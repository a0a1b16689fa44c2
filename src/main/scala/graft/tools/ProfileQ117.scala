package graft.tools

import org.apache.spark.sql.functions._

/** Scratch: q117's graph-build decomposition — where do the ~5 s go, and
  * what strategy does the TP-tree leaf self-join pick? Not driver contract.
  */
object ProfileQ117 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = graft.GraftSession.build()
    spark.sparkContext.setLogLevel("ERROR")

    def t(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prof] $name%-40s ${(System.nanoTime() - t0) / 1e9}%6.2f s  ($r)")
    }

    val vecs = graft.Tables.lineitemVec(spark, sfDir).select(col("id"), col("vec"))
    vecs.count()

    // leaf distribution per tree
    for (tr <- 0 until 2) {
      val dist = vecs.select(graft.operators.KnnGraph.leafCode(col("vec"), tr, 8, 6).as("leaf"))
        .groupBy("leaf").count().orderBy(desc("count")).limit(5).collect()
      println(s"[prof] tree $tr top leaves: ${dist.map(r => s"${r.getLong(0)}:${r.getLong(1)}").mkString(" ")}")
    }

    val g = graft.operators.KnnGraph.build(vecs, 6, 8, 2, 8)
    t("build (full)") { g.count() }
    val gf = graft.operators.KnnGraph.build(vecs, 6, 8, 2, 8).where(col("src") <= 2000)
    t("build + src<=2000 (q117 shape)") { gf.count() }
    println(gf.queryExecution.executedPlan.toString.linesIterator
      .filter(l => l.contains("Join") || l.contains("Exchange") || l.contains("Filter") || l.contains("Aggregate"))
      .mkString("\n"))
    t("rngRefine") {
      graft.operators.KnnGraph.rngRefine(gf, vecs).count()
    }
    spark.stop()
  }
}
