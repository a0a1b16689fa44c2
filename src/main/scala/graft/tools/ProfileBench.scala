package graft.tools

import org.apache.spark.sql.SparkSession

/** Cold-vs-warm per-query timing: separates plan/codegen/JIT overhead (cold
  * minus warm) from actual data work (warm). Scratch tool, not driver
  * contract.
  */
object ProfileBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    // shared conf set (graft.GraftSession) — measure the bench's config
    val spark = graft.GraftSession.build()
    spark.sparkContext.setLogLevel("ERROR")
    graft.Tables.lineitemVec(spark, sfDir).count()
    for (name <- graft.SparkEntry.benchQueryNames) {
      val fn = graft.SparkEntry.queries(name)
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[prof] $name%-22s cold=${times(0)}%6.2f warm=${times(1)}%6.2f")
    }
    spark.stop()
  }
}
