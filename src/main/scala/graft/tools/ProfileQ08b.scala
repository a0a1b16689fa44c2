package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch: stage-by-stage breakdown of searchTwoStage (q08). */
object ProfileQ08b {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "4194304")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def t(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prof] $name%-34s ${(System.nanoTime() - t0) / 1e9}%6.2f s  ($r)")
    }

    val vecs = graft.Tables.lineitemVec(spark, sfDir)
    vecs.count()
    val heads = graft.operators.Spann.selectHeadsModulo(vecs, 200)
    val q = graft.Tables.ordersQuery(spark, sfDir).where(col("query_id") < 50)
    val cp = graft.operators.Spann.buildPostings(vecs, heads, 4).localCheckpoint(true)
    val cand = graft.operators.Spann.candidateHeads(q, heads, 8)

    // warm
    graft.operators.Spann.searchTwoStage(q, heads, cp, 10, 8).count()

    t("scan only") { cp.select(sum(col("head_id"))).head() }
    t("scan+vec touch") { cp.select(sum(element_at(col("vec"), 1))).head() }
    t("cand only") { cand.count() }
    val joined = cand.join(cp, Seq("head_id")).join(broadcast(q), Seq("query_id"))
    t("join only (count)") { joined.count() }
    t("join+dist") {
      joined.select(sum(graft.functions.dist.l2sq(col("qvec"), col("vec")))).head()
    }
    val hits = joined
      .withColumn("pdist", graft.functions.dist.l2sq(col("qvec"), col("vec")))
      .groupBy(col("query_id"), col("id")).agg(min(col("pdist")).as("pdist"))
    t("join+dist+dedup") { hits.count() }
    t("full (2nd warm)") { graft.operators.Spann.searchTwoStage(q, heads, cp, 10, 8).count() }
    joined.queryExecution.executedPlan // force
    println(graft.operators.Spann.searchTwoStage(q, heads, cp, 10, 8)
      .queryExecution.executedPlan.toString.linesIterator
      .filter(l => l.contains("Join") || l.contains("Exchange") || l.contains("Aggregate") || l.contains("Scan"))
      .mkString("\n"))
    spark.stop()
  }
}
