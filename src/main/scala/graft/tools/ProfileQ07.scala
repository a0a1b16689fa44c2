package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for the SPANN posting build (not driver contract). */
object ProfileQ07 {
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
    // warm
    graft.operators.Spann.buildPostings(vecs.limit(1000), heads, 4).count()

    t("expr only (agg nn, no explode)") {
      val nn = graft.functions.NearestHeadsExpr.fromHeads(heads, col("vec"), 4, "l2sq")
      vecs.select(col("id"), nn.as("nn")).select(count(lit(1))).collect()(0).getLong(0)
    }
    t("buildPostings count") {
      graft.operators.Spann.buildPostings(vecs, heads, 4).count()
    }
    t("buildPostings + localCheckpoint") {
      graft.operators.Spann.buildPostings(vecs, heads, 4).localCheckpoint(true).count()
    }
    spark.stop()
  }
}
