package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for the MinHash dedup pipeline stages (not part of the
  * driver contract; run with `sbt "runMain graft.tools.ProfileQ33 <sfDir>"`).
  */
object ProfileQ33 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "4194304")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prof] $name%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val docs = graft.Tables.documents(spark, sfDir)
    println(s"[prof] docs=${docs.count()}")
    val sh = t("shingles+checkpoint") {
      graft.operators.Dedup.shingles(docs).localCheckpoint(true)
    }
    println(s"[prof] shingle rows=${sh.count()}")
    val sig = t("minhash") { val x = graft.operators.Dedup.minhash(sh, 16); x.count(); x }
    val bands = t("lshBands") { val x = graft.operators.Dedup.lshBands(sig, 16, 4); x.count(); x }
    val cands = t("lshCandidates") { val x = graft.operators.Dedup.lshCandidates(bands); println("cands=" + x.count()); x }
    t("jaccard-verify") {
      println("pairs=" + graft.operators.Dedup.jaccard(sh, Some(cands))
        .where(col("jaccard") >= 0.3).count())
    }
    t("end-to-end minhashDedup") {
      println("rows=" + graft.operators.Dedup.minhashDedup(docs, 0.3).count())
    }
    spark.stop()
  }
}
