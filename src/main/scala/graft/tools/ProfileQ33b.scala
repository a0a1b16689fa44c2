package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch: row-form vs array-form minhash dedup, warm, with/without an
  * input repartition (not driver contract).
  */
object ProfileQ33b {
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
    import graft.operators.Dedup

    def t(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prof] $name%-34s ${(System.nanoTime() - t0) / 1e9}%6.2f s  ($r)")
    }

    val docs = graft.Tables.documents(spark, sfDir)
    println(s"[prof] docs=${docs.count()} parts=${docs.rdd.getNumPartitions}")
    val docsR = docs.repartition(32)

    def rowForm(d: org.apache.spark.sql.DataFrame): Long = {
      val sh = Dedup.shingles(d).localCheckpoint(true)
      val cands = Dedup.lshCandidates(Dedup.lshBands(Dedup.minhash(sh, 16), 16, 4))
      Dedup.jaccard(sh, Some(cands)).where(col("jaccard") >= 0.3).count()
    }
    // warm everything twice
    rowForm(docs); Dedup.minhashDedup(docs, 0.3).count()
    rowForm(docsR); Dedup.minhashDedup(docsR, 0.3).count()

    t("row-form, as-read") { rowForm(docs) }
    t("row-form, repartition(32)") { rowForm(docsR) }
    t("array-form, as-read") { Dedup.minhashDedup(docs, 0.3).count() }
    t("array-form, repartition(32)") { Dedup.minhashDedup(docsR, 0.3).count() }
    t("array-form, as-read (again)") { Dedup.minhashDedup(docs, 0.3).count() }
    t("row-form, as-read (again)") { rowForm(docs) }
    spark.stop()
  }
}
