package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch: WARM stage attribution for the array-form q33 pipeline (not
  * driver contract). Each stage timed 3× after a full warmup pass, so the
  * numbers are steady-state operator cost, not JIT.
  */
object ProfileQ33c {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "4194304")
      .config("spark.sql.constraintPropagation.enabled", "false")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.Dedup

    def t(name: String)(f: => Any): Unit =
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        val r = f
        println(f"[prof] $name%-30s run$i ${(System.nanoTime() - t0) / 1e9}%6.2f s ($r)")
      }

    val docs = graft.Tables.documents(spark, sfDir)
    println(s"[prof] docs=${docs.count()} parts=${docs.rdd.getNumPartitions}")
    // warm every code path once
    Dedup.minhashDedup(docs, 0.3).count()

    val target = spark.sessionState.conf.numShufflePartitions
    def spread = if (docs.rdd.getNumPartitions < target) docs.repartition(target) else docs

    t("A checkpoint(shingleArrays)") {
      val da = Dedup.shingleArrays(spread).localCheckpoint(true)
      val n = da.count(); da.unpersist(); n
    }
    val da = Dedup.shingleArrays(spread).localCheckpoint(true)
    t("B sigs+bands+cands (from ckpt)") {
      Dedup.lshCandidates(
        Dedup.lshBands(Dedup.minhashFromArrays(da, 16), 16, 4)).count()
    }
    val cands = Dedup.lshCandidates(
      Dedup.lshBands(Dedup.minhashFromArrays(da, 16), 16, 4)).localCheckpoint(true)
    t("C verify join (from ckpts)") {
      cands
        .join(da.select(col("doc_id").as("a"), col("sharr").as("_sa")), Seq("a"))
        .join(da.select(col("doc_id").as("b"), col("sharr").as("_sb")), Seq("b"))
        .withColumn("_inter", size(array_intersect(col("_sa"), col("_sb"))).cast("long"))
        .select(col("a"), col("b"),
          round(col("_inter").cast("double") /
            (size(col("_sa")) + size(col("_sb")) - col("_inter")).cast("double"), 4)
            .as("jaccard"))
        .where(col("jaccard") >= 0.3).count()
    }
    t("D end-to-end minhashDedup") { Dedup.minhashDedup(docs, 0.3).count() }
    spark.stop()
  }
}
