package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch: q33 + small-shuffle headliners under AQE coalesce settings
  * (parallelismFirst on/off), fresh child session per rep to mimic the bench
  * protocol (not driver contract).
  */
object ProfileQ33d {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val parallelismFirst = args.lift(1).getOrElse("true")
    val advisory = args.lift(2).getOrElse("64MB")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "4194304")
      .config("spark.sql.constraintPropagation.enabled", "false")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", parallelismFirst)
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", advisory)
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val names = Seq("q33_dedup_minhash", "q43_events_window", "q20_tpch_q1",
      "q44_tpch_q3", "q30_text_stats", "q08_spann_search", "q07_spann_postings")
    // warm
    graft.Tables.lineitemVec(spark, sfDir).count()
    names.foreach(n => graft.SparkEntry.queries(n)(spark, sfDir).count())
    (1 to 3).foreach { rep =>
      val sess = spark.newSession()
      graft.Tables.lineitemVec(sess, sfDir).count()
      names.foreach { n =>
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(n)(sess, sfDir).count()
        println(f"[prof] pf=$parallelismFirst adv=$advisory $n%-22s rep$rep ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      }
    }
    spark.stop()
  }
}
