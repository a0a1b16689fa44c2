package graft.tools

import org.apache.spark.sql.SparkSession

/** Fixed-cost dissection for the small headline queries (q20/q43): per
  * FRESH child session (the Bench protocol), time the first (benched) and
  * second (warm-plan floor) execution under config variants — AQE on/off,
  * base-table listing pre-warmed or not. Scratch tool, not driver contract.
  */
object ProfileFixedCost {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "4194304")
      .config("spark.sql.constraintPropagation.enabled", "false")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.Tables.lineitemVec(spark, sfDir).count()
    // JIT warm like Bench
    val warmDir = "/root/testdata/sf0.001"
    graft.Tables.lineitemVec(spark, warmDir).count()
    Seq("q20_tpch_q1", "q43_events_window").foreach { n =>
      try graft.SparkEntry.queries(n)(spark, warmDir).count()
      catch { case _: Throwable => () }
    }
    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    for (q <- Seq("q20_tpch_q1", "q43_events_window");
         aqe <- Seq(true, false);
         preList <- Seq(false, true)) {
      val times = (1 to 3).map { _ =>
        val sess = spark.newSession()
        sess.conf.set("spark.sql.adaptive.enabled", aqe.toString)
        graft.Tables.lineitemVec(sess, sfDir).count()
        if (preList) { // schema+listing touch of the base tables, no scan
          sess.read.parquet(s"$sfDir/lineitem.parquet").queryExecution.analyzed
          sess.read.parquet(s"$sfDir/events.parquet").queryExecution.analyzed
        }
        val fn = graft.SparkEntry.queries(q)
        val cold = timed(fn(sess, sfDir).count())
        val warm = timed(fn(sess, sfDir).count())
        (cold, warm)
      }
      val c = times.map(_._1).sorted.apply(1)
      val w = times.map(_._2).sorted.apply(1)
      println(f"[fc] $q%-18s aqe=$aqe%-5s preList=$preList%-5s cold=$c%5.3f warm=$w%5.3f")
    }
    spark.stop()
  }
}
