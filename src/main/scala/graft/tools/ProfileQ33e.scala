package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch: FRESH-SESSION stage attribution for q33 (not driver contract).
  * ProfileQ33c showed warm-in-session 0.89 s vs ~1.6 s in the bench's fresh
  * child sessions — this splits the fresh-session run stage by stage to find
  * where the per-session tax lands.
  */
object ProfileQ33e {
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

    // JVM warmup in the primary session
    Dedup.minhashDedup(graft.Tables.documents(spark, sfDir), 0.3).count()

    (1 to 3).foreach { rep =>
      val sess = spark.newSession()
      // mirror the bench: schema pre-resolved
      graft.Tables.table(sess, sfDir, "documents").schema
      val docs = graft.Tables.documents(sess, sfDir)
      def tt(name: String)(f: => Any): Unit = {
        val t0 = System.nanoTime()
        val r = f
        println(f"[prof] rep$rep $name%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s ($r)")
      }
      val target = sess.sessionState.conf.numShufflePartitions
      tt("0 partition probe") { docs.rdd.getNumPartitions }
      val spread =
        if (docs.rdd.getNumPartitions < target) docs.repartition(target) else docs
      var da: org.apache.spark.sql.DataFrame = null
      tt("A checkpoint(shingleArrays)") {
        da = Dedup.shingleArrays(spread).localCheckpoint(true); da.count()
      }
      var cands: org.apache.spark.sql.DataFrame = null
      tt("B sigs+bands+cands") {
        cands = Dedup.lshCandidates(
          Dedup.lshBands(Dedup.minhashFromArrays(da, 16), 16, 4))
        cands.count()
      }
      tt("C verify join") {
        Dedup.verifiedPairs(cands, da, da, 0.3).count()
      }
      tt("D e2e fresh frame") {
        Dedup.minhashDedup(graft.Tables.documents(sess, sfDir), 0.3).count()
      }
    }
    spark.stop()
  }
}
