package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Scratch: per-stage wall/run/cpu/gc attribution for ANY bench query in
  * fresh child sessions (not driver contract).
  *
  * Usage: `runMain graft.tools.ProfileStages <name[,name2,...]> [sfDir] [reps]`
  * — queries run in declaration order inside EACH rep's fresh session, so a
  * `q07,q08` run shows the build-then-search split exactly as the bench sees
  * it.
  */
object ProfileStages {
  def main(args: Array[String]): Unit = {
    val names = args.headOption.getOrElse("q07_spann_postings").split(",").toSeq
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(2).map(_.toInt).getOrElse(2)
    // shared conf set (graft.GraftSession): the profiler must measure the
    // bench's configuration — incl. the shared codegen cache — or its
    // fresh-session timings include recompiles the bench doesn't pay
    val spark = graft.GraftSession.build()
    spark.sparkContext.setLogLevel("ERROR")

    @volatile var t0 = System.nanoTime()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val wall = (si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)) / 1e3
        val run = si.taskMetrics.executorRunTime / 1e3
        val cpu = si.taskMetrics.executorCpuTime / 1e9
        val gc = si.taskMetrics.jvmGCTime / 1e3
        val at = (System.nanoTime() - t0) / 1e9
        println(f"[stage] at=$at%6.2f id=${si.stageId}%3d tasks=${si.numTasks}%3d wall=$wall%6.2f runSum=$run%7.2f cpuSum=$cpu%7.2f gcSum=$gc%5.2f ${si.name.take(70)}")
      }
    })

    // JVM warmup in the primary session
    graft.Tables.lineitemVec(spark, sfDir).count()
    names.foreach(n => graft.SparkEntry.queries(n)(spark, sfDir).count())

    (1 to reps).foreach { rep =>
      val sess = spark.newSession()
      graft.Tables.lineitemVec(sess, sfDir).count()
      Seq("lineitem", "orders", "customer", "events", "documents",
        "embeddings").foreach { t =>
        try graft.Tables.table(sess, sfDir, t).schema
        catch { case _: Throwable => () }
      }
      println(s"[prof] ===== rep$rep fresh session =====")
      names.foreach { n =>
        t0 = System.nanoTime()
        val t = System.nanoTime()
        graft.SparkEntry.queries(n)(sess, sfDir).count()
        println(f"[prof] rep$rep $n%-24s ${(System.nanoTime() - t) / 1e9}%6.2f s")
      }
      // unpin the dead child session's memoized frames/checkpoints (ADVICE
      // r15: the session-keyed caches otherwise hold every rep's blocks for
      // the JVM lifetime, the same retained-heap class the bench fixed)
      graft.SparkEntry.dropSessionCaches(sess)
      System.gc()
      Thread.sleep(300)
    }
    spark.stop()
  }
}
