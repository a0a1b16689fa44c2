package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Scratch: per-stage wall/task attribution for one fresh-session q33 run
  * (not driver contract). Prints every completed stage's duration, task
  * count, andtotal executor run time so the fresh-session tax is visible at the
  * stage level.
  */
object ProfileQ33f {
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

    // JVM warmup
    Dedup.minhashDedup(graft.Tables.documents(spark, sfDir), 0.3).count()

    @volatile var t0 = System.nanoTime()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val wall = (si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)) / 1e3
        val run = si.taskMetrics.executorRunTime / 1e3
        val cpu = si.taskMetrics.executorCpuTime / 1e9
        val gc = si.taskMetrics.jvmGCTime / 1e3
        val deser = si.taskMetrics.executorDeserializeTime / 1e3
        val at = (System.nanoTime() - t0) / 1e9
        println(f"[stage] at=$at%6.2f id=${si.stageId}%3d tasks=${si.numTasks}%3d wall=$wall%6.2f runSum=$run%7.2f cpuSum=$cpu%7.2f gcSum=$gc%6.2f deserSum=$deser%6.2f ${si.name.take(60)}")
      }
    })

    (1 to 2).foreach { rep =>
      val sess = spark.newSession()
      graft.Tables.table(sess, sfDir, "documents").schema
      println(s"[prof] ===== rep$rep fresh session =====")
      t0 = System.nanoTime()
      val t = System.nanoTime()
      Dedup.minhashDedup(graft.Tables.documents(sess, sfDir), 0.3).count()
      println(f"[prof] rep$rep e2e ${(System.nanoTime() - t) / 1e9}%6.2f s")
      Thread.sleep(500)
    }
    spark.stop()
  }
}
