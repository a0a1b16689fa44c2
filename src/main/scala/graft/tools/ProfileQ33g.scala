package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch: loop q33 in fresh child sessions forever so a thread dump can be
  * taken mid-stage (guide §7.3). Not driver contract.
  */
object ProfileQ33g {
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
    Dedup.minhashDedup(graft.Tables.documents(spark, sfDir), 0.3).count()
    (1 to 60).foreach { rep =>
      val sess = spark.newSession()
      val t = System.nanoTime()
      Dedup.minhashDedup(graft.Tables.documents(sess, sfDir), 0.3).count()
      println(f"[prof] rep$rep ${(System.nanoTime() - t) / 1e9}%6.2f s")
    }
    spark.stop()
  }
}
