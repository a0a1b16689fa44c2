package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch: what does q07's TIMED action (count over the declared frame)
  * actually execute? Dumps the executed plan of the count and times the
  * pieces (not driver contract).
  */
object ProfileQ07d {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.artifact.isolation.enabled", "false")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "4194304")
      .config("spark.sql.constraintPropagation.enabled", "false")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.Tables.lineitemVec(spark, sfDir).count()
    val df = graft.SparkEntry.queries("q07_spann_postings")(spark, sfDir)
    val cnt = df.groupBy().count()
    cnt.collect()
    println("=== executed plan of q07.count() ===")
    println(cnt.queryExecution.executedPlan.toString.take(3000))
  }
}
