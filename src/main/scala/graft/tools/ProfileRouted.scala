package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch: stage attribution for the routed posting assignment at the 10×
  * probe scale (not driver contract).
  */
object ProfileRouted {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/tmp/graft_scale10")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "4194304")
      .config("spark.sql.constraintPropagation.enabled", "false")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.Spann

    def t(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prof] $name%-38s ${(System.nanoTime() - t0) / 1e9}%7.2f s  ($r)")
    }

    val vecs = graft.Tables.lineitemVec(spark, d)
    t("fixture count") { vecs.count() }
    val heads = Spann.selectHeadsModulo(vecs, 200)
    val sh = Spann.selectHeadsModulo(vecs, 200 * 20)
      .select(col("head_id").as("super_id"), col("head_vec").as("super_vec"))
    t("supers count") { sh.count() }
    val routing = Spann.routeHeads(heads, sh, 2).localCheckpoint(true)
    t("routing checkpoint count") { routing.count() }
    var colOpt: Option[org.apache.spark.sql.Column] = None
    t("fromFramesBounded (driver build)") {
      colOpt = graft.functions.RoutedNearestHeadsExpr.fromFramesBounded(
        sh, routing, col("vec"), 4, 4, "l2sq", 2000000)
      colOpt.isDefined
    }
    val nn = colOpt.get
    t("routed expr explode count (run 1)") {
      vecs.select(col("id"), col("vec"), explode(nn).as("r")).count()
    }
    t("routed expr explode count (run 2)") {
      vecs.select(col("id"), col("vec"), explode(nn).as("r")).count()
    }
    t("buildPostingsRouted end-to-end") {
      Spann.buildPostingsRouted(vecs, sh, routing, 4, superK = 4).count()
    }
    spark.stop()
  }
}
