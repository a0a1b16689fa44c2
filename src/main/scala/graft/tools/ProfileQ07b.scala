package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler: where q07's wall goes — expr vs explode vs checkpoint —
  * and whether a pre-explode (per-vector nn array) checkpoint is cheaper than
  * the exploded posting frame (not driver contract).
  */
object ProfileQ07b {
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

    def t(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prof] $name%-40s ${(System.nanoTime() - t0) / 1e9}%6.2f s  ($r)")
    }

    val vecs = graft.Tables.lineitemVec(spark, sfDir)
    vecs.count()
    val heads = graft.operators.Spann.selectHeadsModulo(vecs, 200)
    // warm
    graft.operators.Spann.buildPostings(vecs.limit(1000), heads, 4).count()

    val nn = graft.functions.NearestHeadsExpr.fromHeads(heads, col("vec"), 4, "l2sq")

    t("expr forced (sum of dists)") {
      vecs.select(explode(nn).as("r")).agg(sum(col("r.dist"))).collect()(0)
    }
    t("expr no explode, forced via element_at") {
      vecs.select(element_at(nn, 1).getField("dist").as("d"))
        .agg(sum(col("d"))).collect()(0)
    }
    t("pre-explode frame checkpoint (id,vec,nn)") {
      vecs.select(col("id"), col("vec"), nn.as("nn")).localCheckpoint(true).count()
    }
    val pre = vecs.select(col("id"), col("vec"), nn.as("nn")).localCheckpoint(true)
    t("explode AFTER checkpoint -> count") {
      pre.select(col("id"), col("vec"), explode(col("nn")).as("r"))
        .select(col("r.id").as("head_id"), col("id"), col("vec"),
          col("r.dist").as("dist")).count()
    }
    t("exploded checkpoint (status quo)") {
      graft.operators.Spann.buildPostings(vecs, heads, 4).localCheckpoint(true).count()
    }
    t("exploded checkpoint, no vec col") {
      graft.operators.Spann.buildPostings(vecs, heads, 4)
        .select("head_id", "id", "dist").localCheckpoint(true).count()
    }
    spark.stop()
  }
}
