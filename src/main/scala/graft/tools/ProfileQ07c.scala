package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch: decompose q07's posting-build stage cost (not driver contract):
  * scan-only vs expr-only vs expr+explode vs full build+checkpoint.
  */
object ProfileQ07c {
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
    import graft.operators.Spann

    val vectors = graft.Tables.lineitemVec(spark, sfDir)
    vectors.count()
    val heads = Spann.selectHeadsModulo(vectors, 200)
    heads.count()

    def t(name: String)(f: => Any): Unit =
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        val r = f
        println(f"[prof] $name%-34s run$i ${(System.nanoTime() - t0) / 1e9}%6.2f s ($r)")
      }

    val nn = graft.functions.NearestHeadsExpr
      .fromHeadsBounded(heads, col("vec"), 4, "l2sq", 100000).get

    // warm all paths
    Spann.buildPostings(vectors, heads, 4).localCheckpoint(true).count()

    t("A scan only (noop agg over id)") {
      vectors.select(col("id")).agg(count(lit(1))).collect()(0).getLong(0)
    }
    t("B expr only (sum of sizes)") {
      vectors.select(size(nn).as("s")).agg(sum(col("s"))).collect()(0).getLong(0)
    }
    t("C expr + explode + project") {
      vectors.select(col("id"), col("vec"), explode(nn).as("r"))
        .select(col("r.id").as("head_id"), col("id"), col("vec"),
          col("r.dist").as("dist"))
        .agg(count(lit(1))).collect()(0).getLong(0)
    }
    t("D full build + localCheckpoint") {
      val p = Spann.buildPostings(vectors, heads, 4).localCheckpoint(true)
      val n = p.count(); p.unpersist(); n
    }
    spark.stop()
  }
}
