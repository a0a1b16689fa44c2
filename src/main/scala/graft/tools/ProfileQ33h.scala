package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch: count whole-stage/expression codegen COMPILATIONS per fresh
  * session for one q33 run (not driver contract). Spark's CodeGenerator
  * tracks compile time in a codahale metric; sampling it before/after each
  * session-run shows whether fresh sessions re-compile (cache miss) or reuse
  * the JVM-wide generated-class cache.
  */
object ProfileQ33h {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.artifact.isolation.enabled",
        sys.env.getOrElse("GRAFT_ARTIFACT_ISOLATION", "true"))
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "4194304")
      .config("spark.sql.constraintPropagation.enabled", "false")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.Dedup
    import org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator

    // CodeGenerator.compileTime is a cumulative nanosecond counter bumped
    // ONLY on real Janino compiles (cache misses)
    def compiles: Long = CodeGenerator.compileTime / 1000000L // ms

    // warmup
    Dedup.minhashDedup(graft.Tables.documents(spark, sfDir), 0.3).count()
    println(s"[prof] after warmup: compileMs=${compiles}")

    (1 to 3).foreach { rep =>
      val sess = spark.newSession()
      val c0 = compiles
      val t = System.nanoTime()
      Dedup.minhashDedup(graft.Tables.documents(sess, sfDir), 0.3).count()
      val dt = (System.nanoTime() - t) / 1e9
      println(f"[prof] rep$rep fresh-session e2e $dt%5.2f s, new compileMs=${compiles - c0}")
    }
    // same session again (warm plan caches)
    val sess = spark.newSession()
    Dedup.minhashDedup(graft.Tables.documents(sess, sfDir), 0.3).count()
    val c0 = compiles
    val t = System.nanoTime()
    Dedup.minhashDedup(graft.Tables.documents(sess, sfDir), 0.3).count()
    println(f"[prof] warm-session rerun ${(System.nanoTime() - t) / 1e9}%5.2f s, new compileMs=${compiles - c0}")
    spark.stop()
  }
}
