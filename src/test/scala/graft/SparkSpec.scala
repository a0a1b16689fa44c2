package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session + the SPTAG-mirror synthetic fixtures
  * (FIXTURES.md §A, mirroring `Test/src/AlgoTest.cpp:60-100`):
  * n=2000 d=10 vectors `x[i][:] = i`, queries `q[t][:] = 2t`, meta = str(i).
  */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSpec.session
  import org.apache.spark.sql.functions._

  def synthVectors(n: Int = 2000, d: Int = 10): DataFrame =
    spark.range(n).select(
      col("id"),
      transform(sequence(lit(1), lit(d)), _ => col("id").cast("float")).as("vec"),
      col("id").cast("string").as("meta"))

  def synthQueries(nq: Int = 3, d: Int = 10): DataFrame =
    spark.range(nq).select(
      col("id").as("query_id"),
      transform(sequence(lit(1), lit(d)), _ => (col("id") * 2).cast("float")).as("qvec"))

  val sf0001 = "/root/testdata/sf0.001"
}

object SparkSpec {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // bounded top-k aggregates run over high-cardinality groups (per-vector
      // posting assignment); the 128-key default would silently degrade
      // ObjectHashAggregate to sort-based over the full crossjoin
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "4194304")
      // checkpointed frames carry origin constraints minted from their
      // pre-checkpoint lineage; constraint propagation over them can push a
      // stale-attribute filter across later joins and die in task binding
      // (INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND) — results are unaffected by the
      // rule, so keep it off (IndexStore.save also guards itself for
      // sessions that leave it on)
      .config("spark.sql.constraintPropagation.enabled", "false")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
