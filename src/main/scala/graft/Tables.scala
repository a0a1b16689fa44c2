package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver's parquet tables plus the deterministic derived
  * vector fixtures (FIXTURES.md §B). Every derivation is integer-exact double
  * math followed by a single cast to float, so DuckDB rebuilds bit-identical
  * vectors in the oracle SQL.
  *
  * Data model mirrors the reference's VectorSet + MetadataSet
  * (`AnnService/inc/Core/VectorSet.h:12-81`, `MetadataSet.h:12-44`):
  * one table of `(id BIGINT, vec ARRAY<FLOAT>, meta STRING)`.
  */
object Tables {
  /** Base parquet frames are memoized per (session, dir, name): a fresh
    * `spark.read.parquet` per call re-infers the schema with a one-task
    * footer-read JOB — profiled at ~0.05-0.1 s of driver+job overhead per
    * bench query (every raw-table query paid it again). Memoizing the
    * ANALYZED frame reuses the footer read and file listing across a
    * session's queries. Plan-object reuse only — no rows are cached; each
    * query still scans the parquet, and the bench's fresh child sessions
    * still start from a cold reader.
    */
  private val tableCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String, String), DataFrame]

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    tableCache.getOrElseUpdate((spark, dir, name),
      spark.read.parquet(s"$dir/$name.parquet"))

  /** The derived-fixture frames are re-used by many queries inside one
    * Verify/Bench run; the lineitem fixture in particular pays a global
    * row_number sort. Cache them once per (session, dir). (Fixture-side
    * only: operator plans stay cache-free.)
    */
  private val fixtureCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String, String), DataFrame]

  private def cached(s: SparkSession, d: String, key: String)(build: => DataFrame): DataFrame =
    fixtureCache.getOrElseUpdate((s, d, key), build.cache())

  /** Drop a finished session's memoized frames and unpersist its fixture
    * cache blocks. The caches key on the session object, so a discarded
    * child session (the bench runs one per timed run) stays strongly
    * reachable — and its cached/checkpointed blocks pinned — until its
    * entries are removed; across a 5-run invocation that retained >1 GB and
    * the growing heap pressure showed up as GC drag on whatever allocates
    * most (measured: the bench's host-state anchor sliding 2.8 s → 12.8 s
    * across attempts while query medians IMPROVED). Callers that discard a
    * session call this; blocks of checkpointed frames free via the context
    * cleaner once unpinned.
    */
  def dropSessionCaches(s: SparkSession): Unit = {
    fixtureCache.keys.filter(_._1 eq s).foreach { k =>
      fixtureCache.remove(k).foreach { df =>
        try df.unpersist(false) catch { case _: Throwable => () }
      }
    }
    tableCache.keys.filter(_._1 eq s).foreach(tableCache.remove)
  }

  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = table(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = table(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame = table(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = table(s, d, "region")
  /** events.parquet carries TIMESTAMP(NANOS) which Spark's parquet reader
    * rejects unless `spark.sql.legacy.parquet.nanosAsLong=true` (then ts
    * arrives as a LongType of nanos) — normalize back to TimestampType
    * (microsecond truncation; DuckDB's `date_trunc` output is unaffected).
    */
  def events(s: SparkSession, d: String): DataFrame = {
    val df = table(s, d, "events")
    if (df.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      df.withColumn("ts", timestamp_micros(floor(col("ts") / 1000).cast("long")))
    else df
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  private def f(c: org.apache.spark.sql.Column) = c.cast("float")

  /** Total order over lineitem for a deterministic synthetic row id —
    * (l_orderkey, l_linenumber) is NOT unique in the synthetic data, so the
    * id is a row_number over ALL columns; any remaining ties are rows that
    * are identical in every vec/meta source column, so the id→(vec,meta)
    * multiset is engine-independent. Fixture-derivation only: a real corpus
    * has a real key (the reference assigns dense int32 VIDs at ingest,
    * `AnnService/inc/Core/Common.h:117`).
    */
  private val lineitemOrderCols = Seq(
    "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice",
    "l_discount", "l_tax", "l_partkey", "l_suppkey", "l_returnflag",
    "l_linestatus", "l_shipdate")

  /** lineitem → 6-dim vector corpus: `(id, vec, meta)`.
    *
    * The id is `row_number() OVER (ORDER BY <all source cols>)` in the oracle;
    * here it is assigned WITHOUT a global single-partition window:
    * `repartitionByRange` puts partitions in key order, `sortWithinPartitions`
    * orders rows inside each, and `zipWithIndex` adds the contiguous global
    * offset (its count pass reads only per-partition sizes). Same total order,
    * full parallelism — the pattern that survives a 100× corpus. Ties in the
    * order (rows identical in every source column) may receive ids in either
    * order, but derive identical (vec, meta), so the id→(vec,meta) multiset is
    * engine-independent either way.
    */
  def lineitemVec(s: SparkSession, d: String): DataFrame = cached(s, d, "lineitemVec") {
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    import org.apache.spark.sql.Row
    val derivedCols = Seq(
      array(
        f(col("l_quantity")),
        f(col("l_extendedprice") / 1000),
        f(col("l_discount") * 100),
        f(col("l_tax") * 100),
        f((col("l_partkey") % 1000) / lit(10.0)),
        f(col("l_suppkey") % 100)
      ).as("vec"),
      concat(col("l_returnflag"), col("l_linestatus")).as("meta")) ++
      lineitemOrderCols.map(col)
    val derived = lineitem(s, d).select(derivedCols: _*)
    val ordered = derived
      .repartitionByRange(fixtureIdPartitions(s), lineitemOrderCols.map(col).toIndexedSeq: _*)
      .sortWithinPartitions(lineitemOrderCols.map(col).toIndexedSeq: _*)
      .select("vec", "meta")
    val schema = StructType(StructField("id", LongType, nullable = false) +: ordered.schema.fields.toIndexedSeq)
    val withId = ordered.rdd.zipWithIndex.map { case (r, i) => Row.fromSeq((i + 1L) +: r.toSeq) }
    s.createDataFrame(withId, schema).select("id", "vec", "meta")
  }

  /** Partition count for the fixture id assignment — derived from the
    * session's shuffle parallelism so each range partition is one task at any
    * configured parallelism. The assigned ids are partition-count-independent
    * (global order is fixed by the range partitioning + in-partition sort).
    */
  private def fixtureIdPartitions(s: SparkSession): Int =
    s.sessionState.conf.numShufflePartitions

  /** orders → query vectors `(query_id, qvec)`; caller filters to a prefix. */
  def ordersQuery(s: SparkSession, d: String): DataFrame =
    orders(s, d).select(
      col("o_orderkey").as("query_id"),
      array(
        f(col("o_totalprice") / 1000),
        f((col("o_custkey") % 1000) / lit(10.0)),
        f(month(col("o_orderdate"))),
        f(dayofmonth(col("o_orderdate"))),
        f(length(col("o_orderpriority"))),
        f(col("o_orderkey") % 97)
      ).as("qvec"))

  /** customer → two vector columns for MultiIndexScan-style queries. */
  def customerVec(s: SparkSession, d: String): DataFrame =
    customer(s, d).select(
      col("c_custkey").as("id"),
      array(
        f(col("c_acctbal") / 100),
        f(col("c_nationkey")),
        f(length(col("c_name")))
      ).as("vec_a"),
      array(
        f(col("c_custkey") % 97),
        f(length(col("c_mktsegment")) % 31),
        f(col("c_nationkey") * 2)
      ).as("vec_b"))

  /** embeddings with canonical column names `(id, vec, label)`. */
  def embeddingVec(s: SparkSession, d: String): DataFrame =
    embeddings(s, d).select(
      col("vec_id").as("id"), col("embedding").as("vec"), col("label"))

  /** Derived delete set (Labelset semantics, `Common/Labelset.h:15-60`):
    * deterministic tombstones — every 10th vector id.
    */
  def deletes(s: SparkSession, d: String): DataFrame =
    lineitemVec(s, d).select(col("id")).where(col("id") % 10 === 0)

  // ---- matching DuckDB SQL fragments (kept adjacent to the Scala so the two
  //      derivations never drift) ----

  /** CTE body producing the same rows as [[lineitemVec]]. */
  val lineitemVecSql: String =
    s"""SELECT row_number() OVER (ORDER BY ${lineitemOrderCols.mkString(", ")}) AS id,
      |  [CAST(l_quantity AS FLOAT), CAST(l_extendedprice/1000 AS FLOAT),
      |   CAST(l_discount*100 AS FLOAT), CAST(l_tax*100 AS FLOAT),
      |   CAST((l_partkey%1000)/10.0 AS FLOAT), CAST(l_suppkey%100 AS FLOAT)] AS vec,
      |  l_returnflag || l_linestatus AS meta
      |FROM lineitem""".stripMargin

  /** CTE body producing the same rows as [[ordersQuery]]. */
  val ordersQuerySql: String =
    """SELECT o_orderkey AS query_id,
      |  [CAST(o_totalprice/1000 AS FLOAT), CAST((o_custkey%1000)/10.0 AS FLOAT),
      |   CAST(month(o_orderdate) AS FLOAT), CAST(day(o_orderdate) AS FLOAT),
      |   CAST(length(o_orderpriority) AS FLOAT), CAST(o_orderkey%97 AS FLOAT)] AS qvec
      |FROM orders""".stripMargin

  val customerVecSql: String =
    """SELECT c_custkey AS id,
      |  [CAST(c_acctbal/100 AS FLOAT), CAST(c_nationkey AS FLOAT),
      |   CAST(length(c_name) AS FLOAT)] AS vec_a,
      |  [CAST(c_custkey%97 AS FLOAT), CAST(length(c_mktsegment)%31 AS FLOAT),
      |   CAST(c_nationkey*2 AS FLOAT)] AS vec_b
      |FROM customer""".stripMargin

  val deletesSql: String =
    s"SELECT id FROM ($lineitemVecSql) WHERE id % 10 = 0"

  /** DuckDB expression for the same double-precision distance as
    * [[graft.functions.VectorDistance]] (strict left-to-right list_sum).
    */
  def distSql(metric: String, a: String, b: String): String = metric match {
    case "l2sq" =>
      s"list_sum(list_transform(list_zip($a, $b), s -> (s[1]::DOUBLE - s[2]::DOUBLE) * (s[1]::DOUBLE - s[2]::DOUBLE)))"
    case "dot" =>
      s"list_sum(list_transform(list_zip($a, $b), s -> s[1]::DOUBLE * s[2]::DOUBLE))"
    case "ip" =>
      s"-list_sum(list_transform(list_zip($a, $b), s -> s[1]::DOUBLE * s[2]::DOUBLE))"
    case "cos" =>
      val dot = s"list_sum(list_transform(list_zip($a, $b), s -> s[1]::DOUBLE * s[2]::DOUBLE))"
      val na = s"list_sum(list_transform($a, x -> x::DOUBLE * x::DOUBLE))"
      val nb = s"list_sum(list_transform($b, x -> x::DOUBLE * x::DOUBLE))"
      s"(CASE WHEN sqrt(($na) * ($nb)) = 0 THEN 1.0 ELSE 1.0 - ($dot) / sqrt(($na) * ($nb)) END)"
  }
}
