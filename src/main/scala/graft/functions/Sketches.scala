package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Streaming-friendly frequency/cardinality sketches over a token (or any
  * string-keyed) stream — the bounded-state summaries a 100 TB corpus pass
  * keeps instead of exact per-key tables:
  *
  *  - [[cmsSketch]]/[[cmsEstimate]]: count-min sketch (Cormode &
  *    Muthukrishnan 2005) — `depth × width` counters; estimates
  *    over-count, never under-count, with error ≤ 2·N/width at confidence
  *    1 − 2^−depth. The heavy-hitter / frequency-probe companion to the
  *    exact [[graft.operators.TextAnalysis.vocabulary]] top-V.
  *  - [[hllRegisters]]: HyperLogLog register table (Flajolet et al. 2007) —
  *    2^p max-rank registers for distinct-count estimation;
  *    [[hllEstimate]] applies the standard bias-corrected harmonic mean.
  *  - [[kmv]]/[[kmvOverlap]]: bottom-k (KMV) distinct sketch (Bar-Yossef
  *    et al. 2002) — the k smallest hash values; unlike HLL it supports
  *    SET OPERATIONS, so two datasets' overlap is estimable from their
  *    sketches alone.
  *
  * Everything is derived from [[Hash60]] with engine-exact integer math
  * (bucket = hash mod width; HLL rank via the BINARY-STRING length of the
  * value bits — `length(bin(v))`, exact in any engine, no float log2), so
  * both sketches are bit-identical in Spark and the DuckDB oracle. Spark's
  * own `approx_count_distinct` ships a non-portable HLL++ binary — this
  * table form is the interoperable one (and is mergeable by plain SUM/MAX
  * across shards, the property that matters at 1000 executors).
  *
  * Scale posture: sketch builds are `depth×` the item stream into a
  * hash aggregation BOUNDED by `depth·width` (CMS) or `2^p` (HLL) rows —
  * map-side partial, mergeable, no key-cardinality state anywhere.
  */
object Sketches {

  /** Count-min sketch table: `(row, bucket, cnt)` — row `j` hashes item
    * `x` to `hash60(j ⊔ x) mod width` (independent salted hash per row).
    * `depth·width` rows at most; merge two sketches by summing `cnt`.
    */
  def cmsSketch(items: DataFrame, itemCol: String,
      width: Int, depth: Int): DataFrame =
    items
      .select(col(itemCol).as("_x"),
        explode(sequence(lit(0), lit(depth - 1))).as("row"))
      .select(col("row"), (Hash60(concat(col("row"), lit("|"), col("_x"))) % width).as("bucket"))
      .groupBy(col("row"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))

  /** Point-estimate the count of each probe item: `min_j sketch[j][h_j(x)]`
    * — joins the (small, broadcastable) sketch against `depth` hashed rows
    * per probe. Estimates never under-count; a probe hitting an untouched
    * bucket in some row reads 0 (a provably-absent item).
    */
  def cmsEstimate(probes: DataFrame, sketch: DataFrame, itemCol: String,
      width: Int, depth: Int): DataFrame =
    probes
      .select(col(itemCol),
        explode(sequence(lit(0), lit(depth - 1))).as("row"))
      .select(col(itemCol), col("row"),
        (Hash60(concat(col("row"), lit("|"), col(itemCol))) % width).as("bucket"))
      .join(broadcast(sketch), Seq("row", "bucket"), "left")
      .groupBy(col(itemCol))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est_cnt"))

  /** HyperLogLog register table over DISTINCT items: `(bucket, register)`,
    * bucket = low `p` bits of the hash, register = max rank of the
    * remaining `60 − p` value bits (rank = leading-zero count + 1,
    * computed as `(60 − p) − (length(bin(v)) − 1)` for v > 0 — pure string
    * length, engine-exact). Merge two tables by per-bucket MAX. Only
    * buckets some item hit appear; absent buckets are register 0.
    */
  def hllRegisters(items: DataFrame, itemCol: String, p: Int): DataFrame = {
    require(p >= 4 && p <= 16, s"p $p out of the practical 4..16 range")
    val m = 1 << p
    val w = 60 - p
    val h = Hash60(col(itemCol))
    val v = shiftright(h, p)
    val rank = when(v === 0, lit(w + 1))
      .otherwise(lit(w) - (length(bin(v)) - 1))
    items
      .select((h % m).as("bucket"), rank.as("_rank"))
      .groupBy(col("bucket"))
      .agg(max(col("_rank")).as("register"))
  }

  /** The standard HLL estimate from a register table (driver-side scalar —
    * registers are ≤ 2^p rows by construction): bias-corrected harmonic
    * mean with the small-range linear-counting correction. For audits and
    * specs; pipelines usually keep the mergeable table itself.
    */
  def hllEstimate(registers: DataFrame, p: Int): Double = {
    val m = 1 << p
    val regs = new Array[Int](m)
    registers.collect().foreach { r =>
      regs(r.getAs[Number](0).intValue) = r.getAs[Number](1).intValue
    }
    val alpha = m match {
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case _ => 0.7213 / (1 + 1.079 / m)
    }
    val z = 1.0 / regs.map(r => math.pow(2.0, -r)).sum
    val e = alpha * m * m * z
    val zeros = regs.count(_ == 0)
    if (e <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros) else e
  }

  /** Hash60's value space: hashes are uniform in `[0, 2^60)`. */
  val KmvSpace: Double = math.pow(2.0, 60)

  /** KMV (k-minimum-values / bottom-k) distinct sketch per key: the k
    * SMALLEST distinct [[Hash60]] values of `valueCol`, sorted ascending.
    * Unlike HLL registers, bottom-k sketches support SET OPERATIONS — the
    * union of two sketches' k smallest values is a valid sketch of the
    * union, and membership of one sketch's hashes in another estimates
    * Jaccard — so cross-dataset overlap is estimable WITHOUT joining the
    * datasets ([[kmvOverlap]]). Fully deterministic (md5 hash, exact
    * integer order), so the DuckDB oracle replays it bit-for-bit.
    *
    * Scale: ONE bounded aggregate — [[BottomKLongs]] keeps the k smallest
    * DISTINCT hashes per key inside Spark's partial-aggregation machinery,
    * so each map task reduces its slice to ≤ k values before the shuffle
    * (O(keys · k · tasks) exchange rows). No distinct pre-pass (the buffer
    * dedups in-place) and no per-key window over the corpus (which would
    * move every distinct (key, hash) pair to ONE reducer per key and sort
    * it). Output `(key, kmv array<long>)`, length ≤ k, ascending.
    */
  def kmv(df: DataFrame, keyCol: String, valueCol: String, k: Int): DataFrame = {
    require(k > 0)
    df.select(col(keyCol), Hash60(col(valueCol)).as("_h"))
      .groupBy(col(keyCol))
      .agg(BottomKLongs.bottomk(col("_h"), k).as("kmv"))
  }

  /** Overlap estimation from two KMV sketches (no data join): merge the
    * two hash lists, take the k smallest of the union — a valid union
    * sketch; `est_union = (k−1)·2^60 / U_(k)` (the classic bottom-k
    * estimator; exact count when the sketch isn't full), Jaccard ≈ the
    * share of union-sketch hashes present in BOTH inputs, and
    * `est_intersect = jaccard · est_union`. Input: one row per side from
    * [[kmv]]; output ONE row `(k, est_a, est_b, est_union, est_intersect)`
    * — unrounded doubles (integer hash order + single divides).
    */
  def kmvOverlap(a: DataFrame, b: DataFrame, k: Int): DataFrame = {
    // grand-aggregate each side to exactly ONE row (empty sketch for an
    // absent key) so the output is always one row — a bare crossJoin of a
    // 0-row side would yield 0 rows while the SQL mirror's grand
    // aggregates yield 1. A side holding MORE than one sketch row (caller
    // forgot the key filter) fails loudly instead of first() picking a
    // nondeterministic sketch and silently skewing the estimate.
    def side(df: DataFrame, out: String) = df
      .agg(count(lit(1)).as("_c"),
        coalesce(first(col("kmv")), array().cast("array<long>")).as(out))
      .where(assert_true(col("_c") <= 1,
        lit("Sketches.kmvOverlap: each side must hold at most one sketch " +
          "row — filter to a single key first")).isNull)
      .drop("_c")
    val merged = side(a, "_ka")
      .crossJoin(broadcast(side(b, "_kb")))
      .withColumn("_u", slice(array_sort(array_union(col("_ka"), col("_kb"))), 1, k))
    def est(arr: Column): Column =
      when(size(arr) < k, size(arr).cast("double"))
        .otherwise(lit((k - 1).toDouble) * lit(KmvSpace) /
          element_at(arr, k).cast("double"))
    merged.select(
      lit(k).as("k"),
      est(col("_ka")).as("est_a"),
      est(col("_kb")).as("est_b"),
      est(col("_u")).as("est_union"),
      when(size(col("_u")) > 0,
        size(filter(col("_u"), h =>
          array_contains(col("_ka"), h) && array_contains(col("_kb"), h)))
          .cast("double") / size(col("_u")).cast("double") *
          est(col("_u"))).otherwise(lit(0.0)).as("est_intersect"))
  }
}
