package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Join shapes Spark's optimizer cannot plan well declaratively — written
  * once here in their scale-safe forms (see also [[Events.asOfJoin]]):
  * a naive `lo <= x AND x <= hi` predicate compiles to a
  * BroadcastNestedLoopJoin (or worse, a CartesianProduct), which is an
  * all-pairs scan however selective the ranges are.
  */
object Joins {

  /** Range (interval-containment) join: points `(… , x)` × intervals
    * `(… , lo, hi)` → one row per (point, containing interval),
    * `lo <= x <= hi`. The bucketed form: intervals explode to the coarse
    * buckets they overlap (`floor(lo/W) .. floor(hi/W)`), points hash to
    * their single bucket, the join is an EQUI-join on the bucket, and the
    * exact containment predicate filters in-row. Shuffle ∝ points +
    * Σ interval-spans/W — pick `bucketWidth` near the typical interval
    * length so each interval explodes to O(1) buckets. The IP-to-geo /
    * price-band / time-window lookup shape at corpus scale.
    *
    * Column contract: `points` carries numeric `x`, `intervals` carries
    * numeric `lo`/`hi` (inclusive both ends); all other columns pass
    * through (names must not collide).
    */
  def rangeJoin(
      points: DataFrame,
      intervals: DataFrame,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val p = points.withColumn("_bkt", floor(col("x") / bucketWidth).cast("long"))
    val iv = intervals
      .withColumn("_bkt", explode(sequence(
        floor(col("lo") / bucketWidth).cast("long"),
        floor(col("hi") / bucketWidth).cast("long"))))
    p.join(iv, Seq("_bkt"))
      .where(col("x") >= col("lo") && col("x") <= col("hi"))
      .drop("_bkt")
  }

  /** Salted equi-join for skewed keys: the left (fact) side appends a
    * deterministic salt `hash60(row-key) % salts` to the join key, the
    * right (dimension-ish) side replicates each row to ALL `salts` values,
    * and the join runs on `(key, salt)` — a hot key's rows now spread over
    * `salts` reducers instead of serializing on one. Result set is
    * row-for-row identical to the plain `key` equi-join (spec-pinned); the
    * price is `salts×` the right side's shuffle volume, which is why the
    * right side should be the smaller input. This is the manual fallback
    * when AQE's skew-join split cannot apply (e.g. the skewed side feeds a
    * co-grouped aggregate, or the planner sees pre-shuffled input).
    *
    * `saltOn` names a left column whose values spread the hot key's rows
    * (any high-cardinality per-row column — an id, a line number). Salt
    * derivation is deterministic (hash, not rand), so the join stays
    * replayable and oracle-comparable.
    */
  def saltedJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      saltOn: String,
      salts: Int): DataFrame = {
    require(salts > 0, "salts must be positive")
    // coalesce: a NULL saltOn must still salt somewhere, not drop the row
    val l = left.withColumn("_salt",
      (graft.functions.Hash60(coalesce(col(saltOn).cast("string"), lit("")))
        % salts).cast("int"))
    val r = right
      .withColumn("_salt0", explode(sequence(lit(0), lit(salts - 1))))
      .withColumn("_salt", col("_salt0").cast("int")).drop("_salt0")
    l.join(r, Seq(key, "_salt")).drop("_salt")
  }

  // ----------------------------------------------------------------------
  // Bloom-filter pre-filtered semi-join
  // ----------------------------------------------------------------------

  /** Per-seed Bloom bit position for `key`: [[graft.functions.Hash60]] over
    * `key:bf:<seed>`, modulo `numBits`. Shared between build and probe — the
    * no-false-negative guarantee is exactly this sharing.
    */
  private def bloomPos(key: Column, seed: Int, numBits: Int): Column =
    graft.functions.Hash60(
      concat(key.cast("string"), lit(s":bf:$seed"))) % numBits

  /** Build the Bloom bit words for the distinct values of `keyCol`:
    * each key sets `numHashes` bits; bits pack into `numBits/64` longs.
    * The OR-fold runs distributed (partial `bit_or` per word, one word-keyed
    * exchange of ≤ numBits/64 rows); only the finished word table is
    * collected — bounded by the FILTER size (2^20 bits = 16 KiB of longs),
    * never by the key count, which is the point: this is the broadcast-a-
    * summary contract ([[graft.functions.PQ]] codebooks, k-means centroids)
    * applied to join pre-filtering.
    */
  def bloomBits(
      keys: DataFrame,
      keyCol: String,
      numBits: Int,
      numHashes: Int): Array[Long] = {
    require(numBits % 64 == 0 && numBits > 0, "numBits must be a positive multiple of 64")
    require(numHashes > 0, "numHashes must be positive")
    val pos = keys.select(
      explode(array((0 until numHashes).map(i =>
        bloomPos(col(keyCol), i, numBits)): _*)).as("_pos"))
    val words = pos
      .select((col("_pos") / 64).cast("int").as("_word"),
        expr("shiftleft(CAST(1 AS BIGINT), CAST(_pos % 64 AS INT))").as("_mask"))
      .groupBy(col("_word"))
      .agg(expr("bit_or(_mask)").as("_bits"))
      .collect()
    val arr = new Array[Long](numBits / 64)
    words.foreach(r => arr(r.getInt(0)) = r.getLong(1))
    arr
  }

  /** Codegen-friendly membership probe against a literal Bloom word array:
    * all `numHashes` bits must be set. No false negatives by construction
    * (same [[bloomPos]] family as [[bloomBits]]); false positives are culled
    * by the exact join that follows in [[bloomSemiJoin]].
    */
  def bloomMightContain(
      bits: Array[Long],
      key: Column,
      numBits: Int,
      numHashes: Int): Column = {
    import org.apache.spark.sql.catalyst.expressions.ShiftRight
    import org.apache.spark.sql.graft.ColumnShim
    val words = typedlit(bits.toSeq)
    (0 until numHashes).map { i =>
      val pos = bloomPos(key, i, numBits)
      val word = element_at(words, (pos / 64).cast("int") + 1)
      val shifted = ColumnShim.column(ShiftRight(
        ColumnShim.expression(word),
        ColumnShim.expression((pos % 64).cast("int"))))
      (shifted.bitwiseAND(lit(1L)) =!= 0L)
    }.reduce(_ && _)
  }

  /** Semi-join `fact` to the distinct `keyCol` values of `keys`, with a
    * Bloom-filter PRE-filter on the fact side. Result ≡ the plain left-semi
    * equi-join (the Bloom pass never drops a matching row; the exact join
    * removes its false positives) — what changes is WHERE rows die: at 100 TB
    * the semi-join's fact-side exchange is the dominant cost, and a 16 KiB
    * filter evaluated inside the scan's codegen stage kills most non-matching
    * rows before they are ever shuffled. This is the manual, tunable form of
    * Spark's own runtime-filter injection (`InjectRuntimeFilter`), exposed as
    * an operator so the filter can be sized (`numBits`/`numHashes`) and
    * REUSED across several facts probing one key set.
    *
    * Reference analogue: SPTAG's posting-list membership checks gate the
    * expensive distance pass the same way (cheap filter first, exact second)
    * — `AnnService/inc/Core/SPANN/ExtraFullGraphSearcher.h` passim.
    */
  def bloomSemiJoin(
      fact: DataFrame,
      keys: DataFrame,
      keyCol: String,
      numBits: Int = 1 << 17,
      numHashes: Int = 4): DataFrame = {
    val keyset = keys.select(col(keyCol)).where(col(keyCol).isNotNull).distinct()
    val bits = bloomBits(keyset, keyCol, numBits, numHashes)
    fact
      .where(col(keyCol).isNotNull &&
        bloomMightContain(bits, col(keyCol), numBits, numHashes))
      .join(keyset, Seq(keyCol), "left_semi")
  }

  // ----------------------------------------------------------------------
  // Blocked fuzzy (edit-distance) self-join
  // ----------------------------------------------------------------------

  /** Record-linkage self-join: pairs of rows whose `strCol` values are within
    * `maxDist` Levenshtein edits, generated ONLY within equal `blockCols`
    * blocks. The blocking key turns the O(n²) all-pairs edit-distance scan
    * into an equi-join (shuffle on the block key) with the quadratic cost
    * confined to each block — the standard blocking-then-verify shape of
    * entity resolution at corpus scale; pick blockCols so blocks stay small
    * (a coarse category + a prefix/phonetic key). Emits `(id_a, id_b,
    * <strCol>_a, <strCol>_b, dist)` with `id_a < id_b` so each unordered pair
    * appears once. Skew caveat: a pathological block costs |block|² — cap or
    * salt upstream if a block key can be degenerate (same contract as
    * `Dedup.MaxBandBucket`).
    */
  def fuzzyJoin(
      df: DataFrame,
      idCol: String,
      strCol: String,
      blockCols: Seq[String],
      maxDist: Int): DataFrame = {
    require(blockCols.nonEmpty, "need at least one blocking column")
    val a = df.select(
      (blockCols.map(col) :+ col(idCol).as("id_a") :+ col(strCol).as(s"${strCol}_a")): _*)
    val b = df.select(
      (blockCols.map(col) :+ col(idCol).as("id_b") :+ col(strCol).as(s"${strCol}_b")): _*)
    a.join(b, blockCols)
      .where(col("id_a") < col("id_b"))
      .withColumn("dist", levenshtein(col(s"${strCol}_a"), col(s"${strCol}_b")))
      .where(col("dist") <= maxDist)
      .select(col("id_a"), col("id_b"), col(s"${strCol}_a"), col(s"${strCol}_b"),
        col("dist"))
  }

  // ----------------------------------------------------------------------
  // Changelog (upsert) merge
  // ----------------------------------------------------------------------

  /** Latest-wins changelog merge: `snapshot` ∪ `changes`, keep each key's
    * highest-`versionCol` row, drop it if that winner is a delete
    * (`deleteCol` true). Implemented as ONE hash aggregation —
    * `max_by(struct(payload), (version, isDelete))` — not a per-key window:
    * the aggregate combines map-side partially, so the exchange carries one
    * candidate row per key per input partition instead of every change row,
    * and no task ever sorts a whole key-group. Ties on version resolve
    * toward the delete (a same-version delete beats the upsert; the bool
    * sorts after false), making replays idempotent. This is the CDC-compact
    * / SCD-current-view primitive a 100 TB ingest pipeline runs daily.
    *
    * Both inputs must share the schema `key :: version :: delete :: payload…`
    * (column names given by the args; payload = every other column).
    */
  def applyChangelog(
      snapshot: DataFrame,
      changes: DataFrame,
      keyCol: String,
      versionCol: String,
      deleteCol: String): DataFrame = {
    val all = snapshot.select(changes.columns.map(col): _*).unionByName(changes)
    val payload = all.columns.filter(c => c != keyCol)
    val winner = all
      .groupBy(col(keyCol))
      .agg(max_by(
        struct(payload.map(col): _*),
        struct(col(versionCol), col(deleteCol).cast("int"))).as("_w"))
    winner
      .select(col(keyCol) +: payload.map(c => col(s"_w.$c").as(c)): _*)
      .where(!col(deleteCol))
      .drop(deleteCol)
  }

  /** Slowly-changing-dimension type 2 from a versioned changelog: turn the
    * [[applyChangelog]] input shape — `(key, version, del, attrs…)` rows —
    * into VALIDITY INTERVALS `(key, attrs…, valid_from, valid_to,
    * is_current)`: each surviving state is valid from its own version up
    * to (exclusive) the key's next event version; `valid_to` NULL marks
    * the open current state. A delete event closes the prior interval and
    * opens none; at a (key, version) tie the delete wins — the
    * [[applyChangelog]] contract.
    *
    * Scale shape: one (key, version) hash agg for tie resolution, then ONE
    * window partitioned by `key` (high-cardinality — balanced tasks, never
    * the per-source shape q85/q86 avoid) for the `lead`. This is the
    * warehouse dimension-history build at fact-table scale.
    */
  def scd2(snapshot: DataFrame, changes: DataFrame, keyCol: String,
      versionCol: String, deleteCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val all = snapshot.select(changes.columns.map(col): _*)
      .unionByName(changes)
    val payload = all.columns.filter(c => c != keyCol && c != versionCol)
    // delete-beats-upsert at the same version: argmax over del
    val winner = all
      .groupBy(col(keyCol), col(versionCol))
      .agg(max_by(struct(payload.map(col): _*), col(deleteCol).cast("int"))
        .as("_w"))
      .select(col(keyCol) +: col(versionCol) +:
        payload.map(c => col(s"_w.$c").as(c)): _*)
    val w = Window.partitionBy(col(keyCol)).orderBy(col(versionCol))
    winner
      .withColumn("valid_to", lead(col(versionCol), 1).over(w))
      .where(!col(deleteCol))
      .select(col(keyCol) +:
        payload.filterNot(_ == deleteCol).map(col) :+
        col(versionCol).as("valid_from") :+ col("valid_to") :+
        col("valid_to").isNull.as("is_current"): _*)
  }

  /** Interval coalescing (islands & gaps): merge every overlapping-or-
    * touching interval per key into one island and report its extent —
    * the classic utilization/coverage reduction (machine busy-time,
    * user activity spans, index-segment consolidation). An interval joins
    * the current island when `lo <= running max(hi)` of everything sorted
    * before it; a strictly greater `lo` opens a new island (gap).
    *
    * Scale shape: ONE per-key sort carries both windows (running max for
    * the island break, running sum for the island id) and one hash
    * aggregate per island closes it — never an interval self-join, which
    * squares on hot keys. Key cardinality governs partition width exactly
    * like [[Events.asOfJoin]].
    *
    * Output `(key, island_start, island_end, n_intervals)`. Deterministic
    * for any input order (sort is (lo, hi); equal intervals coalesce).
    */
  def coalesceIntervals(df: DataFrame, keyCol: String, loCol: String,
      hiCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val before = Window.partitionBy(col(keyCol))
      .orderBy(col(loCol), col(hiCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val run = Window.partitionBy(col(keyCol))
      .orderBy(col(loCol), col(hiCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df
      .withColumn("_pm", max(col(hiCol)).over(before))
      .withColumn("_new",
        when(col("_pm").isNull || col(loCol) > col("_pm"), 1L).otherwise(0L))
      .withColumn("_island", sum(col("_new")).over(run))
      .groupBy(col(keyCol), col("_island"))
      .agg(min(col(loCol)).as("island_start"),
        max(col(hiCol)).as("island_end"),
        count(lit(1)).as("n_intervals"))
      .drop("_island")
  }

  /** 2-D skyline (Pareto frontier, both dimensions MINIMIZED): rows no
    * other row dominates, where `q` dominates `p` iff `q.x ≤ p.x ∧
    * q.y ≤ p.y` with at least one strict. Exact duplicates don't dominate
    * each other, so tied frontier points all survive — the standard
    * skyline-with-duplicates semantics, mirrored by the oracle's
    * NOT EXISTS.
    *
    * Scale shape — the distributive two-phase form (skyline(S) =
    * skyline(∪ᵢ skyline(Sᵢ))):
    *  1. LOCAL prune: hash rows into `buckets`, and inside each bucket
    *     keep a row iff no (x,y)-sort-preceding row has strictly smaller
    *     `y` (a partitioned running-min window — never a global sort).
    *     This keeps a SUPERSET of each bucket's skyline and provably every
    *     global-skyline row; crucially, every pruned row retains a
    *     surviving dominator (the chain of strictly-decreasing `y`
    *     dominators bottoms out at a row the prefix-min cannot prune).
    *  2. GLOBAL pass: anti-join the candidates against their own broadcast
    *     copy on the dominance predicate. This IS a nested-loop join — on
    *     purpose, and safe: the candidate set is bounded by the summed
    *     per-bucket skyline sizes (O(B·logⁿ) on independently-distributed
    *     dims), not by |input|.
    */
  def skyline(df: DataFrame, xCol: String, yCol: String,
      buckets: Int = 64): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("_bk"))
      .orderBy(col(xCol).asc, col(yCol).asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val cand = df
      .withColumn("_bk", pmod(hash(col(xCol), col(yCol)), lit(buckets)))
      .withColumn("_pm", min(col(yCol)).over(w))
      .where(col("_pm").isNull || col("_pm") >= col(yCol))
      .drop("_bk", "_pm")
    val rhs = cand.select(col(xCol).as("_rx"), col(yCol).as("_ry"))
    cand.join(broadcast(rhs),
      col("_rx") <= col(xCol) && col("_ry") <= col(yCol) &&
        (col("_rx") < col(xCol) || col("_ry") < col(yCol)), "left_anti")
  }
}
