package graft.operators

import org.apache.spark.sql.DataFrame
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
}
