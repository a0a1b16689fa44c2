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
}
