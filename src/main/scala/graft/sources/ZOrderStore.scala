package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Pipeline

/** Z-order-clustered table layout: rows persist partitioned by the TOP bits
  * of their Morton key ([[Pipeline.zorderKey]]), so a range probe on EITHER
  * dimension statically prunes to the partitions whose z-prefix quadrants
  * intersect the range — the property single-column partitioning cannot
  * give (partition by x and a y-probe scans everything). This is the
  * Delta/Iceberg `ZORDER BY` layout idea as an explicit store, and the
  * dedup/index sibling of [[IndexStore]] (`head_bucket`) and [[DedupStore]]
  * (`band_bucket`): derive the partition key identically at save and probe
  * time, compute the touched-partition list from the predicate ALONE
  * (driver-side prefix arithmetic over ≤ 2^prefixBits values — no data
  * scan), and keep the exact predicate in-row so bucket cover ⊇ answer
  * never affects results.
  *
  * At 100 TB: the save is one write with a layout key (the sort/partition
  * cost you pay once), and every selective probe afterwards reads
  * O(covered quadrants / 2^prefixBits) of the table. Quantization:
  * `qx = clamp(floor(x / xStep))`, `qy = y mod 2^bits` — callers pick
  * `xStep` so the x-histogram spreads over the 2^bits buckets.
  */
object ZOrderStore {

  case class ZLayout(rows: DataFrame, bits: Int, xStep: Double, prefixBits: Int)

  private def mortonRef(x: Long, y: Long, bits: Int): Long =
    (0 until bits).map(i =>
      (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))).sum

  private def keyCols(xCol: Column, yCol: Column, bits: Int, xStep: Double,
      prefixBits: Int): (Column, Column, Column) = {
    // clamp BOTH ends to the grid, mirroring coverX's qlo/qhi clamps — a
    // negative x would otherwise Morton-shift into a bucket outside every
    // probe cover and its rows would silently vanish from exact matches
    val qx = greatest(lit(0L),
      least(floor(xCol / xStep), lit((1 << bits) - 1))).cast("long")
    val qy = pmod(yCol.cast("long"), lit(1L << bits))
    val z = Pipeline.zorderKey(qx, qy, bits)
    (qx, qy, shiftright(z, 2 * bits - prefixBits).cast("int"))
  }

  def save(
      path: String,
      df: DataFrame,
      xCol: String,
      yCol: String,
      xStep: Double,
      bits: Int = 8,
      prefixBits: Int = 8): Unit = {
    require(prefixBits > 0 && prefixBits <= 2 * bits && prefixBits % 2 == 0,
      "prefixBits must be a positive even number of z-prefix bits")
    val (_, _, zbucket) = keyCols(col(xCol), col(yCol), bits, xStep, prefixBits)
    // cluster by the partition column before the partitioned write (guide
    // §6): without it every input task opens a file in every zbucket it
    // touches — up to tasks × 2^prefixBits tiny files. The partition count
    // is pinned to the bucket count: a bare repartition(col) lets AQE
    // coalesce a small input to ONE task that then writes every directory
    // serially (measured 5.4 s single-task write at sf0.01); one task per
    // bucket writes in parallel and yields ~one file per bucket at any
    // scale. Rows are unchanged.
    df.withColumn("zbucket", zbucket)
      .repartition(1 << prefixBits, col("zbucket"))
      .write.mode("overwrite")
      .partitionBy("zbucket")
      .parquet(s"$path/rows")
    df.sparkSession
      .createDataFrame(Seq((bits, xStep, prefixBits, xCol, yCol)))
      .toDF("bits", "x_step", "prefix_bits", "x_col", "y_col")
      .write.mode("overwrite").parquet(s"$path/meta")
  }

  def load(spark: SparkSession, path: String): ZLayout = {
    val m = spark.read.parquet(s"$path/meta").head
    ZLayout(spark.read.parquet(s"$path/rows"),
      m.getAs[Int]("bits"), m.getAs[Double]("x_step"), m.getAs[Int]("prefix_bits"))
  }

  /** The zbucket cover of an x-range: every prefix whose x high bits fall in
    * the quantized range, crossed with ALL y high bits. ≤ 2^prefixBits
    * values, pure driver arithmetic — floor is monotone, so any row
    * satisfying `lo <= x < hi` quantizes inside `[floor(lo/step),
    * floor(hi/step)]` regardless of float rounding, and the cover is sound.
    */
  private[graft] def coverX(idx: ZLayout, lo: Double, hi: Double): Seq[Int] = {
    val half = idx.prefixBits / 2
    val hiShift = idx.bits - half
    val qlo = math.max(0L, math.min(math.floor(lo / idx.xStep).toLong, (1L << idx.bits) - 1))
    val qhi = math.max(0L, math.min(math.floor(hi / idx.xStep).toLong, (1L << idx.bits) - 1))
    (for {
      hx <- (qlo >> hiShift) to (qhi >> hiShift)
      hy <- 0L until (1L << half)
    } yield mortonRef(hx, hy, half).toInt).distinct
  }

  /** The zbucket cover of one y value (mod 2^bits): its high bits crossed
    * with ALL x high bits.
    */
  private[graft] def coverY(idx: ZLayout, y: Long): Seq[Int] = {
    val half = idx.prefixBits / 2
    val hiShift = idx.bits - half
    val hy = (((y % (1L << idx.bits)) + (1L << idx.bits)) % (1L << idx.bits)) >> hiShift
    (for (hx <- 0L until (1L << half))
      yield mortonRef(hx, hy, half).toInt).distinct
  }

  /** Range probe on the x dimension: static partition pruning to the
    * covered quadrants + the exact predicate in-row. `xCol`/`yCol` name the
    * stored columns (from the save-time schema).
    */
  def probeX(idx: ZLayout, xCol: String, lo: Double, hi: Double): DataFrame =
    idx.rows
      .where(col("zbucket").isin(coverX(idx, lo, hi): _*))
      .where(col(xCol) >= lo && col(xCol) < hi)
      .drop("zbucket")

  /** Point probe on the y dimension (the dimension a single-column x
    * layout could NOT prune).
    */
  def probeY(idx: ZLayout, yCol: String, y: Long): DataFrame =
    idx.rows
      .where(col("zbucket").isin(coverY(idx, y): _*))
      .where(col(yCol) === y)
      .drop("zbucket")
}
