package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}
import org.apache.spark.sql.types.DecimalType

import graft.operators.Spann

/** Online mutation as Structured Streaming (M1/M2,
  * `BKTIndex.cpp:901-970`): the reference appends vectors under a lock and
  * refines per-node; Spark-native form is micro-batch append —
  * `readStream → foreachBatch { assign postings for the delta, append }` —
  * with compaction (B10) as the background rebuild
  * (`BKT/Index.h:40-71` rebuild thread ≡ a periodic batch job).
  */
object StreamingIngest {

  /** Tumbling-window event aggregation (the streaming-analytics shape;
    * batch-equivalent plan is oracle-checked as q43). Decimal-summed so
    * results are aggregation-order independent.
    */
  def eventsWindowed(events: DataFrame): DataFrame =
    events
      .groupBy(
        window(col("ts"), "1 hour").getField("start").as("window_start"),
        col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 4))).cast("double").as("sum_value"))

  /** Streaming flavor with watermarking: same aggregation, late data bounded
    * by 10 minutes, append-mode safe.
    */
  def eventsWindowedStream(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 4))).cast("double").as("sum_value"))
      .select(col("window").getField("start").as("window_start"),
        col("event_type"), col("n"), col("sum_value"))

  /** Streaming dedup on event id within the watermark horizon (the
    * streaming analogue of the exact-dedup operator).
    */
  def dedupStream(events: DataFrame): DataFrame =
    events.withWatermark("ts", "10 minutes")
      .dropDuplicates("event_id")

  /** Micro-batch index ingest: for each incoming vector batch, compute its
    * posting assignments against the CURRENT heads (B8 on the delta only —
    * cost ∝ batch size, not corpus size) and append to the postings store.
    * Returns the writer so the caller controls trigger/checkpoint.
    */
  def ingest(
      vectorStream: DataFrame, // streaming (id, vec)
      heads: DataFrame, // static, broadcastable
      replicaCount: Int,
      appendPostings: DataFrame => Unit): DataStreamWriter[org.apache.spark.sql.Row] =
    vectorStream.writeStream
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          appendPostings(Spann.buildPostings(batch, heads, replicaCount))
        }
      }
}
