package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{StringType, StructType}

/** JSON-Lines corpus interchange — the de-facto wire format of LLM
  * training-data pipelines (one JSON object per line; what web-scale dumps,
  * annotation vendors, and eval harnesses actually exchange). The document-
  * table sibling of [[CsvStore]] (RFC-4180) and the reference's TXT vector
  * reader (`Helper/VectorSetReaders/TxtReader.h`): interchange, not
  * storage — Parquet stays canonical, and the round-trip query exists to
  * pin escaping/typing fidelity.
  *
  * Contract decisions:
  *  - explicit schema on read, never inference (a 100 TB read must not pay
  *    a sampling pass, and inference can retype a column between shards);
  *  - PERMISSIVE parse with a named corrupt-record column ([[loadAudited]])
  *    — real dumps carry truncated/garbled lines, and a pipeline must
  *    count-and-route them, not die ([[load]] keeps FAILFAST for callers
  *    that want the strict contract);
  *  - timestamps/decimals ride as their JSON-native lexical forms under
  *    the explicit schema, strings escape per JSON (embedded newlines and
  *    quotes are format-native — no CSV multiLine caveat, JSONL stays
  *    line-splittable ALWAYS, which is exactly why pipelines prefer it).
  *
  * Scale posture: plain `spark.read.json` / `df.write.json` — splittable
  * per-line tasks, column pruning post-parse; the writer's per-task files
  * shard naturally.
  */
object JsonlStore {

  def save(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** Strict read: explicit schema, FAILFAST — any malformed line aborts. */
  def load(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).option("mode", "FAILFAST").json(path)

  /** Tolerant read: malformed lines land in `_corrupt` (the raw line) with
    * every schema column NULL; callers split on `_corrupt IS NULL` to
    * route good rows onward and quarantine the rest — the ingest policy a
    * real dump needs. NOTE Spark's lazy corrupt-record contract: the
    * `_corrupt` column must be materialized via the returned frame as-is
    * (no `select(_corrupt)`-only queries — Spark forbids them).
    */
  def loadAudited(spark: SparkSession, path: String,
      schema: StructType): DataFrame =
    spark.read
      .schema(schema.add("_corrupt", StringType))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .json(path)

  /** Write-then-read in one call — the round-trip the oracle gates
    * (output must hash-match the Parquet original row-for-row).
    */
  def roundTrip(df: DataFrame, path: String): DataFrame = {
    save(df, path)
    load(df.sparkSession, path, df.schema)
  }

  /** Ingest-audit summary over a possibly-dirty JSONL directory: one row
    * per verdict — `("good", n)` and `("corrupt", n)`. One pass, one
    * 2-group aggregate; the corpus never collects.
    */
  def ingestAudit(spark: SparkSession, path: String,
      schema: StructType): DataFrame = {
    import org.apache.spark.sql.functions.{count, from_json, lit, when}
    // text scan + from_json rather than loadAudited: Spark refuses any
    // file-scan query whose post-pruning referenced columns are only the
    // internal corrupt-record column (its documented workaround — cache
    // the parsed frame — materializes the dump, which an audit over
    // 100 TB must not). from_json carries the SAME corrupt-record channel
    // inside its result struct (PERMISSIVE fills it only for malformed
    // input), without the file-scan restriction: one streaming pass, one
    // 2-group aggregate.
    val parsed = from_json(col("value"),
      schema.add("_corrupt", StringType),
      java.util.Map.of("mode", "PERMISSIVE",
        "columnNameOfCorruptRecord", "_corrupt"))
    spark.read.text(path)
      .select(when(parsed.getField("_corrupt").isNull, lit("good"))
        .otherwise(lit("corrupt")).as("verdict"))
      .groupBy(col("verdict")).agg(count(lit(1)).as("n"))
  }
}
