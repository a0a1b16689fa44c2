package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** RFC-4180 CSV corpus interchange — the lowest-common-denominator sink a
  * curation run exports for tools that speak neither Parquet nor the
  * reference's binary formats (the reference's own TXT reader,
  * `Helper/VectorSetReaders/TxtReader.h`, is this role for vectors; CSV is
  * the document-table analogue). Quote = escape = `"` (RFC doubling),
  * header on, explicit schema on read (never inferSchema — a 100 TB read
  * must not pay a sampling pass, and inference can silently retype a
  * column between shards).
  *
  * Scale posture: plain `spark.read.csv` / `df.write.csv` — splittable
  * per-file tasks, predicate/column pruning still applies post-parse.
  * CSV is an interchange format here, not a storage recommendation: the
  * round-trip query (q231) exists to pin escaping/typing fidelity, and
  * Parquet remains the canonical store.
  */
object CsvStore {

  def save(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite")
      .option("header", "true")
      .option("quote", "\"")
      .option("escape", "\"")
      // NULL and empty string are different values; the default (both render
      // as nothing) collapses them on read. `\N` is the conventional
      // text-format NULL sentinel (mysqldump/Hive); empty string stays `""`.
      // Known format limitation (inherent to every sentinel scheme): a data
      // value equal to the literal sentinel reads back as NULL.
      .option("nullValue", "\\N")
      .csv(path)

  def load(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .schema(schema)
      .option("header", "true")
      .option("quote", "\"")
      .option("escape", "\"")
      .option("nullValue", "\\N")
      // RFC-4180 permits line breaks inside quoted fields and the writer
      // emits them; without multiLine the reader splits such a record in
      // two. Cost at scale: multiLine files parse as whole-file units (not
      // line-splittable) — shard writes into many files (the writer's
      // per-task files already do) so parallelism comes from file count.
      .option("multiLine", "true")
      .csv(path)

  /** Write-then-read in one call — the round-trip the q231 oracle gates
    * (output must hash-match the Parquet original row-for-row).
    */
  def roundTrip(df: DataFrame, path: String): DataFrame = {
    save(df, path)
    load(df.sparkSession, path, df.schema)
  }
}
