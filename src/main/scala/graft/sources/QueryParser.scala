package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Serving-protocol query-string parser (S7, `Server/QueryParser.h:37-68`,
  * `src/Server/QueryParser.cpp:28-200`): a query is `$opt:value` option
  * pairs followed by a `|`-separated vector, or `#<base64>` binary payload.
  * Pure column expressions — parses a whole DataFrame of query strings in
  * one codegen'd pass (the reference parses one string per request).
  */
object QueryParser {

  /** Extract `$name:value` option (NULL if absent). */
  def option(query: Column, name: String): Column = {
    val m = regexp_extract(query, s"\\$$$name:([^$$|#]+)", 1)
    when(m === "", lit(null)).otherwise(m)
  }

  /** The `|`-separated float vector after the last option (empty for
    * base64-form queries — their payload rides in [[base64Payload]]).
    */
  def vector(query: Column): Column =
    transform(
      filter(
        split(
          regexp_replace(
            regexp_replace(query, "#[A-Za-z0-9+/=]*$", ""),
            "^(\\$[^$|#]+)*", ""),
          "\\|"),
        t => t =!= ""),
      t => t.cast("float"))

  /** `#base64` payload → decoded bytes (NULL if not base64-form). */
  def base64Payload(query: Column): Column = {
    val b64 = regexp_extract(query, "#([A-Za-z0-9+/=]+)$", 1)
    when(b64 === "", lit(null)).otherwise(unbase64(b64))
  }

  /** Parse a frame of `(query_id, query)` strings into
    * `(query_id, k, index_name, qvec)`.
    */
  def parse(queries: DataFrame, defaultK: Int = 10): DataFrame =
    queries.select(
      col("query_id"),
      coalesce(option(col("query"), "k").cast("int"), lit(defaultK)).as("k"),
      option(col("query"), "index").as("index_name"),
      vector(col("query")).as("qvec"))
}
