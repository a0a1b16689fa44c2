package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine deterministic 60-bit hash: the first 15 hex chars of md5,
  * as a BIGINT. Spark `conv(substring(md5(x),1,15),16,10)` ≡ DuckDB
  * `('0x' || substr(md5(x),1,15))::BIGINT` — md5 is identical everywhere, and
  * 60 bits fits a signed 64-bit int without sign trouble. Used by every
  * dedup/fingerprint operator so oracle SQL can reproduce signatures exactly.
  */
object Hash60 {
  def apply(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** DuckDB-side rendering of the same hash over SQL expression `e`. */
  def sql(e: String): String = s"('0x' || substr(md5($e), 1, 15))::BIGINT"
}
