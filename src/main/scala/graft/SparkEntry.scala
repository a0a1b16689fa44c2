package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.operators.Knn

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in [[queries]] is an operator from SURVEY.md §2 re-expressed
  * Spark-first; [[oracleSql]] carries the DuckDB-equivalent SQL the driver
  * hash-compares against on /root/testdata/sf0.01.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_knn_l2")(spark, "/root/testdata/sf0.001")

  // number of query vectors used by the kNN family (o_orderkey < QN)
  private val QN = 50
  private val K = 10

  private def q(s: SparkSession, d: String): DataFrame =
    Tables.ordersQuery(s, d).where(col("query_id") < QN)

  private def ordered(df: DataFrame): DataFrame =
    df.orderBy(df.columns.map(col).toIndexedSeq: _*)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_knn_l2" -> ((s, d) =>
      ordered(Knn.search(q(s, d), Tables.lineitemVec(s, d), K, "l2sq"))),
    "q02_knn_cos" -> ((s, d) =>
      ordered(Knn.search(q(s, d), Tables.lineitemVec(s, d), K, "cos"))),
    "q03_knn_ip" -> ((s, d) =>
      ordered(Knn.search(q(s, d), Tables.lineitemVec(s, d), K, "ip"))),
    "q04_knn_filtered" -> ((s, d) =>
      ordered(Knn.searchFiltered(
        q(s, d), Tables.lineitemVec(s, d), col("meta") =!= "AF", K))),
    "q05_knn_deletes" -> ((s, d) =>
      ordered(Knn.searchWithDeletes(
        q(s, d), Tables.lineitemVec(s, d), Tables.deletes(s, d), K))),
    "q06_knn_meta" -> ((s, d) =>
      ordered(Knn.searchWithMeta(q(s, d), Tables.lineitemVec(s, d), K))),
    "q20_tpch_q1" -> ((s, d) => tpchQ1(s, d))
  )

  /** TPC-H Q1-style pricing summary (relational anchor; exercises partial
    * aggregation). Money sums go through DECIMAL(18,4) so the result is
    * order-independent and bit-identical to DuckDB, then back to DOUBLE.
    */
  private def tpchQ1(s: SparkSession, d: String): DataFrame = {
    val dec = DecimalType(18, 4)
    ordered(Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity").cast(dec)).cast("double").as("sum_qty"),
        sum(col("l_extendedprice").cast(dec)).cast("double").as("sum_base_price"),
        sum((col("l_extendedprice") * (lit(1) - col("l_discount"))).cast(dec))
          .cast("double").as("sum_disc_price"),
        count(lit(1)).as("count_order")))
  }

  // ---- oracle SQL ----

  private def knnOracle(
      metric: String,
      corpusFilter: String = "",
      withMeta: Boolean = false,
      antiDeletes: Boolean = false): String = {
    val distE = Tables.distSql(metric, "q.qvec", "v.vec")
    val del =
      if (antiDeletes)
        s" AND id NOT IN (SELECT id FROM (${Tables.deletesSql}))"
      else ""
    val metaCol = if (withMeta) ", meta" else ""
    s"""WITH v0 AS (${Tables.lineitemVecSql}),
       |v AS (SELECT * FROM v0 WHERE TRUE $corpusFilter $del),
       |q AS (SELECT * FROM (${Tables.ordersQuerySql}) WHERE query_id < $QN),
       |dd AS (SELECT q.query_id, v.id, $distE AS dist $metaCol FROM q CROSS JOIN v),
       |r AS (SELECT query_id, id, dist $metaCol,
       |        CAST(row_number() OVER (PARTITION BY query_id ORDER BY dist, id) AS INT) AS rank
       |      FROM dd)
       |SELECT query_id, rank, id, round(dist, 4) AS dist $metaCol
       |FROM r WHERE rank <= $K
       |ORDER BY query_id, rank, id, dist $metaCol""".stripMargin
  }

  def oracleSql: Map[String, String] = Map(
    "q01_knn_l2" -> knnOracle("l2sq"),
    "q02_knn_cos" -> knnOracle("cos"),
    "q03_knn_ip" -> knnOracle("ip"),
    "q04_knn_filtered" -> knnOracle("l2sq", corpusFilter = "AND meta <> 'AF'"),
    "q05_knn_deletes" -> knnOracle("l2sq", antiDeletes = true),
    "q06_knn_meta" -> knnOracle("l2sq", withMeta = true),
    "q20_tpch_q1" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin
  )
}
