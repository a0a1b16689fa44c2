package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.AnnIndex
import graft.operators.Eval
import graft.sources.LegacyFormats

/** The reference's search-only CLI (`AnnService/src/IndexSearcher/main.cpp`:
  * `-i` query file, `-x` index folder, `-k`, optional `-r` truth /
  * `-g` gentruth / `-df` data file): load a saved index, run the query
  * file against it, score recall against a truth file — or GENERATE the
  * truth file from the original data (the tool's `-g` mode, which this
  * library serves with exact [[graft.operators.Knn]] search).
  */
object IndexSearcher {

  final case class Report(
      results: DataFrame,
      recallSummary: Option[DataFrame])

  private def readQueries(
      spark: SparkSession, path: String, fileType: String, valueType: String): DataFrame = {
    val df = fileType.trim.toUpperCase match {
      case "DEFAULT" => LegacyFormats.readDefault(spark, path, valueType)
      case "XVEC" => LegacyFormats.readXvec(spark, path, valueType)
      case "TXT" => LegacyFormats.readTxt(spark, path).select(col("id"), col("vec"))
      case other => sys.error(s"unknown query file type $other")
    }
    df.select(col("id").as("query_id"), col("vec").as("qvec"))
  }

  /** `-i/-x/-k [-r]`: search a loaded index, optionally score vs truth. */
  def run(
      spark: SparkSession,
      indexDir: String,
      queryPath: String,
      k: Int = 10,
      queryType: String = "DEFAULT",
      valueType: String = "float32",
      truthPath: Option[String] = None,
      truthType: String = "DEFAULT"): Report = {
    val idx = AnnIndex.load(spark, indexDir)
    val queries = readQueries(spark, queryPath, queryType, valueType)
    val results = idx.search(queries, k)
    val summary = truthPath.map { tp =>
      val truth = truthType.trim.toUpperCase match {
        case "DEFAULT" => LegacyFormats.readTruthDefault(spark, tp)
        case "XVEC" => LegacyFormats.readTruthXvec(spark, tp)
        case "TXT" => LegacyFormats.readTruthTxt(spark, tp)
        case other => sys.error(s"unknown truth type $other")
      }
      Eval.recallSummary(Eval.recallAt(results, truth, k))
    }
    Report(results, summary)
  }

  /** `-g` gentruth mode: exact kNN of the query file over the original data
    * file, written as a DEFAULT truth file (ids + distances) — the
    * reference generates its truth sets exactly this way
    * (`TruthSet.h:162-164`).
    */
  def genTruth(
      spark: SparkSession,
      dataPath: String,
      queryPath: String,
      outPath: String,
      k: Int,
      dataType: String = "DEFAULT",
      valueType: String = "float32",
      metric: String = "l2sq"): Unit = {
    val corpus = dataType.trim.toUpperCase match {
      case "DEFAULT" => LegacyFormats.readDefault(spark, dataPath, valueType)
      case "XVEC" => LegacyFormats.readXvec(spark, dataPath, valueType)
      case "TXT" => LegacyFormats.readTxt(spark, dataPath).select(col("id"), col("vec"))
      case other => sys.error(s"unknown data file type $other")
    }
    val queries = readQueries(spark, queryPath, dataType, valueType)
    val exact = graft.operators.Knn.search(queries, corpus, k, metric)
      .orderBy(col("query_id"), col("rank"))
      .collect() // bounded: |queries|·k rows, the truth-file payload itself
    val byQ = exact.groupBy(_.getLong(0)).toSeq.sortBy(_._1)
    val truth = byQ.map { case (_, rows) =>
      rows.sortBy(_.getInt(1)).toSeq
        .map(r => (r.getLong(2).toInt, r.getDouble(3).toFloat))
    }
    LegacyFormats.writeTruthDefault(outPath, truth)
  }
}
