package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{AnnIndex, GraftConf}
import graft.operators.Eval
import graft.sources.LegacyFormats

/** The reference's config-driven build/search driver
  * (`AnnService/src/IndexBuilder/main.cpp:42-130`, and SSDServing's
  * `buildconfig.ini` flow from `docs/GettingStart.md`): one ini file names
  * the vector/query/truth files (in the reference's own binary formats),
  * the index directory, and the per-phase knobs; the tool reads the
  * vectors, builds, saves, and — when a `[SearchSSDIndex]` section asks —
  * searches and scores recall against the truth file.
  *
  * Every phase maps onto surfaces that already exist: `GraftConf.fromIni`
  * (the registry), `LegacyFormats` (DEFAULT/XVEC/TXT vectors + all three
  * truth formats), `AnnIndex` (build/save/search), `Eval.recallAt`
  * (distance-tie-credit recall). This object is only the ini → phase
  * orchestration, exactly like the reference main.
  */
object IndexBuilder {

  /** What a run produced: the built (or loaded) index, the search results
    * (when `[SearchSSDIndex]` ran), and the recall summary (when a truth
    * file was given).
    */
  final case class Report(
      index: AnnIndex,
      results: Option[DataFrame],
      recallSummary: Option[DataFrame])

  private def readVectors(
      spark: SparkSession, path: String, fileType: String, valueType: String,
      withId: String = "id"): DataFrame = {
    val df = fileType.trim.toUpperCase match {
      case "DEFAULT" => LegacyFormats.readDefault(spark, path, valueType)
      case "XVEC" => LegacyFormats.readXvec(spark, path, valueType)
      case "TXT" => LegacyFormats.readTxt(spark, path).select(col("id"), col("vec"))
      case other => sys.error(s"unknown VectorType $other")
    }
    if (withId == "id") df else df.withColumnRenamed("id", withId)
  }

  private def readTruth(spark: SparkSession, path: String, fileType: String): DataFrame =
    fileType.trim.toUpperCase match {
      case "DEFAULT" => LegacyFormats.readTruthDefault(spark, path)
      case "XVEC" => LegacyFormats.readTruthXvec(spark, path)
      case "TXT" => LegacyFormats.readTruthTxt(spark, path)
      case other => sys.error(s"unknown TruthType $other")
    }

  /** The reference's ValueType names → the typed reader's element codes. */
  private def valueType(name: String): String = name.trim.toLowerCase match {
    case "float" | "float32" => "float32"
    case "uint8" | "ubyte" => "uint8"
    case "int8" | "byte" => "int8"
    case "int16" | "short" => "int16"
    case other => sys.error(s"unknown ValueType $other")
  }

  def run(spark: SparkSession, iniText: String): Report = {
    val sections = GraftConf.parseIni(iniText)
    val base = sections.getOrElse("base",
      sys.error("ini needs a [Base] section"))
    def flag(section: String, default: Boolean = true): Boolean =
      sections.get(section).flatMap(_.get("isexecute"))
        .map(_.trim.toBoolean).getOrElse(default)
    val conf = GraftConf.fromIni(iniText,
      Seq("Base", "SelectHead", "BuildHead", "BuildSSDIndex", "SearchSSDIndex"))
    val vt = valueType(base.getOrElse("valuetype", "Float"))
    val vectors = readVectors(spark, base("vectorpath").trim,
      base.getOrElse("vectortype", "DEFAULT"), vt)

    var idx = AnnIndex(spark, vectors, conf)
    if (flag("selecthead") || flag("buildhead") || flag("buildssdindex"))
      idx = idx.build()
    base.get("indexdirectory").map(_.trim).filter(_.nonEmpty)
      .foreach(dir => idx.save(dir))

    if (sections.contains("searchssdindex") && flag("searchssdindex")) {
      val queries = readVectors(spark, base("querypath").trim,
        base.getOrElse("querytype", "DEFAULT"), vt)
        .select(col("id").as("query_id"), col("vec").as("qvec"))
      val k = conf.resultK
      val results = idx.search(queries, k)
      val summary = base.get("truthpath").map(_.trim).filter(_.nonEmpty).map { tp =>
        val truth = readTruth(spark, tp, base.getOrElse("truthtype", "DEFAULT"))
        Eval.recallSummary(Eval.recallAt(results, truth, k))
      }
      Report(idx, Some(results), summary)
    } else Report(idx, None, None)
  }

  /** CLI mirror of `IndexBuilder.exe -c config.ini`. */
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: IndexBuilder <config.ini>")
    val ini = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(args(0))),
      java.nio.charset.StandardCharsets.UTF_8)
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[4]"))
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val report = run(spark, ini)
    report.recallSummary.foreach(_.show())
    report.results.foreach(r => println(s"[indexbuilder] ${r.count()} result rows"))
    spark.stop()
  }
}
