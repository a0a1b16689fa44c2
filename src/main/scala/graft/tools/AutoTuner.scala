package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftConf
import graft.operators.AutoTune
import graft.sources.LegacyFormats

/** The reference's parameter auto-tuner as a config-driven driver
  * (`Tools/nni-auto-tune/main.py` + `search_space.json` + `config.yml`):
  * one ini names the input, the knob GRIDS, and the recall floor; the tool
  * runs the matching [[AutoTune]] sweep and reports the sweep table plus
  * the winning config. Where the reference's NNI loop proposes trials and
  * scores measured QPS under a recall constraint, this driver evaluates
  * the full (bounded) grid in one Spark job set and ranks by the
  * deterministic candidate-volume cost — same contract, engine-exact.
  *
  * Ini surface (mirroring the reference's snake-case knob names):
  * {{{
  * [Base]                        ; IVF harness input (reference formats)
  * VectorPath=…  VectorType=DEFAULT  ValueType=Float
  * QueryPath=…   QueryType=DEFAULT
  * DocumentsPath=…               ; LSH harness input (parquet doc_id/text)
  * [AutoTune]
  * Harness=IVF | LSH
  * ResultNum=10                  ; k (IVF)
  * CentroidEveryNth=25           ; IVF head ratio
  * ReplicasGrid=1,2              ; IVF build knob grid
  * NprobeGrid=1,2,4              ; IVF search knob grid
  * NumHashesGrid=16,16,16        ; LSH signature lengths (paired with …)
  * RowsPerBandGrid=2,4,8         ; … band widths, position by position
  * JaccardThreshold=0.3          ; LSH truth threshold
  * RecallFloorBp=8000            ; floor in basis points (8000 = 0.80)
  * DistCalcMethod=Cosine | L2
  * }}}
  */
object AutoTuner {

  /** A finished sweep: the full config table and the winning row. */
  final case class Report(table: DataFrame, best: Map[String, String])

  private def ints(s: String): Seq[Int] =
    s.split(",").map(_.trim).filter(_.nonEmpty).map(_.toInt).toSeq

  def run(spark: SparkSession, iniText: String): Report = {
    val sections = GraftConf.parseIni(iniText)
    val tune = sections.getOrElse("autotune",
      sys.error("ini needs an [AutoTune] section"))
    val base = sections.getOrElse("base", Map.empty[String, String])
    val floorBp = tune.getOrElse("recallfloorbp", "8000").trim.toInt
    val table = tune.getOrElse("harness", "IVF").trim.toUpperCase match {
      case "IVF" =>
        val metric = base.getOrElse("distcalcmethod", "Cosine")
          .trim.toLowerCase match {
          case "cosine" => "cos"
          case "l2" => "l2sq"
          case other => sys.error(s"unknown DistCalcMethod $other")
        }
        val vectors = LegacyFormats.readDefault(
          spark, base("vectorpath").trim,
          base.getOrElse("valuetype", "Float").trim.toLowerCase match {
            case "float" | "float32" => "float32"
            case "uint8" | "ubyte" => "uint8"
            case "int8" | "byte" => "int8"
            case "int16" | "short" => "int16"
            case other => sys.error(s"unknown ValueType $other")
          })
        val queries = LegacyFormats.readDefault(spark,
          base("querypath").trim, "float32")
          .select(col("id").as("query_id"), col("vec").as("qvec"))
        AutoTune.ivfSweep(queries, vectors,
          tune.getOrElse("resultnum", "10").trim.toInt,
          tune.getOrElse("centroideverynth", "25").trim.toInt,
          ints(tune.getOrElse("replicasgrid", "1,2")),
          ints(tune.getOrElse("nprobegrid", "1,2,4")),
          floorBp, metric)
      case "LSH" =>
        val docs = spark.read.parquet(base("documentspath").trim)
        val nhs = ints(tune.getOrElse("numhashesgrid", "16,16,16"))
        val rpbs = ints(tune.getOrElse("rowsperbandgrid", "2,4,8"))
        require(nhs.length == rpbs.length,
          "NumHashesGrid and RowsPerBandGrid must pair position by position")
        AutoTune.lshBandSweep(docs,
          tune.getOrElse("jaccardthreshold", "0.3").trim.toDouble,
          nhs.zip(rpbs), floorBp)
      case other => sys.error(s"unknown Harness $other")
    }
    val bestRow = table.where(col("best")).head()
    val best = table.columns.zipWithIndex.map { case (c, i) =>
      c -> String.valueOf(bestRow.get(i))
    }.toMap
    Report(table, best)
  }

  /** CLI: `AutoTuner <config.ini>` — prints the sweep table and the pick. */
  def main(args: Array[String]): Unit = {
    require(args.length == 1, "usage: AutoTuner <config.ini>")
    val ini = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(args(0))), "UTF-8")
    val spark = graft.Verify.session()
    val report = run(spark, ini)
    report.table.orderBy(report.table.columns.map(col): _*).show(100, false)
    println(report.best.toSeq.sortBy(_._1)
      .map { case (k, v) => s"$k=$v" }.mkString("BEST: ", " ", ""))
    spark.stop()
  }
}
