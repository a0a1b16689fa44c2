package graft.tools

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftConf
import graft.operators.{Dedup, Pipeline, TextAnalysis}

/** Ini-driven corpus-curation driver — the training-data-pipeline
  * counterpart of [[IndexBuilder]] (which mirrors the reference's
  * `IndexBuilder.exe -c config.ini` flow for the index side): one config in,
  * a curated corpus + health report out. Each phase is one of the library's
  * verified operators, gated per-section by `isExecute` exactly like the
  * reference's `[BuildHead]`/`[BuildSSDIndex]` sections
  * (`docs/GettingStart.md` buildconfig.ini).
  *
  * Sections (all optional except `[input]`/`[output]`):
  * {{{
  * [input]        documents=/path/docs.parquet   ; or sfdir=/testdata/sf0.01
  * [rules]        isExecute=true  minTokens=10 maxTokens=10000 ...
  * [lm]           isExecute=true  minScore=-3.5
  * [importance]   isExecute=true  targetLang=en buckets=256 minScore=-0.05
  * [scrub]        isExecute=true                 ; PII redaction (text rewritten)
  * [dedup]        isExecute=true  jaccardThreshold=0.3
  * [phash]        isExecute=true  maxHamming=3   ; content-histogram near-dup
  * [decontaminate] isExecute=true evalPath=/path/eval.parquet maxOverlap=0.3
  * [mixture]      isExecute=true  weights=src0:0.5,src1:1.0 default=1.0 salt=mix
  * [split]        isExecute=true  trainPct=80 valPct=10 salt=split
  * [output]       dir=/path/out   report=true
  * }}}
  *
  * Output: `<dir>/corpus` parquet (partitioned by `split` when `[split]`
  * executes), `<dir>/report` parquet ([[Pipeline.corpusReport]] over the
  * survivors when `report=true`), and one summary line on stdout.
  */
object CorpusCurator {

  case class Result(curated: DataFrame, report: Option[DataFrame], kept: Long, in: Long)

  private def flag(s: Map[String, String]): Boolean =
    s.get("isexecute").exists(_.trim.equalsIgnoreCase("true"))

  /** Run the configured phases; pure function of (spark, ini text). */
  def run(spark: SparkSession, iniText: String): Result = {
    val sections = GraftConf.parseIni(iniText)
    def sec(name: String): Map[String, String] =
      sections.getOrElse(name, Map.empty)

    val in = sec("input")
    val docs0 = in.get("documents").map(_.trim).filter(_.nonEmpty)
      .map(spark.read.parquet(_))
      .orElse(in.get("sfdir").map(d => graft.Tables.documents(spark, d.trim)))
      .getOrElse(sys.error("[input] needs documents=<parquet> or sfdir=<dir>"))
    val nIn = docs0.count()

    var docs = docs0
    val rules = sec("rules")
    if (flag(rules)) {
      val keep = TextAnalysis.ruleFilter(docs,
        minTokens = rules.getOrElse("mintokens", "10").toLong,
        maxTokens = rules.getOrElse("maxtokens", "10000").toLong,
        minMeanLen = rules.getOrElse("minmeanlen", "2.0").toDouble,
        maxMeanLen = rules.getOrElse("maxmeanlen", "12.0").toDouble,
        minAlphaRatio = rules.getOrElse("minalpharatio", "0.7").toDouble,
        minStopHits = rules.getOrElse("minstophits", "2").toLong)
        .where(col("keep")).select(col("doc_id"))
      docs = docs.join(keep, Seq("doc_id"), "left_semi")
    }
    val lm = sec("lm")
    if (flag(lm)) {
      val keep = TextAnalysis.ngramLmScore(docs)
        .where(col("lm_score") >= lm.getOrElse("minscore", "-10").toDouble)
        .select(col("doc_id"))
      docs = docs.join(keep, Seq("doc_id"), "left_semi")
    }
    val imp = sec("importance")
    if (flag(imp)) {
      // DSIR gate: fit the hashed-bigram weight table against the target
      // slice (default: English docs), keep docs scoring at or above the
      // floor — docs with no bigrams carry no signal and are dropped, the
      // [lm] section's convention
      val buckets = imp.getOrElse("buckets", "256").toInt
      val tgtLang = imp.getOrElse("targetlang", "en").trim
      val wt = TextAnalysis.importanceWeightTable(
        docs, col("lang") === tgtLang, buckets)
      val keep = TextAnalysis.importanceScore(docs, wt, buckets)
        .where(col("importance") >= imp.getOrElse("minscore", "-10").toDouble)
        .select(col("doc_id"))
      docs = docs.join(keep, Seq("doc_id"), "left_semi")
    }
    if (flag(sec("scrub"))) {
      val redacted = TextAnalysis.scrub(docs)
        .select(col("doc_id"), col("scrubbed"))
      docs = docs.drop("text")
        .join(redacted, Seq("doc_id"))
        .withColumnRenamed("scrubbed", "text")
    }
    val dd = sec("dedup")
    if (flag(dd)) {
      val thr = dd.getOrElse("jaccardthreshold", "0.3").toDouble
      val exactKept = Dedup.exact(docs)
        .where(col("doc_id") === col("canon_id")).select(col("doc_id"))
      val d1 = docs.join(exactKept, Seq("doc_id"), "left_semi")
      docs = Dedup.applyDedup(d1,
        Dedup.canonicalGroups(d1, Dedup.minhashDedup(d1, thr)))
    }
    val ph = sec("phash")
    if (flag(ph)) {
      // media near-dup: perceptual-hash pairs → canonical grouping → keep
      // one representative per hash-near cluster (q122's operator chain)
      val pairs = graft.operators.Multimodal.phashPairs(
        graft.operators.Multimodal.perceptualHash(docs),
        ph.getOrElse("maxhamming", "3").toInt)
        .select(col("a"), col("b"))
      docs = Dedup.applyDedup(docs, Dedup.canonicalGroups(docs, pairs))
    }
    val dc = sec("decontaminate")
    if (flag(dc)) {
      val evalDocs = spark.read.parquet(dc("evalpath").trim)
      docs = Dedup.decontaminate(docs, evalDocs,
        dc.getOrElse("maxoverlap", "0.3").toDouble)
    }
    val mix = sec("mixture")
    if (flag(mix)) {
      val weights = mix.get("weights").map(_.trim).filter(_.nonEmpty)
        .map(_.split(",").toSeq.map { kv =>
          val Array(s, w) = kv.split(":"); (s.trim, w.trim.toDouble)
        }).getOrElse(Seq.empty)
      docs = Pipeline.mixtureSample(docs, weights,
        defaultWeight = mix.getOrElse("default", "1.0").toDouble,
        salt = mix.getOrElse("salt", "mix"))
    }
    val sp = sec("split")
    if (flag(sp)) {
      val assignments = Pipeline.stratifiedSplit(docs,
        trainPct = sp.getOrElse("trainpct", "80").toInt,
        valPct = sp.getOrElse("valpct", "10").toInt,
        salt = sp.getOrElse("salt", "split"))
        .select(col("doc_id"), col("split"))
      docs = docs.join(assignments, Seq("doc_id"))
    }

    val out = sec("output")
    val outDir = out.getOrElse("dir", sys.error("[output] needs dir=<path>"))
    val writer = docs.write.mode("overwrite")
    (if (docs.columns.contains("split")) writer.partitionBy("split") else writer)
      .parquet(s"$outDir/corpus")
    val report =
      if (out.get("report").exists(_.trim.equalsIgnoreCase("true"))) {
        val r = Pipeline.corpusReport(docs)
        r.coalesce(1).write.mode("overwrite").parquet(s"$outDir/report")
        Some(r)
      } else None
    Result(docs, report, docs.count(), nIn)
  }

  /** CLI: `CorpusCurator <config.ini>`. */
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: CorpusCurator <config.ini>")
    val ini = new String(
      Files.readAllBytes(Paths.get(args(0))), StandardCharsets.UTF_8)
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[4]"))
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val r = run(spark, ini)
    println(s"""{"metric":"curated","in":${r.in},"kept":${r.kept}}""")
    spark.stop()
  }
}
