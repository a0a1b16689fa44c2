package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Truth generation + recall/MRR evaluation (Q12/Q13,
  * `AnnService/inc/Core/Common/TruthSet.h:162-240`).
  */
object Eval {

  /** Exact-kNN ground truth (TruthSet::GenerateTruth ≡ brute-force top-k). */
  def truth(
      queries: DataFrame,
      corpus: DataFrame,
      k: Int,
      metric: String = "l2sq"): DataFrame =
    Knn.search(queries, corpus, k, metric)

  /** Per-query Recall@K with the reference's distance-tie credit
    * (`TruthSet.h:189-205`): a result id counts as a hit if it is in the
    * truth set OR its distance ties a truth distance within eps.
    * Inputs: `(query_id, rank, id, dist)` frames.
    */
  def recallAt(
      results: DataFrame,
      truthDf: DataFrame,
      k: Int,
      eps: Double = 1e-6): DataFrame = {
    val r = results.where(col("rank") <= k)
      .select(col("query_id").as("rqid"), col("id").as("rid"), col("dist").as("rdist"))
    val t = truthDf.where(col("rank") <= k)
      .select(col("query_id"), col("id").as("tid"), col("dist").as("tdist"))
    // reference iterates the TRUTH side: each truth item is a hit if some
    // result shares its id or ties its distance within eps
    val hits = t.join(r,
        t("query_id") === r("rqid") &&
          (r("rid") === t("tid") || abs(r("rdist") - t("tdist")) < eps),
        "left")
      .groupBy(t("query_id"), t("tid"))
      .agg(max(when(r("rid").isNotNull, 1).otherwise(0)).as("hit"))
    hits.groupBy(col("query_id"))
      .agg((sum(col("hit")).cast("double") / k).as("recall"))
  }

  /** Mean/min/max/std recall summary (`TruthSet.h:206-240` log output). */
  def recallSummary(perQuery: DataFrame): DataFrame =
    perQuery.agg(
      round(avg(col("recall")), 4).as("avg_recall"),
      round(min(col("recall")), 4).as("min_recall"),
      round(max(col("recall")), 4).as("max_recall"),
      count(lit(1)).as("n_queries"))

  /** QPS/latency report (V4, the serving harness's metric block —
    * `SSDServing/SSDIndex.h:152-158,284-310` prints QPS and latency
    * P50/90/95/99/99.9): percentiles + mean over a latency column, QPS as
    * n / Σlatency (the harness's serial-time definition). Input: one row
    * per query/trigger with `latencyMs`; output: one summary row.
    */
  def latencyReport(lat: DataFrame, latencyMs: String = "latency_ms"): DataFrame =
    lat.agg(latencyAggCols(col(latencyMs).cast("double")).head,
      latencyAggCols(col(latencyMs).cast("double")).tail: _*)

  private def latencyAggCols(c: org.apache.spark.sql.Column) = Seq(
    count(lit(1)).as("n"),
    round(lit(1000.0) * count(lit(1)) / sum(c), 2).as("qps"),
    round(avg(c), 3).as("mean_ms"),
    round(percentile_approx(c, lit(0.5), lit(10000)), 3).as("p50_ms"),
    round(percentile_approx(c, lit(0.9), lit(10000)), 3).as("p90_ms"),
    round(percentile_approx(c, lit(0.95), lit(10000)), 3).as("p95_ms"),
    round(percentile_approx(c, lit(0.99), lit(10000)), 3).as("p99_ms"),
    round(percentile_approx(c, lit(0.999), lit(10000)), 3).as("p999_ms"))

  /** Stage-split latency report (the reference's serving harness prints the
    * head-search and SSD-"Ex" percentile blocks SEPARATELY,
    * `SSDServing/SSDIndex.h:284-310`): unpivot the given per-stage latency
    * columns into `(stage, latency_ms)` and emit one [[latencyReport]] row
    * per stage (stage order = the given column order).
    */
  def latencyReportByStage(lat: DataFrame, stageCols: Seq[String]): DataFrame = {
    val stacked = lat.select(explode(array(stageCols.zipWithIndex.map { case (s, i) =>
        struct(lit(i).as("idx"), lit(s).as("stage"),
          col(s).cast("double").as("latency_ms"))
      }: _*)).as("e"))
      .select(col("e.idx").as("idx"), col("e.stage").as("stage"),
        col("e.latency_ms").as("latency_ms"))
    val c = col("latency_ms")
    stacked.groupBy(col("idx"), col("stage"))
      .agg(latencyAggCols(c).head, latencyAggCols(c).tail: _*)
      .orderBy(col("idx")).drop("idx") // rows in the given column order
  }

  /** Head-recall analysis (Q14, `SSDServing/SSDIndex.h:355-490`): for each
    * query, the fraction of its true top-k neighbors whose posting head was
    * among the probed candidate heads — separates stage-1 miss (head not
    * probed) from stage-2 truncation when diagnosing recall.
    */
  def headRecall(
      candidates: DataFrame, // (query_id, head_id) probed per query
      postings: DataFrame, // (head_id, id)
      truthDf: DataFrame, // (query_id, rank, id)
      k: Int): DataFrame = {
    val t = truthDf.where(col("rank") <= k).select(col("query_id"), col("id"))
    val reachable = t
      .join(postings.select(col("head_id"), col("id")), Seq("id"))
      .join(candidates.select(col("query_id"), col("head_id")),
        Seq("query_id", "head_id"), "left_semi")
      .select(col("query_id"), col("id")).distinct()
      .groupBy(col("query_id")).agg(count(lit(1)).as("covered"))
    t.groupBy(col("query_id")).agg(count(lit(1)).as("total"))
      .join(reachable, Seq("query_id"), "left")
      .select(col("query_id"),
        round(coalesce(col("covered"), lit(0L)).cast("double") / col("total"), 4)
          .as("head_recall"))
  }

  /** MRR@K: reciprocal rank of the first result that hits the truth top-K. */
  /** Classifier operating-point sweep: for every DISTINCT score value `s`
    * (interpreted as the rule "predict positive when score ≥ s"), the
    * exact confusion counts and P/R/F1 — the precision-recall curve a
    * quality/language/toxicity filter's threshold is chosen from. Input:
    * one row per example with a numeric `scoreCol` and boolean `labelCol`.
    * Output `(thr, tp, fp, fn, precision, recall, f1)`, ratios 6dp; F1 is
    * computed as `2·tp / (2·tp + fp + fn)` — one integer-exact divide, no
    * compounding of rounded P and R.
    *
    * Scale posture: the corpus-scale work is ONE map-side-partial groupBy
    * on the score, whose state is bounded by score RESOLUTION (scores are
    * fixed-dp rounded ratios — a 4dp score in [0,1] has ≤ 10001 distinct
    * values no matter the corpus). The cumulative counts come from a
    * `b.thr ≥ a.thr` self-join of that resolution-bounded frame
    * (broadcast nested-loop over ≤ 10k×10k — documented bounded, the
    * bnljOk family), NOT a partition-less window, which would serialize
    * on one task and is banned by the scale contract.
    */
  def thresholdSweep(scored: DataFrame, scoreCol: String = "score",
      labelCol: String = "gold"): DataFrame = {
    val per = scored
      .groupBy(col(scoreCol).as("thr"))
      .agg(
        sum(when(col(labelCol), 1L).otherwise(0L)).as("_pos"),
        sum(when(col(labelCol), 0L).otherwise(1L)).as("_neg"))
    val tot = per.agg(sum(col("_pos")).as("_tpos"))
    val cum = per.select(col("thr"))
      .join(broadcast(per.select(col("thr").as("_s"), col("_pos"), col("_neg"))),
        col("_s") >= col("thr"))
      .groupBy(col("thr"))
      .agg(sum(col("_pos")).as("tp"), sum(col("_neg")).as("fp"))
    cum.crossJoin(broadcast(tot))
      .select(
        col("thr"), col("tp"), col("fp"),
        (col("_tpos") - col("tp")).as("fn"),
        round(col("tp").cast("double") / (col("tp") + col("fp")), 6)
          .as("precision"),
        when(col("_tpos") === 0L, lit(null).cast("double"))
          .otherwise(round(col("tp").cast("double") / col("_tpos"), 6))
          .as("recall"),
        when(lit(2L) * col("tp") + col("fp") + (col("_tpos") - col("tp")) === 0L,
          lit(null).cast("double"))
          .otherwise(round(lit(2L) * col("tp").cast("double") /
            (lit(2L) * col("tp") + col("fp") + (col("_tpos") - col("tp"))), 6))
          .as("f1"))
  }

  /** Exact ROC-AUC of a score against a boolean label — the
    * threshold-free companion of [[thresholdSweep]] (one number instead
    * of a curve). Computed in the tie-aware midrank form on INTEGERS
    * only: over the per-score confusion cells,
    * `AUC = Σ_s pos_s·(2·negBelow_s + neg_s) / (2·P·N)` — the numerator
    * and denominator are exact integer sums (DECIMAL(38,0); P·N at 10¹¹
    * rows passes 2⁶³), one IEEE divide, 6dp round. Output one row
    * `(n_pos, n_neg, auc)`; AUC is NULL when either class is empty.
    *
    * Scale posture: identical to [[thresholdSweep]] — one score-keyed
    * groupBy bounded by score resolution, cumulatives from the bounded
    * self-join, never a partition-less window.
    */
  def auc(scored: DataFrame, scoreCol: String = "score",
      labelCol: String = "gold"): DataFrame = {
    val dec = "decimal(38,0)"
    val per = scored
      .groupBy(col(scoreCol).as("s"))
      .agg(
        sum(when(col(labelCol), 1L).otherwise(0L)).as("_pos"),
        sum(when(col(labelCol), 0L).otherwise(1L)).as("_neg"))
    val below = per.select(col("s"))
      .join(broadcast(per.select(col("s").as("_u"), col("_neg").as("_nb"))),
        col("_u") < col("s"), "left")
      .groupBy(col("s"))
      .agg(coalesce(sum(col("_nb")), lit(0L)).as("_negBelow"))
    per.join(below, Seq("s"))
      .agg(
        sum(col("_pos")).cast(dec).as("_p"),
        sum(col("_neg")).cast(dec).as("_n"),
        // cast BEFORE the product: pos_s·(2·negBelow+neg) alone passes
        // 2⁶³ at corpus scale
        sum(col("_pos").cast(dec) *
          (lit(2L) * col("_negBelow") + col("_neg")).cast(dec)).as("_num"))
      .select(
        col("_p").cast("long").as("n_pos"),
        col("_n").cast("long").as("n_neg"),
        when(col("_p") === 0 || col("_n") === 0, lit(null).cast("double"))
          .otherwise(round(col("_num").cast("double") /
            (lit(2).cast(dec) * col("_p") * col("_n")).cast("double"), 6))
          .as("auc"))
  }

  /** Cohen's kappa between two categorical labelings of the same rows —
    * the chance-corrected agreement score a labeling pipeline is audited
    * with (gold vs model, annotator vs annotator, heuristic vs stored
    * metadata). One row out:
    * `(n, n_agree, po, pe, kappa)` — observed agreement `po = A/n`,
    * chance agreement `pe = Σ_c rowMarg_c·colMarg_c / n²`, and
    * `kappa = (po − pe)/(1 − pe)`, all rounded 6dp.
    *
    * Determinism: every ratio is formed from EXACT integer counts —
    * kappa is computed as `(A·n − P) / (n² − P)` on DECIMAL(38,0)
    * products (no 1−x float subtraction), one IEEE divide, then the 6dp
    * round; `pe = 1` (degenerate single-class margins) yields NULL rather
    * than an engine-dependent ÷0. DECIMAL(38,0), not BIGINT, because
    * `A·n` at a 10¹¹-row corpus is ~10²² — past 2⁶³.
    *
    * Scale posture: one corpus-scan groupBy whose state is the
    * contingency table (≤ |classes|² cells — map-side partial, bounded);
    * everything after operates on that tiny frame.
    */
  def labelAgreement(labeled: DataFrame, aCol: String = "gold",
      bCol: String = "pred"): DataFrame = {
    val dec = "decimal(38,0)"
    val cells = labeled
      .groupBy(col(aCol).as("_a"), col(bCol).as("_b"))
      .agg(count(lit(1)).as("_c"))
    val stats = cells.agg(
      sum(col("_c")).cast(dec).as("n"),
      sum(when(col("_a") === col("_b"), col("_c")).otherwise(0L))
        .cast(dec).as("n_agree"))
    val prods = cells.groupBy(col("_a")).agg(sum(col("_c")).cast(dec).as("_ca"))
      .join(cells.groupBy(col("_b")).agg(sum(col("_c")).cast(dec).as("_cb")),
        col("_a") === col("_b"))
      .agg(coalesce(sum(col("_ca") * col("_cb")), lit(0).cast(dec)).as("_p"))
    stats.crossJoin(prods)
      .select(
        col("n").cast("long").as("n"),
        col("n_agree").cast("long").as("n_agree"),
        round(col("n_agree").cast("double") / col("n").cast("double"), 6).as("po"),
        round(col("_p").cast("double") / (col("n") * col("n")).cast("double"), 6)
          .as("pe"),
        when(col("n") * col("n") === col("_p"), lit(null).cast("double"))
          .otherwise(round(
            (col("n_agree") * col("n") - col("_p")).cast("double") /
              (col("n") * col("n") - col("_p")).cast("double"), 6))
          .as("kappa"))
  }

  /** Per-class confusion report for a multi-class classifier — the standard
    * model card table behind [[labelAgreement]]'s single-number κ: one row
    * per label observed on EITHER side with its support, TP/FP/FN cells, and
    * precision/recall/F1 at 6dp (NULL where the denominator is zero: a
    * never-predicted label has no precision, a never-true label no recall —
    * distinct from a genuine 0.0). Macro-averaging is one `avg` over this
    * output; emitting the per-class rows keeps the rare-class failure
    * visible instead of averaged away.
    *
    * Scale: ONE corpus-scan groupBy to the (actual, pred) contingency table
    * (≤ |classes|² cells, map-side partial); the per-label sums and the
    * label-domain union all operate on that tiny frame. No windows.
    */
  def confusion(labeled: DataFrame, aCol: String = "gold",
      bCol: String = "pred"): DataFrame = {
    val cells = labeled
      .groupBy(col(aCol).as("_a"), col(bCol).as("_b"))
      .agg(count(lit(1)).as("_c"))
      .localCheckpoint(true)
    val labels = cells.select(col("_a").as("label"))
      .union(cells.select(col("_b"))).distinct()
    val byActual = cells.groupBy(col("_a").as("label"))
      .agg(sum(col("_c")).as("support"),
        sum(when(col("_a") === col("_b"), col("_c")).otherwise(0L)).as("tp"))
    val byPred = cells.groupBy(col("_b").as("label"))
      .agg(sum(col("_c")).as("n_pred"))
    def ratio(num: org.apache.spark.sql.Column,
        den: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      when(den > 0, round(num.cast("double") / den.cast("double"), 6))
    labels
      .join(byActual, Seq("label"), "left")
      .join(byPred, Seq("label"), "left")
      .select(col("label"),
        coalesce(col("support"), lit(0L)).as("support"),
        coalesce(col("tp"), lit(0L)).as("tp"),
        (coalesce(col("n_pred"), lit(0L)) - coalesce(col("tp"), lit(0L))).as("fp"),
        (coalesce(col("support"), lit(0L)) - coalesce(col("tp"), lit(0L))).as("fn"))
      .withColumn("precision", ratio(col("tp"), col("tp") + col("fp")))
      .withColumn("recall", ratio(col("tp"), col("tp") + col("fn")))
      .withColumn("f1",
        when(col("tp") + col("fp") + col("fn") > 0,
          round(lit(2.0) * col("tp").cast("double") /
            (lit(2.0) * col("tp") + col("fp") + col("fn")).cast("double"), 6)))
  }

  /** Reliability (calibration) table for a [0,1] classifier score against a
    * boolean gold label: `bins` equal-width score bins, each reporting row
    * count, positive count, mean predicted score, empirical positive rate,
    * and the bin's Brier contribution (mean squared error of the score as a
    * probability). A well-calibrated score has `mean_score ≈ pos_rate` per
    * bin — THE diagnostic run before a quality/toxicity filter's scores are
    * trusted as probabilities ([[thresholdSweep]] picks the cut,
    * calibration says whether the scores mean anything).
    *
    * Determinism contract: `scoreCol` must be 4dp-rounded in [0,1] (the
    * [[TextAnalysis.stopwordConfidence]] convention). Scores scale to exact
    * integers (`round(s·10⁴)`), so binning is integer division, every sum is
    * an integer sum, and each output ratio is one IEEE divide + 6dp round —
    * no float accumulation anywhere. Scale: one groupBy with ≤ `bins`
    * map-side-combined groups.
    */
  def calibration(scored: DataFrame, bins: Int = 10,
      scoreCol: String = "score", labelCol: String = "gold"): DataFrame = {
    require(bins > 0 && 10000 % bins == 0, "bins must divide 10000")
    val intScore = round(col(scoreCol) * 10000).cast("long")
    val gold10k = when(col(labelCol), 10000L).otherwise(0L)
    val sqErr = (intScore - gold10k) * (intScore - gold10k)
    scored
      .select(
        least(floor(intScore / (10000 / bins)).cast("int"), lit(bins - 1)).as("bin"),
        intScore.as("_s"),
        when(col(labelCol), 1L).otherwise(0L).as("_pos"),
        sqErr.as("_se"))
      .groupBy(col("bin"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("_pos")).as("n_pos"),
        round(sum(col("_s")).cast("double") / count(lit(1)) / 10000.0, 6)
          .as("mean_score"),
        round(sum(col("_pos")).cast("double") / count(lit(1)), 6).as("pos_rate"),
        round(sum(col("_se").cast("decimal(38,0)")).cast("double") /
          count(lit(1)) / 1e8, 6).as("bin_brier"))
  }

  /** Binary nDCG@k of ranked `results` against `truthDf` (both
    * `(query_id, rank, id)`): DCG = Σ over hits of `1/log₂(pos+1)`, ideal
    * DCG = the same sum over the first `min(k, |relevant|)` positions,
    * nDCG = DCG/IDCG. Float-log terms round 6dp then DECIMAL-sum (the
    * [[graft.operators.TextAnalysis.tokenEntropy]] convention: only ~k
    * distinct discount values exist, so the rounded terms are
    * engine-identical and the sum is exact); the final ratio is one IEEE
    * divide + 6dp round. Scale: a semi-join on `(query_id, id)` + two
    * query-keyed aggregations — never a per-query collect.
    */
  def ndcgAt(results: DataFrame, truthDf: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    def disc(pos: org.apache.spark.sql.Column) =
      round(lit(1.0) / log(2.0, pos + 1), 6).cast(DecimalType(18, 9))
    val rel = truthDf.where(col("rank") <= k).select(col("query_id"), col("id"))
    val dcg = results.where(col("rank") <= k)
      .join(rel, Seq("query_id", "id"), "left_semi")
      .groupBy(col("query_id"))
      .agg(sum(disc(col("rank"))).as("_dcg"), count(lit(1)).as("n_hits"))
    val ideal = rel.groupBy(col("query_id")).agg(count(lit(1)).as("_nrel"))
      .select(col("query_id"),
        explode(sequence(lit(1), least(col("_nrel"), lit(k)))).as("_pos"))
      .groupBy(col("query_id"))
      .agg(sum(disc(col("_pos"))).as("_idcg"))
    results.select(col("query_id")).distinct()
      .join(dcg, Seq("query_id"), "left")
      .join(ideal, Seq("query_id"), "left")
      .select(col("query_id"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        round(coalesce(col("_dcg"), lit(0)).cast("double") /
          col("_idcg").cast("double"), 6).as("ndcg"))
  }

  /** Population Stability Index between two snapshots of a [0,1] score —
    * the drift metric a corpus pipeline alarms on (q149's centroid drift
    * for embeddings; this for any scalar quality/classifier score). Bins
    * like [[calibration]] (4dp-score contract → integer-exact deciles),
    * per-bin Laplace-smoothed shares `p = (c+1)/(n+bins)`, and the PSI term
    * `(p_a − p_b)·ln(p_a/p_b)` rounded 6dp — Σ terms ≥ 0.25 is the
    * conventional "investigate" bar. Output one row per OBSERVED bin
    * `(bin, n_a, n_b, p_a, p_b, term)`; the shares are single IEEE divides
    * over exact integer counts, so both engines see identical doubles.
    * Scale: one ≤`bins`-group aggregation + a one-row totals broadcast.
    */
  def psi(scored: DataFrame, bins: Int = 10,
      scoreCol: String = "score", snapCol: String = "snap"): DataFrame = {
    require(bins > 0 && 10000 % bins == 0, "bins must divide 10000")
    val intScore = round(col(scoreCol) * 10000).cast("long")
    val binned = scored.select(
      least(floor(intScore / (10000 / bins)).cast("int"), lit(bins - 1)).as("bin"),
      when(col(snapCol), 1L).otherwise(0L).as("_a"),
      when(col(snapCol), 0L).otherwise(1L).as("_b"))
      .groupBy(col("bin"))
      .agg(sum(col("_a")).as("n_a"), sum(col("_b")).as("n_b"))
    val totals = binned.agg(sum(col("n_a")).as("_ta"), sum(col("n_b")).as("_tb"))
    val pa = (col("n_a") + 1).cast("double") / (col("_ta") + bins)
    val pb = (col("n_b") + 1).cast("double") / (col("_tb") + bins)
    binned.crossJoin(broadcast(totals))
      .select(col("bin"), col("n_a"), col("n_b"),
        round(pa, 6).as("p_a"), round(pb, 6).as("p_b"),
        round((pa - pb) * log(pa / pb), 6).as("term"))
  }

  /** Per-group exact Pearson correlation + OLS slope — the grouped sibling
    * of the q187 global scan (per-source quality trend, per-event-type
    * value drift): the five power sums accumulate in DECIMAL(38,0) over
    * INTEGER-valued inputs (callers pre-scale, the ×10⁴ convention), so the
    * sums are order-exact at any partitioning and both engines produce the
    * identical double at the single terminal divide. One map-side-partial
    * hash aggregation keyed by the group — state ∝ groups, never rows.
    * Degenerate groups (zero variance on either axis) emit NULL rather than
    * NaN/±Inf, which no hash compare survives. Output
    * `(group, n, corr, beta)`, 6dp.
    */
  def groupOls(df: DataFrame, groupCol: String, xCol: String,
      yCol: String): DataFrame = {
    val bigDec = "decimal(38,0)"
    val agged = df.groupBy(col(groupCol)).agg(
      count(lit(1)).cast(bigDec).as("_n"),
      sum(col(xCol)).cast(bigDec).as("_sx"),
      sum(col(yCol)).cast(bigDec).as("_sy"),
      sum((col(xCol) * col(yCol)).cast(bigDec)).as("_sxy"),
      sum((col(xCol) * col(xCol)).cast(bigDec)).as("_sxx"),
      sum((col(yCol) * col(yCol)).cast(bigDec)).as("_syy"))
    val cov = (col("_n") * col("_sxy") - col("_sx") * col("_sy")).cast("double")
    val dxx = (col("_n") * col("_sxx") - col("_sx") * col("_sx")).cast("double")
    val dyy = (col("_n") * col("_syy") - col("_sy") * col("_sy")).cast("double")
    agged.select(col(groupCol),
      col("_n").cast("long").as("n"),
      when(dxx > 0 && dyy > 0, round(cov / (sqrt(dxx) * sqrt(dyy)), 6))
        .as("corr"),
      when(dxx > 0, round(cov / dxx, 6)).as("beta"))
  }

  /** Two-sample A/B comparison — the experiment readout an event pipeline
    * serves (did the treatment move the per-user metric?): per variant,
    * user count, mean and sample variance of the per-user metric, plus the
    * Welch t statistic and Cohen's d effect size between exactly two
    * variants. Input is a per-unit metric frame `(variant, x)` with `x`
    * ALREADY integer-scaled by the caller (the q221 convention — e.g.
    * `round(value·10⁴)` — so every sum below is integer-exact); `scale` is
    * that factor. Output ONE row:
    * `(variant_a, n_a, mean_a, variant_b, n_b, mean_b, t_welch, cohens_d)`
    * with the doubles UNROUNDED (each is a fixed IEEE expression over exact
    * DECIMAL(38,0) sums — bit-identical across engines); NULL t/d when
    * either variance is undefined (n < 2) or both variances are zero.
    *
    * Scale: one variant-keyed hash aggregation over the unit frame
    * (map-side partial, 2 groups), then driver-free one-row math. Exactly
    * two variants required — ENFORCED at runtime (a third variant or a
    * degenerate single-variant frame would otherwise emit one row per
    * unordered pair / zero rows: plausible-looking but wrong output for a
    * caller bug like a bad hash-bucket expression).
    */
  def abTest(units: DataFrame, scale: Double,
      variantCol: String = "variant", xCol: String = "x"): DataFrame = {
    val dec = "decimal(38,0)"
    // x widens to DECIMAL BEFORE any multiply/sum: a LONG-first x·x wraps
    // silently past |x| ~ 3e9 (well inside a per-user metric total at the
    // ×10⁴ scale), while the decimal product is exact in both engines
    val g = units.groupBy(col(variantCol).as("variant")).agg(
      count(lit(1)).cast(dec).as("n"),
      sum(col(xCol).cast(dec)).as("sx"),
      sum(col(xCol).cast(dec) * col(xCol).cast(dec)).as("sxx"))
    val a = g.select(col("variant").as("variant_a"), col("n").as("na"),
      col("sx").as("sxa"), col("sxx").as("sxxa"))
    val b = g.select(col("variant").as("variant_b"), col("n").as("nb"),
      col("sx").as("sxb"), col("sxx").as("sxxb"))
    // the single unordered pair; the contract check rides the plan as a
    // filter over assert_true (NULL iff it passes — a filter can't be
    // optimized away, unlike a dropped projection column). The assert
    // lives on the always-one-row nv frame ITSELF, not on `paired`: a 0-
    // or 1-variant input makes `paired` empty, and a filter riding an
    // empty frame never evaluates — the degenerate case would silently
    // return zero rows instead of erroring
    val nv = g.agg(count(lit(1)).as("_nv"))
      .where(assert_true(col("_nv") === 2,
        lit("Eval.abTest: exactly two variants required")).isNull)
    val paired = a.join(b, col("variant_a") < col("variant_b"))
      .crossJoin(broadcast(nv))
    def mean(sx: Column, n: Column): Column =
      sx.cast("double") / n.cast("double") / lit(scale)
    // sample variance from power sums: (n·Σx² − (Σx)²) / (n(n−1)) / scale²
    // — NULL for n < 2 (the n≥2 guard must live INSIDE this expression:
    // common-subexpression elimination hoists it out of any outer `when`,
    // and ANSI mode errors on the 0 divisor)
    def varS(n: Column, sx: Column, sxx: Column): Column =
      when(n >= 2,
        (n * sxx - sx * sx).cast("double") /
          (n * (n - 1)).cast("double") / lit(scale * scale))
    val ma = mean(col("sxa"), col("na"))
    val mb = mean(col("sxb"), col("nb"))
    val va = varS(col("na"), col("sxa"), col("sxxa"))
    val vb = varS(col("nb"), col("sxb"), col("sxxb"))
    val se2 = va / col("na").cast("double") + vb / col("nb").cast("double")
    val pooled = ((col("na") - 1).cast("double") * va +
      (col("nb") - 1).cast("double") * vb) /
      (col("na") + col("nb") - 2).cast("double")
    paired.select(
      col("variant_a"), col("na").cast("long").as("n_a"), ma.as("mean_a"),
      col("variant_b"), col("nb").cast("long").as("n_b"), mb.as("mean_b"),
      when(col("na") >= 2 && col("nb") >= 2 && se2 > 0,
        (ma - mb) / sqrt(se2)).as("t_welch"),
      when(col("na") >= 2 && col("nb") >= 2 && pooled > 0,
        (ma - mb) / sqrt(pooled)).as("cohens_d"))
  }

  /** Per-group Spearman rank correlation between two columns — the
    * scorer-agreement diagnostic ("does the quality score order documents
    * the way length does?") that Pearson ([[groupOls]]) gets wrong under
    * monotone-but-nonlinear relationships. Standard tie handling: average
    * (fractional) ranks, carried as DOUBLED integers
    * (`2·avgrank = 2·rank + |ties| − 1`, exact), so the whole computation
    * is [[groupOls]]'s integer-exact DECIMAL(38,0) power-sum correlation
    * over the scaled ranks. Output `(group, n, spearman)` at 6dp, NULL for
    * constant columns.
    *
    * Scale: a rank depends only on a row's VALUE, so the doubled average
    * rank comes from the per-(group, value) count histogram —
    * `2·avgrank(v) = 2·(#rows below v) + count(v) + 1` — and the histograms
    * are bounded by value resolution (callers pass integer-scaled or
    * resolution-bounded ratios, the q221 convention), never by corpus size.
    * The corpus is scanned ONCE: two broadcast rank-map joins, then
    * [[groupOls]]'s keyed hash aggregation; windows run only over the tiny
    * histograms (the [[graft.operators.Pipeline.qualityQuantileFloor]]
    * shape), never a group-partitioned window over raw rows. Doubled ranks
    * square inside a LONG, so groups past ~1.5e9 rows need a wider
    * intermediate (same bound as groupOls).
    */
  def spearmanByGroup(df: DataFrame, groupCol: String, xCol: String,
      yCol: String): DataFrame = {
    // NULL x or y is dropped UP FRONT (a rank over NULL is meaningless and
    // the rank-map equi-joins below would silently drop such rows anyway —
    // filtering first makes n and the coefficient well-defined: Spearman
    // over the complete (x, y) pairs only, the standard pairwise-deletion
    // convention)
    val df2 = df.where(col(xCol).isNotNull && col(yCol).isNotNull)
    // per-(group, value) histogram → doubled tie-averaged rank of the value:
    // 2·avgrank = 2·rank + ties − 1 = 2·(#below) + count + 1, all integers.
    // NO broadcast hint on the rank-map joins: a near-tie-free column (an
    // unrounded score) makes the map ∝ distinct values, and Spark's own
    // threshold then picks a shuffle join — still scale-safe (equi-join on
    // (group, value)), where a forced broadcast would blow the driver
    val rankMap = (c: String, out: String) => {
      val wBelow = Window.partitionBy(col(groupCol)).orderBy(col(c))
        .rowsBetween(Window.unboundedPreceding, -1)
      df2.groupBy(col(groupCol), col(c)).agg(count(lit(1)).as("_cnt"))
        .withColumn("_below", coalesce(sum(col("_cnt")).over(wBelow), lit(0L)))
        .select(col(groupCol), col(c),
          (col("_below") * 2 + col("_cnt") + 1).as(out))
    }
    groupOls(
      df2.join(rankMap(xCol, "_rx"), Seq(groupCol, xCol))
        .join(rankMap(yCol, "_ry"), Seq(groupCol, yCol)),
      groupCol, "_rx", "_ry")
      .select(col(groupCol), col("n"), col("corr").as("spearman"))
  }

  /** Centroid silhouette — the clustering-quality score an embedding-
    * curation pipeline reads before trusting cluster-based ops (SemDeDup
    * buckets, cluster sampling, IVF cells): per vector, `a` = distance to
    * its own (nearest) centroid, `b` = distance to the best OTHER centroid,
    * `s = (b − a) / max(a, b)` (the standard simplified silhouette — the
    * exact pairwise form is O(n²) and adds nothing at centroid granularity).
    * Output one row per centroid: `(head_id, n, mean_silhouette)` at 6dp.
    *
    * Scale: `a`/`b` are ranks 1–2 of ONE bounded top-k pass over the corpus
    * ([[Knn.searchAgg]]'s single-scan aggregate — heads ride inside the
    * expression, nothing shuffles but the per-head partial aggregates);
    * the mean is an exact DECIMAL sum of 6dp-rounded scores, so it is
    * reduction-order-independent and engine-exact. `s = 0` when both
    * distances are 0 (a vector sitting ON two coincident centroids).
    */
  def silhouette(vecs: DataFrame, heads: DataFrame,
      metric: String = "cos"): DataFrame = {
    val top2 = Knn.searchAgg(
      vecs.select(col("id").as("query_id"), col("vec").as("qvec")),
      heads.select(col("head_id").as("id"), col("head_vec").as("vec")),
      2, metric)
    val scored = top2.select(
      element_at(col("nn"), 1).getField("id").as("head_id"),
      element_at(col("nn"), 1).getField("dist").as("_a"),
      element_at(col("nn"), 2).getField("dist").as("_b"))
      .select(col("head_id"),
        when(greatest(col("_a"), col("_b")) > 0,
          (col("_b") - col("_a")) / greatest(col("_a"), col("_b")))
          .otherwise(lit(0.0)).as("_s"))
    scored.groupBy(col("head_id")).agg(
      count(lit(1)).as("n"),
      round(sum(round(col("_s"), 6).cast("decimal(18,6)")).cast("double") /
        count(lit(1)), 6).as("mean_silhouette"))
  }

  def mrrAt(results: DataFrame, truthDf: DataFrame, k: Int): DataFrame = {
    val t = truthDf.where(col("rank") <= k)
      .select(col("query_id"), col("id"))
    val firstHit = results.where(col("rank") <= k)
      .join(t, Seq("query_id", "id"), "left_semi")
      .groupBy(col("query_id"))
      .agg(min(col("rank")).as("first_hit"))
    results.select(col("query_id")).distinct()
      .join(firstHit, Seq("query_id"), "left")
      .select(col("query_id"),
        round(coalesce(lit(1.0) / col("first_hit"), lit(0.0)), 4).as("mrr"))
  }

  /** Per-cluster purity against gold labels: for each cluster, the share
    * of members carrying its majority label (ties → smaller label).
    * Inputs: `assign(id, cluster)` and `labels(id, label)`. Output
    * `(cluster, n, top_label, purity)` with purity at 6dp — the external
    * clustering-quality table read next to [[silhouette]]'s internal one.
    *
    * Scale shape: one equi-join on id, one hash agg to the
    * cluster×label contingency frame; everything downstream (majority
    * pick, the ratio) runs on that bounded frame. The majority pick is a
    * max_by-shaped aggregate, not a window.
    */
  def clusterPurity(assign: DataFrame, labels: DataFrame): DataFrame = {
    val joint = assign.select(col("id"), col("cluster"))
      .join(labels.select(col("id"), col("label")), Seq("id"))
      .groupBy(col("cluster"), col("label")).agg(count(lit(1)).as("_cl"))
      .localCheckpoint(eager = false)
    // majority pick in two label-type-agnostic aggs (a negate-based
    // struct-max trick would silently NULL non-numeric labels): max count
    // per cluster, then the SMALLEST label attaining it
    val tops = joint.groupBy(col("cluster")).agg(
      sum(col("_cl")).as("n"), max(col("_cl")).as("_mc"))
    tops.join(joint, Seq("cluster"))
      .where(col("_cl") === col("_mc"))
      .groupBy(col("cluster"), col("n"), col("_mc"))
      .agg(min(col("label")).as("top_label"))
      .select(col("cluster"), col("n"), col("top_label"),
        round(col("_mc").cast("double") / col("n"), 6).as("purity"))
  }

  /** Normalized mutual information between a clustering and gold labels —
    * ONE row `(n, mi, h_cluster, h_label, nmi)` (nats, 6dp), with the
    * sqrt normalization `nmi = mi / sqrt(h_cluster · h_label)` (0.0 when
    * either entropy is 0). Inputs as in [[clusterPurity]].
    *
    * Determinism contract: each contingency/margin cell contributes one
    * double log-term rounded to 8dp and cast to DECIMAL(38,8) before the
    * sum — reduction-order-independent, oracle-mirrored verbatim.
    * Scale shape: identical to [[clusterPurity]] — one join + one hash
    * agg; all log-space math on the bounded contingency frame.
    */
  def clusterNmi(assign: DataFrame, labels: DataFrame): DataFrame = {
    val joint = assign.select(col("id"), col("cluster"))
      .join(labels.select(col("id"), col("label")), Seq("id"))
      .groupBy(col("cluster"), col("label")).agg(count(lit(1)).as("_cl"))
      .localCheckpoint(eager = false)
    val n = joint.agg(sum(col("_cl")).as("_n"))
    def entropy(margin: DataFrame, cnt: String, out: String): DataFrame =
      margin.crossJoin(broadcast(n))
        .select(round((col(cnt) .cast("double") / col("_n")) *
            -log(col(cnt).cast("double") / col("_n")), 8)
          .cast("decimal(38,8)").as("_t"))
        .agg(sum(col("_t")).cast("double").as(out))
    val hc = entropy(joint.groupBy(col("cluster"))
      .agg(sum(col("_cl")).as("_c")), "_c", "_hc")
    val hl = entropy(joint.groupBy(col("label"))
      .agg(sum(col("_cl")).as("_l")), "_l", "_hl")
    val mi = joint
      .join(joint.groupBy(col("cluster")).agg(sum(col("_cl")).as("_c")),
        Seq("cluster"))
      .join(joint.groupBy(col("label")).agg(sum(col("_cl")).as("_l")),
        Seq("label"))
      .crossJoin(broadcast(n))
      .select(round((col("_cl").cast("double") / col("_n")) *
          log(col("_cl").cast("double") * col("_n") /
            (col("_c").cast("double") * col("_l"))), 8)
        .cast("decimal(38,8)").as("_t"))
      .agg(sum(col("_t")).cast("double").as("_mi"))
    mi.crossJoin(hc).crossJoin(hl).crossJoin(broadcast(n))
      .select(col("_n").as("n"), round(col("_mi"), 6).as("mi"),
        round(col("_hc"), 6).as("h_cluster"),
        round(col("_hl"), 6).as("h_label"),
        round(when(col("_hc") > 0 && col("_hl") > 0,
          col("_mi") / sqrt(col("_hc") * col("_hl")))
          .otherwise(lit(0.0)), 6).as("nmi"))
  }

  /** Mean-average-precision at k: per query, `AP@k = Σ_{hits h}
    * P@rank(h) / min(k, |relevant|)` over the result ranking, with the
    * truth set as relevance — the order-sensitive middle ground between
    * recall@k (set-blind) and [[ndcgAt]] (graded). Output one row per
    * query `(query_id, ap)` at 6dp; mean it for MAP.
    *
    * Determinism contract: `P@r = hits_so_far / r` where `hits_so_far`
    * is the hit's position among the query's hits ordered by rank — an
    * exact integer pair per hit; each `P@r / denom` term rounds to 8dp
    * DECIMAL before the sum (order-free). The per-query hit numbering
    * windows ONLY the matched-hit frame (≤ k rows per query).
    *
    * Scale shape: one equi-join of two O(|Q|·k) rank frames, one bounded
    * window, two hash aggs.
    */
  def mapAt(results: DataFrame, truthDf: DataFrame, k: Int): DataFrame = {
    val r = results.where(col("rank") <= k)
      .select(col("query_id"), col("id"), col("rank"))
    val t = truthDf.where(col("rank") <= k)
      .select(col("query_id"), col("id"))
    val nRel = t.groupBy(col("query_id"))
      .agg(count(lit(1)).as("_nrel"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("rank"))
    val perHit = r.join(t, Seq("query_id", "id"), "left_semi")
      .withColumn("_h", row_number().over(w).cast("long"))
      .join(broadcast(nRel), Seq("query_id"))
      .select(col("query_id"),
        round(col("_h").cast("double") / col("rank") /
          least(lit(k.toLong), col("_nrel")), 8)
          .cast("decimal(38,8)").as("_t"))
    results.select(col("query_id")).distinct()
      .join(perHit.groupBy(col("query_id")).agg(sum(col("_t")).as("_s")),
        Seq("query_id"), "left")
      .select(col("query_id"),
        round(coalesce(col("_s").cast("double"), lit(0.0)), 6).as("ap"))
  }

  /** Rank-biased overlap at depth k (Webber et al., TOIS'10, truncated
    * form) between two per-query rankings — the ORDERING-agreement metric
    * recall@k cannot express (two searchers can share all k ids yet rank
    * them oppositely; RBO@k = 1 only when the prefixes agree depth by
    * depth). Inputs: `(query_id, rank, id)` frames; output one row per
    * query of the FIRST ranking: `(query_id, rbo)` at 6dp (0.0 when
    * nothing overlaps).
    *
    * Closed form without per-depth loops: a shared id first co-present at
    * depth `m = max(rank_a, rank_b)` contributes
    * `w(m) = (1−p)/p · Σ_{d=m..k} p^d/d` to
    * `RBO = (1−p)/p · Σ_{d≤k} p^d·|A_d ∩ B_d|/d` — so RBO is one weight
    * lookup per MATCHED id. The k weights are driver-computed literals
    * rounded to 12dp DECIMAL, making the per-query sum exact and
    * reduction-order-free; the oracle embeds the identical literals.
    *
    * Scale shape: one equi-join of two O(|Q|·k) rank frames, a broadcast
    * k-row weight join, one hash agg — nothing corpus-sized.
    */
  def rboAt(a: DataFrame, b: DataFrame, k: Int,
      p: Double = 0.9): DataFrame = {
    val spark = a.sparkSession
    import spark.implicits._
    val w = rboWeights(k, p).map { case (m, s) => (m, s.bigDecimal) }
    val wdf = w.toDF("_m", "_w")
    val ar = a.where(col("rank") <= k)
      .select(col("query_id"), col("id"), col("rank").as("_ra"))
    val br = b.where(col("rank") <= k)
      .select(col("query_id"), col("id"), col("rank").as("_rb"))
    val per = ar.join(br, Seq("query_id", "id"))
      .select(col("query_id"),
        greatest(col("_ra"), col("_rb")).cast("long").as("_m"))
      .join(broadcast(wdf), Seq("_m"))
      .groupBy(col("query_id")).agg(sum(col("_w")).as("_s"))
    a.select(col("query_id")).distinct()
      .join(per, Seq("query_id"), "left")
      .select(col("query_id"),
        round(coalesce(col("_s").cast("double"), lit(0.0)), 6).as("rbo"))
  }

  /** The RBO@k depth-weight table `(m, w(m))` — shared by [[rboAt]] and
    * its oracle so both sides sum literally identical 12dp decimals.
    */
  def rboWeights(k: Int, p: Double): Seq[(Long, BigDecimal)] =
    (1 to k).map { m =>
      val s = (m to k).map(d => math.pow(p, d) / d).sum * (1 - p) / p
      (m.toLong,
        BigDecimal(s).setScale(12, BigDecimal.RoundingMode.HALF_UP))
    }

  /** 1-Wasserstein (earth-mover) distance between two score samples — the
    * metric-aware drift number [[psi]]'s binned ratios miss (PSI is
    * blind to HOW FAR mass moved; W1 integrates |CDF_a − CDF_b| over the
    * value axis). One row: `(n_a, n_b, w1)` at 6dp. Inputs: two frames
    * with a numeric `valueCol` (quantize upstream — the distinct-value
    * set must be bounded by contract, e.g. 4dp scores).
    *
    * Determinism contract: per merged distinct value, the segment term
    * `|F_a − F_b| · (next − v)` is one double over exact longs, rounded
    * 8dp → DECIMAL(38,8) before the sum. Scale shape: one hash agg per
    * side to value histograms; CDFs, the next-value step, and the fold
    * are self-joins on the bounded merged-value frame — no global sort,
    * no partition-less windows.
    */
  def wasserstein1(a: DataFrame, b: DataFrame, valueCol: String): DataFrame = {
    val (vals, cdfs, na, nb) = mergedCdf(a, b, valueCol)
    val nxt = vals.join(broadcast(vals.select(col("_v").as("_w"))),
        col("_w") > col("_v"))
      .groupBy(col("_v")).agg(min(col("_w")).as("_nxt"))
    val terms = cdfs
      .join(nxt, Seq("_v")) // the max value has no next → no segment
      .crossJoin(broadcast(na)).crossJoin(broadcast(nb))
      .select(round(abs(col("_fa").cast("double") / col("_na") -
          col("_fb").cast("double") / col("_nb")) *
          (col("_nxt") - col("_v")), 8)
        .cast("decimal(38,8)").as("_t"))
    terms.agg(sum(col("_t")).as("_w1"))
      .crossJoin(broadcast(na)).crossJoin(broadcast(nb))
      .select(col("_na").as("n_a"), col("_nb").as("n_b"),
        round(coalesce(col("_w1").cast("double"), lit(0.0)), 6).as("w1"))
  }

  /** Shared staging of the two-sample drift statistics ([[wasserstein1]],
    * [[ksStat]] — the "same frames, different lens" guarantee lives here):
    * per-side value histograms with NULL values excluded up front (a
    * missing score is not a sample — the [[kendallTau]] convention; an
    * unfiltered null bucket would count in n_a/n_b yet never join a CDF,
    * deflating every F), the merged distinct-value frame, per-side totals,
    * and both CDF numerators joined per value. Every self-join runs on the
    * bounded merged-value frame.
    */
  private def mergedCdf(a: DataFrame, b: DataFrame, valueCol: String)
      : (DataFrame, DataFrame, DataFrame, DataFrame) = {
    def hist(df: DataFrame, out: String): DataFrame =
      df.select(col(valueCol).cast("double").as("_v"))
        .where(col("_v").isNotNull)
        .groupBy(col("_v")).agg(count(lit(1)).as(out))
    val ha = hist(a, "_ca"); val hb = hist(b, "_cb")
    val vals = ha.select(col("_v")).unionByName(hb.select(col("_v")))
      .distinct().localCheckpoint(eager = false)
    val na = ha.agg(sum(col("_ca")).as("_na"))
    val nb = hb.agg(sum(col("_cb")).as("_nb"))
    def cdf(h: DataFrame, cnt: String, out: String): DataFrame =
      vals.join(broadcast(h.select(col("_v").as("_u"), col(cnt))),
          col("_u") <= col("_v"), "left")
        .groupBy(col("_v")).agg(coalesce(sum(col(cnt)), lit(0L)).as(out))
    (vals, cdf(ha, "_ca", "_fa").join(cdf(hb, "_cb", "_fb"), Seq("_v")),
      na, nb)
  }

  /** One pooled block of the isotonic (PAV) fit: scores in `[lo, hi]`
    * share the calibrated rate `pos/n`.
    */
  final case class IsoBlock(lo: Long, hi: Long, n: Long, pos: Long)

  /** Isotonic regression (pool-adjacent-violators) of a boolean outcome
    * against an integer-unit score — the shape-free upgrade of
    * [[calibration]]'s fixed bins: PAV finds the best monotone step
    * function, so the calibrated rate is non-decreasing in the score by
    * construction (the property a threshold picker actually needs).
    * Fits driver-side on the collected (score, n, pos) histogram
    * (bounded by the score-resolution contract, the k-means/PCA
    * bounded-driver adjudication); all pooling comparisons cross-multiply
    * exact counts in BigInt, so the fit is engine- and order-exact.
    */
  def isotonicFit(scored: DataFrame, scoreCol: String = "score",
      labelCol: String = "keep"): Seq[IsoBlock] = {
    val hist = scored.where(col(scoreCol).isNotNull)
      .groupBy(col(scoreCol).cast("long").as("_s"))
      .agg(count(lit(1)).as("_n"),
        sum(when(col(labelCol), 1L).otherwise(0L)).as("_p"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    require(hist.nonEmpty, "isotonicFit: empty input")
    val stack = scala.collection.mutable.ArrayBuffer.empty[IsoBlock]
    hist.foreach { case (s0, n0, p0) =>
      var b = IsoBlock(s0, s0, n0, p0)
      while (stack.nonEmpty &&
          BigInt(stack.last.pos) * b.n >= BigInt(b.pos) * stack.last.n) {
        val prev = stack.remove(stack.length - 1)
        b = IsoBlock(prev.lo, b.hi, prev.n + b.n, prev.pos + b.pos)
      }
      stack += b
    }
    // extend each block's hi to the next block's lo − 1 so the blocks
    // PARTITION the trained score range: an unobserved score between two
    // trained scores takes the lower block's rate (right-continuous step),
    // never falls through a range-join gap
    val raw = stack.toSeq
    raw.zipWithIndex.map { case (b, i) =>
      if (i + 1 < raw.length) b.copy(hi = raw(i + 1).lo - 1) else b
    }
  }

  /** Apply a fitted [[isotonicFit]] model: the per-distinct-score outcome
    * histogram joined to the broadcast-literal block table — output
    * `(score, n, n_pos, rate)` with `rate` monotone in `score`. The whole
    * chain is dynamic-oracle-checkable (the q217 contract: the PAV fit is
    * outside SQL, the blocks are literals, the stats and the rate divide
    * are mirrored).
    */
  def isotonicCalibrate(scored: DataFrame, blocks: Seq[IsoBlock],
      scoreCol: String = "score", labelCol: String = "keep"): DataFrame = {
    val spark = scored.sparkSession
    import spark.implicits._
    val bdf = blocks.map(b => (b.lo, b.hi, b.n, b.pos))
      .toDF("_lo", "_hi", "_bn", "_bp")
    // out-of-sample scores clamp to the nearest fitted block (the standard
    // isotonic extrapolation: constant beyond the training range) — an
    // inner join on the raw score would silently DROP them
    val minLo = blocks.map(_.lo).min
    val maxHi = blocks.map(_.hi).max
    scored.where(col(scoreCol).isNotNull)
      .groupBy(col(scoreCol).cast("long").as("score"))
      .agg(count(lit(1)).as("n"),
        sum(when(col(labelCol), 1L).otherwise(0L)).as("n_pos"))
      .withColumn("_sc",
        greatest(least(col("score"), lit(maxHi)), lit(minLo)))
      .join(broadcast(bdf),
        col("_sc") >= col("_lo") && col("_sc") <= col("_hi"))
      .select(col("score"), col("n"), col("n_pos"),
        round(col("_bp").cast("double") / col("_bn"), 6).as("rate"))
  }

  /** Deterministic bootstrap confidence interval on a per-group mean —
    * the error bars for the corpus quality dashboard ([[jackknifeMean]]
    * reads leave-one-GROUP-out sensitivity; this reads within-group
    * sampling noise). Classic Poisson bootstrap made reproducible: row r's
    * multiplicity in replicate b is a Poisson(1) draw read off the
    * deterministic `hash60(id:b:salt) mod 10000` uniform against the fixed
    * integer pmf thresholds (0.3679/0.3679/0.1839/0.0613/0.0153 mass on
    * 0..4, remainder 5) — no RNG state, identical in any engine, and the
    * replicate loop rides IN-ROW (one explode), so the pass stays one scan
    * + one (group, b)-keyed agg. The CI is the order-statistic interval of
    * the `b` replicate means: `lo = sorted[ceil(alpha·b)]`,
    * `hi = sorted[b + 1 − ceil(alpha·b)]` (1-based) — the per-group sort
    * runs on a `b`-element in-row array, never on data.
    * Output `(group, n, mean, ci_lo, ci_hi)` at 6dp; integer-unit
    * `valueUnits` by contract, `scale` maps units back (the [[abTest]]
    * convention). Degenerate all-zero-weight replicates (possible only for
    * tiny groups) drop out of the order statistics.
    */
  def bootstrapCi(df: DataFrame, groupCol: String, idCol: String,
      valueUnits: Column, scale: Double, b: Int = 32, alpha: Double = 0.1,
      salt: String = "boot"): DataFrame = {
    require(b >= 4 && alpha > 0 && alpha < 0.5, "need b >= 4, 0 < alpha < .5")
    val loIdx = math.ceil(alpha * b).toInt.max(1)
    val hiIdx = b + 1 - loIdx
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val rows = df.select(col(groupCol).as("_g"), col(idCol).as("_id"),
        valueUnits.cast("long").as("_x"))
      .where(col("_x").isNotNull)
      .select(col("_g"), col("_x"), col("_id"),
        explode(sequence(lit(0), lit(b - 1))).as("_b"))
      .withColumn("_u", graft.functions.Hash60(concat(
        col("_id").cast("string"), lit(":"), col("_b").cast("string"),
        lit(":" + salt))) % 10000L)
      .withColumn("_w",
        when(col("_u") < 3679, 0L).when(col("_u") < 7358, 1L)
          .when(col("_u") < 9197, 2L).when(col("_u") < 9810, 3L)
          .when(col("_u") < 9963, 4L).otherwise(5L))
    val reps = rows.groupBy(col("_g"), col("_b"))
      .agg(sum(col("_w").cast(dec) * col("_x")).as("_swx"),
        sum(col("_w")).as("_sw"))
      .where(col("_sw") > 0)
      .select(col("_g"),
        round(col("_swx").cast("double") / col("_sw") / scale, 6).as("_m"))
    val base = df.select(col(groupCol).as("_g"),
        valueUnits.cast("long").as("_x"))
      .where(col("_x").isNotNull)
      .groupBy(col("_g"))
      .agg(count(lit(1)).as("n"), sum(col("_x").cast(dec)).as("_sx"))
    // base LEFT JOIN the replicate means: a group whose every replicate
    // degenerated to zero weight still reports its n/mean, with NULL CI
    // bounds (element_at on a NULL array) — never a silently dropped row
    base.join(
        reps.groupBy(col("_g"))
          .agg(sort_array(collect_list(col("_m"))).as("_ms")),
        Seq("_g"), "left")
      .select(col("_g").as(groupCol), col("n"),
        round(col("_sx").cast("double") / col("n") / scale, 6).as("mean"),
        element_at(col("_ms"), least(lit(loIdx), size(col("_ms"))))
          .as("ci_lo"),
        element_at(col("_ms"), least(lit(hiIdx), size(col("_ms"))))
          .as("ci_hi"))
  }

  /** CUPED variance reduction for the A/B readout ([[abTest]]'s
    * experimentation companion): adjust each unit's post-period metric by
    * its own PRE-period covariate, `ŷ = y − θ(x − x̄)` with
    * `θ = cov(x, y)/var(x)` estimated over all units pooled — the standard
    * trick that removes the between-user variance both variants share,
    * shrinking the standard error while leaving the treatment-effect
    * estimate unbiased under randomization. Input: per-unit
    * `(variant, x, y)` with integer-unit metrics (pre-scale, the [[abTest]]
    * contract); output one row per variant
    * `(variant, n, mean_y, mean_adj, theta, var_y, var_adj,
    * var_reduction)` at 6dp — everything closed form from ONE pass of
    * pooled power sums (Σx, Σy, Σx², Σy², Σxy in DECIMAL(38) — exact; no
    * per-unit adjusted column ever materializes) plus the per-variant
    * (n, Σx, Σy) agg. θ guards a constant covariate (var(x)=0 → θ=0, no
    * adjustment).
    */
  def cuped(units: DataFrame, scale: Double,
      variantCol: String = "variant", xCol: String = "x",
      yCol: String = "y"): DataFrame = {
    val dec = "decimal(38,0)"
    def dx = col(xCol).cast(dec)
    def dy = col(yCol).cast(dec)
    // a unit with a NULL metric is not an observation (the kendallTau
    // convention): count(*) would keep it while the sums skip it, silently
    // desynchronizing every mean/variance denominator
    val obs = units.where(col(xCol).isNotNull && col(yCol).isNotNull)
    val g = obs.groupBy(col(variantCol).as("variant")).agg(
      count(lit(1)).cast(dec).as("n"),
      sum(dx).as("sx"), sum(dy).as("sy"))
    val tot = obs.agg(
      count(lit(1)).cast(dec).as("tn"),
      sum(dx).as("tsx"), sum(dy).as("tsy"),
      sum(dx * dx).as("tsxx"), sum(dy * dy).as("tsyy"),
      sum(dx * dy).as("tsxy"))
    val s2 = lit(scale * scale)
    val covxy = (col("tn") * col("tsxy") - col("tsx") * col("tsy"))
      .cast("double") / (col("tn") * col("tn")).cast("double") / s2
    val varx = (col("tn") * col("tsxx") - col("tsx") * col("tsx"))
      .cast("double") / (col("tn") * col("tn")).cast("double") / s2
    val vary = (col("tn") * col("tsyy") - col("tsy") * col("tsy"))
      .cast("double") / (col("tn") * col("tn")).cast("double") / s2
    val theta = when(varx > 0.0, covxy / varx).otherwise(lit(0.0))
    val meanY = col("sy").cast("double") / col("n").cast("double") / scale
    val meanX = col("sx").cast("double") / col("n").cast("double") / scale
    val meanXAll = col("tsx").cast("double") / col("tn").cast("double") / scale
    g.crossJoin(broadcast(tot)).select(
      col("variant"), col("n").cast("long").as("n"),
      round(meanY, 6).as("mean_y"),
      round(meanY - theta * (meanX - meanXAll), 6).as("mean_adj"),
      round(theta, 6).as("theta"),
      round(vary, 6).as("var_y"),
      round(vary - theta * covxy, 6).as("var_adj"),
      round(when(vary > 0.0, theta * covxy / vary).otherwise(lit(0.0)), 6)
        .as("var_reduction"))
  }

  /** Kendall rank correlation τ-b between two integer-unit columns —
    * tie-corrected, exact, computed entirely from the bounded joint
    * histogram (both columns must be resolution-bounded by contract, the
    * [[ksStat]] rule). Complements [[spearmanByGroup]]: Spearman reads
    * monotone association through ranks, τ-b reads it through concordant
    * vs discordant PAIRS — robust to the heavy ties integer-unit scores
    * produce. One row: `(n, tau)` at 6dp (0.0 when either margin is all
    * ties, where τ-b is undefined).
    *
    * Closed form without touching pairs: on the DENSE |X|×|Y| grid,
    * strictly-less 2D prefix sums give each cell its concordant
    * (`x'<x, y'<y`) and discordant (`x'<x, y'>y`) mass — two
    * constant-size window passes (each partitioned by one axis over the
    * bounded grid) plus a broadcast margin self-join; C, D, and the tie
    * terms accumulate in DECIMAL(38) so corpus-scale n² never overflows.
    * τ-b = 2(C−D)/√((n(n−1)−Σtₓ(tₓ−1))·(n(n−1)−Σt_y(t_y−1))).
    */
  def kendallTau(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val d38 = DecimalType(38, 0)
    val j = df.select(col(xCol).cast("long").as("_x"),
        col(yCol).cast("long").as("_y"))
      .where(col("_x").isNotNull && col("_y").isNotNull)
      .groupBy(col("_x"), col("_y")).agg(count(lit(1)).as("_c"))
      .localCheckpoint(eager = false)
    val grid = j.select(col("_x")).distinct()
      .crossJoin(broadcast(j.select(col("_y")).distinct()))
      .join(j, Seq("_x", "_y"), "left")
      .select(col("_x"), col("_y"), coalesce(col("_c"), lit(0L)).as("_c"))
    // strictly-less-in-y running sums within each x column (dense grid ⇒
    // ROWS ≡ RANGE), then strictly-less-in-x sums of those within each y
    val wyLt = Window.partitionBy(col("_x")).orderBy(col("_y"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wyLe = Window.partitionBy(col("_x")).orderBy(col("_y"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val wxLt = Window.partitionBy(col("_y")).orderBy(col("_x"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val s = grid
      .withColumn("_ay", coalesce(sum(col("_c")).over(wyLt), lit(0L)))
      .withColumn("_ayle", sum(col("_c")).over(wyLe))
      .withColumn("_slt", coalesce(sum(col("_ay")).over(wxLt), lit(0L)))
      .withColumn("_sle", coalesce(sum(col("_ayle")).over(wxLt), lit(0L)))
    val tx = j.groupBy(col("_x")).agg(sum(col("_c")).as("_tx"))
    val ty = j.groupBy(col("_y")).agg(sum(col("_c")).as("_ty"))
    // strictly-below-x margin totals via the bounded-histogram self-join
    val txLt = tx.select(col("_x"))
      .join(broadcast(tx.select(col("_x").as("_u"), col("_tx"))),
        col("_u") < col("_x"), "left")
      .groupBy(col("_x")).agg(coalesce(sum(col("_tx")), lit(0L)).as("_txlt"))
    val cd = s.join(broadcast(txLt), Seq("_x"))
      .where(col("_c") > 0)
      .select((col("_c").cast(d38) * col("_slt")).as("_tc"),
        (col("_c").cast(d38) * (col("_txlt") - col("_sle"))).as("_td"))
      .agg(coalesce(sum(col("_tc")), lit(0L).cast(d38)).as("_cc"),
        coalesce(sum(col("_td")), lit(0L).cast(d38)).as("_dd"))
    val n = j.agg(sum(col("_c")).as("_n"))
    val n1 = tx.agg(sum(col("_tx").cast(d38) * (col("_tx") - 1)).as("_n1"))
    val n2 = ty.agg(sum(col("_ty").cast(d38) * (col("_ty") - 1)).as("_n2"))
    cd.crossJoin(broadcast(n)).crossJoin(broadcast(n1))
      .crossJoin(broadcast(n2))
      .select(col("_n"),
        (col("_n").cast(d38) * (col("_n") - 1) - col("_n1")).as("_da"),
        (col("_n").cast(d38) * (col("_n") - 1) - col("_n2")).as("_db"),
        col("_cc"), col("_dd"))
      .select(col("_n").as("n"),
        round(when(col("_da") > 0 && col("_db") > 0,
            lit(2.0) * (col("_cc") - col("_dd")).cast("double") /
              sqrt(col("_da").cast("double") * col("_db").cast("double")))
          .otherwise(lit(0.0)), 6).as("tau"))
  }

  /** Two-sample Kolmogorov–Smirnov statistic `sup_v |F_a(v) − F_b(v)|` —
    * the worst single CDF gap between two numeric samples. Completes the
    * drift triad: [[psi]] is bin-blind, [[wasserstein1]] integrates the gap
    * (a localized shift averages away), KS reads the one worst point, so it
    * flags a narrow distribution shift the other two smooth over. One row:
    * `(n_a, n_b, ks)` at 6dp. Inputs: two frames with a numeric `valueCol`
    * whose distinct-value set is bounded by contract (e.g. 4dp scores).
    *
    * Determinism contract: per merged distinct value the gap
    * `|F_a/n_a − F_b/n_b|` is one double over exact longs rounded 8dp;
    * `max` is order-independent so no DECIMAL fold is needed. Scale shape =
    * [[wasserstein1]] minus the next-value step: one hash agg per side to
    * value histograms, CDFs as broadcast ≤ self-joins on the bounded
    * merged-value frame, then a single max — no global sort, no windows.
    */
  def ksStat(a: DataFrame, b: DataFrame, valueCol: String): DataFrame = {
    val (_, cdfs, na, nb) = mergedCdf(a, b, valueCol)
    // global aggregate + coalesce, NOT a groupBy on (_na, _nb): exactly
    // wasserstein1's degenerate-input shape, so the two drift stats over the
    // shared mergedCdf staging behave identically at the edges — empty
    // inputs yield ONE well-formed row (ks 0.0, the empty side's n NULL)
    // instead of zero rows / a NULL ks
    cdfs
      .crossJoin(broadcast(na)).crossJoin(broadcast(nb))
      .select(round(abs(col("_fa").cast("double") / col("_na") -
        col("_fb").cast("double") / col("_nb")), 8).as("_g"))
      .agg(max(col("_g")).as("_ks"))
      .crossJoin(broadcast(na)).crossJoin(broadcast(nb))
      .select(col("_na").as("n_a"), col("_nb").as("n_b"),
        round(coalesce(col("_ks"), lit(0.0)), 6).as("ks"))
  }

  /** Leave-one-group-out (jackknife) sensitivity of a corpus-level mean:
    * for each group, the mean of `valueCol` over all OTHER groups, its
    * delta vs the full mean, plus the group's own weight — the "which
    * source is dragging my quality metric" audit. Output
    * `(left_out, n_rest, mean_rest, delta)` at 6dp.
    *
    * Scale shape: ONE hash agg over the corpus to per-group
    * (Σ rounded-DECIMAL value, count); every leave-one-out mean is then
    * closed-form from the global totals minus the group's —
    * `(S − S_g) / (N − n_g)` — on the bounded per-group frame. No
    * per-group rescans, no windows; exact DECIMAL sums make each mean
    * reduction-order-independent.
    */
  def jackknifeMean(df: DataFrame, groupCol: String,
      valueCol: String): DataFrame = {
    val per = df.select(col(groupCol).as("_g"),
        round(col(valueCol), 6).cast("decimal(28,6)").as("_v"))
      .groupBy(col("_g"))
      .agg(sum(col("_v")).as("_sg"), count(lit(1)).as("_ng"))
      .localCheckpoint(eager = false)
    val tot = per.agg(sum(col("_sg")).as("_s"), sum(col("_ng")).as("_n"))
    per.crossJoin(broadcast(tot))
      .where(col("_n") > col("_ng"))
      .select(col("_g").as("left_out"),
        (col("_n") - col("_ng")).as("n_rest"),
        round((col("_s") - col("_sg")).cast("double") /
          (col("_n") - col("_ng")), 6).as("mean_rest"),
        round((col("_s") - col("_sg")).cast("double") /
            (col("_n") - col("_ng")) -
          col("_s").cast("double") / col("_n"), 6).as("delta"))
  }

  /** Per-group two-sample KS drift with Benjamini–Hochberg FDR control —
    * the multiple-testing closure of the drift family ([[ksStat]] asks "did
    * THIS stream drift"; a 20-source dashboard asking it 20 times at
    * α = .05 false-alarms weekly by construction). Per group the KS D
    * between the `sideCol = false` and `sideCol = true` samples of the
    * integer-unit `valueCol` feeds the one-term asymptotic bound
    * `p = min(1, 2·e^{−2D²·n_a n_b/(n_a+n_b)})`, and BH keeps the groups
    * up to the largest rank i with `p_(i) ≤ α·i/m`. Output per group:
    * `(group, n_a, n_b, ks, p_value, bh_rank, alarm)`.
    *
    * Determinism: CDF gaps are doubles over exact longs rounded 8dp (the
    * [[ksStat]] rule); the exp argument is rounded 8dp before `exp`; p is
    * compared against `α·rank/m` evaluated in the same operand order both
    * engines. Scale shape: one (group, value) hash agg, CDFs by
    * group-equi + range self-join on the bounded per-group value frame
    * (the score-resolution contract bounds it), then every BH step on the
    * ≤|groups|-row frame — no windows, no sorts.
    */
  def fdrDrift(df: DataFrame, groupCol: String, valueCol: String,
      sideCol: String, alpha: Double = 0.05): DataFrame = {
    val base = df.select(col(groupCol).as("_g"),
        col(valueCol).cast("long").as("_v"), col(sideCol).as("_l"))
      .where(col("_v").isNotNull && col("_l").isNotNull)
    val hist = base.groupBy(col("_g"), col("_v"))
      .agg(sum(when(col("_l"), 0L).otherwise(1L)).as("_ca"),
        sum(when(col("_l"), 1L).otherwise(0L)).as("_cb"))
      .localCheckpoint(eager = false)
    val totals = hist.groupBy(col("_g"))
      .agg(sum(col("_ca")).as("_na"), sum(col("_cb")).as("_nb"))
    val cdf = hist.select(col("_g"), col("_v"))
      .join(hist.select(col("_g"), col("_v").as("_u"),
        col("_ca"), col("_cb")), Seq("_g"))
      .where(col("_u") <= col("_v"))
      .groupBy(col("_g"), col("_v"))
      .agg(sum(col("_ca")).as("_fa"), sum(col("_cb")).as("_fb"))
    val ks = cdf.join(totals, Seq("_g"))
      .where(col("_na") > 0 && col("_nb") > 0)
      .select(col("_g"), col("_na"), col("_nb"),
        round(abs(col("_fa").cast("double") / col("_na") -
          col("_fb").cast("double") / col("_nb")), 8).as("_gap"))
      .groupBy(col("_g"), col("_na"), col("_nb"))
      .agg(max(col("_gap")).as("_ks"))
    val p = ks.select(col("_g"), col("_na"), col("_nb"), col("_ks"),
      round(least(lit(1.0), lit(2.0) * exp(round(lit(-2.0) *
        col("_ks") * col("_ks") *
        (col("_na").cast("double") * col("_nb").cast("double")) /
        (col("_na") + col("_nb")).cast("double"), 8))), 8).as("_p"))
      .localCheckpoint(eager = false)
    val m = p.agg(count(lit(1)).as("_mm"))
    val ranked = p
      .join(broadcast(p.select(col("_g").as("_g2"), col("_p").as("_p2"))),
        col("_p2") < col("_p") ||
          (col("_p2") === col("_p") && col("_g2") <= col("_g")))
      .groupBy(col("_g"), col("_na"), col("_nb"), col("_ks"), col("_p"))
      .agg(count(lit(1)).as("_rank"))
      .crossJoin(broadcast(m))
      .withColumn("_ok", col("_p") <=
        lit(alpha) * col("_rank").cast("double") / col("_mm").cast("double"))
      .localCheckpoint(eager = false)
    ranked
      .join(broadcast(ranked.select(col("_rank").as("_r2"), col("_ok").as("_ok2"))),
        col("_r2") >= col("_rank"), "left")
      .groupBy(col("_g"), col("_na"), col("_nb"), col("_ks"),
        col("_p"), col("_rank"))
      .agg(max(when(col("_ok2"), 1).otherwise(0)).as("_al"))
      .select(col("_g").as("group"), col("_na").as("n_a"), col("_nb").as("n_b"),
        round(col("_ks"), 6).as("ks"), col("_p").as("p_value"),
        col("_rank").as("bh_rank"), (col("_al") === 1).as("alarm"))
  }

  /** Mondrian (per-group) split-conformal interval for an integer-unit
    * score — the distribution-free "how wrong is a per-source point
    * estimate" wrapper: within each group the CALIBRATION rows
    * (`calCol = true`) give a median predictor and the
    * `⌈(n+1)·(1−α)⌉`-th order statistic of |score − median| as the
    * conformal radius; the holdout rows measure empirical coverage, which
    * the conformal guarantee lower-bounds by 1−α under exchangeability.
    * `α = alphaNum/alphaDen` stays RATIONAL so the order-statistic index
    * is exact integer arithmetic (`⌈(n+1)·(d−a)/d⌉`, no float boundary) —
    * the q190 integer-unit rule applied to a quantile INDEX. Output per
    * group: `(group, n_cal, n_eval, median_u, qhat_u, coverage)` — units
    * stay the caller's integer units, coverage one 6dp divide.
    *
    * Scale shape: (group, unit) hash aggs for both the score and residual
    * histograms; every order statistic is an exact-count cumulative on the
    * bounded per-group unit frame (group-equi + range self-join per the
    * score-resolution contract); no windows, no sorts, nothing driver-side.
    */
  def conformalInterval(df: DataFrame, groupCol: String, valueCol: String,
      calCol: String, alphaNum: Int = 1, alphaDen: Int = 10): DataFrame = {
    require(alphaNum > 0 && alphaNum < alphaDen,
      s"conformal alpha must be in (0,1): $alphaNum/$alphaDen")
    val base = df.select(col(groupCol).as("_g"),
        col(valueCol).cast("long").as("_v"), col(calCol).as("_cal"))
      .where(col("_v").isNotNull && col("_cal").isNotNull)
      .localCheckpoint(eager = false)
    def orderStat(values: DataFrame, kOf: Column): DataFrame = {
      // smallest unit whose cumulative count reaches k (exact integers)
      val h = values.groupBy(col("_g"), col("_v"))
        .agg(count(lit(1)).as("_c"))
      val n = h.groupBy(col("_g")).agg(sum(col("_c")).as("_n"))
      h.select(col("_g"), col("_v"))
        .join(h.select(col("_g"), col("_v").as("_u"), col("_c")), Seq("_g"))
        .where(col("_u") <= col("_v"))
        .groupBy(col("_g"), col("_v")).agg(sum(col("_c")).as("_cum"))
        .join(n.select(col("_g"), col("_n"), kOf.as("_k")), Seq("_g"))
        .where(col("_cum") >= col("_k"))
        .groupBy(col("_g"), col("_n")).agg(min(col("_v")).as("_stat"))
    }
    // per-group calibration median: k = ⌈n/2⌉ = (n+1) div 2 (lower median
    // for even n; `div` keeps the index integer-exact in both engines)
    val med = orderStat(base.where(col("_cal")), expr("(_n + 1) div 2"))
      .select(col("_g"), col("_n").as("n_cal"), col("_stat").as("median_u"))
      .localCheckpoint(eager = false)
    // conformal radius: the ⌈(n+1)·(den−num)/den⌉-th smallest |v − median|,
    // clamped to n (the finite-sample split-conformal index)
    val kExpr = expr(
      s"least(_n, ((_n + 1) * ${alphaDen - alphaNum} + ${alphaDen - 1}) div $alphaDen)")
    val qhat = orderStat(
      base.where(col("_cal"))
        .join(med.select(col("_g"), col("median_u")), Seq("_g"))
        .select(col("_g"), abs(col("_v") - col("median_u")).as("_v")),
      kExpr)
      .select(col("_g"), col("_stat").as("qhat_u"))
    // holdout coverage: share of eval rows with |v − median| ≤ qhat
    base.where(!col("_cal"))
      .join(med.select(col("_g"), col("median_u")), Seq("_g"))
      .join(qhat, Seq("_g"))
      .groupBy(col("_g"))
      .agg(count(lit(1)).as("n_eval"),
        sum(when(abs(col("_v") - col("median_u")) <= col("qhat_u"), 1L)
          .otherwise(0L)).as("_cov"))
      .join(med, Seq("_g")).join(qhat, Seq("_g"))
      .select(col("_g").as("group"), col("n_cal"), col("n_eval"),
        col("median_u"), col("qhat_u"),
        round(col("_cov").cast("double") / col("n_eval").cast("double"), 6)
          .as("coverage"))
  }
}
