package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** End-to-end corpus curation — the full training-data hygiene pipeline a
  * pre-training corpus runs, composed from the individually-verified
  * operators in execution order:
  *
  *   1. quality filter ([[TextAnalysis.stats]] score ≥ `minQuality`);
  *   2. exact dedup, keep the canonical (min-id) copy ([[Dedup.exact]]);
  *   3. near-dup dedup: MinHash+LSH detect → connected components → keep
  *      one doc per group ([[Dedup.minhashDedup]] → [[Dedup.canonicalGroups]]
  *      → [[Dedup.applyDedup]]);
  *   4. eval-set decontamination ([[Dedup.decontaminate]]).
  *
  * Scale posture: every stage is a semi/anti-join projection of the previous
  * survivor set — per-row column math, hash groupBys, and band equi-joins;
  * the whole pipeline shuffles ∝ corpus size and never materializes a
  * doc-pair space. Stage order matters and is part of the contract (dedup
  * canonicals are chosen among QUALITY-PASSING docs; contamination is only
  * paid for survivors).
  */
object Pipeline {

  /** Returns the surviving rows of `docs` (all original columns). Both
    * frames follow the standard `(doc_id, text, …)` document contract.
    */
  def curate(
      docs: DataFrame,
      evalDocs: DataFrame,
      minQuality: Double,
      jaccardThreshold: Double,
      maxOverlap: Double): DataFrame = {
    // 1. quality floor
    val passing = TextAnalysis.stats(docs)
      .where(col("quality") >= minQuality).select(col("doc_id"))
    val d1 = docs.join(passing, Seq("doc_id"), "left_semi")
    // 2. exact dedup (canonical = min id among identical quality-passing texts)
    val exactKept = Dedup.exact(d1)
      .where(col("doc_id") === col("canon_id")).select(col("doc_id"))
    val d2 = d1.join(exactKept, Seq("doc_id"), "left_semi")
    // 3. near-dup dedup over the exact-deduped survivors
    val d3 = Dedup.applyDedup(d2,
      Dedup.canonicalGroups(d2, Dedup.minhashDedup(d2, jaccardThreshold)))
    // 4. eval decontamination of what remains
    Dedup.decontaminate(d3, evalDocs, maxOverlap)
  }

  /** Curation v2 — the extended signal set composed end-to-end: the
    * Gopher/C4-style rule gate ([[TextAnalysis.ruleFilter]]), the
    * corpus-trained bigram-LM familiarity floor
    * ([[TextAnalysis.ngramLmScore]]; the LM trains on the input corpus
    * itself, and docs too short to carry a bigram fail the floor), then the
    * [[curate]] dedup chain: exact dedup → near-dup canonical grouping →
    * eval-set decontamination. Same all-semi-join scale shape as [[curate]].
    */
  def curateV2(
      docs: DataFrame,
      evalDocs: DataFrame,
      minLmScore: Double,
      jaccardThreshold: Double,
      maxOverlap: Double): DataFrame = {
    val ruleKeep = TextAnalysis.ruleFilter(docs)
      .where(col("keep")).select(col("doc_id"))
    val lmKeep = TextAnalysis.ngramLmScore(docs)
      .where(col("lm_score") >= minLmScore).select(col("doc_id"))
    val d1 = docs
      .join(ruleKeep, Seq("doc_id"), "left_semi")
      .join(lmKeep, Seq("doc_id"), "left_semi")
    val exactKept = Dedup.exact(d1)
      .where(col("doc_id") === col("canon_id")).select(col("doc_id"))
    val d2 = d1.join(exactKept, Seq("doc_id"), "left_semi")
    val d3 = Dedup.applyDedup(d2,
      Dedup.canonicalGroups(d2, Dedup.minhashDedup(d2, jaccardThreshold)))
    Dedup.decontaminate(d3, evalDocs, maxOverlap)
  }

  /** Domain-mixture sampling — the corpus-assembly step that downweights
    * over-represented sources to hit a target mixture. Keeps a doc iff its
    * deterministic uniform draw `u = hash60(doc_id:salt) mod 10000` falls
    * under `weight(source)·10000`; unlisted sources use `defaultWeight`.
    * The draw is a pure per-row hash of the id (NOT the text), so re-runs
    * and engine mirrors agree exactly, and changing `salt` re-draws without
    * correlation to the previous sample. No shuffle — a filter at scan
    * speed; expected kept fraction per source = its weight.
    */
  /** A weight's integer keep-threshold: the 10000-sided hash draw keeps the
    * doc iff `u < round(wt·10000)`. Precomputed ONCE here and embedded as the
    * SAME integer literal in both dialects — comparing the integer draw
    * against a double product (`u < wt*10000.0`) would let a boundary draw
    * land on either side of a non-exactly-representable product (e.g. 0.07)
    * depending on each engine's float evaluation.
    */
  private def weightThreshold(wt: Double): Long = math.round(wt * 10000.0)

  /** The shared draw/threshold pair: `u` = the doc's deterministic
    * 10000-sided hash draw, `thr` = its source's integer threshold.
    * [[mixtureSample]] and [[mixtureUpsample]] both decide the fractional
    * keep as `u < thr mod 10000` (for weights ≤ 1, `thr` IS the fractional
    * part), so sharing this single definition is what makes the two
    * operators provably agree on which docs a fractional weight keeps.
    */
  private def drawAndThreshold(
      weights: Seq[(String, Double)],
      defaultWeight: Double,
      salt: String,
      idCol: String,
      sourceCol: String): (org.apache.spark.sql.Column, org.apache.spark.sql.Column) = {
    val u = graft.functions.Hash60(
      concat(col(idCol).cast("string"), lit(":" + salt))) % 10000L
    val thr = weights.reverse.foldLeft(lit(weightThreshold(defaultWeight))) {
      case (acc, (src, wt)) =>
        when(col(sourceCol) === src, lit(weightThreshold(wt))).otherwise(acc)
    }
    (u, thr)
  }

  def mixtureSample(
      docs: DataFrame,
      weights: Seq[(String, Double)],
      defaultWeight: Double = 1.0,
      salt: String = "mix",
      idCol: String = "doc_id",
      sourceCol: String = "source"): DataFrame = {
    val (u, thr) = drawAndThreshold(weights, defaultWeight, salt, idCol, sourceCol)
    docs.where(u < thr)
  }

  /** DuckDB predicate mirroring [[mixtureSample]]'s keep condition — the
    * integer thresholds come from the same [[weightThreshold]] computation.
    */
  def mixtureSampleSql(
      weights: Seq[(String, Double)],
      defaultWeight: Double,
      salt: String): String = {
    val u = graft.functions.Hash60.sql(s"doc_id::VARCHAR || ':$salt'") + " % 10000"
    val cases = weights.map { case (src, wt) =>
      s"WHEN source = '$src' THEN ${weightThreshold(wt)}" }.mkString(" ")
    s"($u) < (CASE $cases ELSE ${weightThreshold(defaultWeight)} END)"
  }

  /** Mixture sampling with UPSAMPLING: weights above 1 emit multiple copies
    * of a document (high-quality sources are repeated in real pre-training
    * mixtures — e.g. weight 2.3 means every doc appears twice and 30% of
    * docs a third time), weights at or below 1 downsample exactly like
    * [[mixtureSample]]. Copies come from `floor(w)` whole repeats plus one
    * more when the doc's deterministic hash draw lands under the fractional
    * part; the draw reuses [[mixtureSample]]'s integer-threshold contract
    * (`thr = round(w·10000)`: whole copies `thr div 10000`, fractional keep
    * iff `u < thr mod 10000`), so the two operators agree on which docs the
    * fractional part keeps. Output adds a `rep` column (0-based copy index)
    * so downstream shuffles see distinct rows. Zero-shuffle: a scan-speed
    * generate per row — the 100 TB shape (never materialize repeats through
    * an exchange; let the terminal writer stream them out).
    */
  def mixtureUpsample(
      docs: DataFrame,
      weights: Seq[(String, Double)],
      defaultWeight: Double = 1.0,
      salt: String = "mix",
      idCol: String = "doc_id",
      sourceCol: String = "source"): DataFrame = {
    val (u, thr) = drawAndThreshold(weights, defaultWeight, salt, idCol, sourceCol)
    val copies = floor(thr / lit(10000L)).cast("long") +
      when(u < thr % 10000L, lit(1L)).otherwise(lit(0L))
    // guard BEFORE sequence: Spark's sequence(0, -1) DESCENDS (yields
    // [0, -1]) instead of being empty, so zero-copy docs must be filtered
    // out first, exactly as the SQL mirror's WHERE does
    docs.withColumn("_copies", copies)
      .where(col("_copies") > 0)
      .withColumn("rep", explode(sequence(lit(0L), col("_copies") - 1)))
      .drop("_copies")
  }

  /** DuckDB mirror of [[mixtureUpsample]] restricted to the oracle's
    * projection: emits `(doc_id, rep, source)` rows by unnesting the scalar
    * list form of `generate_series` (the lateral table-function form rejects
    * column arguments in DuckDB 1.0) against the same integer thresholds.
    */
  def mixtureUpsampleSql(
      weights: Seq[(String, Double)],
      defaultWeight: Double,
      salt: String): String = {
    val u = graft.functions.Hash60.sql(s"doc_id::VARCHAR || ':$salt'") + " % 10000"
    val cases = weights.map { case (src, wt) =>
      s"WHEN source = '$src' THEN ${weightThreshold(wt)}" }.mkString(" ")
    s"""WITH c AS (
       |  SELECT doc_id, source,
       |         (CASE $cases ELSE ${weightThreshold(defaultWeight)} END) // 10000
       |         + (CASE WHEN ($u) < (CASE $cases ELSE ${weightThreshold(defaultWeight)} END) % 10000
       |            THEN 1 ELSE 0 END) AS copies
       |  FROM documents)
       |SELECT doc_id, unnest(generate_series(0, copies - 1)) AS rep, source
       |FROM c WHERE copies > 0""".stripMargin
  }

  /** Adaptive per-source quality floor: keep the documents whose quality
    * score sits at or above their OWN source's `quantile` percentile —
    * unlike a fixed threshold, each domain keeps its best (100·(1−q))%
    * regardless of how its score distribution is shifted (web junk and
    * curated prose get floored on their own scales).
    *
    * Semantics: `percent_rank` over quality PER SOURCE (standard SQL tie
    * handling — a whole tie group shares one rank, so the boundary quality
    * keeps or drops as a unit), i.e. keep iff
    * `(#docs in source with lower quality) ≥ quantile · (n − 1)`.
    *
    * Scale shape (the 100 TB path, NOT a per-source window): sources are few
    * relative to docs, so `Window.partitionBy(source)` over the raw corpus
    * would sort a whole domain — tens of TB — in ONE task. Instead the
    * percentile THRESHOLD is computed from a per-source quality histogram
    * (quality is a 4-dp-rounded ratio, so distinct values are bounded ≈10⁴
    * per source regardless of corpus size — the histogram is tiny) and the
    * corpus is filtered by a broadcast threshold join: one map-side-partial
    * groupBy over the docs + a scan-speed filter; the only windows run over
    * the histogram. The same cutoff-not-total-order shape as the reference's
    * posting truncation (`ExtraFullGraphSearcher.h:744-760`); at even larger
    * distinct-value counts, swap the exact histogram for
    * `approx_percentile` — the operator contract stays "filter by a
    * per-source threshold".
    */
  /** Exact GLOBAL quantile table of the quality score — the dataset-card
    * numbers ("median quality", "p90") computed without a global sort.
    * Output one `(pct, value)` row per requested percentile: `value` =
    * the smallest quality with cumulative count ≥ ⌈pct·n/100⌉ (type-1 /
    * `quantile_disc` semantics), formed entirely from integer counts —
    * `100·cum ≥ pct·n` avoids the float ceil.
    *
    * Scale shape: quality is a 4dp-rounded ratio, so the per-VALUE count
    * frame is bounded by score resolution (≤ ~10⁴ rows) no matter the
    * corpus; the cumulative counts come from a `≤` self-join of that
    * bounded frame (broadcast, the q147 pattern) — not a partition-less
    * window. The corpus-scale work is one map-side-partial groupBy.
    */
  def qualityQuantiles(docs: DataFrame, pcts: Seq[Int],
      textCol: String = "text"): DataFrame = {
    require(pcts.nonEmpty && pcts.forall(p => p >= 1 && p <= 100),
      "percentiles must be 1..100")
    val spark = docs.sparkSession
    import spark.implicits._
    val per = docs
      .groupBy(TextAnalysis.quality(col(textCol)).as("v"))
      .agg(count(lit(1)).as("c"))
    val tot = per.agg(sum(col("c")).as("n"))
    val cum = per.select(col("v"))
      .join(broadcast(per.select(col("v").as("_u"), col("c"))),
        col("_u") <= col("v"))
      .groupBy(col("v")).agg(sum(col("c")).as("cum"))
    cum.crossJoin(broadcast(tot))
      .crossJoin(broadcast(pcts.toDF("pct")))
      .where(col("cum") * 100 >= col("pct") * col("n"))
      .groupBy(col("pct")).agg(min(col("v")).as("value"))
  }

  def qualityQuantileFloor(
      docs: DataFrame,
      quantile: Double,
      idCol: String = "doc_id",
      textCol: String = "text",
      sourceCol: String = "source"): DataFrame = {
    val q = TextAnalysis.quality(col(textCol))
    val hist = docs
      .groupBy(col(sourceCol), q.as("_q"))
      .agg(count(lit(1)).as("_cnt"))
    val wBelow = Window.partitionBy(col(sourceCol)).orderBy(col("_q"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wAll = Window.partitionBy(col(sourceCol))
    // percent_rank of a quality value = (#docs strictly below) / (n − 1);
    // the single-doc source is pr = 0 by SQL convention (0/0 → 0)
    val thr = hist
      .withColumn("_below", coalesce(sum(col("_cnt")).over(wBelow), lit(0L)))
      .withColumn("_n", sum(col("_cnt")).over(wAll))
      .where(
        when(col("_n") === 1, lit(0.0))
          .otherwise(col("_below").cast("double") /
            (col("_n") - 1).cast("double")) >= quantile)
      .groupBy(col(sourceCol)).agg(min(col("_q")).as("_thr"))
    docs.join(broadcast(thr), Seq(sourceCol))
      .where(q >= col("_thr"))
      .drop("_thr")
  }

  /** The sketch-based variant of [[qualityQuantileFloor]] for corpora whose
    * per-source distinct-quality histogram itself gets large: the per-source
    * threshold comes from `approx_percentile` (a one-pass mergeable KLL-style
    * sketch — map-side partial like any aggregate), the filter join is
    * identical. Thresholds can differ from the exact form by the sketch's
    * rank-error ε = 1/accuracy, so this is NOT oracle-mirrored (sketch
    * internals are engine-specific); PipelineSpec bounds its disagreement
    * with the exact operator on fixture data.
    */
  def qualityQuantileFloorApprox(
      docs: DataFrame,
      quantile: Double,
      accuracy: Int = 10000,
      idCol: String = "doc_id",
      textCol: String = "text",
      sourceCol: String = "source"): DataFrame = {
    val q = TextAnalysis.quality(col(textCol))
    val thr = docs
      .groupBy(col(sourceCol))
      .agg(percentile_approx(q, lit(quantile), lit(accuracy)).as("_thr"))
    docs.join(broadcast(thr), Seq(sourceCol))
      .where(q >= col("_thr"))
      .drop("_thr")
  }

  /** DuckDB mirror of [[qualityQuantileFloor]]'s keep predicate, as a
    * projection + QUALIFY-style subquery body over `documents`. The oracle
    * states the SEMANTICS directly (percent_rank over quality, standard tie
    * handling); the Spark side reaches the same set via the histogram
    * threshold.
    */
  def qualityQuantileFloorSql(quantile: Double): String =
    s"""SELECT doc_id, source FROM (
       |  SELECT doc_id, source,
       |         percent_rank() OVER (PARTITION BY source
       |           ORDER BY ${TextAnalysis.Sql.qualityExpr}) AS pr
       |  FROM documents)
       |WHERE pr >= $quantile""".stripMargin

  /** Token-budget corpus selection: per source, take documents in
    * quality-descending order (UNROUNDED [[TextAnalysis.qualityRaw]], ties
    * by doc id) until the cumulative token count reaches `budget` — "fill N
    * tokens per domain with that domain's best documents", the terminal
    * corpus-assembly step once scores exist.
    * A doc is kept iff the running total INCLUDING it stays within budget
    * (documents larger than the remaining budget are skipped only if they
    * overflow it — no bin-packing backtrack, the deterministic greedy every
    * production pipeline uses). Output `(doc_id, source, cum_tokens)`.
    *
    * Scale shape — a TWO-LEVEL prefix sum, not a per-source window (which
    * would put a whole domain's total order in one task; sources are few
    * relative to docs). The [[packSequences]] bucketing pattern applied to an
    * ORDERED key: (1) a per-source quality histogram (tiny — quality is a
    * 4-dp-rounded ratio) assigns every distinct quality value a rank-balanced
    * bucket 0..`buckets−1`, bucket 0 = best; the bucket map is monotone in
    * the greedy order (round() is monotone, so rounded-value buckets are
    * order-consistent with the raw ordering key) and never splits a rounded
    * tie group, so concatenating buckets preserves the exact global
    * (qualityRaw DESC, id) order per source; (2) the
    * in-bucket running sum is a window over `(source, bucket)` — `buckets`×
    * the parallelism, balanced by construction up to tie mass; (3) each
    * bucket's starting offset is the cumsum of earlier buckets' totals — a
    * histogram-sized frame, broadcast back. Windows over raw docs partition
    * by (source, bucket); windows over source alone only ever see
    * histogram-sized aggregates.
    */
  def tokenBudgetSelect(
      docs: DataFrame,
      budget: Long,
      idCol: String = "doc_id",
      textCol: String = "text",
      sourceCol: String = "source",
      buckets: Int = 32): DataFrame =
    cumTokensBySource(docs, idCol, textCol, sourceCol, buckets)
      .where(col("cum_tokens") <= budget)
      .select(col(idCol), col(sourceCol), col("cum_tokens"))

  /** Mixture-budgeted corpus selection — [[tokenBudgetSelect]] with the
    * per-source budget set by the [[mixtureWeights]] α-tempered mixture
    * instead of one flat number: source `s` gets
    * `floor(weight_s · totalBudget)` tokens of its own best documents.
    * This is the one-plan composition a pretraining run actually executes
    * ("fill a 1T-token budget at the 0.5-temperature mixture, best docs
    * first"). Output `(doc_id, source, cum_tokens, src_budget)`.
    *
    * Scale: the weights/budgets frame is sources-sized (broadcast); the
    * selection is the same two-level prefix sum as tokenBudgetSelect. The
    * whole composition stays one Catalyst plan.
    */
  def mixtureBudgetSelect(
      docs: DataFrame,
      totalBudget: Long,
      alpha: Double = 0.5,
      idCol: String = "doc_id",
      textCol: String = "text",
      sourceCol: String = "source",
      buckets: Int = 32): DataFrame = {
    require(totalBudget > 0)
    val budgets = mixtureWeights(docs, alpha, textCol, sourceCol)
      .select(col(sourceCol),
        floor(col("weight") * totalBudget).cast("long").as("src_budget"))
    cumTokensBySource(docs, idCol, textCol, sourceCol, buckets)
      .join(broadcast(budgets), Seq(sourceCol))
      .where(col("cum_tokens") <= col("src_budget"))
      .select(col(idCol), col(sourceCol), col("cum_tokens"), col("src_budget"))
  }

  /** The shared greedy-prefix core of [[tokenBudgetSelect]] /
    * [[mixtureBudgetSelect]]: per source, every doc's cumulative token
    * count in (quality DESC, id) order, via the two-level bucketed prefix
    * sum documented on tokenBudgetSelect.
    */
  private def cumTokensBySource(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      sourceCol: String,
      buckets: Int): DataFrame = {
    // ordering key = the UNROUNDED score (4dp rounding is the q222
    // half-boundary class: Spark and DuckDB can round a boundary double
    // differently and reorder the greedy prefix); the histogram/bucket key
    // stays the ROUNDED value — bounded distinct values, and round() is
    // monotone so bucket order is consistent with the raw ordering key
    val base = docs.select(
      col(idCol), col(sourceCol),
      TextAnalysis.quality(col(textCol)).as("_q"),
      TextAnalysis.qualityRaw(col(textCol)).as("_qr"),
      size(TextAnalysis.tokens(col(textCol))).cast("long").as("_ntok"))
    // level 0: histogram → rank-balanced bucket per distinct quality value
    val hist = base.groupBy(col(sourceCol), col("_q")).agg(count(lit(1)).as("_cnt"))
    val wBefore = Window.partitionBy(col(sourceCol)).orderBy(col("_q").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val wAll = Window.partitionBy(col(sourceCol))
    val bucketMap = hist
      .withColumn("_before", coalesce(sum(col("_cnt")).over(wBefore), lit(0L)))
      .withColumn("_n", sum(col("_cnt")).over(wAll))
      .select(col(sourceCol), col("_q"),
        least(floor(col("_before") * buckets / col("_n")), lit(buckets - 1L))
          .cast("long").as("_bkt"))
    val withB = base.join(broadcast(bucketMap), Seq(sourceCol, "_q"))
    // level 1: in-bucket running sum (partition = source × bucket)
    val wIn = Window.partitionBy(col(sourceCol), col("_bkt"))
      .orderBy(col("_qr").desc, col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // level 2: bucket offsets = cumsum of earlier buckets' totals (tiny)
    val wOff = Window.partitionBy(col(sourceCol)).orderBy(col("_bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = withB.groupBy(col(sourceCol), col("_bkt"))
      .agg(sum(col("_ntok")).as("_tot"))
      .select(col(sourceCol), col("_bkt"),
        coalesce(sum(col("_tot")).over(wOff), lit(0L)).as("_off"))
    withB
      .withColumn("_cumIn", sum(col("_ntok")).over(wIn))
      .join(broadcast(offsets), Seq(sourceCol, "_bkt"))
      .select(col(idCol), col(sourceCol),
        (col("_off") + col("_cumIn")).as("cum_tokens"))
  }

  /** DuckDB mirror of [[tokenBudgetSelect]] over `documents` (ordering key =
    * the unrounded mirrored-op score, matching the Spark side). */
  def tokenBudgetSelectSql(budget: Long): String =
    s"""SELECT doc_id, source, cum_tokens::BIGINT AS cum_tokens FROM (
       |  SELECT doc_id, source,
       |         sum(len(${TextAnalysis.Sql.toks("text")}))
       |           OVER (PARTITION BY source
       |                 ORDER BY ${TextAnalysis.Sql.qualityRawExpr} DESC, doc_id
       |                 ROWS UNBOUNDED PRECEDING) AS cum_tokens
       |  FROM documents)
       |WHERE cum_tokens <= $budget""".stripMargin

  /** End-to-end training-set assembly — the terminal composition a
    * pretraining pipeline runs once curation signals exist, as ONE
    * declarative plan: composite rule gate ([[TextAnalysis.ruleFilter]]) →
    * DSIR importance floor (fit on the gated corpus,
    * [[TextAnalysis.importanceWeightTable]]/[[TextAnalysis.importanceScore]])
    * → exact dedup (canonical keep) → token-window chunking
    * ([[TextAnalysis.chunk]]) → reproducible shard layout
    * ([[shardAssign]] over the chunk key). Output one row per surviving
    * chunk: `(doc_id, chunk_idx, shard, pos, n_tokens)` — the manifest a
    * training loader reads.
    *
    * Every stage is an independently-verified operator; the composition
    * adds only semi-joins and the chunk-key projection, so the whole
    * assembly optimizes as a single Catalyst plan (filters push to the one
    * document scan; nothing is materialized between stages except the
    * ≤`buckets`-row collected weight table).
    */
  def assembleTrainingSet(
      docs: DataFrame,
      targetPred: org.apache.spark.sql.Column,
      impFloor: Double,
      window: Int,
      stride: Int,
      numShards: Int,
      salt: String = "assemble",
      buckets: Int = 256): DataFrame = {
    val gated = docs.join(
      TextAnalysis.ruleFilter(docs).where(col("keep")).select(col("doc_id")),
      Seq("doc_id"), "left_semi")
    val wt = TextAnalysis.importanceWeightTable(gated, targetPred, buckets)
    val keepImp = TextAnalysis.importanceScore(gated, wt, buckets)
      .where(col("importance") >= impFloor).select(col("doc_id"))
    val d1 = gated.join(keepImp, Seq("doc_id"), "left_semi")
    val exactKept = Dedup.exact(d1)
      .where(col("doc_id") === col("canon_id")).select(col("doc_id"))
    val d2 = d1.join(exactKept, Seq("doc_id"), "left_semi")
    val chunks = TextAnalysis.chunk(d2, window, stride)
      .select((col("doc_id") * 1000L + col("chunk_idx")).as("pid"),
        col("doc_id"), col("chunk_idx"), col("n_tokens"))
    shardAssign(chunks.select(col("pid")), numShards, salt, idCol = "pid")
      .join(chunks, Seq("pid"))
      .select(col("doc_id"), col("chunk_idx"), col("shard"), col("pos"),
        col("n_tokens"))
  }

  /** Percentile (rank) normalization of the quality score WITHIN source —
    * the score calibration step when heterogeneous domains are scored on
    * incomparable raw scales: `pr = percent_rank` of the doc's quality
    * inside its source, ties sharing the minimum rank. Feed the normalized
    * column to cross-source selection ([[tokenBudgetSelect]],
    * [[mixtureSample]]) so "top decile" means the same thing in every
    * domain.
    *
    * Scale shape — the [[qualityQuantileFloor]] histogram form: quality is
    * a 4dp-rounded ratio, so the per-source histogram is tiny; the
    * percent_rank arithmetic `(rank−1)/(n−1)` runs over histogram rows and
    * broadcasts back — no per-source window ever sees the corpus. Output
    * `(doc_id, source, pr)`, pr 6dp.
    */
  def qualityPercentile(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      sourceCol: String = "source"): DataFrame = {
    val base = docs.select(col(idCol), col(sourceCol),
      TextAnalysis.quality(col(textCol)).as("_q"))
    val hist = base.groupBy(col(sourceCol), col("_q")).agg(count(lit(1)).as("_cnt"))
    val wBefore = Window.partitionBy(col(sourceCol)).orderBy(col("_q"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wAll = Window.partitionBy(col(sourceCol))
    val prMap = hist
      .withColumn("_before", coalesce(sum(col("_cnt")).over(wBefore), lit(0L)))
      .withColumn("_n", sum(col("_cnt")).over(wAll))
      .select(col(sourceCol), col("_q"),
        round(col("_before").cast("double") /
          greatest(col("_n") - 1, lit(1L)), 6).as("pr"))
    base.join(broadcast(prMap), Seq(sourceCol, "_q"))
      .select(col(idCol), col(sourceCol), col("pr"))
  }

  /** Per-source document cap — "no domain contributes more than N docs":
    * keep a deterministic uniform-random `maxDocs` sample of every source,
    * ranked by a salted hash (re-runnable, stable under corpus growth for
    * the kept prefix semantics). The dominant-domain balancer that runs
    * before mixture weighting when one crawl source is 100× the rest.
    *
    * Scale shape — the [[tokenBudgetSelect]] two-level rank with a
    * HASH-RANGE level 0: bucket = top `log2(buckets)` bits of the 60-bit
    * hash, so buckets are uniform by construction and concatenating them
    * in bucket order preserves the global (hash, id) order per source —
    * no histogram needed, no per-source window over the corpus. In-bucket
    * rank windows over `(source, bucket)`; bucket offsets are a
    * bucket-count cumsum (tiny, broadcast back).
    *
    * Output `(doc_id, source, pick_rank)`, pick_rank 1-based in hash order.
    */
  def sourceCap(
      docs: DataFrame,
      maxDocs: Long,
      salt: String = "cap",
      idCol: String = "doc_id",
      sourceCol: String = "source",
      bucketBits: Int = 5): DataFrame = {
    import graft.functions.Hash60
    val buckets = 1 << bucketBits
    val base = docs.select(col(idCol), col(sourceCol),
      Hash60(concat(lit(salt), lit("|"), col(idCol))).as("_h"))
      .withColumn("_bkt", shiftright(col("_h"), 60 - bucketBits))
    val wIn = Window.partitionBy(col(sourceCol), col("_bkt"))
      .orderBy(col("_h"), col(idCol))
    val wOff = Window.partitionBy(col(sourceCol)).orderBy(col("_bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = base.groupBy(col(sourceCol), col("_bkt"))
      .agg(count(lit(1)).as("_cnt"))
      .select(col(sourceCol), col("_bkt"),
        coalesce(sum(col("_cnt")).over(wOff), lit(0L)).as("_off"))
    base
      .withColumn("_rIn", row_number().over(wIn).cast("long"))
      .join(broadcast(offsets.where(col("_off") < maxDocs)), Seq(sourceCol, "_bkt"))
      .withColumn("pick_rank", col("_off") + col("_rIn"))
      .where(col("pick_rank") <= maxDocs)
      .select(col(idCol), col(sourceCol), col("pick_rank"))
  }

  /** DuckDB mirror of [[sourceCap]]: the same hash order as ONE per-source
    * window (fixture-scale form; the Spark side reaches the identical set
    * through the two-level rank).
    */
  def sourceCapSql(maxDocs: Long, salt: String = "cap"): String = {
    val h = graft.functions.Hash60.sql(s"'$salt' || '|' || doc_id")
    s"""SELECT doc_id, source, pick_rank FROM (
       |  SELECT doc_id, source,
       |         row_number() OVER (PARTITION BY source
       |           ORDER BY ($h), doc_id) AS pick_rank
       |  FROM documents)
       |WHERE pick_rank <= $maxDocs""".stripMargin
  }

  /** Sequence packing (concat-and-chunk): documents are laid end-to-end in
    * id order and cut every `budgetTokens` tokens — each doc reports the
    * pack its first token lands in and its offset inside that pack. Docs
    * are first hash-bucketed (`doc_id mod buckets`) and packed per bucket,
    * so the cumulative sum is a window over each bucket, not one global
    * single-partition window — the layout a 1000-executor job needs; each
    * bucket is an independent token stream. Output: `(doc_id, bucket,
    * n_tokens, pack_id, pack_off)`.
    */
  def packSequences(
      docs: DataFrame,
      budgetTokens: Long = 256L,
      buckets: Int = 32,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("bucket")).orderBy(col(idCol))
    docs
      .select(col(idCol), pmod(col(idCol), lit(buckets.toLong)).as("bucket"),
        size(TextAnalysis.tokens(col(textCol))).cast("long").as("n_tokens"))
      .withColumn("start_off", sum(col("n_tokens")).over(w) - col("n_tokens"))
      .select(col(idCol), col("bucket"), col("n_tokens"),
        floor(col("start_off") / lit(budgetTokens.toDouble)).cast("long").as("pack_id"),
        (col("start_off") % lit(budgetTokens)).as("pack_off"))
  }

  /** Deterministic corpus shuffle + shard assignment — the terminal layout
    * step of a pre-training pipeline: training wants documents in a
    * pseudo-random but REPRODUCIBLE order, laid out as `numShards` shard
    * files. Each doc draws `shuffle_key = hash60(doc_id:salt)` (the
    * [[mixtureSample]] draw contract: pure function of the id, so re-runs
    * and engine mirrors agree and a new salt is an independent re-shuffle),
    * its shard is `shuffle_key mod numShards`, and `pos` is its rank inside
    * the shard by `(shuffle_key, doc_id)`. Output
    * `(doc_id, shard, pos)` — a writer partitions by `shard`, sorts by
    * `pos`, and streams shards out independently.
    *
    * Scale: the draw and shard are scan-speed column math; the only wide op
    * is the per-shard rank window, whose partition count is `numShards` —
    * CHOSEN large at scale (a 100 TB corpus ships thousands of shards), so
    * parallelism is the writer's own fan-out, never one task per corpus.
    * Unlike q85/q86's per-source windows, the partition key here is synthetic
    * and uniform (md5 draw), so shards are balanced by construction.
    */
  def shardAssign(
      docs: DataFrame,
      numShards: Int,
      salt: String = "shuffle",
      idCol: String = "doc_id"): DataFrame = {
    val key = graft.functions.Hash60(
      concat(col(idCol).cast("string"), lit(":" + salt)))
    val w = Window.partitionBy(col("shard"))
      .orderBy(col("shuffle_key"), col(idCol))
    docs
      .select(col(idCol), key.as("shuffle_key"),
        pmod(key, lit(numShards.toLong)).as("shard"))
      .withColumn("pos", row_number().over(w).cast("long"))
      .select(col(idCol), col("shard"), col("pos"))
  }

  /** DuckDB mirror of [[shardAssign]] over `documents`. */
  def shardAssignSql(numShards: Int, salt: String): String = {
    val key = graft.functions.Hash60.sql(s"doc_id::VARCHAR || ':$salt'")
    s"""SELECT doc_id, shard,
       |       row_number() OVER (PARTITION BY shard ORDER BY shuffle_key, doc_id) AS pos
       |FROM (SELECT doc_id, $key AS shuffle_key,
       |             ((($key) % $numShards) + $numShards) % $numShards AS shard
       |      FROM documents)""".stripMargin
  }

  /** Per-source reputation (domain-level filtering signals — pipelines keep
    * or drop WHOLE sources on these): doc count, mean quality, and the
    * exact-duplicate rate (fraction of docs whose canonical copy is another
    * doc). Quality means go through an exact DECIMAL sum (the scores are
    * 4-dp-rounded, so the sum is exact and aggregation-order independent).
    * One groupBy on `source` — at 100 TB, sources are few relative to docs
    * and the aggregation is map-side partial.
    */
  /** Corpus snapshot diff — dataset-versioning's "what changed" report:
    * full-outer join two corpus snapshots on the doc key and classify each
    * key as `added` (only in `cur`), `removed` (only in `prev`), or
    * `changed` (both, different text); unchanged docs are omitted (the
    * selective-report semantics — at 100 TB the interesting set is the
    * delta, not the corpus).
    *
    * Scale shape: texts never shuffle — each side reduces to
    * `(key, md5)` AT THE SCAN (the hash commutes under the join), so the
    * full-outer join moves 16-byte digests, one equi-shuffle on the key.
    * MD5 of the UTF-8 bytes is the one digest both engines spell
    * identically (`md5(cast .. as binary)` ≡ DuckDB `md5(text)`).
    */
  def corpusDiff(prev: DataFrame, cur: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val a = prev.select(col(idCol).as("_ida"),
      md5(col(textCol).cast("binary")).as("_ha"))
    val b = cur.select(col(idCol).as("_idb"),
      md5(col(textCol).cast("binary")).as("_hb"))
    a.join(b, col("_ida") === col("_idb"), "full_outer")
      .select(coalesce(col("_ida"), col("_idb")).as(idCol),
        when(col("_ha").isNull, "added")
          .when(col("_hb").isNull, "removed")
          .when(col("_ha") =!= col("_hb"), "changed")
          .otherwise("same").as("status"))
      .where(col("status") =!= "same")
  }

  def sourceStats(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val q = TextAnalysis.stats(docs).select(col("doc_id"), col("quality"))
    val dup = Dedup.exact(docs)
      .select(col("doc_id"),
        (col("doc_id") =!= col("canon_id")).cast("int").as("is_dup"))
    docs.select(col("doc_id"), col("source"))
      .join(q, Seq("doc_id"))
      .join(dup, Seq("doc_id"))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        round(sum(col("quality").cast(DecimalType(18, 4))).cast("double") /
          count(lit(1)), 4).as("mean_quality"),
        round(sum(col("is_dup")).cast("double") / count(lit(1)), 4).as("dup_rate"))
  }

  /** One-plan corpus health report — the per-source dashboard row a data
    * team reads before touching the mix: doc count, token mass, mean
    * quality, exact-duplicate rate, and the dominant language. Composes
    * [[sourceStats]], a token aggregation, and
    * [[TextAnalysis.langId]]'s per-source mode (ties → the alphabetically
    * smaller language, via a `min_by` over `(−count, lang)`). Output
    * `(source, n_docs, n_tokens, mean_quality, dup_rate, top_lang)`.
    *
    * Scale: three corpus-scan aggregations keyed on `source` (map-side
    * partial) + sources-sized joins; the only per-doc wide op is exact
    * dedup's hash-groupBy inside [[sourceStats]].
    */
  def corpusReport(docs: DataFrame,
      sourceCol: String = "source", textCol: String = "text"): DataFrame = {
    val st = sourceStats(docs)
    val toks = docs.groupBy(col(sourceCol))
      .agg(sum(size(TextAnalysis.tokens(col(textCol))).cast("long")).as("n_tokens"))
    val langs = TextAnalysis.langId(docs)
      .join(docs.select(col("doc_id"), col(sourceCol)), Seq("doc_id"))
      .groupBy(col(sourceCol), col("pred_lang"))
      .agg(count(lit(1)).as("_cnt"))
      .groupBy(col(sourceCol))
      .agg(min_by(col("pred_lang"),
        struct((-col("_cnt")).as("nc"), col("pred_lang"))).as("top_lang"))
    st.join(toks, Seq(sourceCol)).join(langs, Seq(sourceCol))
      .select(col(sourceCol), col("n_docs"), col("n_tokens"),
        col("mean_quality"), col("dup_rate"), col("top_lang"))
  }

  /** Deterministic train/val/test split: each doc draws the
    * [[mixtureSample]] 10000-sided hash (pure function of `doc_id` + salt)
    * and lands in `train` (< 10·trainPct), `val` (< 10·(trainPct+valPct)) or
    * `test`. Because the draw is uniform and independent of content, the
    * proportions hold WITHIN every source (stratification for free) and the
    * assignment is stable across runs, engines, and corpus growth — a doc's
    * split never changes when other docs are added, the property that keeps
    * eval sets honest across pipeline versions. Output
    * `(doc_id, source, split)`.
    *
    * Scale: pure scan-speed column math, zero shuffle.
    */
  def stratifiedSplit(
      docs: DataFrame,
      trainPct: Int = 80, valPct: Int = 10,
      salt: String = "split",
      idCol: String = "doc_id",
      sourceCol: String = "source"): DataFrame = {
    require(trainPct > 0 && valPct >= 0 && trainPct + valPct < 100,
      "percentages must leave room for a test split")
    val u = graft.functions.Hash60(
      concat(col(idCol).cast("string"), lit(":" + salt))) % 10000L
    docs.select(col(idCol), col(sourceCol),
      when(u < trainPct * 100L, "train")
        .when(u < (trainPct + valPct) * 100L, "val")
        .otherwise("test").as("split"))
  }

  /** Leakage-free train/val/test split: [[stratifiedSplit]]'s stable hash
    * draw, but on the near-dup group id (`canon_id` from
    * [[Dedup.canonicalGroups]]) instead of the doc id — so a whole cluster
    * of near-duplicates always lands on ONE side. The per-doc split is the
    * classic eval-contamination bug: a test document's near-twin in train
    * inflates every benchmark it touches; group-keyed assignment is the
    * standard fix. Same stability contract as stratifiedSplit (a group's
    * split never changes as the corpus grows, as long as its canonical id
    * is stable). Output `(doc_id, source, canon_id, split)`.
    *
    * Scale: one equi-join of the corpus to its (corpus-sized, id-keyed)
    * groups frame + scan-speed column math. Use [[leakageAudit]] to verify
    * any split: this one audits to ZERO cross-split pairs by construction.
    */
  def groupAwareSplit(
      docs: DataFrame,
      groups: DataFrame, // (doc_id, canon_id)
      trainPct: Int = 80, valPct: Int = 10,
      salt: String = "gsplit",
      idCol: String = "doc_id",
      sourceCol: String = "source"): DataFrame = {
    require(trainPct > 0 && valPct >= 0 && trainPct + valPct < 100,
      "percentages must leave room for a test split")
    val u = graft.functions.Hash60(
      concat(col("canon_id").cast("string"), lit(":" + salt))) % 10000L
    docs.join(groups.select(col(idCol), col("canon_id")), Seq(idCol))
      .select(col(idCol), col(sourceCol), col("canon_id"),
        when(u < trainPct * 100L, "train")
          .when(u < (trainPct + valPct) * 100L, "val")
          .otherwise("test").as("split"))
  }

  /** Split leakage audit: how many near-dup pairs straddle split
    * boundaries. `split` is any `(doc_id, split)` assignment; `pairs` is a
    * verified near-dup pair frame (`(a, b)`, e.g. [[Dedup.minhashDedup]]).
    * Output one row per unordered split combination
    * `(split_a ≤ split_b, n_pairs)`; off-diagonal rows ARE the leakage —
    * a [[groupAwareSplit]] audits to none, a per-doc split does not.
    * Scale: two id-keyed hash joins on the pair frame + one tiny aggregate.
    */
  def leakageAudit(split: DataFrame, pairs: DataFrame,
      idCol: String = "doc_id"): DataFrame =
    pairs
      .join(split.select(col(idCol).as("a"), col("split").as("_sa")), Seq("a"))
      .join(split.select(col(idCol).as("b"), col("split").as("_sb")), Seq("b"))
      .select(least(col("_sa"), col("_sb")).as("split_a"),
        greatest(col("_sa"), col("_sb")).as("split_b"))
      .groupBy(col("split_a"), col("split_b"))
      .agg(count(lit(1)).as("n_pairs"))

  /** DuckDB mirror of [[stratifiedSplit]] over `documents`. */
  def stratifiedSplitSql(trainPct: Int, valPct: Int, salt: String): String = {
    val u = graft.functions.Hash60.sql(s"doc_id::VARCHAR || ':$salt'") + " % 10000"
    s"""SELECT doc_id, source,
       |  CASE WHEN ($u) < ${trainPct * 100} THEN 'train'
       |       WHEN ($u) < ${(trainPct + valPct) * 100} THEN 'val'
       |       ELSE 'test' END AS split
       |FROM documents""".stripMargin
  }

  /** Temperature-scaled domain mixture weights — the "how much of each source
    * does the training mix draw" knob (the multinomial α-smoothing used by
    * multilingual / multi-domain LLM training): per source,
    * `weight ∝ (token_share)^alpha`, normalized to sum 1. `alpha = 1`
    * reproduces natural proportions; `alpha → 0` flattens toward uniform.
    * Output `(source, n_docs, n_tokens, weight)`.
    *
    * Determinism: token counts are exact longs; `share^alpha` is rounded into
    * DECIMAL(38,12) before the normalizing sum (exact, order-independent) and
    * the final ratio is a 6dp round of a decimal-by-decimal division carried
    * out in double on both engines.
    *
    * Scale: one map-side-partial groupBy over the corpus; everything after is
    * a sources-sized frame (a broadcast-sized aggregate, never windowed over
    * raw docs).
    */
  def mixtureWeights(
      docs: DataFrame,
      alpha: Double = 0.5,
      textCol: String = "text",
      sourceCol: String = "source"): DataFrame = {
    val perSrc = docs
      .groupBy(col(sourceCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(TextAnalysis.tokens(col(textCol))).cast("long")).as("n_tokens"))
    val tot = perSrc.agg(sum(col("n_tokens")).as("_tot"))
    // alpha = 0.5 (the common temperature) goes through sqrt, which IEEE-754
    // requires to be correctly rounded — bit-identical across engines;
    // general pow is only 1-ulp-accurate and could land a hair across the
    // 12dp decimal boundary
    def tempered(x: Column): Column =
      if (alpha == 0.5) sqrt(x) else pow(x, alpha)
    val raw = perSrc.crossJoin(broadcast(tot))
      .withColumn("_w",
        tempered(col("n_tokens").cast("double") / col("_tot").cast("double"))
          .cast("decimal(38,12)"))
    val norm = raw.agg(sum(col("_w")).as("_z"))
    raw.crossJoin(broadcast(norm))
      .select(col(sourceCol), col("n_docs"), col("n_tokens"),
        round(col("_w").cast("double") / col("_z").cast("double"), 6).as("weight"))
  }

  /** Curriculum ordering: per-source quality tiers for staged training
    * (easy/high-quality shards first, tail shards later — the data-ordering
    * knob curriculum-learning recipes schedule over). Per source, each doc
    * gets its quality `ntile(buckets)` tier and `percent_rank` position
    * under `(quality DESC, id ASC)` — tier 1 is the best slice of ITS
    * source, so no source is starved by a globally stronger one (the same
    * per-source fairness contract as [[qualityFloor]]). Output
    * `(doc_id, source, quality, tier, pct)`, pct at 6dp, quality UNROUNDED
    * ([[TextAnalysis.qualityRaw]] — the ordering key must be the emitted
    * value and must agree bit-for-bit across engines).
    *
    * Scale (the 100 TB path — NOT a per-source window over the corpus; a
    * window partitioned only by `source` sorts a whole domain, tens of TB,
    * in ONE task): both outputs are arithmetic over the doc's per-source
    * POSITION `r` under `(quality DESC, id)`, and that position comes from
    * the [[tokenBudgetSelect]] two-level rank — level 0 buckets by the
    * per-source quality-value histogram (quality is a resolution-bounded
    * ratio, so the histogram is tiny regardless of corpus size; rounding is
    * monotone, so 4dp histogram buckets are order-consistent with the raw
    * ordering key), level 1 is an in-bucket `row_number` over
    * `(source, bucket)`, level 2 adds broadcast bucket-count offsets. Then
    * `pct = (r−1)/(n−1)` (the ordering key is unique, so `percent_rank` =
    * row position) and `tier` is the closed-form ntile bucket of `r` given
    * `n` — both exact, no corpus-scale window anywhere.
    */
  def curriculum(
      docs: DataFrame,
      buckets: Int = 4,
      idCol: String = "doc_id",
      textCol: String = "text",
      sourceCol: String = "source"): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    // UNROUNDED score: ordering and the emitted column must agree across
    // engines, and rounding quality at 4dp is the q222 boundary class
    // (observed live on this query at sf0.1)
    val base = docs.select(col(idCol), col(sourceCol),
      TextAnalysis.qualityRaw(col(textCol)).as("quality"),
      TextAnalysis.quality(col(textCol)).as("_q4"))
    // level 0: per-source histogram of the ROUNDED score (bounded ≈10⁴
    // values) → rank-balanced bucket per distinct value + per-source total n
    val hist = base.groupBy(col(sourceCol), col("_q4"))
      .agg(count(lit(1)).as("_cnt"))
    val wBefore = Window.partitionBy(col(sourceCol)).orderBy(col("_q4").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val wAll = Window.partitionBy(col(sourceCol))
    val rankBuckets = 32
    val bucketMap = hist
      .withColumn("_before", coalesce(sum(col("_cnt")).over(wBefore), lit(0L)))
      .withColumn("_n", sum(col("_cnt")).over(wAll))
      .select(col(sourceCol), col("_q4"), col("_n"),
        least(floor(col("_before") * rankBuckets / col("_n")),
          lit(rankBuckets - 1L)).cast("long").as("_bkt"))
    val withB = base.join(broadcast(bucketMap), Seq(sourceCol, "_q4"))
    // level 1: in-bucket position; raw-score order is consistent with the
    // rounded bucket key because round() is monotone
    val wIn = Window.partitionBy(col(sourceCol), col("_bkt"))
      .orderBy(col("quality").desc, col(idCol))
    // level 2: bucket offsets = cumsum of earlier buckets' counts (tiny)
    val wOff = Window.partitionBy(col(sourceCol)).orderBy(col("_bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = withB.groupBy(col(sourceCol), col("_bkt"))
      .agg(count(lit(1)).as("_bc"))
      .select(col(sourceCol), col("_bkt"),
        coalesce(sum(col("_bc")).over(wOff), lit(0L)).as("_off"))
    val ranked = withB
      .withColumn("_rIn", row_number().over(wIn).cast("long"))
      .join(broadcast(offsets), Seq(sourceCol, "_bkt"))
      .withColumn("_r", col("_off") + col("_rIn"))
    // ntile(B) closed form: first n%B buckets hold n/B+1 rows, the rest n/B.
    // Integer `div` keeps the arithmetic exact past double precision; the
    // else-branch divisor is guarded with greatest(_,1) INSIDE the
    // expression (CSE can hoist it out of the `when` — the q242 lesson).
    ranked
      .withColumn("_qt", expr(s"_n div ${buckets}L"))
      .withColumn("_rem", col("_n") % buckets)
      .withColumn("_cut", (col("_qt") + 1L) * col("_rem"))
      .select(col(idCol), col(sourceCol), col("quality"),
        when(col("_r") <= col("_cut"),
          expr("(_r + _qt) div (_qt + 1)"))
          .otherwise(col("_rem") +
            expr("(_r - _cut + greatest(_qt, 1L) - 1) div greatest(_qt, 1L)"))
          .cast("int").as("tier"),
        when(col("_n") === 1L, lit(0.0))
          .otherwise(round((col("_r") - 1L).cast("double") /
            (col("_n") - 1L).cast("double"), 6)).as("pct"))
  }

  /** k-anonymity audit over quasi-identifier columns — the privacy check a
    * corpus release runs before shipping metadata alongside text (a
    * quasi-identifier combination shared by fewer than `k` rows can
    * re-identify its members; the scrubbed TEXT being clean is not enough
    * when the `(lang, source, …)` envelope is unique). Output one row per
    * quasi-class: the quasi columns, its row count `n`, and `at_risk`
    * (`n < k`). Feed [[kAnonymize]] to suppress. Scale: ONE hash
    * aggregation keyed by the quasi tuple — map-side partial, state ∝
    * distinct classes.
    */
  def kAnonymity(df: DataFrame, quasiCols: Seq[String], k: Int): DataFrame = {
    require(quasiCols.nonEmpty && k > 0)
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .withColumn("at_risk", col("n") < k)
  }

  /** Suppression pass for [[kAnonymity]]: drop every row whose quasi-class
    * has fewer than `k` members (the standard release remedy when
    * generalization isn't on the table). One aggregate + one left-semi hash
    * join on the quasi tuple — the corpus streams once.
    */
  def kAnonymize(df: DataFrame, quasiCols: Seq[String], k: Int): DataFrame =
    df.join(
      kAnonymity(df, quasiCols, k).where(!col("at_risk"))
        .select(quasiCols.map(col): _*),
      quasiCols, "left_semi")

  /** Deterministic weighted interleave schedule — the "training order"
    * generator that merges per-source document streams so each source
    * appears at its mixture rate from the very first batch (feeding a
    * trainer one source at a time distorts early gradients even when the
    * TOTALS match the mixture; interleaving is how `interleave_datasets`-
    * style loaders consume a weighted corpus). Each doc gets its source-
    * local shuffle rank (hash order, salt-reproducible) and the classic
    * stratified merge key `sched_key = (rank − 0.5) / weight`; ascending
    * `sched_key` IS the schedule — a source with weight w holds a w-share
    * of every prefix of it. Output `(doc_id, source, src_rank, sched_key)`.
    *
    * The key is emitted rather than a global position: downstream writers
    * sort/shard by it (e.g. [[shardAssign]] or a range-partitioned write),
    * so no partition-less global row-numbering window ever runs. `weights`
    * is a broadcast-sized `(source, weight)` frame (weights > 0; docs from
    * unlisted sources are dropped — the same contract as [[mixtureSample]]).
    *
    * Scale: `src_rank` is the [[sourceCap]] two-level rank with a HASH-RANGE
    * level 0 — bucket = top `bucketBits` of the 60-bit hash, uniform by
    * construction, so concatenating buckets in bucket order preserves the
    * per-source (hash, id) total order without ever windowing the raw corpus
    * partitioned only by `source` (a whole domain — tens of TB — would sort
    * in ONE task). In-bucket `row_number` windows over `(source, bucket)`;
    * bucket offsets are a bucket-count cumsum (tiny, broadcast back).
    */
  def interleave(
      docs: DataFrame,
      weights: DataFrame,
      salt: String = "il",
      idCol: String = "doc_id",
      sourceCol: String = "source",
      bucketBits: Int = 5): DataFrame = {
    val base = docs
      .withColumn("_h", graft.functions.Hash60(
        concat(col(idCol).cast("string"), lit(":" + salt))))
      .join(broadcast(weights.select(col(sourceCol), col("weight"))),
        Seq(sourceCol))
      .withColumn("_bkt", shiftright(col("_h"), 60 - bucketBits))
    val wIn = Window.partitionBy(col(sourceCol), col("_bkt"))
      .orderBy(col("_h"), col(idCol))
    val wOff = Window.partitionBy(col(sourceCol)).orderBy(col("_bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = base.groupBy(col(sourceCol), col("_bkt"))
      .agg(count(lit(1)).as("_cnt"))
      .select(col(sourceCol), col("_bkt"),
        coalesce(sum(col("_cnt")).over(wOff), lit(0L)).as("_off"))
    base
      .withColumn("_rIn", row_number().over(wIn).cast("long"))
      .join(broadcast(offsets), Seq(sourceCol, "_bkt"))
      .withColumn("src_rank", (col("_off") + col("_rIn")).cast("int"))
      .select(col(idCol), col(sourceCol), col("src_rank"),
        ((col("src_rank").cast("double") - 0.5) / col("weight"))
          .as("sched_key"))
  }

  /** Column profiler — the first query anyone runs against an unfamiliar
    * 100 TB corpus drop: per requested column, row/null counts, EXACT
    * distinct count, lexicographic min/max (string-cast so one report shape
    * fits every type), and the modal value with its share. Output one row
    * per column: `(column, n_rows, n_null, n_distinct, min_val, max_val,
    * top_val, top_n, top_share)`; the modal tie falls to the smallest value
    * string, share at 6dp.
    *
    * Scale: per column, ONE value-keyed hash aggregation (map-side partial —
    * shuffle ∝ distinct values, not rows) feeding a one-row reduce; columns
    * union their one-row results. Never a global sort, never a window; a
    * near-unique column (an id) costs its cardinality in shuffle rows —
    * same posture as exact-distinct anywhere.
    */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "at least one column")
    cols.map { c =>
      val g = df.groupBy(col(c).cast("string").as("v"))
        .agg(count(lit(1)).as("n"))
      g.agg(
        coalesce(sum(col("n")), lit(0L)).as("n_rows"),
        coalesce(sum(when(col("v").isNull, col("n")).otherwise(lit(0L))), lit(0L))
          .as("n_null"),
        count(when(col("v").isNotNull, lit(1))).as("n_distinct"),
        min(col("v")).as("min_val"),
        max(col("v")).as("max_val"),
        // modal value: lexicographic max over (n, reversed tie) is fragile —
        // use min over (-n, v): largest count first, then smallest value
        min(when(col("v").isNotNull, struct((-col("n")).as("nn"), col("v").as("v"))))
          .as("_top"))
        .select(lit(c).as("column"), col("n_rows"), col("n_null"),
          col("n_distinct"), col("min_val"), col("max_val"),
          col("_top.v").as("top_val"), (-col("_top.nn")).as("top_n"),
          round((-col("_top.nn")).cast("double") /
            greatest(col("n_rows"), lit(1L)).cast("double"), 6).as("top_share"))
    }.reduce(_ unionByName _)
  }

  /** Weighted sampling WITHOUT replacement, k winners, probability ∝
    * `weightCol` — Efraimidis–Spirakis exponential race: each row draws a
    * deterministic uniform `u` from its id hash and races with key
    * `−ln(u)/w` (an Exponential(rate = w) arrival time); the k SMALLEST keys
    * win, which is distribution-exact weighted sampling without replacement.
    * The corpus-scale use: subsample a training mixture proportional to a
    * per-doc importance weight (token count, quality score, source weight)
    * in ONE scan.
    *
    * Scale posture: the global top-k runs through the bounded
    * [[graft.functions.TopKByDistance]] aggregate — map-side partial top-k
    * per task, one ≤(k · tasks)-row merge — NEVER a global sort. Keys round
    * to 9dp with an id tie-break so the selection is engine-reproducible
    * (ln is correct to ~1 ulp in both engines; 60k+ race keys spread over
    * units of range, so 1e-9 quantization is 7 orders of magnitude above
    * the float disagreement and ties resolve by id).
    *
    * `weightCol` must be strictly positive (rows with w ≤ 0 or NULL are
    * dropped — zero weight cannot win a race).
    */
  def weightedSample(
      docs: DataFrame,
      weightCol: Column,
      k: Int,
      salt: String = "ws",
      idCol: String = "doc_id"): DataFrame = {
    require(k > 0, "k must be positive")
    val u = (graft.functions.Hash60(
      concat(col(idCol).cast("string"), lit(":" + salt))) % 1000000L + 1L)
      .cast("double") / 1000001.0
    val key = round(-log(u) / weightCol.cast("double"), 9)
    val raced = docs
      .where(weightCol.isNotNull && weightCol > 0)
      .withColumn("race_key", key)
    val winners = raced
      .agg(graft.functions.TopKByDistance.topk(
        col(idCol).cast("long"), col("race_key"), k).as("_top"))
      .select(explode(col("_top")).as("_w"))
      .select(col(s"_w.id").as(idCol))
    raced.join(winners, Seq(idCol), "left_semi")
  }

  /** Z-order (Morton) clustering key: interleave the low `bits` bits of two
    * non-negative integer columns — `z = Σᵢ xᵢ·4ⁱ + yᵢ·2·4ⁱ`. Sorting or
    * range-partitioning a 100 TB table by `z` at WRITE time gives
    * multi-dimensional locality: a predicate selective on either dimension
    * touches O(√files) of the layout instead of all of it, because a z-range
    * covers a quadrant, not a stripe — the standard layout-clustering move
    * (Delta/Iceberg `ZORDER BY`) expressed as one codegen-friendly column.
    * Callers quantize each dimension into `[0, 2^bits)` first (bucket id,
    * not raw value); all shifts are literal, so the whole key folds into
    * whole-stage codegen with zero exchanges.
    */
  def zorderKey(x: Column, y: Column, bits: Int): Column = {
    require(bits > 0 && bits <= 31, "bits must be in [1, 31]")
    (0 until bits).map { i =>
      shiftright(x, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i)) +
        shiftright(y, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1))
    }.reduce(_ + _)
  }

  /** DuckDB rendering of [[zorderKey]] over integer expressions `x`/`y`. */
  def zorderKeySql(x: String, y: String, bits: Int): String =
    (0 until bits).map { i =>
      s"((($x) >> $i) & 1) * ${1L << (2 * i)} + ((($y) >> $i) & 1) * ${1L << (2 * i + 1)}"
    }.mkString("(", " + ", ")")

  /** Per-group EXACT percentiles of an integer-valued column: the q159
    * histogram rank test (`100·cum ≥ pct·n`, lower value wins) applied per
    * group — one `(group, value)` aggregation, a cum window over the
    * RESOLUTION-BOUNDED histogram (never the raw rows: the q85 contract),
    * and a broadcast pct-literal join. The generalized form behind
    * [[qualityQuantiles]] (global), [[madOutliers]] (medians), and
    * `Events.timeToConvert` (bucketed delays) — exposed so any
    * per-group distribution card (tokens per source, latency per route) is
    * one call. `valueCol` must be integer-typed or resolution-bounded;
    * output `(group, pct, value)`.
    */
  def groupQuantiles(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      pcts: Seq[Int]): DataFrame = {
    require(pcts.nonEmpty && pcts.forall(p => p >= 1 && p <= 100),
      "percentiles must be 1..100")
    val spark = df.sparkSession
    import spark.implicits._
    val h = df.groupBy(col(groupCol), col(valueCol).as("v"))
      .agg(count(lit(1)).as("c"))
    val n = h.groupBy(col(groupCol)).agg(sum(col("c")).as("n"))
    val w = Window.partitionBy(col(groupCol)).orderBy(col("v"))
    h.withColumn("cum", sum(col("c")).over(w))
      .join(n, Seq(groupCol))
      .crossJoin(broadcast(pcts.toDF("pct")))
      .where(col("cum") * 100 >= col("pct") * col("n"))
      .groupBy(col(groupCol), col("pct")).agg(min(col("v")).as("value"))
  }

  /** Context-length budget report per source for a training `maxLen`: doc
    * and token counts, docs that overflow the context, tokens lost to
    * truncation, tokens kept after clamping, the bin-count LOWER BOUND
    * `ceil(kept / maxLen)` (what a perfect packer needs — the fill target
    * [[packSequences]]' concat-and-chunk actually achieves up to one tail
    * chunk per bucket), and the fill ratio against it. The "what does a
    * 4k context cost me per source" dashboard read before picking a
    * sequence length. All-integer (ceil as `(kept + maxLen − 1) div
    * maxLen`); the one ratio divides exact longs, 6dp. One hash agg.
    */
  def packingReport(docs: DataFrame, maxLen: Int,
      sourceCol: String = "source", textCol: String = "text"): DataFrame = {
    require(maxLen >= 1, "maxLen must be >= 1")
    // NULL text counts as 0 tokens — without the coalesce it would reach
    // the budget columns as size()'s null/-1 and leave kept > total
    docs.select(col(sourceCol).as("source"),
      greatest(coalesce(size(TextAnalysis.tokens(col(textCol))).cast("long"),
        lit(0L)), lit(0L)).as("_t"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("_t")).as("n_tokens"),
        sum(when(col("_t") > maxLen, 1L).otherwise(0L)).as("n_overflow_docs"),
        sum(greatest(col("_t") - maxLen, lit(0L))).as("n_truncated_tokens"),
        sum(least(col("_t"), lit(maxLen.toLong))).as("n_kept_tokens"))
      .withColumn("n_bins_lb",
        expr(s"(n_kept_tokens + ${maxLen - 1}L) div ${maxLen}L"))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        col("n_overflow_docs"), col("n_truncated_tokens"),
        col("n_kept_tokens"), col("n_bins_lb"),
        round(col("n_kept_tokens").cast("double") /
          (col("n_bins_lb") * maxLen), 6).as("fill_ratio"))
  }

  /** Per-source winsorized moments of an exact integer-unit score: clamp at
    * the source's own `loPct`/`hiPct` histogram percentiles (the q159
    * lower-value rank rule), then mean and population std of the clamped
    * values — the robust "source quality card" row whose tails one junk
    * cluster cannot drag. Output `(source, lo, hi, n, mean_w, std_w)`;
    * mean/std are mirrored-op doubles over exact integer power sums
    * (Σx, Σx² of clamped units), rounded 6dp.
    *
    * Scale shape: percentiles read off the resolution-bounded per-source
    * value histogram (windows run over histogram rows, never the corpus);
    * the clamp + power sums are one map + hash agg pass.
    */
  def winsorizedStats(docs: DataFrame, scoreUnits: Column, loPct: Int,
      hiPct: Int, sourceCol: String = "source"): DataFrame = {
    require(1 <= loPct && loPct < hiPct && hiPct <= 100, "need 1<=lo<hi<=100")
    // NULL scores are not observations (the kendallTau convention): unclamped
    // they'd ride least/greatest straight to the hi bound AND shift the
    // percentile histogram (nulls sort first in the cum window)
    val scored = docs.select(col(sourceCol).as("source"),
      scoreUnits.cast("long").as("_x"))
      .where(col("_x").isNotNull)
    val qs = groupQuantiles(scored, "source", "_x", Seq(loPct, hiPct))
    val bounds = qs.groupBy(col("source")).agg(
      min(when(col("pct") === loPct, col("value"))).as("_lo"),
      min(when(col("pct") === hiPct, col("value"))).as("_hi"))
    scored.join(broadcast(bounds), Seq("source"))
      .select(col("source"), col("_lo"), col("_hi"),
        greatest(least(col("_x"), col("_hi")), col("_lo")).as("_w"))
      .groupBy(col("source"), col("_lo"), col("_hi"))
      .agg(count(lit(1)).as("n"), sum(col("_w")).as("_sx"),
        // Σx² in DECIMAL(38): unit² × corpus-scale row counts overflows long
        sum((col("_w").cast(org.apache.spark.sql.types.DecimalType(38, 0)) *
          col("_w"))).as("_sxx"))
      .select(col("source"), col("_lo").as("lo"), col("_hi").as("hi"),
        col("n"),
        round(col("_sx").cast("double") / col("n"), 6).as("mean_w"),
        round(sqrt(greatest(
          col("_sxx").cast("double") / col("n") -
            (col("_sx").cast("double") / col("n")) *
            (col("_sx").cast("double") / col("n")), lit(0.0))), 6)
          .as("std_w"))
  }

  /** Neyman-optimal stratified sampling allocation: each stratum's share
    * of a total sample `budget` is ∝ N_h·σ_h — the allocation that
    * minimizes the variance of the stratified mean estimator (a big AND
    * internally-diverse stratum earns more eval samples than a
    * big-but-uniform one; proportional allocation ignores σ). The
    * eval-set-construction companion to [[waterfillAllocate]] (weights
    * from dispersion instead of externally supplied). Input: rows with a
    * stratum column and an exact integer-unit score; output
    * `(stratum, n_pop, sigma, alloc, capped)` with Σ alloc ≤ budget —
    * largest-remainder rounding, allocations clamp at the stratum
    * population (single pass; a clamped stratum's unplaced remainder
    * shows in Σ alloc — feed waterfilling if it must redistribute).
    *
    * Determinism: σ from exact integer power sums (Σx, Σx² in
    * DECIMAL(38)); the weights N_h·σ_h round 8dp → DECIMAL before the
    * total fold (order-free); the largest-remainder ranks resolve on the
    * bounded per-stratum frame via a self-join with a
    * (remainder DESC, stratum ASC) tie order — no windows, no sorts.
    */
  def neymanAllocate(df: DataFrame, stratumCol: String,
      valueUnits: Column, budget: Long): DataFrame = {
    require(budget >= 0, "budget must be non-negative")
    val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val d8 = org.apache.spark.sql.types.DecimalType(38, 8)
    val per = df.select(col(stratumCol).as("_g"),
        valueUnits.cast("long").as("_x"))
      .where(col("_x").isNotNull)
      .groupBy(col("_g"))
      .agg(count(lit(1)).as("_n"), sum(col("_x").cast(d38)).as("_sx"),
        sum(col("_x").cast(d38) * col("_x")).as("_sxx"))
      .select(col("_g"), col("_n"),
        sqrt(greatest(
          col("_sxx").cast("double") / col("_n") -
            (col("_sx").cast("double") / col("_n")) *
            (col("_sx").cast("double") / col("_n")), lit(0.0))).as("_sig"))
      .withColumn("_w", round(col("_n") * col("_sig"), 8).cast(d8))
      .localCheckpoint(eager = false)
    val tot = per.agg(sum(col("_w")).as("_tw"))
    val quota = per.crossJoin(broadcast(tot))
      .withColumn("_q", when(col("_tw") > 0,
          lit(budget) * col("_w").cast("double") / col("_tw").cast("double"))
        .otherwise(lit(0.0)))
      .withColumn("_base", floor(col("_q")).cast("long"))
      .withColumn("_rem", col("_q") - col("_base"))
      .localCheckpoint(eager = false)
    val used = quota.agg(sum(col("_base")).as("_used"))
    // largest-remainder rank on the bounded per-stratum frame
    val rk = quota.select(col("_g"), col("_rem"))
      .join(broadcast(quota.select(col("_g").as("_g2"), col("_rem").as("_r2"))),
        col("_r2") > col("_rem") ||
          (col("_r2") === col("_rem") && col("_g2") < col("_g")), "left")
      .groupBy(col("_g")).agg((count(col("_g2")) + 1).as("_rank"))
    quota.join(rk, Seq("_g")).crossJoin(broadcast(used))
      // remainder units require a POSITIVE remainder: in the all-degenerate
      // case (total weight 0) every quota is 0.0 and rem ties at 0 — rank
      // alone would hand the whole budget out one unit per stratum
      .withColumn("_raw", col("_base") +
        when(col("_rank") <= lit(budget) - col("_used") &&
          col("_rem") > 0.0, 1L).otherwise(0L))
      .select(col("_g").as(stratumCol), col("_n").as("n_pop"),
        round(col("_sig"), 6).as("sigma"),
        least(col("_raw"), col("_n")).as("alloc"),
        (col("_raw") > col("_n")).as("capped"))
  }

  /** Cross-source quantile normalization: map each source's score
    * distribution onto the POOLED corpus distribution by ECDF matching —
    * `v_norm = min{u : F_pool(u) ≥ F_src(v)}`. This is the calibration
    * step before any global quality floor ([[qualityQuantileFloor]]'s
    * complement): a source whose scorer runs generous floods a raw global
    * threshold; after quantile normalization the p-th percentile of every
    * source lands on the same normalized value, so one global cut takes
    * the same FRACTION from each source's own ranking. Returns the bounded
    * MAPPING table `(source, v, v_norm, n_docs)` — apply is a broadcast
    * join on `(source, v)`, and at 100 TB the mapping (≤ distinct-values ×
    * sources rows) is the only thing that ever leaves the scan.
    *
    * All-integer determinism: `valueCol` must be resolution-bounded (the
    * 4dp quality contract); ECDF comparisons cross-multiply exact long
    * counts (`F_pool(u)·n_src ≥ F_src(v)·n_pool`) so no double ever
    * decides a rank. Scale shape: one hash agg to the (source, v)
    * histogram, CDFs as broadcast ≤ self-joins on the bounded histogram,
    * the quantile match as a broadcast ≥ join histogram×histogram — no
    * corpus-wide windows, no sorts.
    */
  def quantileNormalize(
      docs: DataFrame,
      groupCol: String,
      valueCol: Column): DataFrame = {
    // NULL values are excluded up front: a null bucket would count in the
    // _ng/_np totals yet never satisfy the ≤/≥ ECDF joins, silently
    // shifting every mapping and dropping max-level rows entirely
    val h = docs.select(col(groupCol).as("_g"), valueCol.as("_v"))
      .where(col("_v").isNotNull)
      .groupBy(col("_g"), col("_v")).agg(count(lit(1)).as("_c"))
      .localCheckpoint(eager = false)
    val ns = h.groupBy(col("_g")).agg(sum(col("_c")).as("_ng"))
    val hp = h.groupBy(col("_v")).agg(sum(col("_c")).as("_cp"))
    val np = hp.agg(sum(col("_cp")).as("_np"))
    // per-(source, v) ECDF numerator: counts of same-source values ≤ v
    val fs = h.select(col("_g"), col("_v"))
      .join(broadcast(h.select(col("_g"), col("_v").as("_u"), col("_c"))),
        Seq("_g"))
      .where(col("_u") <= col("_v"))
      .groupBy(col("_g"), col("_v")).agg(sum(col("_c")).as("_fs"))
    // pooled ECDF numerator per distinct value
    val fp = hp.select(col("_v").as("_w"))
      .join(broadcast(hp.select(col("_v").as("_u"), col("_cp"))),
        col("_u") <= col("_w"))
      .groupBy(col("_w")).agg(sum(col("_cp")).as("_fp"))
    // quantile match: smallest pooled value whose pooled ECDF reaches the
    // source ECDF level — integer cross-multiplication, never a ratio
    val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
    fs.join(ns, Seq("_g")).crossJoin(broadcast(np))
      .join(broadcast(fp),
        col("_fp").cast(d38) * col("_ng") >= col("_fs").cast(d38) * col("_np"))
      .groupBy(col("_g"), col("_v"), col("_fs"))
      .agg(min(col("_w")).as("v_norm"))
      .join(h, Seq("_g", "_v"))
      .select(col("_g").as(groupCol), col("_v").as("v"),
        col("v_norm"), col("_c").as("n_docs"))
  }

  /** Per-source robust outliers by median absolute deviation: flag docs
    * whose 4dp score sits more than `factor1e4/10⁴ × MAD` from their OWN
    * source's median (default 3σ-equivalent: 3·1.4826 = 4.4478). Robust
    * where the mean/stddev z-score is not — one junk cluster in a source
    * moves a median by nothing. All integer arithmetic: scores scale to
    * exact ints, the median is the LOWER median read off a per-source value
    * HISTOGRAM (smallest v with 2·cum ≥ n — the q85 resolution-bounded
    * pattern: the window runs over ≤10⁴ histogram rows per source, never
    * over the corpus), the MAD is the same rule on |x − med|, and the flag
    * test cross-multiplies (`10⁴·d > factor1e4·MAD`). Degenerate sources
    * (over half the docs share one score) have MAD = 0 and flag every
    * off-median doc — the standard MAD behavior, callers pre-filter if
    * unwanted. Output: the flagged docs with their evidence.
    */
  def madOutliers(
      docs: DataFrame,
      scoreCol: Column,
      factor1e4: Long = 44478L,
      idCol: String = "doc_id",
      sourceCol: String = "source"): DataFrame = {
    val scored = docs.select(col(idCol), col(sourceCol).as("source"),
      round(scoreCol * 10000).cast("long").as("x"))
    def lowerMedian(df: DataFrame, out: String): DataFrame = {
      val h = df.groupBy(col("source"), col("v")).agg(count(lit(1)).as("c"))
      val n = h.groupBy(col("source")).agg(sum(col("c")).as("n"))
      val w = Window.partitionBy(col("source")).orderBy(col("v"))
      h.withColumn("cum", sum(col("c")).over(w))
        .join(n, Seq("source"))
        .where(col("cum") * 2 >= col("n"))
        .groupBy(col("source")).agg(min(col("v")).as(out))
    }
    val med = lowerMedian(scored.select(col("source"), col("x").as("v")), "med")
    val dev = scored.join(broadcast(med), Seq("source"))
      .withColumn("d", abs(col("x") - col("med")))
    val mad = lowerMedian(dev.select(col("source"), col("d").as("v")), "mad")
    dev.join(broadcast(mad), Seq("source"))
      .where(col("d") * 10000 > col("mad") * factor1e4)
      .select(col(idCol), col("source"), col("x").as("score1e4"),
        col("med"), col("mad"))
  }

  /** DuckDB mirror of [[weightedSample]]'s race key over expression `w`. */
  def weightedSampleKeySql(w: String, salt: String): String = {
    val u = s"((${graft.functions.Hash60.sql(s"doc_id::VARCHAR || ':$salt'")} % 1000000 + 1)::DOUBLE / 1000001.0)"
    s"round(-ln($u) / ($w)::DOUBLE, 9)"
  }

  /** DuckDB mirror of [[mixtureWeights]] over `documents`. */
  def mixtureWeightsSql(alpha: Double): String = {
    val toks = TextAnalysis.Sql.toks("text")
    val tempered =
      if (alpha == 0.5) "sqrt(n_tokens::DOUBLE / tot::DOUBLE)"
      else s"pow(n_tokens::DOUBLE / tot::DOUBLE, $alpha)"
    s"""WITH s AS (SELECT source, count(*) AS n_docs,
       |             sum(len($toks))::BIGINT AS n_tokens
       |           FROM documents GROUP BY source),
       |t AS (SELECT sum(n_tokens) AS tot FROM s),
       |r AS (SELECT source, n_docs, n_tokens,
       |        $tempered::DECIMAL(38,12) AS w
       |      FROM s, t),
       |z AS (SELECT sum(w) AS z FROM r)
       |SELECT source, n_docs, n_tokens,
       |       round(w::DOUBLE / z::DOUBLE, 6) AS weight
       |FROM r, z""".stripMargin
  }

  /** Declarative data-contract audit — the expectation-suite gate a
    * pipeline runs on a new table drop before any training job reads it.
    * One row per constraint: `(check_name, col_name, n_checked, n_violations)`.
    *
    *   - `notNull`: rows where the column IS NULL;
    *   - `unique`: rows carrying a duplicated (non-null) key value
    *     (`n_nonnull − n_distinct` — 0 iff the column is a key);
    *   - `ranges` `(col, lo, hi)`: non-null rows outside `[lo, hi]`;
    *   - `accepted` `(col, values)`: non-null rows whose value is not in
    *     the enumerated domain;
    *   - `refs` `(col, dim, dimCol)`: referential integrity — non-null
    *     rows whose key has no match in the dimension table.
    *
    * Scale shape: every scan-family check (notNull/unique/ranges/accepted)
    * is a conditional aggregate of ONE pass over the fact table — a single
    * hash agg, no per-check scans; `unique` rides the same agg as a
    * `count distinct` (Spark expands it into the same scan). Each `refs`
    * check is one LEFT ANTI join counted (dimension side broadcast when
    * small); results union onto the scan row set. Nothing collects.
    */
  def constraintAudit(
      df: DataFrame,
      notNull: Seq[String] = Nil,
      unique: Seq[String] = Nil,
      ranges: Seq[(String, Double, Double)] = Nil,
      accepted: Seq[(String, Seq[String])] = Nil,
      refs: Seq[(String, DataFrame, String)] = Nil): DataFrame = {
    require(
      notNull.nonEmpty || unique.nonEmpty || ranges.nonEmpty ||
        accepted.nonEmpty || refs.nonEmpty,
      "constraintAudit needs at least one expectation")
    val aggs: Seq[(String, String, Column, Column)] =
      notNull.map { c =>
        ("not_null", c, count(lit(1)),
          sum(when(col(c).isNull, 1L).otherwise(0L)))
      } ++ unique.map { c =>
        ("unique", c, sum(when(col(c).isNotNull, 1L).otherwise(0L)),
          sum(when(col(c).isNotNull, 1L).otherwise(0L)) -
            countDistinct(col(c)))
      } ++ ranges.map { case (c, lo, hi) =>
        ("in_range", c, sum(when(col(c).isNotNull, 1L).otherwise(0L)),
          sum(when(col(c).isNotNull && (col(c) < lo || col(c) > hi), 1L)
            .otherwise(0L)))
      } ++ accepted.map { case (c, vs) =>
        ("accepted_values", c, sum(when(col(c).isNotNull, 1L).otherwise(0L)),
          sum(when(col(c).isNotNull && !col(c).isInCollection(vs), 1L)
            .otherwise(0L)))
      }
    val scanned: Option[DataFrame] =
      if (aggs.isEmpty) None
      else {
        // coalesce unifies nullability across branches (count is non-null,
        // sum is nullable) — stack() requires identical struct types
        val exprs = aggs.zipWithIndex.flatMap { case ((_, _, nc, vc), i) =>
          Seq(coalesce(nc, lit(0L)).as(s"_n$i"),
            coalesce(vc, lit(0L)).as(s"_v$i")) }
        val one = df.agg(exprs.head, exprs.tail: _*)
        val rows = aggs.zipWithIndex.map { case ((name, c, _, _), i) =>
          struct(lit(name).as("check_name"), lit(c).as("col_name"),
            col(s"_n$i").as("n_checked"), col(s"_v$i").as("n_violations")) }
        Some(one.select(inline(array(rows: _*))))
      }
    val refChecks = refs.map { case (c, dim, dimCol) =>
      val nn = df.where(col(c).isNotNull).select(col(c))
      nn.join(broadcast(dim.select(col(dimCol).as(c)).distinct()),
          Seq(c), "left_anti")
        .agg(count(lit(1)).as("n_violations"))
        .select(lit("ref_integrity").as("check_name"), lit(c).as("col_name"),
          col("n_violations"))
        .crossJoin(broadcast(nn.agg(count(lit(1)).as("_cnt"))))
        .select(col("check_name"), col("col_name"),
          col("_cnt").as("n_checked"), col("n_violations"))
    }
    (scanned.toSeq ++ refChecks).reduce(_ unionByName _)
  }

  /** Greedy coverage-based selection (facility-location / set-cover style
    * data curation): over `rounds` synchronous rounds, pick the document
    * adding the most NOT-YET-COVERED distinct tokens (ties → smaller id),
    * then mark its tokens covered. Output one row per pick:
    * `(round, doc_id, new_tokens)` — the classic submodular-coverage
    * ordering used to seed a maximally-diverse fine-tuning subset.
    *
    * Scale shape: the doc→token incidence list is built once (one
    * projection + distinct); each round is (a) one ANTI join of the
    * incidence list against the covered-token set, (b) one hash agg to
    * per-doc gains, (c) a global top-1 (`TakeOrderedAndProject` — no full
    * sort), and (d) a semi-join growing the covered set, which is
    * localCheckpointed so the plan stays flat across rounds. The only
    * driver materialization is the single winning row per round — the
    * greedy argmax is inherently sequential across rounds (rounds is a
    * small constant by contract), never across the corpus.
    */
  def coverageSelect(docs: DataFrame, rounds: Int,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    // ids ride as LONG: the per-round argmax row is read back typed
    val inc = docs.select(col(idCol).cast("long").as("_id"),
        explode(TextAnalysis.tokens(col(textCol))).as("_tok"))
      .distinct().localCheckpoint(eager = false)
    var covered = inc.select(col("_tok")).limit(0)
    val picks = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Long)]
    var exhausted = false
    for (r <- 1 to rounds if !exhausted) {
      val gains = inc.join(covered, Seq("_tok"), "left_anti")
        .groupBy(col("_id")).agg(count(lit(1)).as("_gain"))
        .orderBy(col("_gain").desc, col("_id")).limit(1)
      // bounded driver materialization: exactly one row per round
      val top = gains.collect()
      if (top.isEmpty) exhausted = true
      else {
        val id = top(0).getLong(0); val gain = top(0).getLong(1)
        picks += ((r, id, gain))
        covered = covered
          .unionByName(inc.where(col("_id") === id).select(col("_tok")))
          .distinct().localCheckpoint(eager = false)
      }
    }
    picks.toSeq.toDF("round", "doc_id", "new_tokens")
  }

  /** Time-based train/test split with an embargo gap (the leakage control
    * temporal ML needs that [[groupAwareSplit]]'s entity keys don't give):
    * `train` = rows strictly before `cutoff`, `test` = rows at or after
    * `cutoff + embargoHours`, rows inside the gap are dropped (label
    * horizons crossing the boundary would leak future into train).
    * Returns the input plus a `split` column with gap rows REMOVED.
    * Purely per-row column math — one scan, no shuffle.
    */
  def temporalEmbargoSplit(df: DataFrame, tsCol: String, cutoff: String,
      embargoHours: Int): DataFrame = {
    val c = to_timestamp(lit(cutoff))
    val e = c + expr(s"INTERVAL $embargoHours HOURS")
    df.withColumn("split",
        when(col(tsCol) < c, "train")
          .when(col(tsCol) >= e, "test"))
      .where(col("split").isNotNull)
  }

  /** Per-split audit of [[temporalEmbargoSplit]]: row/entity counts plus
    * the count of entities present on BOTH sides — the residual
    * entity-level leakage an embargo alone cannot remove (same user, far
    * apart in time). One row per split:
    * `(split, n_rows, n_entities, n_shared_entities)`.
    * Scale shape: one hash agg per (entity, split), then counts on the
    * entity-level frame; no windows.
    */
  def temporalSplitAudit(split: DataFrame, entityCol: String): DataFrame = {
    val per = split.groupBy(col(entityCol).as("_e"), col("split"))
      .agg(count(lit(1)).as("_n")).localCheckpoint(eager = false)
    val shared = per.groupBy(col("_e"))
      .agg(count(lit(1)).as("_sides"))
      .where(col("_sides") === 2)
      .agg(count(lit(1)).as("_shared"))
    per.groupBy(col("split"))
      .agg(sum(col("_n")).as("n_rows"), count(lit(1)).as("n_entities"))
      .crossJoin(broadcast(shared))
      .select(col("split"), col("n_rows"), col("n_entities"),
        coalesce(col("_shared"), lit(0L)).as("n_shared_entities"))
  }

  /** Gini coefficient of a non-negative LONG measure (token counts, bytes,
    * cluster sizes) — the corpus-concentration number behind "10% of the
    * docs carry 80% of the tokens". One row: `(n, total, gini)` at 6dp,
    * `G = 2·Σ rank_i·x_i / (n·Σx) − (n+1)/n` over ascending values.
    *
    * Scale shape: closed form over the VALUE HISTOGRAM — rows with value
    * v occupy ranks F_v+1..F_v+c_v (F_v = rows strictly below v), so
    * `Σ rank·x = Σ_v v·(c_v·F_v + c_v(c_v+1)/2)` — all exact integer
    * arithmetic on the bounded distinct-value frame; the prefix count is
    * a self-join on that bounded histogram, never a global rank window
    * over raw rows. The final expression is one double over exact longs —
    * engine-exact with no rounding staging.
    */
  def gini(df: DataFrame, valueCol: String): DataFrame = {
    val h = df.select(col(valueCol).cast("long").as("_v"))
      .groupBy(col("_v")).agg(count(lit(1)).as("_c"))
      .localCheckpoint(eager = false)
    val pre = h.join(broadcast(h.select(col("_v").as("_u"), col("_c").as("_cu"))),
        col("_u") < col("_v"), "left")
      .groupBy(col("_v"), col("_c"))
      .agg(coalesce(sum(col("_cu")), lit(0L)).as("_f"))
    pre.select(col("_c"), (col("_v") * col("_c")).as("_vc"),
        (col("_v") * (col("_c") * col("_f") +
          expr("(_c * (_c + 1)) div 2"))).as("_r"))
      .agg(sum(col("_c")).as("_n"), sum(col("_vc")).as("_tot"),
        sum(col("_r")).as("_ri"))
      .select(col("_n").as("n"), col("_tot").as("total"),
        round(when(col("_tot") > 0 && col("_n") > 0,
          lit(2.0) * col("_ri") / (col("_n").cast("double") * col("_tot")) -
            (col("_n") + 1).cast("double") / col("_n"))
          .otherwise(lit(0.0)), 6).as("gini"))
  }

  /** Benford first-significant-digit audit of a positive monetary/measure
    * column — the data-forensics check for fabricated or truncated feeds
    * (natural multi-scale data follows `P(d) = log10(1 + 1/d)`; a flat or
    * spiked digit histogram flags synthetic rows). Output one row per
    * digit 1–9: `(digit, n, share, expected, delta)` at 6dp; zero-count
    * digits are kept (their deficit IS the signal).
    *
    * Determinism contract: values quantize to integer units
    * (`round(x·10^scale)` — exact for money-like columns), and the first
    * digit comes from the INTEGER's string head — never from
    * `floor(log10(x))`, whose 1-ulp wobble at exact powers of ten
    * misclassifies boundary values differently per engine. The expected
    * shares are driver-baked 6dp literals, so no engine's `log10` is in
    * the compare path.
    *
    * Scale shape: one projection + one 9-key hash agg + a one-row total;
    * the digit/expected frame is a 9-row broadcast.
    */
  def benfordAudit(df: DataFrame, valueCol: String,
      scale: Int = 2): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val expected = (1 to 9).map(d => (d,
      BigDecimal(math.log10(1.0 + 1.0 / d))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
    val exp = expected.toDF("digit", "expected")
    val mult = math.pow(10.0, scale)
    val digits = df
      .select(round(col(valueCol) * mult).cast("long").as("_c"))
      .where(col("_c") > 0)
      .select(substring(col("_c").cast("string"), 1, 1).cast("int")
        .as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("_n"))
    // greatest(Σ, 1): an all-nonpositive/empty feed reports 0.0 shares
    // (their deficit vs expected IS the verdict), never 9 NULL rows
    val tot = digits.agg(greatest(sum(col("_n")), lit(1L)).as("_t"))
    broadcast(exp).join(digits, Seq("digit"), "left")
      .crossJoin(broadcast(tot))
      .select(col("digit"), coalesce(col("_n"), lit(0L)).as("n"),
        round(coalesce(col("_n"), lit(0L)).cast("double") / col("_t"), 6)
          .as("share"),
        col("expected"),
        round(coalesce(col("_n"), lit(0L)).cast("double") / col("_t") -
          col("expected"), 6).as("delta"))
  }

  /** The 6dp expected-share literals, for the oracle's VALUES list
    * (cast ::DOUBLE — a bare decimal literal would type the column
    * DECIMAL and trip the dtype-pairing gate).
    */
  def benfordExpectedSql: String =
    (1 to 9).map { d =>
      val e = BigDecimal(math.log10(1.0 + 1.0 / d))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP)
      s"($d, $e::DOUBLE)"
    }.mkString(", ")

  /** Capped proportional budget allocation (waterfilling) across sources —
    * the mixture-design step AFTER [[mixtureWeights]]: a token budget is
    * split ∝ weight, but a source can't give more than it has, and its
    * surplus re-flows to the others ∝ their weights. Input one row per
    * source `(source, weight1e6, cap)` (integer-scaled weights, token
    * caps); output `(source, weight1e6, cap, allocated, saturated)`.
    *
    * Algorithm (synchronous rounds, ≤ one per source): allocate the
    * remaining budget to unsaturated sources as `R·w div ΣW` (exact
    * integer floor); any allocation meeting its cap saturates AT the cap
    * and returns its surplus to the pool; stop when a round saturates
    * nothing. Floor remainders (< one unit per source per round) stay
    * unallocated — deterministic, oracle-unrollable.
    *
    * Scale shape: the per-source frame is bounded by the source
    * vocabulary (broadcast-tiny by contract); each round is one one-row
    * aggregate crossJoined back — the driver loop only counts rounds.
    */
  def waterfillAllocate(perSource: DataFrame, budget: Long): DataFrame = {
    require(budget >= 0)
    var cur = perSource.select(col("source"), col("weight1e6"), col("cap"),
      lit(null).cast("long").as("allocated"), lit(false).as("saturated"))
      .localCheckpoint(eager = false)
    var done = false
    var rounds = 0
    // each non-final round saturates ≥ 1 source, so sources + 1 rounds
    // always reach the fixpoint (one bounded count on the tiny frame)
    val maxRounds = cur.count().toInt + 1
    var prevSat = 0L
    while (!done && rounds < maxRounds) {
      rounds += 1
      val pool = cur.agg(
        (lit(budget) - coalesce(sum(when(col("saturated"),
          col("allocated"))), lit(0L))).as("_r"),
        coalesce(sum(when(!col("saturated"), col("weight1e6"))), lit(0L))
          .as("_w"))
      val stepped = cur.crossJoin(broadcast(pool))
        .select(col("source"), col("weight1e6"), col("cap"),
          when(col("saturated"), col("allocated"))
            // 38-digit intermediate: R·w overflows Long once budgets reach
            // corpus scale (1e14 tokens · 1e6 weight); div returns BIGINT
            .otherwise(when(col("_w") > 0,
              expr("CAST(_r AS DECIMAL(38,0)) * weight1e6 div _w"))
              .otherwise(lit(0L)))
            .as("_a"),
          col("saturated"))
      val next = stepped.select(col("source"), col("weight1e6"), col("cap"),
          when(!col("saturated") && col("_a") >= col("cap"), col("cap"))
            .otherwise(col("_a")).as("allocated"),
          (col("saturated") || col("_a") >= col("cap")).as("saturated"))
        .localCheckpoint(eager = false)
      // a round that saturates nothing is final (ONE bounded one-row
      // collect per round; the previous count carries in a local)
      val sat = next
        .agg(coalesce(sum(when(col("saturated"), 1L).otherwise(0L)),
          lit(0L)))
        .collect()(0).getLong(0)
      cur = next
      done = sat == prevSat
      prevSat = sat
    }
    cur
  }

  /** DPO-style preference-pair assembly: within each group, pair the
    * rank-i BEST-scoring doc with the rank-i WORST (i = 1..pairs), ties
    * on id ascending, keeping only pairs with a strictly positive margin
    * and distinct members. Output
    * `(group, pair_rank, chosen_id, rejected_id, margin)` — the chosen /
    * rejected tuple layout of a preference-optimization training set.
    *
    * Scale shape: the top list and the bottom list are each ONE bounded
    * top-k aggregate pass ([[graft.functions.TopKByDistance]]'s map-side-reduced
    * buffer — at most `pairs` rows per group cross the shuffle), never a
    * per-group window over the raw corpus. The pairing join runs on the
    * post-aggregation frame (≤ `pairs` rows per group per side). The
    * score is quantized to 1e-4 longs for the buffer's (dist, id)
    * ordering — exactly the 4dp-rounded score the contract exposes.
    */
  def preferencePairs(docs: DataFrame, scoreCol: String, pairs: Int,
      groupCol: String = "source", idCol: String = "doc_id"): DataFrame = {
    val base = docs.select(col(groupCol).as("_g"), col(idCol).as("_id"),
      round(col(scoreCol) * 10000).cast("long").as("_s1e4"))
    def ranked(d: DataFrame, distCol: Column, out: String): DataFrame =
      d.groupBy(col("_g"))
        .agg(graft.functions.TopKByDistance.topk(col("_id"), distCol, pairs)
          .as("_nn"))
        .select(col("_g"), posexplode(col("_nn")).as(Seq("_p", "_e")))
        .select(col("_g"), (col("_p") + 1).cast("long").as("pair_rank"),
          col("_e").getField("id").as(s"${out}_id"),
          col("_e").getField("dist").as(s"_${out}_d"))
    // best = smallest negated score; worst = smallest raw score
    val best = ranked(base, -col("_s1e4").cast("double"), "chosen")
    val worst = ranked(base, col("_s1e4").cast("double"), "rejected")
    best.join(worst, Seq("_g", "pair_rank"))
      .where(col("chosen_id") =!= col("rejected_id"))
      .select(col("_g").as(groupCol), col("pair_rank"),
        col("chosen_id"), col("rejected_id"),
        ((-col("_chosen_d") - col("_rejected_d")) / 10000.0).as("margin"))
      .where(col("margin") > 0)
      .withColumn("margin", round(col("margin"), 4))
  }
}
