package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Market-basket association mining over a (basket, item) fact table —
  * the "frequently bought together" analytics family. The reference
  * engine's workloads stop at per-table aggregation; co-occurrence
  * mining is the canonical OLAP extension a user of this engine asks
  * for next, and its scale shape (bounded per-key self-join + keyed
  * count hydration) reuses the [[graft.operators.TextAnalysis]]
  * collocations pattern on a join-generated pair space instead of an
  * in-row one.
  */
object Association {

  /** Pairwise item lift: for item pairs co-occurring in at least
    * `minPairCount` baskets, `lift = P(ab) / (P(a)·P(b))` estimated over
    * baskets — `(pair_cnt · N) / (cnt_a · cnt_b)`. Output
    * `(item_a, item_b, pair_cnt, cnt_a, cnt_b, lift)` with
    * `item_a < item_b`, lift > 1 ⇒ the items attract, < 1 ⇒ repel.
    *
    * Determinism contract: one double expression over exact long counts,
    * `cast(pair_cnt)·N / (cast(cnt_a)·cnt_b)` — cast on each product's
    * head pins the multiply order and avoids long overflow at corpus
    * scale — then `round(·, 6)`; the oracle mirrors it verbatim.
    *
    * Scale shape: items dedupe per basket (one hash agg); the pair space
    * is a SELF-JOIN ON THE BASKET KEY — never all-pairs — and the
    * `maxBasket` stop guard drops degenerate mega-baskets BEFORE pairing
    * (the [[Dedup]] `MaxBandBucket` rationale: a basket with thousands of
    * items is a crawler artifact, and its pair fan-out is quadratic), so
    * shuffle ∝ Σ basket_size² ≤ N_baskets·maxBasket². Support counts are
    * keyed hash aggs; the basket total is a one-row broadcast.
    */
  def basketLift(facts: DataFrame, basketCol: String, itemCol: String,
      minPairCount: Long = 2L, maxBasket: Int = 64): DataFrame = {
    val bi = facts.select(col(basketCol).as("_b"), col(itemCol).as("_i"))
      .distinct()
    val kept = bi.join(
      bi.groupBy(col("_b")).agg(count(lit(1)).as("_sz"))
        .where(col("_sz") <= maxBasket).select(col("_b")),
      Seq("_b"))
    val nBaskets = kept.agg(countDistinct(col("_b")).as("_n"))
    val support = kept.groupBy(col("_i")).agg(count(lit(1)).as("_cnt"))
    kept.select(col("_b"), col("_i").as("item_a"))
      .join(kept.select(col("_b"), col("_i").as("item_b")), Seq("_b"))
      .where(col("item_a") < col("item_b"))
      .groupBy(col("item_a"), col("item_b"))
      .agg(count(lit(1)).as("pair_cnt"))
      .where(col("pair_cnt") >= minPairCount)
      .join(support.select(col("_i").as("item_a"), col("_cnt").as("cnt_a")),
        Seq("item_a"))
      .join(support.select(col("_i").as("item_b"), col("_cnt").as("cnt_b")),
        Seq("item_b"))
      .crossJoin(broadcast(nBaskets))
      .select(col("item_a"), col("item_b"), col("pair_cnt"),
        col("cnt_a"), col("cnt_b"),
        round(col("pair_cnt").cast("double") * col("_n") /
          (col("cnt_a").cast("double") * col("cnt_b")), 6).as("lift"))
  }

  /** Chi-square test of independence between two categorical columns,
    * with Cramér's V — the "is my language mix confounded with my source
    * mix" audit a mixture designer runs before reweighting a corpus.
    * Output ONE row: `(n, r, c, chi2, cramers_v)` where `r`/`c` are the
    * observed category counts, `chi2 = Σ_cells (o−e)²/e` over the FULL
    * r×c grid (zero-observed cells still contribute `e`), and
    * `cramers_v = sqrt(chi2 / (n · min(r−1, c−1)))` (0.0 when either
    * margin is a single category).
    *
    * Determinism contract: each cell's `(o−e)²/e` is one double
    * expression over exact long counts, rounded to 8dp and cast to
    * DECIMAL(38,8) BEFORE the sum, so the statistic is
    * reduction-order-independent and engine-exact; the oracle mirrors
    * the per-cell expression verbatim.
    *
    * Scale shape: one hash agg over the fact table builds the
    * contingency counts; every later step (margins, the r×c dense grid,
    * the final fold) runs on that post-aggregation frame, which is
    * bounded by |A|·|B| categories — broadcast-tiny by the categorical
    * contract. Nothing else shuffles.
    */
  /** Mutual information between two categorical columns — the
    * information-theoretic companion to [[categoricalAssociation]]'s chi²:
    * chi² asks "is the deviation from independence significant", MI asks
    * "how many nats does knowing A tell you about B" — the number a
    * mixture designer reads to decide whether `source` already encodes
    * `lang` (redundant stratification) or carries independent signal. One
    * row: `(n, h_a, h_b, mi, nmi)` in nats at 6dp, with
    * `nmi = mi / sqrt(h_a·h_b)` (0 when either marginal entropy is 0, i.e.
    * a constant column ⇒ nothing to tell).
    *
    * NULL categories are excluded up front (the [[categoricalAssociation]]
    * contract: missing values are not a category — a null key would count
    * in the joint but vanish from the margins' equi-joins, skewing every
    * p·log p term).
    *
    * Determinism contract: each cell/margin term is one double over exact
    * long counts — `(o/n)·ln(o·n/(ra·cb))` with the long products cast at
    * the head — rounded 8dp → DECIMAL(38,8) before the fold, so the sums
    * are order-independent; final stats round 6dp. MI needs only OBSERVED
    * cells (zero-observed cells contribute exactly 0), so unlike chi²
    * there is no dense r×c grid. Scale shape: one hash agg to the
    * contingency table (bounded by the category-pair count), margins as
    * keyed aggs over it, one-row broadcast total — no windows, no sorts.
    */
  def mutualInformation(df: DataFrame, aCol: String,
      bCol: String): DataFrame = {
    val obs = df.select(col(aCol).as("_a"), col(bCol).as("_b"))
      .where(col("_a").isNotNull && col("_b").isNotNull)
      .groupBy(col("_a"), col("_b")).agg(count(lit(1)).as("_o"))
    val rowm = obs.groupBy(col("_a")).agg(sum(col("_o")).as("_ra"))
    val colm = obs.groupBy(col("_b")).agg(sum(col("_o")).as("_cb"))
    val tot = obs.agg(sum(col("_o")).as("_n"))
    def entropyOf(margin: DataFrame, cnt: String, out: String): DataFrame =
      margin.crossJoin(broadcast(tot))
        .select(round(-(col(cnt).cast("double") / col("_n")) *
            log(col(cnt).cast("double") / col("_n")), 8)
          .cast("decimal(38,8)").as("_t"))
        .agg(coalesce(sum(col("_t")).cast("double"), lit(0.0)).as(out))
    val mi = obs.join(rowm, Seq("_a")).join(colm, Seq("_b"))
      .crossJoin(broadcast(tot))
      .select(round((col("_o").cast("double") / col("_n")) *
          log(col("_o").cast("double") * col("_n") /
            (col("_ra").cast("double") * col("_cb"))), 8)
        .cast("decimal(38,8)").as("_t"))
      .agg(coalesce(sum(col("_t")).cast("double"), lit(0.0)).as("_mi"))
    tot.crossJoin(broadcast(entropyOf(rowm, "_ra", "_ha")))
      .crossJoin(broadcast(entropyOf(colm, "_cb", "_hb")))
      .crossJoin(broadcast(mi))
      .select(col("_n").as("n"),
        round(col("_ha"), 6).as("h_a"), round(col("_hb"), 6).as("h_b"),
        round(col("_mi"), 6).as("mi"),
        round(when(col("_ha") > 0.0 && col("_hb") > 0.0,
            col("_mi") / sqrt(col("_ha") * col("_hb")))
          .otherwise(lit(0.0)), 6).as("nmi"))
  }

  def categoricalAssociation(df: DataFrame, aCol: String,
      bCol: String): DataFrame = {
    // NULL categories are excluded up front: a null-keyed group survives
    // the groupBy but can never match the dense-grid equi-join, so it
    // would contribute phantom (o=0, e>0) cells to chi2 while
    // countDistinct excludes it from r/c — the test is over OBSERVED
    // category pairs, missing values are not a category
    val obs = df.select(col(aCol).as("_a"), col(bCol).as("_b"))
      .where(col("_a").isNotNull && col("_b").isNotNull)
      .groupBy(col("_a"), col("_b")).agg(count(lit(1)).as("_o"))
    val rowm = obs.groupBy(col("_a")).agg(sum(col("_o")).as("_ra"))
    val colm = obs.groupBy(col("_b")).agg(sum(col("_o")).as("_cb"))
    val tot = obs.agg(sum(col("_o")).as("_n"),
      countDistinct(col("_a")).as("_r"), countDistinct(col("_b")).as("_c"))
    // dense r×c grid: zero-observed cells still carry their expected count
    val cells = rowm.crossJoin(colm)
      .join(obs, Seq("_a", "_b"), "left")
      .crossJoin(broadcast(tot))
      .select(col("_n"), col("_r"), col("_c"),
        coalesce(col("_o"), lit(0L)).cast("double").as("_od"),
        (col("_ra").cast("double") * col("_cb") / col("_n")).as("_e"))
      .select(col("_n"), col("_r"), col("_c"),
        round((col("_od") - col("_e")) * (col("_od") - col("_e")) / col("_e"), 8)
          .cast("decimal(38,8)").as("_t"))
    cells.groupBy(col("_n"), col("_r"), col("_c"))
      .agg(sum(col("_t")).cast("double").as("_chi2"))
      .select(col("_n").as("n"), col("_r").as("r"), col("_c").as("c"),
        round(col("_chi2"), 4).as("chi2"),
        round(when(least(col("_r"), col("_c")) > 1,
          sqrt(col("_chi2") /
            (col("_n") * (least(col("_r"), col("_c")) - 1))))
          .otherwise(lit(0.0)), 6).as("cramers_v"))
  }
}
