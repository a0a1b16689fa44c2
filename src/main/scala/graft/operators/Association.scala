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
}
