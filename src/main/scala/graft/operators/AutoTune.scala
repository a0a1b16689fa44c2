package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Parameter auto-tuning harnesses — the engine-side analogue of the
  * reference's NNI-driven knob search (`Tools/nni-auto-tune/main.py`,
  * `search_space.json`): grid-sweep build/search knobs over the recall
  * harnesses the repo already ships (IVF recall-vs-nprobe, LSH banding
  * recall) and mark the winning config under a recall floor.
  *
  * Where the reference maximizes measured QPS under a recall constraint
  * (wall-clock, host-dependent), these sweeps rank configs by a
  * DETERMINISTIC cost proxy — the number of candidates the config forces
  * the engine to score (probed posting entries for IVF, candidate pairs
  * for LSH). Candidate volume is what QPS is downstream of in both
  * engines, and it is integer-exact, so the whole sweep table (including
  * the `best` pick) is oracle-able.
  *
  * Scale shape: per sweep, the TRUTH is computed once and checkpointed;
  * each index build is shared across all search-knob configs probing it;
  * each config costs bounded joins/aggs over the shared frames. Sweeps are
  * meant to run on a bounded sample of the corpus (the reference's
  * preprocessing.py samples for exactly this reason) — the chosen config
  * then drives the full-scale build.
  */
object AutoTune {

  /** The deterministic best-config rule both sweeps share: prefer configs
    * meeting the recall floor (given in integer BASIS POINTS, 8000 = 0.80,
    * so the comparison `n_hit·10000 ≥ bp·n_true` is integer-exact in any
    * engine — a double floor would round 0.7·10000 below 7000); among
    * those, the CHEAPEST (fewest scored
    * candidates); if none meets the floor, the highest recall. All ties
    * fall to the config columns ascending. Implemented as one lexicographic
    * struct-min aggregate over the (bounded, few-row) sweep table folded to
    * a broadcast row — no window, no collect.
    */
  private[graft] def markBest(table: DataFrame, cfgCols: Seq[String],
      recallFloorBp: Int): DataFrame = {
    val meets = col("n_hit") * lit(10000L) >= lit(recallFloorBp.toLong) * col("n_true")
    val key = struct(
      (when(meets, lit(0)).otherwise(lit(1))).as("miss") +:
        when(meets, col("n_cand")).otherwise(-col("n_hit")).as("cost") +:
        cfgCols.map(c => col(c).as(c)): _*)
    val pick = table.agg(min(key).as("_k"))
      .select((cfgCols.map(c => col(s"_k.$c").as(s"_b_$c"))): _*)
    table.crossJoin(broadcast(pick))
      .withColumn("best",
        cfgCols.map(c => col(c) === col(s"_b_$c")).reduce(_ && _))
      .drop(cfgCols.map(c => s"_b_$c"): _*)
  }

  /** IVF knob sweep: `(replicas × nprobe)` at a fixed centroid ratio.
    * Output one row per config: `(replicas, nprobe, n_true, n_hit, recall,
    * n_cand, best)` where `n_cand` is the probed posting-entry count
    * (stage-2 work) and `best` marks [[markBest]]'s pick.
    *
    * The truth scan runs once; each replica level builds its postings once
    * (posting LENGTHS checkpoint as a |heads|-row frame); each nprobe level
    * is one bounded candidate-heads pass + two count aggregates.
    */
  def ivfSweep(
      queries: DataFrame,
      corpus: DataFrame,
      k: Int,
      centroidEveryNth: Int,
      replicasGrid: Seq[Int],
      nprobeGrid: Seq[Int],
      recallFloorBp: Int,
      metric: String = "cos"): DataFrame = {
    require(replicasGrid.nonEmpty && nprobeGrid.nonEmpty)
    val cents = Spann.selectHeadsModulo(corpus, centroidEveryNth)
      .localCheckpoint(true)
    val truth = Knn.search(queries, corpus, k, metric)
      .select(col("query_id"), col("id")).localCheckpoint(true)
    val nT = truth.agg(count(lit(1)).as("n_true"))
    val rows = replicasGrid.flatMap { r =>
      val postings = Spann.buildPostings(corpus, cents, r, metric)
        .localCheckpoint(true)
      val plen = postings.groupBy(col("head_id"))
        .agg(count(lit(1)).as("_plen")).localCheckpoint(true)
      nprobeGrid.map { np =>
        val hit = Spann.searchTwoStage(queries, cents, postings, k, np,
          metric = metric)
          .select(col("query_id"), col("id"))
          .join(truth, Seq("query_id", "id"), "left_semi")
          .agg(count(lit(1)).as("n_hit"))
        val cand = Spann.candidateHeads(queries, cents, np, metric = metric)
          .join(plen, Seq("head_id"))
          .agg(coalesce(sum(col("_plen")), lit(0L)).as("n_cand"))
        nT.crossJoin(broadcast(hit)).crossJoin(broadcast(cand))
          .select(lit(r).as("replicas"), lit(np).as("nprobe"),
            col("n_true"), col("n_hit"),
            when(col("n_true") > 0,
              col("n_hit").cast("double") / col("n_true").cast("double"))
              .as("recall"),
            col("n_cand"))
      }
    }
    markBest(rows.reduce(_.unionByName(_)), Seq("replicas", "nprobe"),
      recallFloorBp)
  }

  /** LSH banding knob sweep over [[Dedup.bandingRecall]]'s harness: per
    * `(numHashes, rowsPerBand)` config, recall of the banded candidates
    * against the exact-Jaccard truth at `threshold`, cost = candidate pair
    * count. Output `(num_hashes, rows_per_band, n_true, n_hit, recall,
    * n_cand, best)`.
    *
    * The shingle pass and exact truth are computed ONCE and shared by
    * every config (the harness's own economy, kept across the grid).
    */
  def lshBandSweep(
      docs: DataFrame,
      threshold: Double,
      configs: Seq[(Int, Int)],
      recallFloorBp: Int): DataFrame = {
    require(configs.nonEmpty)
    val sh = Dedup.shingles(docs).localCheckpoint(true)
    val truth = Dedup.jaccard(sh)
      .where(col("jaccard") >= threshold)
      .select(col("a"), col("b")).localCheckpoint(true)
    val nT = truth.agg(count(lit(1)).as("n_true"))
    val rows = configs.map { case (nh, rpb) =>
      val cand = Dedup.lshCandidates(
        Dedup.lshBands(Dedup.minhash(sh, nh), nh, rpb))
        .localCheckpoint(true)
      val nC = cand.agg(count(lit(1)).as("n_cand"))
      val nH = truth.join(cand, Seq("a", "b"), "left_semi")
        .agg(count(lit(1)).as("n_hit"))
      nT.crossJoin(broadcast(nC)).crossJoin(broadcast(nH))
        .select(lit(nh).as("num_hashes"), lit(rpb).as("rows_per_band"),
          col("n_true"), col("n_hit"),
          when(col("n_true") > 0,
            col("n_hit").cast("double") / col("n_true").cast("double"))
            .as("recall"),
          col("n_cand"))
    }
    markBest(rows.reduce(_.unionByName(_)), Seq("num_hashes", "rows_per_band"),
      recallFloorBp)
  }
}
