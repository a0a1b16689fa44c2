package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** 1-bit-per-dimension binary quantization: bit `d` of a vector's code is
  * set when component `d` lies above the corpus mean for that dimension.
  * 32× smaller than float32 — the coarsest rung of the quantizer ladder
  * ([[PQ]] 8×–16×, [[ScalarQuantizer]] 4×) and the standard candidate-
  * generation stage for billion-scale search: Hamming distance between two
  * codes is one XOR + popcount, so a candidate scan runs at memory
  * bandwidth and the exact metric only touches the top-R survivors
  * (see [[graft.operators.SimilaritySearch.binarySearch]]).
  *
  * Reference provenance: the quantizer surface this slots into is
  * `AnnService/inc/Core/Common/IQuantizer.h:15-60`; binary sign codes are
  * the degenerate 1-bit member of that family (the reference ships PQ/OPQ,
  * `PQQuantizer.h:15-60` — same fit/quantize/search-over-codes contract).
  *
  * Determinism (the oracle contract): vectors are integer-scaled
  * (×1000, rounded — the [[graft.operators.SimilaritySearch.lshCodes]]
  * convention), per-dimension sums are exact BIGINT sums, and the
  * mean-threshold test is cross-multiplied (`v·n > Σ`) so no division ever
  * happens — every bit is integer-exact and identical in any engine at any
  * partitioning. Magnitudes: |scaled| ≤ ~10⁶ and n ≤ ~10¹² keeps `v·n`
  * and `Σ` far inside the 2⁶³ range at 100 TB scale.
  *
  * Scale posture: [[fit]] is one map-side-combined hash aggregation keyed
  * by `dim` (d rows of state) folded to a single broadcastable row;
  * [[codes]] is a pure per-row projection inside whole-stage codegen —
  * nothing shuffles.
  */
object BinaryQuantizer {

  /** ≤64 dims pack into one BIGINT word (the embeddings fixture is 64-dim);
    * wider vectors take `ceil(dims/64)` words — extend [[codes]] to an
    * ARRAY<BIGINT> and sum per-word popcounts when needed.
    */
  val MaxDims = 64

  private def scaled(vecCol: Column): Column =
    transform(vecCol, v => round(v.cast("double") * 1000).cast("long"))

  /** Per-dimension corpus threshold state as ONE broadcastable row
    * `(_n BIGINT, _sums ARRAY<BIGINT>)` — `_sums(d)` = Σ over the corpus of
    * the integer-scaled component `d`, dim-ordered via `array_sort` on
    * `(dim, s)` structs (no `collect_list` ordering leak — the
    * [[ScalarQuantizer]] statsRow convention).
    */
  def fit(vecs: DataFrame, vecCol: String = "vec"): DataFrame =
    vecs.select(posexplode(scaled(col(vecCol))).as(Seq("dim", "_v")))
      .groupBy(col("dim"))
      .agg(sum(col("_v")).as("_s"), count(lit(1)).as("_c"))
      .agg(max(col("_c")).as("_n"),
        array_sort(collect_list(struct(col("dim"), col("_s")))).as("_ss"))
      .select(col("_n"), transform(col("_ss"), s => s.getField("_s")).as("_sums"))

  /** `(idCol, bcode BIGINT)` — bit `d` set iff `scaled(v_d) · n > Σ_d`
    * (strictly above the per-dimension mean). Bit 63's addend is
    * `1L << 63` = `Long.MinValue` — exact, and every consumer masks or
    * XORs, so the sign never matters (the [[graft.operators.Dedup.simhash64]]
    * convention).
    */
  def codes(vecs: DataFrame, stats: DataFrame, dims: Int,
      idCol: String = "id", vecCol: String = "vec"): DataFrame = {
    require(dims <= MaxDims, s"dims $dims > $MaxDims: use the multi-word extension")
    val withS = vecs
      .select(col(idCol), scaled(col(vecCol)).as("_sv"))
      .crossJoin(broadcast(stats))
    val code = (0 until dims).map { d =>
      val above = col("_sv").getItem(d) * col("_n") > element_at(col("_sums"), d + 1)
      when(above, lit(1L << d)).otherwise(lit(0L))
    }.reduce(_ + _)
    withS.select(col(idCol), code.as("bcode"))
  }

  /** Hamming distance between two packed codes, as a Column. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))
}
