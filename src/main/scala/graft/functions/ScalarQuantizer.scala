package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-dimension scalar quantization (SQ8): each float component is mapped
  * to an 8-bit code on the corpus's per-dimension `[min, max]` range —
  * 4× smaller than float32 with no codebook training, the cheap sibling of
  * [[PQ]] (which the reference's quantizer surface is built around,
  * `AnnService/inc/Core/Common/PQQuantizer.h:15-60`; SQ8 is the standard
  * baseline that surface is compared against).
  *
  * All math is double-precision with a `floor(x + 0.5)` rounding step —
  * `floor` is exact in every IEEE engine, so codes are bit-reproducible by
  * the DuckDB oracle (Spark `round`'s HALF_UP vs DuckDB's rounding mode
  * never enters the picture).
  *
  * Scale posture: `fit` is one hash aggregation over `(dim)` — 2·d doubles
  * of state per task, map-side partial. `quantize`/`reconstruct` broadcast
  * the 2·d stats arrays (one row) and run as pure per-row projections
  * inside whole-stage codegen; nothing shuffles.
  */
object ScalarQuantizer {

  /** Per-dimension corpus range: `(dim, mn, mx)`, dim 0-based. */
  def fit(vecs: DataFrame, vecCol: String = "vec"): DataFrame =
    vecs.select(posexplode(col(vecCol)).as(Seq("dim", "_v")))
      .groupBy(col("dim"))
      .agg(min(col("_v")).cast("double").as("mn"),
        max(col("_v")).cast("double").as("mx"))

  /** The fitted stats as one broadcastable row of dim-ordered arrays
    * `(_mns, _mxs)` — `array_sort` on `(dim, mn, mx)` structs orders by
    * dim, so no nondeterministic `collect_list` ordering leaks through.
    */
  private def statsRow(stats: DataFrame): DataFrame =
    stats.agg(array_sort(collect_list(struct(col("dim"), col("mn"), col("mx"))))
        .as("_s"))
      .select(transform(col("_s"), s => s.getField("mn")).as("_mns"),
        transform(col("_s"), s => s.getField("mx")).as("_mxs"))

  private def codeExpr(v: Column, mn: Column, mx: Column): Column =
    when(mx === mn, lit(0L)).otherwise(
      floor((v.cast("double") - mn) / (mx - mn) * 255d + 0.5d).cast("long"))

  /** `(idCol, codes ARRAY<BIGINT>)` — code_i = round to nearest of
    * `(v_i - mn_i) / (mx_i - mn_i) * 255`; a constant dimension codes to 0.
    * Corpus values are inside the fitted range by construction, so codes
    * land in [0, 255] with no clamp.
    */
  def quantize(vecs: DataFrame, stats: DataFrame,
      idCol: String = "id", vecCol: String = "vec"): DataFrame =
    vecs.crossJoin(broadcast(statsRow(stats)))
      .select(col(idCol),
        transform(col(vecCol),
          (v, i) => codeExpr(v, element_at(col("_mns"), i + 1),
            element_at(col("_mxs"), i + 1))).as("codes"))

  /** Inverse map: code → `mn + code/255 · (mx - mn)` (double array). The
    * reconstruction a search path runs ADC-style distances against; see the
    * SQ spec for the recall-vs-exact check.
    */
  def reconstruct(codes: DataFrame, stats: DataFrame,
      idCol: String = "id", codesCol: String = "codes"): DataFrame =
    codes.crossJoin(broadcast(statsRow(stats)))
      .select(col(idCol),
        transform(col(codesCol), (c, i) => {
          val mn = element_at(col("_mns"), i + 1)
          val mx = element_at(col("_mxs"), i + 1)
          mn + c.cast("double") / 255d * (mx - mn)
        }).as("vec"))
}
