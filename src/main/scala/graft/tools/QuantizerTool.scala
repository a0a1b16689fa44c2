package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.PQ
import graft.sources.LegacyFormats

/** The reference's quantizer-training CLI (`AnnService/src/Quantizer/
  * main.cpp:71-160`: read a vector file, train a PQ or OPQ quantizer with
  * 256 codes per subspace, save the binary quantizer blob and optionally
  * the quantized vectors). Training is [[PQ.train]]/[[PQ.trainOpq]]; the
  * blob is the reference-format codebook file `LegacyFormats.writeQuantizer`
  * emits and `readQuantizer` (or the reference itself) loads back.
  */
object QuantizerTool {

  final case class Report(
      rcb: PQ.RotatedCodebooks,
      quantizedPath: Option[String])

  def run(
      spark: SparkSession,
      vectorPath: String,
      dim: Int,
      quantizedDim: Int, // m subspaces (reference: dim/quantizedDim dims each)
      outPath: String,
      quantizerType: String = "PQQuantizer",
      vectorType: String = "DEFAULT",
      valueType: String = "float32",
      quantizedOut: Option[String] = None,
      maxIter: Int = 5): Report = {
    val vectors = vectorType.trim.toUpperCase match {
      case "DEFAULT" => LegacyFormats.readDefault(spark, vectorPath, valueType)
      case "XVEC" => LegacyFormats.readXvec(spark, vectorPath, valueType)
      case "TXT" => LegacyFormats.readTxt(spark, vectorPath).select(col("id"), col("vec"))
      case other => sys.error(s"unknown VectorType $other")
    }
    val rcb = quantizerType.trim.toLowerCase match {
      case "pqquantizer" | "pq" =>
        // identity rotation: the blob format always carries one
        PQ.RotatedCodebooks(
          Array.tabulate(dim, dim)((i, j) => if (i == j) 1.0 else 0.0),
          PQ.train(vectors, dim, quantizedDim, 256, maxIter))
      case "opqquantizer" | "opq" =>
        PQ.trainOpq(vectors, dim, quantizedDim, 256, maxIter)
      case other => sys.error(s"unknown QuantizerType $other")
    }
    LegacyFormats.writeQuantizer(outPath, rcb)
    val qp = quantizedOut.map { p =>
      PQ.quantizeOpq(vectors, rcb).write.mode("overwrite").parquet(p); p
    }
    Report(rcb, qp)
  }
}
