package graft.sources

import java.io.{DataOutputStream, FileOutputStream}
import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Readers/writers for the reference's legacy vector-file formats
  * (S1-S3, `AnnService/inc/Helper/VectorSetReaders/` DefaultReader,
  * XvecReader, TxtReader; `docs/GettingStart.md` "Input File Format"):
  *
  *  - DEFAULT: `[int32 n][int32 d]` header + n·d little-endian float32 rows
  *  - XVEC:    per record `[int32 d][d float32]`
  *  - TXT:     `meta\tv1|v2|...` per line
  *
  * Reads go through `binaryFile` scans + per-file decode in mapPartitions —
  * one task per file, so a directory of shard files parallelizes across the
  * cluster (the reference reads one file with a thread pool; a 100 TB corpus
  * is *many* files, which is exactly Spark's scan model). Ids are assigned
  * per file from a caller-provided base (ingest-time dense VIDs,
  * `Common.h:117`).
  */
object LegacyFormats {

  val schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("vec", ArrayType(FloatType, containsNull = false), nullable = false)))

  private def decodeDefault(bytes: Array[Byte]): Iterator[(Long, Array[Float])] = {
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val n = bb.getInt(); val d = bb.getInt()
    (0L until n.toLong).iterator.map { i =>
      val v = new Array[Float](d)
      var j = 0
      while (j < d) { v(j) = bb.getFloat(); j += 1 }
      (i, v)
    }
  }

  private def decodeXvec(bytes: Array[Byte]): Iterator[(Long, Array[Float])] = {
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    new Iterator[(Long, Array[Float])] {
      private var i = 0L
      def hasNext: Boolean = bb.remaining() >= 4
      def next(): (Long, Array[Float]) = {
        val d = bb.getInt()
        val v = new Array[Float](d)
        var j = 0
        while (j < d) { v(j) = bb.getFloat(); j += 1 }
        val r = (i, v); i += 1; r
      }
    }
  }

  private def readBinary(
      spark: SparkSession, path: String,
      decode: Array[Byte] => Iterator[(Long, Array[Float])]): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(path)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (_, bytes) => decode(bytes).map { case (i, v) => (i, v) } }
      .toDF("id", "vec")
  }

  def readDefault(spark: SparkSession, path: String): DataFrame =
    readBinary(spark, path, decodeDefault)

  def readXvec(spark: SparkSession, path: String): DataFrame =
    readBinary(spark, path, decodeXvec)

  /** TXT: `meta\tv1|v2|...`; line number (per file) becomes the id. */
  def readTxt(spark: SparkSession, path: String, delimiter: String = "|"): DataFrame = {
    import spark.implicits._
    spark.read.text(path).rdd.zipWithIndex()
      .map { case (row, idx) =>
        val line = row.getString(0)
        val tab = line.indexOf('\t')
        val meta = line.substring(0, tab)
        val vec = line.substring(tab + 1).split(java.util.regex.Pattern.quote(delimiter))
          .filter(_.nonEmpty).map(_.toFloat)
        (idx, vec, meta)
      }.toDF("id", "vec", "meta")
  }

  // ---- truth files (S5, `TruthSet.h:16-160`: DEFAULT truth format =
  //      [int32 nq][int32 K] + nq*K int32 ids + optional nq*K float dists) ----

  def writeTruthDefault(
      path: String,
      truth: Seq[Seq[(Int, Float)]], // per query: K (id, dist) ascending
      withDists: Boolean = true): Unit = {
    val nq = truth.length
    val k = truth.headOption.map(_.length).getOrElse(0)
    val sz = 8 + nq * k * 4 + (if (withDists) nq * k * 4 else 0)
    val bb = ByteBuffer.allocate(sz).order(ByteOrder.LITTLE_ENDIAN)
    bb.putInt(nq).putInt(k)
    truth.foreach(_.foreach { case (id, _) => bb.putInt(id) })
    if (withDists) truth.foreach(_.foreach { case (_, d) => bb.putFloat(d) })
    val out = new FileOutputStream(path)
    try out.write(bb.array()) finally out.close()
  }

  /** Truth file → `(query_id, rank, id [, dist])`. */
  def readTruthDefault(spark: SparkSession, path: String, withDists: Boolean = true): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(path)
      .select(col("content")).as[Array[Byte]]
      .flatMap { bytes =>
        val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
        val nq = bb.getInt(); val k = bb.getInt()
        val ids = Array.fill(nq, k)(bb.getInt())
        val dists =
          if (withDists) Array.fill(nq, k)(bb.getFloat())
          else Array.fill(nq, k)(0f)
        for (qi <- 0 until nq; r <- 0 until k)
          yield (qi.toLong, r + 1, ids(qi)(r).toLong, dists(qi)(r))
      }.toDF("query_id", "rank", "id", "dist")
  }

  // ---- truth XVEC/TXT (`Helper/DefinitionList.h:115-128` TruthFileType:
  //      XVEC = per query record [int32 K][K int32 ids] (ivecs); TXT = one
  //      line per query, ids space-separated) ----

  def writeTruthXvec(path: String, truth: Seq[Seq[Int]]): Unit = {
    val total = truth.map(t => 4 + t.length * 4).sum
    val bb = ByteBuffer.allocate(total).order(ByteOrder.LITTLE_ENDIAN)
    truth.foreach { t => bb.putInt(t.length); t.foreach(bb.putInt) }
    val out = new FileOutputStream(path)
    try out.write(bb.array()) finally out.close()
  }

  /** XVEC truth file(s) → `(query_id, rank, id)`. Query ids number GLOBALLY
    * across files in path order (same multi-file semantics as
    * [[readTruthTxt]]'s line numbering); a record truncated mid-ids fails
    * with the offending path instead of a bare buffer underflow.
    */
  def readTruthXvec(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(path)
      .select(col("path"), col("content")).as[(String, Array[Byte])]
      .rdd.sortBy(_._1)
      .flatMap { case (p, bytes) =>
        val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
        val recs = scala.collection.mutable.ArrayBuffer.empty[Array[Int]]
        while (bb.remaining() >= 4) {
          val k = bb.getInt()
          // a corrupt/negative length would pass the remaining-bytes check
          // (k*4 < 0) and silently misnumber every later query
          require(k >= 0, s"negative XVEC truth record length $k in $p")
          require(bb.remaining() >= k * 4,
            s"truncated XVEC truth record (k=$k, ${bb.remaining()} bytes left) in $p")
          recs += Array.fill(k)(bb.getInt())
        }
        recs
      }
      .zipWithIndex()
      .flatMap { case (ids, qi) =>
        ids.zipWithIndex.map { case (id, r) => (qi, r + 1, id.toLong) }
      }.toDF("query_id", "rank", "id")
  }

  def writeTruthTxt(path: String, truth: Seq[Seq[Int]]): Unit = {
    val out = new java.io.PrintWriter(path, "UTF-8")
    try truth.foreach(t => out.println(t.mkString(" "))) finally out.close()
  }

  /** TXT truth file → `(query_id, rank, id)`; line number is the query id. */
  def readTruthTxt(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.read.text(path).rdd.zipWithIndex()
      .flatMap { case (row, qi) =>
        row.getString(0).trim.split("\\s+").filter(_.nonEmpty).zipWithIndex
          .map { case (id, r) => (qi, r + 1, id.toLong) }
      }.toDF("query_id", "rank", "id")
  }

  // ---- local writers (test fixtures / export parity) ----

  def writeDefault(path: String, vecs: Seq[Array[Float]]): Unit = {
    val d = vecs.headOption.map(_.length).getOrElse(0)
    val bb = ByteBuffer.allocate(8 + vecs.length * d * 4).order(ByteOrder.LITTLE_ENDIAN)
    bb.putInt(vecs.length).putInt(d)
    vecs.foreach(_.foreach(bb.putFloat))
    val out = new FileOutputStream(path)
    try out.write(bb.array()) finally out.close()
  }

  def writeXvec(path: String, vecs: Seq[Array[Float]]): Unit = {
    val total = vecs.map(v => 4 + v.length * 4).sum
    val bb = ByteBuffer.allocate(total).order(ByteOrder.LITTLE_ENDIAN)
    vecs.foreach { v => bb.putInt(v.length); v.foreach(bb.putFloat) }
    val out = new FileOutputStream(path)
    try out.write(bb.array()) finally out.close()
  }

  def writeTxt(path: String, rows: Seq[(String, Array[Float])], delimiter: String = "|"): Unit = {
    val out = new java.io.PrintWriter(path, "UTF-8")
    try rows.foreach { case (meta, v) =>
      out.println(meta + "\t" + v.mkString(delimiter))
    } finally out.close()
  }
}
