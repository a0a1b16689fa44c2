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

  /** The reference's four vector value types (`Core/DefinitionList.h:6-11`:
    * Int8/UInt8/Int16/Float; typed readers instantiated per type in
    * `Helper/VectorSetReaders/DefaultReader.cpp` via GetValueTypeSize).
    * SURVEY §1.2 prescribes widen-to-float on read, so every reader yields
    * `ARRAY<FLOAT>` regardless of the on-disk element type — int8/uint8/int16
    * are exactly representable in float32, so reads are lossless.
    */
  private def elemWidth(valueType: String): Int = valueType.toLowerCase match {
    case "float" | "float32" => 4
    case "int8" | "uint8" => 1
    case "int16" => 2
    case other => sys.error(s"unknown vector value type $other")
  }

  private def readElem(bb: ByteBuffer, valueType: String): Float =
    valueType match {
      case "float" | "float32" => bb.getFloat()
      case "int8" => bb.get().toFloat
      case "uint8" => (bb.get() & 0xff).toFloat
      case "int16" => bb.getShort().toFloat
    }

  private def putElem(bb: ByteBuffer, valueType: String, x: Float): Unit =
    valueType match {
      case "float" | "float32" => bb.putFloat(x)
      case "int8" | "uint8" => bb.put(x.toInt.toByte)
      case "int16" => bb.putShort(x.toInt.toShort)
    }

  private def decodeDefault(
      bytes: Array[Byte], valueType: String): Iterator[(Long, Array[Float])] = {
    val vt = valueType.toLowerCase
    elemWidth(vt) // validate before the lazy iterator runs
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val n = bb.getInt(); val d = bb.getInt()
    (0L until n.toLong).iterator.map { i =>
      val v = new Array[Float](d)
      var j = 0
      while (j < d) { v(j) = readElem(bb, vt); j += 1 }
      (i, v)
    }
  }

  private def decodeXvec(
      bytes: Array[Byte], valueType: String): Iterator[(Long, Array[Float])] = {
    val vt = valueType.toLowerCase
    elemWidth(vt)
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    new Iterator[(Long, Array[Float])] {
      private var i = 0L
      def hasNext: Boolean = bb.remaining() >= 4
      def next(): (Long, Array[Float]) = {
        val d = bb.getInt()
        val v = new Array[Float](d)
        var j = 0
        while (j < d) { v(j) = readElem(bb, vt); j += 1 }
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

  def readDefault(
      spark: SparkSession, path: String, valueType: String = "float32"): DataFrame = {
    elemWidth(valueType) // validate on the driver, not inside a task
    readBinary(spark, path, decodeDefault(_, valueType))
  }

  def readXvec(
      spark: SparkSession, path: String, valueType: String = "float32"): DataFrame = {
    elemWidth(valueType)
    readBinary(spark, path, decodeXvec(_, valueType))
  }

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
          // long arithmetic: a huge k would overflow k*4 past the check
          require(bb.remaining() >= k.toLong * 4,
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

  // ---- legacy quantizer blob (`docs/GettingStart.md` "Quantizer File
  //      Format"): [u8 QuantizerType 0 NONE/1 PQ/2 OPQ][u8 ReconstructDataType
  //      0 int8/1 uint8/2 int16/3 float][i32 m][i32 k][i32 dsub]
  //      [m·k·dsub float32 codebooks][dim·dim float32 rotation when OPQ,
  //      row-major], little-endian ----

  /** Write codebooks (+ rotation when non-identity → OPQ type byte) in the
    * reference's binary quantizer layout. Centers are float32 on disk (the
    * reference's float ReconstructDataType) — double-precision centers round
    * through Float, so a roundtrip reproduces the FLOAT value exactly but
    * not arbitrary doubles; byte-level interop is the point of this format,
    * [[IndexStore]]'s parquet codebooks remain the lossless store.
    */
  def writeQuantizer(path: String, rcb: graft.functions.PQ.RotatedCodebooks): Unit = {
    val cb = rcb.cb
    val dim = rcb.rotation.length
    val isOpq = !rcb.rotation.zipWithIndex.forall { case (row, i) =>
      row.zipWithIndex.forall { case (x, j) => x == (if (i == j) 1.0 else 0.0) }
    }
    val total = 2 + 12 + 4 * cb.m * cb.k * cb.dsub + (if (isOpq) 4 * dim * dim else 0)
    val bb = ByteBuffer.allocate(total).order(ByteOrder.LITTLE_ENDIAN)
    bb.put((if (isOpq) 2 else 1).toByte) // QuantizerType
    bb.put(3.toByte) // ReconstructDataType float
    bb.putInt(cb.m).putInt(cb.k).putInt(cb.dsub)
    for (s <- 0 until cb.m; c <- 0 until cb.k; j <- 0 until cb.dsub)
      bb.putFloat(cb.centers(s)(c)(j).toFloat)
    if (isOpq)
      for (i <- 0 until dim; j <- 0 until dim) bb.putFloat(rcb.rotation(i)(j).toFloat)
    val out = new FileOutputStream(path)
    try out.write(bb.array()) finally out.close()
  }

  /** Read the reference quantizer blob back into codebooks (+ rotation for
    * OPQ; identity for plain PQ). Rejects NONE-type and non-float
    * reconstruct types (the other layouts are byte-quantized codebooks this
    * double-precision pipeline does not model).
    */
  def readQuantizer(path: String): graft.functions.PQ.RotatedCodebooks =
    decodeQuantizer(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)), path)

  /** [[readQuantizer]] over in-memory bytes (callers that read through a
    * non-local filesystem, e.g. [[IndexStore.load]]).
    */
  def decodeQuantizer(
      bytes: Array[Byte], path: String): graft.functions.PQ.RotatedCodebooks = {
    import graft.functions.PQ
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val qType = bb.get()
    val rType = bb.get()
    require(qType == 1 || qType == 2, s"unsupported QuantizerType $qType in $path")
    require(rType == 3, s"unsupported ReconstructDataType $rType (only float) in $path")
    val m = bb.getInt(); val k = bb.getInt(); val dsub = bb.getInt()
    require(m > 0 && k > 0 && dsub > 0, s"corrupt quantizer header ($m,$k,$dsub) in $path")
    val centers = Array.fill(m, k, dsub)(bb.getFloat().toDouble)
    val dim = m * dsub
    val rotation =
      if (qType == 2) Array.fill(dim, dim)(bb.getFloat().toDouble)
      else Array.tabulate(dim, dim)((i, j) => if (i == j) 1.0 else 0.0)
    PQ.RotatedCodebooks(rotation, PQ.Codebooks(m, k, dsub, centers))
  }

  // ---- local writers (test fixtures / export parity) ----

  /** Write in any of the four element types; callers are responsible for the
    * values fitting the target range (the reference likewise truncates on its
    * int writers) — integral floats in range roundtrip exactly.
    */
  def writeDefault(
      path: String, vecs: Seq[Array[Float]], valueType: String = "float32"): Unit = {
    val vt = valueType.toLowerCase
    val w = elemWidth(vt)
    val d = vecs.headOption.map(_.length).getOrElse(0)
    val bb = ByteBuffer.allocate(8 + vecs.length * d * w).order(ByteOrder.LITTLE_ENDIAN)
    bb.putInt(vecs.length).putInt(d)
    vecs.foreach(_.foreach(putElem(bb, vt, _)))
    val out = new FileOutputStream(path)
    try out.write(bb.array()) finally out.close()
  }

  def writeXvec(
      path: String, vecs: Seq[Array[Float]], valueType: String = "float32"): Unit = {
    val vt = valueType.toLowerCase
    val w = elemWidth(vt)
    val total = vecs.map(v => 4 + v.length * w).sum
    val bb = ByteBuffer.allocate(total).order(ByteOrder.LITTLE_ENDIAN)
    vecs.foreach { v => bb.putInt(v.length); v.foreach(putElem(bb, vt, _)) }
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
