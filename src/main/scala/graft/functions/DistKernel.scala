package graft.functions

/** Shared tight-loop distance kernels for the batch-search aggregates and
  * expressions ([[BatchTopK]], [[NearestHeadsExpr]]).
  *
  * Numeric contract (oracle exactness): accumulate in double, strictly
  * left-to-right per pair — identical results to [[VectorDistance]] and the
  * DuckDB `list_sum(list_transform(...))` rendering in `Tables.distSql`.
  *
  * Performance contract: metric dispatch happens ONCE per scan (int tag,
  * never a string match inside the per-candidate loop) and the candidate
  * set is flattened into ONE contiguous array (stride = dim) so the scan is
  * sequential memory access instead of per-candidate pointer chasing. For
  * l2sq the running sum is monotone nondecreasing, so a candidate whose
  * partial sum already exceeds the buffer's current worst can be abandoned
  * mid-vector — exact (it could never be inserted) and profitable once
  * vectors are wide; gated on dim >= [[AbandonMinDim]].
  */
object DistKernel {
  final val L2 = 0
  final val Dot = 1
  final val Ip = 2
  final val Cos = 3

  /** Early-abandon pays for its per-element compare only on wide vectors.
    * The abandon guard is written `!(s > bound)` rather than `s <= bound` so
    * a NaN partial sum (NaN input component) keeps scanning and reaches the
    * insert just like the non-abandon path — behavior must not differ by
    * vector width on NaN-containing input.
    */
  final val AbandonMinDim = 16

  def tag(metric: String): Int = metric match {
    case "l2sq"      => L2
    case "dot"       => Dot
    case "ip"        => Ip
    case "cos"       => Cos
    case other => throw new IllegalArgumentException(s"unknown metric: $other")
  }

  /** Single-pair distance over the first `m` components (ragged fallback).
    * `qNorm`/`vNorm` are the FULL-length squared norms (cosine only).
    */
  def pair(q: Array[Double], v: Array[Double], m: Int, tag: Int,
      qNorm: Double, vNorm: Double): Double = tag match {
    case L2 =>
      var s = 0.0; var i = 0
      while (i < m) { val x = q(i) - v(i); s += x * x; i += 1 }
      s
    case Dot =>
      var s = 0.0; var i = 0
      while (i < m) { s += q(i) * v(i); i += 1 }
      s
    case Ip =>
      var s = 0.0; var i = 0
      while (i < m) { s += q(i) * v(i); i += 1 }
      -s
    case Cos =>
      var s = 0.0; var i = 0
      while (i < m) { s += q(i) * v(i); i += 1 }
      val denom = math.sqrt(qNorm * vNorm)
      if (denom == 0.0) 1.0 else 1.0 - s / denom
  }

  /** ONE query row against ALL flattened candidates → bounded top-k into
    * `buf` ([[NearestHeadsExpr]] shape). `q.length >= dim` required.
    */
  def scanFlat(q: Array[Double], flat: Array[Double], ids: Array[Long],
      norms: Array[Double], dim: Int, tag: Int, buf: TopKBuffer): Unit = {
    val n = ids.length
    tag match {
      case L2 if dim >= AbandonMinDim =>
        var h = 0; var base = 0
        while (h < n) {
          val bound =
            if (buf.size == buf.k) buf.dists(0) else Double.PositiveInfinity
          var s = 0.0; var i = 0
          while (i < dim && !(s > bound)) {
            val x = q(i) - flat(base + i); s += x * x; i += 1
          }
          if (!(s > bound)) buf.insert(s, ids(h))
          h += 1; base += dim
        }
      case L2 =>
        var h = 0; var base = 0
        while (h < n) {
          var s = 0.0; var i = 0
          while (i < dim) { val x = q(i) - flat(base + i); s += x * x; i += 1 }
          buf.insert(s, ids(h))
          h += 1; base += dim
        }
      case Dot =>
        var h = 0; var base = 0
        while (h < n) {
          var s = 0.0; var i = 0
          while (i < dim) { s += q(i) * flat(base + i); i += 1 }
          buf.insert(s, ids(h))
          h += 1; base += dim
        }
      case Ip =>
        var h = 0; var base = 0
        while (h < n) {
          var s = 0.0; var i = 0
          while (i < dim) { s += q(i) * flat(base + i); i += 1 }
          buf.insert(-s, ids(h))
          h += 1; base += dim
        }
      case Cos =>
        var qNorm = 0.0
        var j = 0
        while (j < q.length) { qNorm += q(j) * q(j); j += 1 }
        var h = 0; var base = 0
        while (h < n) {
          var s = 0.0; var i = 0
          while (i < dim) { s += q(i) * flat(base + i); i += 1 }
          val denom = math.sqrt(qNorm * norms(h))
          buf.insert(if (denom == 0.0) 1.0 else 1.0 - s / denom, ids(h))
          h += 1; base += dim
        }
    }
  }

  /** ONE corpus row against ALL flattened queries, each with its own bounded
    * buffer ([[BatchTopK]] shape). `v.length >= dim` required; `vNorm` is
    * v's full-length squared norm (cosine only).
    */
  def updateAll(v: Array[Double], flatQ: Array[Double], qNorms: Array[Double],
      dim: Int, tag: Int, bufs: Array[TopKBuffer], rowId: Long,
      vNorm: Double): Unit = {
    val nq = bufs.length
    tag match {
      case L2 if dim >= AbandonMinDim =>
        var qi = 0; var base = 0
        while (qi < nq) {
          val buf = bufs(qi)
          val bound =
            if (buf.size == buf.k) buf.dists(0) else Double.PositiveInfinity
          var s = 0.0; var i = 0
          while (i < dim && !(s > bound)) {
            val x = flatQ(base + i) - v(i); s += x * x; i += 1
          }
          if (!(s > bound)) buf.insert(s, rowId)
          qi += 1; base += dim
        }
      case L2 =>
        var qi = 0; var base = 0
        while (qi < nq) {
          var s = 0.0; var i = 0
          while (i < dim) { val x = flatQ(base + i) - v(i); s += x * x; i += 1 }
          bufs(qi).insert(s, rowId)
          qi += 1; base += dim
        }
      case Dot =>
        var qi = 0; var base = 0
        while (qi < nq) {
          var s = 0.0; var i = 0
          while (i < dim) { s += flatQ(base + i) * v(i); i += 1 }
          bufs(qi).insert(s, rowId)
          qi += 1; base += dim
        }
      case Ip =>
        var qi = 0; var base = 0
        while (qi < nq) {
          var s = 0.0; var i = 0
          while (i < dim) { s += flatQ(base + i) * v(i); i += 1 }
          bufs(qi).insert(-s, rowId)
          qi += 1; base += dim
        }
      case Cos =>
        var qi = 0; var base = 0
        while (qi < nq) {
          var s = 0.0; var i = 0
          while (i < dim) { s += flatQ(base + i) * v(i); i += 1 }
          val denom = math.sqrt(qNorms(qi) * vNorm)
          bufs(qi).insert(if (denom == 0.0) 1.0 else 1.0 - s / denom, rowId)
          qi += 1; base += dim
        }
    }
  }
}
