package graft.tools

import graft.functions.{DistKernel, TopKBuffer}

/** Driver-side microbench of the nearest-heads L2 kernel (not driver
  * contract): per-core throughput, to separate kernel speed from task
  * parallelism in the q07 wall time.
  */
object ProfileKernel {
  def main(args: Array[String]): Unit = {
    val rows = 60000
    val nHeads = 3000
    val dim = 6
    val rnd = new java.util.Random(42)
    val flat = Array.fill(nHeads * dim)(rnd.nextDouble())
    val ids = Array.tabulate(nHeads)(_.toLong)
    val norms = new Array[Double](nHeads)
    val q = Array.fill(dim)(rnd.nextDouble())
    val buf = new TopKBuffer(4)
    // warm JIT
    var w = 0
    while (w < 3000) {
      buf.reset(); DistKernel.scanFlat(q, flat, ids, norms, dim, DistKernel.L2, buf); w += 1
    }
    var rep = 0
    while (rep < 3) {
      val t0 = System.nanoTime()
      var r = 0
      var acc = 0.0
      while (r < rows) {
        q(0) = r * 1e-5
        buf.reset()
        DistKernel.scanFlat(q, flat, ids, norms, dim, DistKernel.L2, buf)
        acc += buf.dists(0)
        r += 1
      }
      val secs = (System.nanoTime() - t0) / 1e9
      val pairs = rows.toLong * nHeads
      println(f"[prof] scanFlat $rows%d rows x $nHeads%d heads: $secs%6.3f s  " +
        f"(${pairs / secs / 1e6}%8.1f Mpairs/s, ns/pair ${secs * 1e9 / pairs}%5.2f, acc=$acc%.3f)")
      rep += 1
    }
  }
}
