package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  // shared conf set ([[GraftSession]] — one place for the flags and their
  // rationale); verify keeps its historical 4-core default
  private[graft] def session(): SparkSession = GraftSession.build("4")

  // JSON string escape: backslash, quote, and ALL control chars (<0x20)
  // — a tab or CR in builder-authored SQL would otherwise make the
  // driver's json.load fail and silently zero the round's correctness.
  private def q(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  private[graft] def writeOracleJson(outDir: String, entries: Map[String, String]): Unit = {
    val json = entries.map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    ()
  }

  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional third arg: comma-separated query names — run (and emit oracle
    // entries for) just that subset; local-debugging aid, driver passes none
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").toSet) else None
    def keep(name: String): Boolean = only.forall(_.contains(name))
    val spark = session()
    new java.io.File(outDir).mkdirs()
    // oracle_sql.json is written FIRST: each query then flushes as its own
    // parquet directory, so a stalled/killed run still leaves a comparable
    // outDir for every query that finished (round 8's driver stall turned
    // the whole round's correctness artifact into `{}` because this file
    // was written last)
    // dynamic entries (data-dependent model literals, e.g. q217's fitted
    // PCA basis) are generated here — the fit caches, so the q217 query
    // run below reuses the identical model object
    writeOracleJson(outDir,
      (SparkEntry.oracleSql ++ SparkEntry.oracleSqlDynamic(spark, sfDir))
        .filter(kv => keep(kv._1)))
    // queries dump through a small thread pool: Spark schedules concurrent
    // jobs fine (FIFO within the one session), each query writes its own
    // directory, and no query shares mutable state (scratch subdirs are
    // per-query, fixture caches are a TrieMap). sf0.01 plans are small, so
    // wall time is driver/planning-bound — 4 in flight roughly quarters the
    // 6-minute serial sweep without oversubscribing the executor threads.
    val par = sys.env.getOrElse("SPARK_GRAFT_VERIFY_PAR", "4").toInt.max(1)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(par)
    val todo = SparkEntry.queries.filter(kv => keep(kv._1)).toSeq.sortBy(_._1)
    // per-query dump secs in the log (round-14 verdict item 7): the
    // registry's wall is the other half of the driver-window budget, so a
    // tail regression must be visible in the round it lands, same as
    // compare_oracle.py's per-oracle secs
    val secs = new java.util.concurrent.ConcurrentHashMap[String, Double]()
    val futures = todo.map { case (name, fn) =>
      pool.submit(new Runnable {
        override def run(): Unit = {
          val t0 = System.nanoTime()
          try {
            fn(spark, sfDir).coalesce(1).write.mode("overwrite")
              .parquet(s"$outDir/$name")
            val dt = (System.nanoTime() - t0) / 1e9
            secs.put(name, dt)
            println(f"[verify] $name ok in $dt%.1fs")
          } catch { case e: Throwable =>
            System.err.println(s"[verify] $name failed: ${e.getMessage}")
          }
        }
      })
    }
    futures.foreach(_.get())
    pool.shutdown()
    import scala.jdk.CollectionConverters._
    val slowest = secs.asScala.toSeq.sortBy(-_._2).take(10)
      .map { case (n, s) => f"$n=$s%.1f" }.mkString(" ")
    println(s"[verify] done: ${secs.size()}/${todo.size} dumped; slowest: $slowest")
    spark.stop()
  }
}
