package graft

import java.nio.file.Files

import org.apache.spark.sql.functions.col

import graft.operators.AutoTune
import graft.sources.LegacyFormats
import graft.tools.AutoTuner

/** The ini-driven knob-sweep driver (`Tools/nni-auto-tune/main.py`
  * analogue): grids in, sweep table + winning config out — end-to-end in
  * the reference's own vector format, like IndexBuilderSpec.
  */
class AutoTunerSpec extends SparkSpec {

  test("ini-driven IVF sweep end-to-end: full grid, one best pick, " +
    "pick obeys the floor-then-cost rule") {
    val dir = Files.createTempDirectory("autotune").toString
    val n = 200
    val dim = 10
    val vecs = (0 until n).map(i => Array.fill(dim)(i.toFloat))
    LegacyFormats.writeDefault(s"$dir/base.bin", vecs)
    LegacyFormats.writeDefault(s"$dir/query.bin", Seq(0, 5, 9).map(vecs(_)))
    val ini =
      s"""[Base]
         |ValueType=Float
         |DistCalcMethod=L2
         |VectorPath=$dir/base.bin
         |QueryPath=$dir/query.bin
         |
         |[AutoTune]
         |Harness=IVF
         |ResultNum=3
         |CentroidEveryNth=20
         |ReplicasGrid=1,2
         |NprobeGrid=1,2,4
         |RecallFloorBp=9000
         |""".stripMargin
    val report = AutoTuner.run(spark, ini)
    val rows = report.table.orderBy("replicas", "nprobe").collect()
    assert(rows.length === 6)
    assert(rows.count(_.getAs[Boolean]("best")) === 1)
    // every row carries the one shared truth size and a sane recall
    rows.foreach { r =>
      assert(r.getAs[Long]("n_true") === 9L)
      assert(r.getAs[Long]("n_hit") <= r.getAs[Long]("n_true"))
      assert(r.getAs[Long]("n_cand") >= 0L)
    }
    // more probes never hurt recall or shrink cost at fixed replicas
    for (rep <- Seq(1, 2)) {
      val byNp = rows.filter(_.getAs[Int]("replicas") == rep)
        .sortBy(_.getAs[Int]("nprobe"))
      assert(byNp.map(_.getAs[Long]("n_hit")).toSeq ===
        byNp.map(_.getAs[Long]("n_hit")).sorted.toSeq)
      assert(byNp.map(_.getAs[Long]("n_cand")).toSeq ===
        byNp.map(_.getAs[Long]("n_cand")).sorted.toSeq)
    }
    // the pick is the cheapest floor-meeting config (or max recall if
    // none meets) — recomputed here independently
    val meets = rows.filter(r =>
      r.getAs[Long]("n_hit") * 10000L >= 9000L * r.getAs[Long]("n_true"))
    val expect =
      (if (meets.nonEmpty) meets.minBy(r => (r.getAs[Long]("n_cand"),
        r.getAs[Int]("replicas"), r.getAs[Int]("nprobe")))
      else rows.minBy(r => (-r.getAs[Long]("n_hit"),
        r.getAs[Int]("replicas"), r.getAs[Int]("nprobe"))))
    val got = rows.filter(_.getAs[Boolean]("best")).head
    assert((got.getAs[Int]("replicas"), got.getAs[Int]("nprobe")) ===
      (expect.getAs[Int]("replicas"), expect.getAs[Int]("nprobe")))
    assert(report.best("replicas") ===
      expect.getAs[Int]("replicas").toString)
  }

  test("LSH banding sweep: wider bands cost less and recall less; " +
    "one best under the floor") {
    import spark.implicits._
    // 40 docs in 8 clusters of 5 near-identical members → plenty of true
    // pairs; distinct filler tokens keep cross-cluster Jaccard at zero
    val docs = (0 until 40).map { i =>
      val c = i % 8
      val base = s"cluster $c shares these exact tokens across all members " +
        s"alpha$c beta$c gamma$c delta$c epsilon$c zeta$c eta$c theta$c"
      (i.toLong, if (i < 8) base else s"$base filler${i}x")
    }.toDF("doc_id", "text")
    val table = AutoTune.lshBandSweep(
      docs, 0.3, Seq((16, 2), (16, 4), (16, 8)), 7000)
      .orderBy("rows_per_band").collect()
    assert(table.length === 3)
    assert(table.count(_.getAs[Boolean]("best")) === 1)
    val cands = table.map(_.getAs[Long]("n_cand")).toSeq
    assert(cands === cands.sorted.reverse, s"2-row bands must cast the " +
      s"widest net: $cands")
    val hits = table.map(_.getAs[Long]("n_hit")).toSeq
    assert(hits === hits.sorted.reverse)
    // AutoTuner.run drives the same sweep from an ini over parquet
    val dir = Files.createTempDirectory("autotune_lsh").toString
    docs.write.parquet(s"$dir/docs.parquet")
    val report = AutoTuner.run(spark,
      s"""[Base]
         |DocumentsPath=$dir/docs.parquet
         |
         |[AutoTune]
         |Harness=LSH
         |NumHashesGrid=16,16,16
         |RowsPerBandGrid=2,4,8
         |JaccardThreshold=0.3
         |RecallFloorBp=7000
         |""".stripMargin)
    assert(report.table.where(col("best")).count() === 1)
    assert(report.best.contains("rows_per_band"))
  }
}
