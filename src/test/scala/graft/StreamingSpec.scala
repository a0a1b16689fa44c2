package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.{Knn, Spann}
import graft.streaming.StreamingIngest

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  test("streaming windowed agg matches the batch-equivalent plan") {
    val events = Tables.events(spark, sf0001)
    val batch = StreamingIngest.eventsWindowed(events)

    implicit val sq = spark.sqlContext
    val stream = MemoryStream[(Long, java.sql.Timestamp, String, Double)]
    val sdf = stream.toDF().toDF("event_id", "ts", "event_type", "value")
    stream.addData(events.select("event_id", "ts", "event_type", "value")
      .as[(Long, java.sql.Timestamp, String, Double)].collect().toIndexedSeq)

    val q = StreamingIngest.eventsWindowedStream(sdf)
      .writeStream.format("memory").queryName("win_out")
      .outputMode("complete") // no watermark closure needed for the check
      .start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("win_out")
      assert(streamed.exceptAll(batch).count() === 0)
      assert(batch.exceptAll(streamed).count() === 0)
    } finally q.stop()
  }

  test("mixReport over streamed window counts equals the batch path and " +
    "flags the planted drift") {
    val events = Tables.events(spark, sf0001)
    val targets = Map("view" -> 0.8, "click" -> 0.15) // purchase unlisted
    val batch = StreamingIngest.mixReport(
      StreamingIngest.eventsWindowed(events), targets, tol = 0.05)

    implicit val sq = spark.sqlContext
    val stream = MemoryStream[(Long, java.sql.Timestamp, String, Double)]
    val sdf = stream.toDF().toDF("event_id", "ts", "event_type", "value")
    stream.addData(events.select("event_id", "ts", "event_type", "value")
      .as[(Long, java.sql.Timestamp, String, Double)].collect().toIndexedSeq)
    val q = StreamingIngest.eventsWindowedStream(sdf)
      .writeStream.format("memory").queryName("mix_out")
      .outputMode("complete")
      .start()
    try {
      q.processAllAvailable()
      val streamed = StreamingIngest.mixReport(
        spark.table("mix_out"), targets, tol = 0.05)
      assert(streamed.exceptAll(batch).count() === 0)
      assert(batch.exceptAll(streamed).count() === 0)
    } finally q.stop()
    // report invariants: shares sum to ~1 per window; unlisted types carry
    // target 0.0 and (at tol 0.05) flag as drifted whenever present
    val perWin = batch.groupBy("window_start")
      .agg(sum("share").as("s")).collect()
    assert(perWin.forall(r => math.abs(r.getDouble(1) - 1.0) < 1e-4))
    val unlisted = batch.where(col("event_type") === "purchase").collect()
    assert(unlisted.nonEmpty)
    assert(unlisted.forall(r => r.getDouble(r.fieldIndex("target")) === 0.0))
    assert(unlisted.filter(r => r.getDouble(r.fieldIndex("share")) > 0.05)
      .forall(r => r.getBoolean(r.fieldIndex("drift"))),
      "unlisted share over tol must flag")
  }

  test("streaming constraint audit equals the batch scan-family checks " +
      "across micro-batches") {
    import graft.operators.Pipeline
    implicit val sq = spark.sqlContext
    val stream = MemoryStream[(Option[Long], Option[Double], String)]
    val sdf = stream.toDF().toDF("k", "price", "status")
    val b1 = Seq((Some(1L), Some(10.0), "O"), (None, Some(-5.0), "X"))
    val b2 = Seq((Some(2L), Some(999.0), "F"), (Some(3L), None, "O"))
    val batch = Pipeline.constraintAudit(
      (b1 ++ b2).toDF("k", "price", "status"),
      notNull = Seq("k"), ranges = Seq(("price", 0.0, 100.0)),
      accepted = Seq(("status", Seq("O", "F"))))
    val q = StreamingIngest.constraintAuditStream(sdf,
        notNull = Seq("k"), ranges = Seq(("price", 0.0, 100.0)),
        accepted = Seq(("status", Seq("O", "F"))))
      .writeStream.format("memory").queryName("audit_out")
      .outputMode("complete")
      .start()
    try {
      stream.addData(b1.toIndexedSeq); q.processAllAvailable()
      stream.addData(b2.toIndexedSeq); q.processAllAvailable()
      val streamed = spark.table("audit_out")
      assert(streamed.exceptAll(batch).count() === 0)
      assert(batch.exceptAll(streamed).count() === 0)
    } finally q.stop()
  }

  test("streaming drift histogram equals the batch value histogram across " +
      "micro-batches, and the KS readout over it matches the batch ksStat") {
    import graft.operators.Eval
    implicit val sq = spark.sqlContext
    val stream = MemoryStream[Long]
    // integer-unit scores with duplicates across batches
    val b1 = Seq(10L, 10L, 12L, 15L)
    val b2 = Seq(10L, 12L, 20L, 20L, 21L)
    val q = StreamingIngest.driftHistogramStream(
        stream.toDF().toDF("u"), "u")
      .writeStream.format("memory").queryName("drift_hist_out")
      .outputMode("complete")
      .start()
    try {
      stream.addData(b1.toIndexedSeq); q.processAllAvailable()
      stream.addData(b2.toIndexedSeq); q.processAllAvailable()
      val streamed = spark.table("drift_hist_out")
      val batch = (b1 ++ b2).toDF("u").groupBy(col("u").cast("long").as("v"))
        .agg(count(lit(1)).as("n"))
      assert(streamed.exceptAll(batch).count() === 0)
      assert(batch.exceptAll(streamed).count() === 0)
      // the monitor's readout: KS of (live values vs a reference) computed
      // from the completed histogram equals ksStat on the raw rows
      val live = streamed.select(
        explode(array_repeat(col("v"), col("n").cast("int"))).as("v"))
      val ref = Seq(10L, 12L, 15L, 20L).toDF("v")
      val fromHist = Eval.ksStat(ref, live, "v").collect()(0).getDouble(2)
      val fromRows = Eval.ksStat(ref, (b1 ++ b2).toDF("v"), "v")
        .collect()(0).getDouble(2)
      assert(fromHist === fromRows)
    } finally q.stop()
  }

  test("streaming JSONL ingest audit equals the batch good/corrupt counts " +
      "across micro-batches") {
    import org.apache.spark.sql.types.{LongType, StringType, StructType}
    implicit val sq = spark.sqlContext
    val schema = new StructType().add("id", LongType).add("s", StringType)
    val good = Seq("""{"id": 1, "s": "a"}""", """{"id": 2, "s": "b"}""",
      """{"id": 3, "s": "c"}""")
    val bad = Seq("{\"id\": 4, \"s\": unterminated", "not json")
    val stream = MemoryStream[String]
    val q = StreamingIngest.jsonlAuditStream(
        stream.toDF().toDF("value"), schema)
      .writeStream.format("memory").queryName("jsonl_audit_out")
      .outputMode("complete")
      .start()
    try {
      stream.addData(good.take(2).toIndexedSeq); q.processAllAvailable()
      stream.addData((good.drop(2) ++ bad).toIndexedSeq); q.processAllAvailable()
      val got = spark.table("jsonl_audit_out").collect()
        .map(r => (r.getString(0), r.getLong(1))).toMap
      assert(got === Map("good" -> 3L, "corrupt" -> 2L))
    } finally q.stop()
  }

  test("stream-stream interval join equals the batch attribution pairs") {
    val events = Tables.events(spark, sf0001)
    val batch = graft.operators.Events.linearAttribution(events, 60)
      .select("purchase_id", "view_id")

    implicit val sq = spark.sqlContext
    val pStream = MemoryStream[(Long, Long, java.sql.Timestamp, Double)]
    val vStream = MemoryStream[(Long, Long, java.sql.Timestamp)]
    pStream.addData(events.where(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("ts"), col("value"))
      .as[(Long, Long, java.sql.Timestamp, Double)].collect().toIndexedSeq)
    vStream.addData(events.where(col("event_type") === "view")
      .select(col("user_id"), col("event_id"), col("ts"))
      .as[(Long, Long, java.sql.Timestamp)].collect().toIndexedSeq)

    val q = StreamingIngest.attributionStream(
      pStream.toDF().toDF("user_id", "purchase_id", "pts", "value"),
      vStream.toDF().toDF("user_id", "view_id", "vts"), 60)
      .writeStream.format("memory").queryName("attr_out").outputMode("append")
      .start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("attr_out").select("purchase_id", "view_id")
      assert(streamed.exceptAll(batch).count() === 0)
      assert(batch.exceptAll(streamed).count() === 0)
      assert(batch.count() > 0)
    } finally q.stop()
  }

  test("streaming quota admits exactly the batch operator's rows under in-order delivery") {
    val events = Tables.events(spark, sf0001)
    // 1 event per user per DAY: tight enough that the sf0.001 fixture
    // genuinely drops rows (per-hour quotas trim nothing at this scale)
    val batch = graft.operators.Events.quotaEnforce(events, 1, 1440)
      .select("event_id")

    implicit val sq = spark.sqlContext
    val stream = MemoryStream[(Long, java.sql.Timestamp, Long)]
    val rows = events.select(col("event_id"), col("ts"), col("user_id"))
      .as[(Long, java.sql.Timestamp, Long)].collect()
      .sortBy(r => (r._2.getTime, r._1)) // per-user in-order delivery
    val (first, second) = rows.splitAt(rows.length / 2)
    val q = StreamingIngest.quotaStream(
      stream.toDF().toDF("event_id", "ts", "user_id"), 1, 1440)
      .writeStream.format("memory").queryName("quota_out").outputMode("append")
      .start()
    try {
      stream.addData(first.toIndexedSeq); q.processAllAvailable()
      stream.addData(second.toIndexedSeq); q.processAllAvailable()
      val streamed = spark.table("quota_out").select("event_id")
      assert(streamed.exceptAll(batch).count() === 0)
      assert(batch.exceptAll(streamed).count() === 0)
      assert(batch.count() > 0 && batch.count() < events.count())
    } finally q.stop()
  }

  test("quota counters are EVICTED once the watermark clears the window " +
      "(r9 advice: (user, window) keys grow with wall-clock, not entities)") {
    implicit val sq = spark.sqlContext
    val stream = MemoryStream[(Long, java.sql.Timestamp, Long)]
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    // hour windows, 10-minute lateness: day-2 events push the watermark far
    // past every day-1 window end, so day-1 counters must drop from state
    val q = StreamingIngest.quotaStream(
      stream.toDF().toDF("event_id", "ts", "user_id"), 1, 60)
      .writeStream.format("memory").queryName("quota_evict_out")
      .outputMode("append").start()
    try {
      stream.addData(Seq(
        (1L, t("2024-01-01 00:05:00"), 10L), (2L, t("2024-01-01 01:05:00"), 10L),
        (3L, t("2024-01-01 02:05:00"), 11L), (4L, t("2024-01-01 03:05:00"), 12L)))
      q.processAllAvailable()
      // processAllAvailable's trailing no-data batch already evicts windows
      // behind the batch-1 watermark (02:55) — some but not all of the four
      val afterDay1 = q.lastProgress.stateOperators.head.numRowsTotal
      assert(afterDay1 <= 4 && afterDay1 >= 1, s"live counters: $afterDay1")
      // advance event time a day; all four day-1 windows end long before
      // the new watermark → every day-1 counter times out and is removed
      stream.addData(Seq((5L, t("2024-01-02 00:05:00"), 10L)))
      q.processAllAvailable()
      // one more batch so the progress line reflects the post-timeout state
      stream.addData(Seq((6L, t("2024-01-02 00:06:00"), 10L)))
      q.processAllAvailable()
      val afterDay2 = q.lastProgress.stateOperators.head.numRowsTotal
      assert(afterDay2 <= 1,
        s"day-1 counters never evicted: $afterDay2 state rows for 5 windows")
      // and the quota still enforced within the live window
      assert(spark.table("quota_evict_out").count() === 5) // event 6 dropped
    } finally q.stop()
  }

  test("streaming dedup drops duplicate event ids") {
    implicit val sq = spark.sqlContext
    val stream = MemoryStream[(Long, java.sql.Timestamp, Double)]
    val ts = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    stream.addData(Seq((1L, ts, 1.0), (1L, ts, 1.0), (2L, ts, 2.0)))
    val q = StreamingIngest.dedupStream(
      stream.toDF().toDF("event_id", "ts", "value"))
      .writeStream.format("memory").queryName("dedup_out").outputMode("append")
      .start()
    try {
      q.processAllAvailable()
      assert(spark.table("dedup_out").count() === 2)
    } finally q.stop()
  }

  test("streaming near-dup dedup matches the batch pipeline across micro-batches") {
    import graft.operators.Dedup
    implicit val sq = spark.sqlContext
    val batch1 = Seq(
      (0L, "the quick brown fox jumps over the lazy dog"),
      (1L, "the quick brown fox jumps over the lazy dog"), // dup of 0, same batch
      (2L, "completely different text about spark engines and data"))
    val batch2 = Seq(
      (3L, "the quick brown fox jumps over the lazy dog"), // dup of 0, CROSS batch
      (4L, "unrelated content with nothing shared at all"))
    val stream = MemoryStream[(Long, String)]
    val q = StreamingIngest.nearDupStream(
      stream.toDF().toDF("doc_id", "text"), 0.3)
      .writeStream.format("memory").queryName("neardup_out").outputMode("append")
      .start()
    try {
      stream.addData(batch1); q.processAllAvailable()
      stream.addData(batch2); q.processAllAvailable()
      val got = spark.table("neardup_out").distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val want = Dedup.minhashDedup(
        (batch1 ++ batch2).toDF("doc_id", "text"), 0.3)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(got === want, s"stream $got vs batch $want")
      assert(got.exists { case (a, b, _) => a < 3 && b >= 3 },
        "a cross-micro-batch pair must surface (state carried between triggers)")
    } finally q.stop()
  }

  test("streaming near-dup state caps bucket membership (stop-bucket guard)") {
    implicit val sq = spark.sqlContext
    // 5 identical docs, maxBucket=2: only the first two enter state, so
    // pairs form against those representatives only — bounded, not quadratic
    val stream = MemoryStream[(Long, String)]
    val q = StreamingIngest.nearDupStream(
      stream.toDF().toDF("doc_id", "text"), 0.3, maxBucket = 2)
      .writeStream.format("memory").queryName("neardup_cap_out").outputMode("append")
      .start()
    try {
      stream.addData((0L to 4L).map(i => (i, "same boilerplate text every single time")))
      q.processAllAvailable()
      val got = spark.table("neardup_cap_out").distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      // members {0,1}: every later doc pairs against both, nothing else
      assert(got === Set((0L, 1L), (0L, 2L), (1L, 2L), (0L, 3L), (1L, 3L),
        (0L, 4L), (1L, 4L)))
    } finally q.stop()
  }

  test("posting pressure keeps per-head state across micro-batches") {
    implicit val sq = spark.sqlContext
    val stream = MemoryStream[(Long, Long)]
    val q = StreamingIngest.postingPressure(
      stream.toDF().toDF("head_id", "id"), limit = 3)
      .writeStream.format("memory").queryName("pressure_out").outputMode("update")
      .start()
    try {
      stream.addData(Seq((1L, 10L), (1L, 11L), (2L, 20L)))
      q.processAllAvailable()
      stream.addData(Seq((1L, 12L), (1L, 13L))) // head 1 crosses the limit
      q.processAllAvailable()
      val out = spark.table("pressure_out")
        .groupBy("head_id").agg(max("n_postings").as("n"), max("needs_split").as("split"))
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
      assert(out(1L) === ((4L, true)), s"head 1 state wrong: $out")
      assert(out(2L) === ((1L, false)), s"head 2 state wrong: $out")
    } finally q.stop()
  }

  test("streaming query serving equals batch two-stage search (V1 stream)") {
    val corpus = synthVectors(300).select("id", "vec")
    val heads = Spann.selectHeadsModulo(corpus, 30)
    val postings = Spann.buildPostings(corpus, heads, 2)

    implicit val sq = spark.sqlContext
    val stream = MemoryStream[(Long, Seq[Float])]
    val queries = (0 until 5).map(i => (i.toLong, Seq.fill(10)(i * 40f)))
    stream.addData(queries)

    val outDir = Files.createTempDirectory("graft_serve").toString
    val collected = scala.collection.mutable.ArrayBuffer.empty[(Long, Int, Long, Double)]
    val writer = StreamingIngest.searchStream(
      stream.toDF().toDF("query_id", "qvec"), heads, postings, 3, 4,
      res => collected ++= res.select("query_id", "rank", "id", "dist")
        .as[(Long, Int, Long, Double)].collect())
      .option("checkpointLocation", s"$outDir/ckpt")
    val q = writer.start()
    try q.awaitTermination(60000) finally q.stop()

    val batch = Spann.searchTwoStage(
      queries.toDF("query_id", "qvec"), heads, postings, 3, 4)
      .select("query_id", "rank", "id", "dist")
      .as[(Long, Int, Long, Double)].collect()
    assert(collected.toSet === batch.toSet)
  }

  test("streaming ADC serving equals the batch compressed two-stage search") {
    import graft.functions.PQ
    val corpus = synthVectors(300).select("id", "vec")
    val heads = Spann.selectHeadsModulo(corpus, 30)
    val cb = PQ.train(corpus, dim = 10, m = 2, k = 8, maxIter = 2)
    val ident = Array.tabulate(10, 10)((i, j) => if (i == j) 1.0 else 0.0)
    val rcb = PQ.RotatedCodebooks(ident, cb)
    val coded = Spann.buildPostings(corpus, heads, 2)
      .select(col("head_id"), col("id"))
      .join(PQ.quantize(corpus, cb).select(col("id"), col("codes")), Seq("id"))
      .localCheckpoint(true)

    implicit val sq = spark.sqlContext
    val stream = MemoryStream[(Long, Seq[Float])]
    val queries = (0 until 5).map(i => (i.toLong, Seq.fill(10)(i * 40f)))
    stream.addData(queries)

    val outDir = Files.createTempDirectory("graft_serve_adc").toString
    val collected = scala.collection.mutable.ArrayBuffer.empty[(Long, Int, Long, Double)]
    val writer = StreamingIngest.searchStreamAdc(
      stream.toDF().toDF("query_id", "qvec"), heads, coded, rcb, 3, 4,
      res => collected ++= res.select("query_id", "rank", "id", "dist")
        .as[(Long, Int, Long, Double)].collect())
      .option("checkpointLocation", s"$outDir/ckpt")
    val q = writer.start()
    try q.awaitTermination(60000) finally q.stop()

    val batch = Spann.searchTwoStageAdc(
      queries.toDF("query_id", "qvec"), heads, coded, rcb, 3, 4)
      .select("query_id", "rank", "id", "dist")
      .as[(Long, Int, Long, Double)].collect()
    assert(collected.toSet === batch.toSet)
  }

  test("timed serving splits stage-1 vs stage-2 latency; per-stage report (V4)") {
    val corpus = synthVectors(300).select("id", "vec")
    val heads = Spann.selectHeadsModulo(corpus, 30)
    val postings = Spann.buildPostings(corpus, heads, 2)

    implicit val sq = spark.sqlContext
    val stream = MemoryStream[(Long, Seq[Float])]
    val queries = (0 until 5).map(i => (i.toLong, Seq.fill(10)(i * 40f)))
    stream.addData(queries)

    val outDir = Files.createTempDirectory("graft_serve_timed").toString
    val results = scala.collection.mutable.ArrayBuffer.empty[(Long, Int, Long, Double)]
    val timings = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double, Double)]
    val writer = StreamingIngest.searchStreamTimed(
      stream.toDF().toDF("query_id", "qvec"), heads, postings, 3, 4,
      res => results ++= res.select("query_id", "rank", "id", "dist")
        .as[(Long, Int, Long, Double)].collect(),
      (bid, n, s1, s2) => timings += ((bid, n, s1, s2)))
      .option("checkpointLocation", s"$outDir/ckpt")
    val q = writer.start()
    try q.awaitTermination(60000) finally q.stop()

    // same results as the fused batch search
    val batch = Spann.searchTwoStage(
      queries.toDF("query_id", "qvec"), heads, postings, 3, 4)
      .select("query_id", "rank", "id", "dist")
      .as[(Long, Int, Long, Double)].collect()
    assert(results.toSet === batch.toSet)
    // both stages were timed (positive millis), per processed trigger
    assert(timings.nonEmpty)
    assert(timings.forall { case (_, n, s1, s2) => n > 0 && s1 > 0 && s2 > 0 })
    // and the per-stage report carries one percentile block PER stage
    val lat = timings.toSeq.toDF("batch_id", "n_queries", "stage1_ms", "stage2_ms")
    val rep = graft.operators.Eval.latencyReportByStage(lat, Seq("stage1_ms", "stage2_ms"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(rep.keySet === Set("stage1_ms", "stage2_ms"))
    assert(rep.values.forall(_.getDouble(4) > 0)) // p50 positive for both stages
  }

  test("micro-batch ingest assigns postings for the delta only (M1)") {
    val corpus = synthVectors(200).select("id", "vec")
    val heads = Spann.selectHeadsModulo(corpus, 20)

    implicit val sq = spark.sqlContext
    val stream = MemoryStream[(Long, Seq[Float])]
    val delta = (1000 until 1010).map(i => (i.toLong, Seq.fill(10)(i.toFloat)))
    stream.addData(delta)

    val outDir = Files.createTempDirectory("graft_ingest").toString
    val writer = StreamingIngest.ingest(
      stream.toDF().toDF("id", "vec"), heads, 2,
      p => p.write.mode("append").parquet(s"$outDir/postings"))
      .option("checkpointLocation", s"$outDir/ckpt")
    val q = writer.start()
    try q.awaitTermination(60000) finally q.stop()

    val postings = spark.read.parquet(s"$outDir/postings")
    assert(postings.select("id").distinct().count() === 10)
    assert(postings.groupBy("id").count().agg(max("count")).head().getLong(0) <= 2)
    // appended postings are searchable alongside the base index
    val basePostings = Spann.buildPostings(corpus, heads, 2)
    val all = basePostings.unionByName(postings)
    val res = Spann.searchTwoStage(
      Seq((0L, Seq.fill(10)(1005f))).toDF("query_id", "qvec"),
      heads, all, 1, 4)
    assert(res.head().getLong(2) === 1005L)
  }

  test("per-row text curation ops are streaming-safe: the rule gate on a stream equals batch") {
    import graft.operators.TextAnalysis
    implicit val sq = spark.sqlContext
    val docs = Tables.documents(spark, sf0001).limit(50)
      .select("doc_id", "text")
    // the stateless per-row stage a streaming ingest runs before any
    // stateful dedup — pure projections, no join/window, so the identical
    // expression tree runs unchanged under the streaming planner
    val streamSide = (df: org.apache.spark.sql.DataFrame) =>
      TextAnalysis.ruleFilter(df)
        .select(col("doc_id"), col("n_tokens"), col("keep"))
    val batch = streamSide(docs)
    val stream = MemoryStream[(Long, String)]
    stream.addData(docs.as[(Long, String)].collect().toIndexedSeq)
    val q = streamSide(stream.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("curate_stream")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("curate_stream")
      assert(streamed.exceptAll(batch).count() === 0)
      assert(batch.exceptAll(streamed).count() === 0)
    } finally q.stop()
  }

  test("importance scoring on a stream equals the batch fit-corpus path") {
    import graft.operators.TextAnalysis
    implicit val sq = spark.sqlContext
    val docs = Tables.documents(spark, sf0001).select("doc_id", "text", "lang")
    // fit once on the (static) corpus, score a document STREAM against the
    // collected weight table — importanceScore is a pure projection, so the
    // identical expression tree runs under the streaming planner with no
    // state, no watermark, no output-mode constraint
    val wt = TextAnalysis.importanceWeightTable(docs, col("lang") === "en")
    val batch = TextAnalysis.importanceScore(docs, wt)
    val stream = MemoryStream[(Long, String)]
    stream.addData(docs.select("doc_id", "text").as[(Long, String)].collect().toIndexedSeq)
    val q = TextAnalysis.importanceScore(stream.toDF().toDF("doc_id", "text"), wt)
      .writeStream.format("memory").queryName("imp_stream")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("imp_stream")
      assert(streamed.exceptAll(batch).count() === 0)
      assert(batch.exceptAll(streamed).count() === 0)
      assert(streamed.count() > 0)
    } finally q.stop()
  }

  test("streaming semantic dedup equals the batch pair set across micro-batches") {
    import graft.operators.{SimilaritySearch, Spann}
    implicit val sq = spark.sqlContext
    val emb = Tables.embeddingVec(spark, sf0001).select("id", "vec")
    val batch = SimilaritySearch.semanticDedup(emb, 25, 0.6)
    val cents = Spann.selectHeadsModulo(emb, 25)
    val stream = MemoryStream[(Long, Seq[Float])]
    val out = StreamingIngest.semanticDedupStream(
      stream.toDF().toDF("id", "vec"), cents, 0.6)
      .writeStream.format("memory").queryName("semdedup_stream")
      .outputMode("append").start()
    try {
      import spark.implicits._
      val rows = emb.as[(Long, Seq[Float])].collect()
      // two micro-batches: cross-batch pairs must surface from state
      val (b1, b2) = rows.splitAt(rows.length / 2)
      stream.addData(b1.toIndexedSeq); out.processAllAvailable()
      stream.addData(b2.toIndexedSeq); out.processAllAvailable()
      val streamed = spark.table("semdedup_stream")
      assert(streamed.exceptAll(batch).count() === 0)
      assert(batch.exceptAll(streamed).count() === 0)
      assert(streamed.count() > 0)
    } finally out.stop()
  }

  test("streaming cms sketch equals the batch sketch after all batches drain") {
    import graft.functions.Sketches
    import graft.operators.TextAnalysis
    implicit val sq = spark.sqlContext
    val toks = Tables.documents(spark, sf0001)
      .select(col("doc_id"), explode(TextAnalysis.tokens(col("text"))).as("token"))
    val batchSketch = Sketches.cmsSketch(toks.select("token"), "token", 256, 4)
    val stream = MemoryStream[String]
    // the sketch build is a bounded-key streaming aggregation (≤ depth·width
    // groups) — complete output mode materializes the running table
    val out = Sketches.cmsSketch(stream.toDF().toDF("token"), "token", 256, 4)
      .writeStream.format("memory").queryName("cms_stream")
      .outputMode("complete").start()
    try {
      import spark.implicits._
      stream.addData(toks.select("token").as[String].collect().toIndexedSeq)
      out.processAllAvailable()
      val streamed = spark.table("cms_stream")
      assert(streamed.exceptAll(batchSketch).count() === 0)
      assert(batchSketch.exceptAll(streamed).count() === 0)
    } finally out.stop()
  }

  test("naive-bayes in-row scoring classifies a stream identically to batch") {
    import graft.operators.TextAnalysis
    implicit val sq = spark.sqlContext
    val docs = Tables.documents(spark, sf0001).select("doc_id", "text", "lang")
    val model = TextAnalysis.nbTrain(docs)
    val batch = TextAnalysis.nbClassifyInRow(docs, model)
    val stream = MemoryStream[(Long, String)]
    stream.addData(docs.select("doc_id", "text").as[(Long, String)].collect().toIndexedSeq)
    val q = TextAnalysis.nbClassifyInRow(stream.toDF().toDF("doc_id", "text"), model)
      .writeStream.format("memory").queryName("nb_stream")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("nb_stream")
      assert(streamed.exceptAll(batch).count() === 0)
      assert(batch.exceptAll(streamed).count() === 0)
      assert(streamed.count() > 0)
    } finally q.stop()
  }

  test("streaming sessionization: gap closes sessions; agrees with batch off-boundary") {
    import graft.operators.Events
    implicit val sq = spark.sqlContext
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    def ts(min: Long) = new java.sql.Timestamp(t0 + min * 60000L)
    // user 1 probes the exact-gap boundary (29 in-session, exactly-30 ALSO
    // merges — the native window treats adjacent ranges as one session, the
    // batch op's `ts > prev + gap` semantics exactly); user 2 is clearly
    // split, user 3 clearly one session
    val fixture = Seq(
      (1L, ts(0), 1L, "view", 1.0), (2L, ts(29), 1L, "view", 2.0), (3L, ts(59), 1L, "view", 4.0),
      (4L, ts(0), 2L, "view", 1.0), (5L, ts(31), 2L, "view", 2.0),
      (6L, ts(0), 3L, "view", 1.0), (7L, ts(10), 3L, "view", 2.0), (8L, ts(20), 3L, "view", 4.0))
    val stream = MemoryStream[(Long, java.sql.Timestamp, Long, String, Double)]
    val sdf = stream.toDF().toDF("event_id", "ts", "user_id", "event_type", "value")
    val q = StreamingIngest.sessionizeStream(sdf, gapMinutes = 30, watermark = "0 seconds")
      .writeStream.format("memory").queryName("sess_out").outputMode("append")
      .start()
    try {
      stream.addData(fixture)
      q.processAllAvailable()
      // sentinel advances the watermark past every fixture session; one more
      // batch flushes the now-closed windows
      stream.addData(Seq((90L, ts(10000), 99L, "view", 0.0)))
      q.processAllAvailable()
      stream.addData(Seq((91L, ts(10001), 99L, "view", 0.0)))
      q.processAllAvailable()
      val got = spark.table("sess_out")
        .select(col("user_id"), col("session_start"), col("session_end"),
          col("n_events"), col("sum_value"))
        .collect()
        .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3), r.getDouble(4)))
        .toSet
      val expect = Set(
        (1L, ts(0), ts(59), 3L, 7.0),
        (2L, ts(0), ts(0), 1L, 1.0), (2L, ts(31), ts(31), 1L, 2.0),
        (3L, ts(0), ts(20), 3L, 7.0))
      assert(got === expect, s"closed sessions: $got")
      // the batch operator agrees aggregate-for-aggregate on every user,
      // exact-gap boundary included
      val batch = Events.sessionize(
        fixture.toDF("event_id", "ts", "user_id", "event_type", "value"),
        gapMinutes = 30)
        .select(col("user_id"), col("session_start"), col("session_end"),
          col("n_events"), col("sum_value"))
        .collect()
        .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3), r.getDouble(4)))
        .toSet
      assert(batch === expect)
    } finally q.stop()
  }

  test("streaming funnel emits each conversion once and equals the batch funnel") {
    import graft.operators.Events
    implicit val sq = spark.sqlContext
    val events = Tables.events(spark, sf0001)
      .select("event_id", "ts", "user_id", "event_type")
    val stages = Seq("view", "click", "purchase")
    // events.ts is TIMESTAMP_NTZ; the stream side goes through a Timestamp
    // encoder (session-UTC) — compare both as Spark-rendered strings
    val batch = Events.funnel(Tables.events(spark, sf0001), stages, Some(720))
      .select(col("user_id"), col("stage"), col("stage_name"),
        col("t").cast("string"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getString(3)))
      .toSet
    val rows = events.as[(Long, java.sql.Timestamp, Long, String)]
      .collect().sortBy(_._2.getTime)
    val (first, second) = rows.splitAt(rows.length / 2)
    val stream = MemoryStream[(Long, java.sql.Timestamp, Long, String)]
    val sdf = stream.toDF().toDF("event_id", "ts", "user_id", "event_type")
    val q = StreamingIngest.funnelStream(sdf, stages, Some(720))
      .writeStream.format("memory").queryName("funnel_out").outputMode("append")
      .start()
    try {
      // two ts-ordered micro-batches: state must carry stage commits across
      stream.addData(first.toIndexedSeq); q.processAllAvailable()
      stream.addData(second.toIndexedSeq); q.processAllAvailable()
      val got = spark.table("funnel_out")
        .select(col("user_id"), col("stage"), col("stage_name"),
          col("t").cast("string"))
        .collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getString(3))).toSet
      assert(got === batch, s"missing: ${batch -- got}, extra: ${got -- batch}")
    } finally q.stop()
  }

  test("streaming retention events aggregate to the batch cohort matrix") {
    import graft.operators.Events
    implicit val sq = spark.sqlContext
    val events = Tables.events(spark, sf0001)
    val batch = Events.retention(events)
      .select(col("cohort_day").cast("string"), col("day_offset"), col("n_users"))
      .collect().map(r => (r.getString(0).take(10), r.getLong(1), r.getLong(2))).toSet
    val rows = events.select("ts", "user_id", "event_type")
      .as[(java.sql.Timestamp, Long, String)]
      .collect().sortBy(_._1.getTime)
    val (first, second) = rows.splitAt(rows.length / 2)
    val stream = MemoryStream[(java.sql.Timestamp, Long, String)]
    val sdf = stream.toDF().toDF("ts", "user_id", "event_type")
    val q = StreamingIngest.retentionEventsStream(sdf)
      .writeStream.format("memory").queryName("retention_out").outputMode("append")
      .start()
    try {
      stream.addData(first.toIndexedSeq); q.processAllAvailable()
      stream.addData(second.toIndexedSeq); q.processAllAvailable()
      val got = spark.table("retention_out")
        .groupBy(col("cohort_day"), col("day_offset"))
        .agg(count(lit(1)).as("n_users"))
        .select(col("cohort_day").cast("string"), col("day_offset"), col("n_users"))
        .collect().map(r => (r.getString(0).take(10), r.getLong(1), r.getLong(2))).toSet
      assert(got === batch, s"missing: ${batch -- got}, extra: ${got -- batch}")
    } finally q.stop()
  }

  test("streaming rate anomaly equals the batch operator on every closed minute") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val events = Tables.events(spark, sf0001)
      .select("ts", "event_type", "event_id")
      .as[(java.sql.Timestamp, String, Long)].collect().sortBy(_._1.getTime)
    val (b1, b2) = events.splitAt(events.length / 2)
    val stream = MemoryStream[(java.sql.Timestamp, String, Long)]
    val q = StreamingIngest.rateAnomalyStream(
      stream.toDF().toDF("ts", "event_type", "event_id"), trailing = 4,
      zThreshold = 1.5)
      .writeStream.format("memory").queryName("rate_out").outputMode("append")
      .start()
    try {
      stream.addData(b1.toSeq); q.processAllAvailable()
      stream.addData(b2.toSeq); q.processAllAvailable()
      val got = spark.table("rate_out")
        .collect().map(r => (r.getString(0), r.getTimestamp(1).getTime,
          r.getLong(2), Option(r.get(3)).map(_.asInstanceOf[Double]),
          r.getBoolean(4))).toSet
      val batchAll = graft.operators.Events.rateAnomaly(
        Tables.events(spark, sf0001), trailing = 4, zThreshold = 1.5)
        .collect().map(r => (r.getString(0), r.getTimestamp(1).getTime,
          r.getLong(2), Option(r.get(3)).map(_.asInstanceOf[Double]),
          r.getBoolean(4)))
      // the stream cannot close each type's final minute — drop it
      val lastPerType = batchAll.groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
      val batch = batchAll.filterNot(r => r._2 == lastPerType(r._1)).toSet
      assert(got === batch,
        s"missing: ${(batch -- got).take(3)}, extra: ${(got -- batch).take(3)}")
      // sf0.001 traffic is ~1 event/minute — every window is constant, so
      // all-NULL z here is CORRECT (σ=0); the spike scenario below covers
      // actual scoring
    } finally q.stop()
  }

  test("streaming rate anomaly scores a planted spike once its minute closes") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    def t(m: Int) = java.sql.Timestamp.valueOf(f"2026-01-01 10:$m%02d:00")
    var eid = 0L
    def burst(m: Int, n: Int) = (1 to n).map { _ =>
      eid += 1; (t(m), "click", eid)
    }
    // 8 trailing minutes alternating 8/12, the 20-event spike at minute 9,
    // one closer event at minute 10 (the spike minute must CLOSE to score)
    val rows = (1 to 8).flatMap(m => burst(m, if (m % 2 == 1) 8 else 12)) ++
      burst(9, 20) ++ burst(10, 1)
    val stream = MemoryStream[(java.sql.Timestamp, String, Long)]
    val q = StreamingIngest.rateAnomalyStream(
      stream.toDF().toDF("ts", "event_type", "event_id"), trailing = 8,
      zThreshold = 2.0)
      .writeStream.format("memory").queryName("rate_spike_out")
      .outputMode("append").start()
    try {
      stream.addData(rows); q.processAllAvailable()
      val got = spark.table("rate_spike_out")
        .collect().map(r => (r.getTimestamp(1).getTime, r.getLong(2),
          Option(r.get(3)).map(_.asInstanceOf[Double]), r.getBoolean(4))).toSet
      val spike = got.find(_._1 == t(9).getTime).get
      assert(spike._2 === 20L)
      assert(spike._3 === Some(5.0)) // (160-80)/16, the EventsSpec arithmetic
      assert(spike._4)
      // minute 10 is still open: not emitted
      assert(!got.exists(_._1 == t(10).getTime))
      // pre-window minutes emitted unscored
      assert(got.count(_._3.isEmpty) === 8)
    } finally q.stop()
  }

  test("streaming MG heavy hitters: superset of the global bar, lower-bound ests") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val docRows = Tables.documents(spark, sf0001)
      .select("doc_id", "text").as[(Long, String)].collect().toSeq
    val (b1, b2) = docRows.splitAt(docRows.size / 2)
    val stream = MemoryStream[(Long, String)]
    val capacity = 64
    val q = StreamingIngest.heavyHittersStream(
      stream.toDF().toDF("doc_id", "text"), capacity, buckets = 8)
      .writeStream.format("memory").queryName("hh_out").outputMode("update")
      .start()
    try {
      stream.addData(b1); q.processAllAvailable()
      stream.addData(b2); q.processAllAvailable()
      val rows = spark.table("hh_out")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
      // latest snapshot per bucket = its max-n_seen emission
      val latest = rows.groupBy(_._1).values.flatMap { g =>
        val mx = g.map(_._2).max; g.filter(_._2 == mx)
      }.map(t => t._3 -> t._4).toMap
      val toks = Tables.documents(spark, sf0001)
        .select(explode(graft.operators.TextAnalysis.tokens(col("text"))).as("token"))
      val n = toks.count()
      val counts = toks.groupBy("token").count().as[(String, Long)].collect().toMap
      val bar = n / (capacity + 1)
      counts.foreach { case (t, c) =>
        if (c > bar) assert(latest.contains(t), s"heavy token $t ($c > $bar) lost")
      }
      latest.foreach { case (t, est) =>
        assert(est <= counts(t), s"$t over-counted: $est > ${counts(t)}")
      }
    } finally q.stop()
  }
}
