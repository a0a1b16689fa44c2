package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}
import org.apache.spark.sql.types.DecimalType

import graft.operators.Spann

/** Online mutation as Structured Streaming (M1/M2,
  * `BKTIndex.cpp:901-970`): the reference appends vectors under a lock and
  * refines per-node; Spark-native form is micro-batch append —
  * `readStream → foreachBatch { assign postings for the delta, append }` —
  * with compaction (B10) as the background rebuild
  * (`BKT/Index.h:40-71` rebuild thread ≡ a periodic batch job).
  */
object StreamingIngest {

  /** Tumbling-window event aggregation (the streaming-analytics shape;
    * batch-equivalent plan is oracle-checked as q43). Decimal-summed so
    * results are aggregation-order independent.
    */
  def eventsWindowed(events: DataFrame): DataFrame =
    events
      .groupBy(
        window(col("ts"), "1 hour").getField("start").as("window_start"),
        col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 4))).cast("double").as("sum_value"))

  /** Streaming flavor with watermarking: same aggregation, late data bounded
    * by 10 minutes, append-mode safe.
    */
  def eventsWindowedStream(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 4))).cast("double").as("sum_value"))
      .select(col("window").getField("start").as("window_start"),
        col("event_type"), col("n"), col("sum_value"))

  /** Source-mix drift monitor over windowed counts — the alert a streaming
    * ingest pipeline runs so one upstream feed silently flooding (or
    * starving) the mixture is caught the window it happens. Input is the
    * per-window per-type count frame [[eventsWindowedStream]] (or its batch
    * twin) emits; output adds each type's within-window `share`, its
    * `target` weight (0.0 for unlisted types), and a `drift` flag when
    * `|share − target| > tol`.
    *
    * Two-phase by design: the heavy aggregation is the ONE streaming
    * windowed groupBy (chained streaming aggregations are unsupported in
    * append mode, and unnecessary — this finisher's input is
    * |windows|·|types| rows, run it batch after the sink or per-batch in
    * `foreachBatch`). The share window partitions by `window_start` — keyed,
    * tiny groups. Deterministic: shares are one IEEE divide of exact counts,
    * 6dp.
    */
  def mixReport(counts: DataFrame, targets: Map[String, Double],
      tol: Double = 0.1): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("window_start"))
    counts
      .withColumn("share",
        round(col("n").cast("double") /
          sum(col("n")).over(w).cast("double"), 6))
      .withColumn("target",
        coalesce(element_at(typedLit(targets), col("event_type")), lit(0.0)))
      .withColumn("drift", abs(col("share") - col("target")) > tol)
  }

  /** Streaming dedup on event id within the watermark horizon (the
    * streaming analogue of the exact-dedup operator).
    */
  def dedupStream(events: DataFrame): DataFrame =
    events.withWatermark("ts", "10 minutes")
      .dropDuplicates("event_id")

  /** Stream-stream interval join — the continuous form of
    * [[graft.operators.Events.linearAttribution]]'s touch pairing (q177):
    * each purchase joins every view by the same user within the preceding
    * `windowMinutes`. Both sides carry watermarks and the join condition
    * carries BOTH time bounds (`pts − W ≤ vts ≤ pts`), which is what lets
    * Spark evict view state once the watermark passes `vts + W` and
    * purchase state once it passes `pts` — unbounded-state joins never
    * reach a production cluster. Emits the raw (purchase, view) touch
    * pairs append-mode; the per-purchase credit divide is a second stateful
    * stage downstream (or the batch operator over the landed pairs).
    *
    * Column contract: `purchases` = (user_id, purchase_id, pts, value),
    * `views` = (user_id, view_id, vts).
    */
  def attributionStream(
      purchases: DataFrame,
      views: DataFrame,
      windowMinutes: Int = 60,
      watermark: String = "30 minutes"): DataFrame = {
    val p = purchases.withWatermark("pts", watermark)
    val v = views.withWatermark("vts", watermark)
    p.join(v,
      p("user_id") === v("user_id") &&
        col("vts") <= col("pts") &&
        col("vts") >= col("pts") - expr(s"INTERVAL $windowMinutes MINUTES"))
      .select(p("user_id"), col("purchase_id"), col("pts"), col("value"),
        col("view_id"), col("vts"))
  }

  /** Streaming gap-based sessionization via the native
    * `session_window(ts, gap)` — the continuous form of
    * [[graft.operators.Events.sessionize]] (q99): Spark merges events whose
    * gap is UNDER `gapMinutes` into one growing session window and closes it
    * once the watermark passes last-event + gap. Output mirrors the batch
    * operator's aggregates with `session_end` = max event ts (the native
    * window's `end` is last-ts + gap, so it is shifted back), minus the
    * batch op's per-user `session_idx` (a running count over closed
    * sessions is not append-mode computable; order sessions by
    * `session_start` downstream if needed).
    *
    * Boundary parity: the batch op starts a new session when
    * `ts > prev + gap`; the native window merges adjacent ranges, i.e. while
    * `ts <= prev + gap` — identical semantics INCLUDING the exact-gap
    * boundary (StreamingSpec pins an exactly-gap-separated pair merging on
    * both paths).
    *
    * Scale: state is per (user, open-session) — keyed on the same
    * high-cardinality `user_id` the batch windows partition by; watermark
    * bounds state lifetime.
    */
  def sessionizeStream(events: DataFrame, gapMinutes: Int = 30,
      watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(col("user_id"), session_window(col("ts"), s"$gapMinutes minutes"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 4))).cast("double").as("sum_value"))
      .select(col("user_id"),
        col("session_window").getField("start").as("session_start"),
        (col("session_window").getField("end") -
          expr(s"INTERVAL $gapMinutes MINUTES")).as("session_end"),
        col("n_events"), col("sum_value"))

  /** Running per-head posting pressure via arbitrary stateful processing
    * (`flatMapGroupsWithState`): as posting assignments stream in, keep a
    * per-head running count and emit the head whenever its posting crosses
    * `limit` — the streaming analogue of the reference's posting-length cap
    * + background split/compaction trigger (B9 `PostingPageLimit`,
    * `ExtraFullGraphSearcher.h:723-760`; rebuild thread `BKT/Index.h:40-71`).
    * Output rows: `(head_id, n_postings, needs_split)`.
    */
  def postingPressure(
      postingStream: DataFrame, // streaming (head_id, id)
      limit: Int): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = postingStream.sparkSession
    import spark.implicits._
    postingStream
      .select(col("head_id").cast("long"), col("id").cast("long"))
      .as[(Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Long, (Long, Long, Boolean)](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (headId: Long, rows: Iterator[(Long, Long)], state: GroupState[Long]) =>
          val prev = state.getOption.getOrElse(0L)
          val next = prev + rows.size
          state.update(next)
          Iterator.single((headId, next, next > limit))
      }
      .toDF("head_id", "n_postings", "needs_split")
  }

  /** Streaming quota enforcement — the continuous twin of
    * [[graft.operators.Events.quotaEnforce]]: per (user, tumbling-window)
    * counter state admits the first `maxPerWindow` events and drops the
    * rest at the ingest edge. State is ONE long per (user, active window) —
    * the rate-limiter shape that never buffers events. Equality with the
    * batch operator holds under per-user in-order delivery (the same
    * contract [[funnelStream]] states); out-of-order storms admit a
    * different-but-size-identical subset, which is the accepted semantics
    * of an online limiter.
    *
    * State lifetime: unlike the per-user/per-head keys above (bounded by
    * entity count), the (user, window) key space grows with wall-clock —
    * so each counter arms an event-time timeout at `window end +
    * lateness` and is evicted when the watermark passes it. Without the
    * timeout a long-lived stream would accumulate one long per (user,
    * window-ever-seen).
    */
  def quotaStream(
      events: DataFrame, // streaming (event_id, ts, user_id)
      maxPerWindow: Int,
      windowMinutes: Int = 60,
      lateness: String = "10 minutes"): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    require(maxPerWindow > 0 && windowMinutes > 0)
    val spark = events.sparkSession
    import spark.implicits._
    val winSec = 60L * windowMinutes
    val lateMs = org.apache.spark.sql.catalyst.util.IntervalUtils
      .stringToInterval(org.apache.spark.unsafe.types.UTF8String.fromString(lateness))
    require(lateMs.months == 0, "lateness must be a fixed-length interval")
    val lateMillis =
      lateMs.days * 86400000L + lateMs.microseconds / 1000L
    events
      .withWatermark("ts", lateness)
      .select(col("event_id").cast("long"), col("user_id").cast("long"),
        col("ts"),
        floor(unix_timestamp(col("ts")) / winSec).cast("long").as("win"))
      .as[(Long, Long, java.sql.Timestamp, Long)]
      .groupByKey(r => (r._2, r._4))
      .flatMapGroupsWithState[Long, (Long, Long, java.sql.Timestamp)](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (key: (Long, Long), rows: Iterator[(Long, Long, java.sql.Timestamp, Long)],
            state: GroupState[Long]) =>
          if (state.hasTimedOut) {
            // watermark passed window end + lateness: counter is dead weight
            state.remove()
            Iterator.empty
          } else {
            val seen = state.getOption.getOrElse(0L)
            // admit in (ts, event_id) order within the batch — the batch
            // operator's tie rule
            val sorted = rows.toIndexedSeq.sortBy(r => (r._3.getTime, r._1))
            val admit = sorted.take(math.max(0, maxPerWindow - seen.toInt))
            state.update(seen + sorted.size)
            // evict once the watermark clears this window's end (+ lateness
            // slack so stragglers inside the watermark still hit the counter)
            state.setTimeoutTimestamp((key._2 + 1) * winSec * 1000L + lateMillis)
            admit.iterator.map(r => (r._1, r._2, r._3))
          }
      }
      .toDF("event_id", "user_id", "ts")
  }

  /** Streaming conversion funnel via arbitrary stateful processing
    * (`flatMapGroupsWithState`) — the continuous form of
    * [[graft.operators.Events.funnel]] (q100): per-user state holds the
    * committed completion time of each funnel stage; a newly-arriving event
    * commits stage `i` when stage `i−1` is committed, the event falls
    * strictly after it (and inside `withinMinutes` when set), and stage `i`
    * is still open. Each commit emits ONE append-mode row
    * `(user_id, stage, stage_name, t)` — the same long-form rows the batch
    * operator produces, surfaced the moment the conversion happens.
    *
    * Exactness contract: commits are greedy and final (append-mode
    * semantics). With per-user in-order delivery — the Kafka
    * partition-by-user norm, and guaranteed within a micro-batch because the
    * group's events are processed in `(ts, event_id)` order — greedy
    * first-eligible IS the batch operator's chained min-aggregation, so the
    * emitted rows equal `Events.funnel` exactly (StreamingSpec pins it,
    * single- and multi-batch). A stage event arriving out of order BEHIND an
    * already-committed stage is ignored, matching real-time dashboards.
    * Timestamps compare at microsecond precision (the batch op's interval
    * arithmetic).
    *
    * Scale: state is `|stages|` longs per user, keyed on the
    * high-cardinality `user_id`; no timeout — funnels are small and
    * permanent within the job's horizon (add a TTL timeout for unbounded
    * user spaces).
    */
  def funnelStream(
      events: DataFrame, // streaming (event_id, ts, user_id, event_type)
      stages: Seq[String],
      withinMinutes: Option[Int] = None,
      watermark: String = "1 hour"): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = events.sparkSession
    import spark.implicits._
    require(stages.nonEmpty, "funnel needs at least one stage")
    val stageIdx = stages.zipWithIndex.toMap
    val windowMicros = withinMinutes.map(_.toLong * 60L * 1000000L)
    val Open = Long.MaxValue
    def micros(t: java.sql.Timestamp): Long =
      t.getTime / 1000L * 1000000L + t.getNanos / 1000L
    events
      .withWatermark("ts", watermark)
      .select(col("user_id").cast("long"), col("ts"),
        col("event_type").cast("string"), col("event_id").cast("long"))
      .as[(Long, java.sql.Timestamp, String, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Seq[Long], (Long, Int, String, java.sql.Timestamp)](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (uid: Long, rows: Iterator[(Long, java.sql.Timestamp, String, Long)],
         state: GroupState[Seq[Long]]) =>
          var times = state.getOption.getOrElse(Seq.fill(stages.size)(Open))
          val out = Seq.newBuilder[(Long, Int, String, java.sql.Timestamp)]
          for ((_, ts, tpe, _) <- rows.toSeq.sortBy(e => (micros(e._2), e._4))) {
            stageIdx.get(tpe).foreach { i =>
              val t = micros(ts)
              val prevOk =
                if (i == 0) true
                else times(i - 1) != Open && t > times(i - 1) &&
                  windowMicros.forall(w => t <= times(i - 1) + w)
              if (times(i) == Open && prevOk) {
                times = times.updated(i, t)
                out += ((uid, i + 1, tpe, ts))
              }
            }
          }
          state.update(times)
          out.result().iterator
      }
      .toDF("user_id", "stage", "stage_name", "t")
  }

  /** Streaming retention events via arbitrary stateful processing — the
    * continuous form of [[graft.operators.Events.retention]]'s per-user
    * dedup stage: one append-mode row `(user_id, cohort_day, day_offset)`
    * the FIRST time a user is active on each day at-or-after their signup
    * day. Downstream, `groupBy(cohort_day, day_offset).count()` — batch or
    * a second streaming aggregation — reproduces the batch operator's
    * cohort matrix exactly (StreamingSpec pins it on the real fixture).
    *
    * State per user: the signup day, the offsets already emitted, and the
    * activity days seen BEFORE the signup arrived (same-day activity that
    * precedes the signup event in time must still count once the cohort is
    * known — the batch op keeps any `day >= cohort_day`); pre-signup days
    * earlier than the cohort day are discarded at flush, matching the batch
    * filter. Exact under per-user in-order delivery (the [[funnelStream]]
    * contract); state grows one long per distinct active day within the
    * job's horizon.
    */
  def retentionEventsStream(
      events: DataFrame, // streaming (ts, user_id, event_type)
      signupType: String = "signup",
      watermark: String = "1 hour"): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = events.sparkSession
    import spark.implicits._
    val DayMicros = 86400000000L
    val NoCohort = Long.MinValue
    def micros(t: java.sql.Timestamp): Long =
      t.getTime / 1000L * 1000000L + t.getNanos / 1000L
    events
      .withWatermark("ts", watermark)
      .select(col("user_id").cast("long"), col("ts"),
        col("event_type").cast("string"))
      .as[(Long, java.sql.Timestamp, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Seq[Long], Seq[Long]),
        (Long, java.sql.Timestamp, Long)](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (uid: Long, rows: Iterator[(Long, java.sql.Timestamp, String)],
         state: GroupState[(Long, Seq[Long], Seq[Long])]) =>
          var (cohort, emittedSeq, pendingSeq) =
            state.getOption.getOrElse((NoCohort, Seq.empty[Long], Seq.empty[Long]))
          var emitted = emittedSeq.toSet
          var pending = pendingSeq.toSet
          val out = Seq.newBuilder[(Long, java.sql.Timestamp, Long)]
          def emit(day: Long): Unit = {
            val off = day - cohort
            if (off >= 0 && !emitted(off)) {
              emitted += off
              out += ((uid, new java.sql.Timestamp(cohort * 86400000L), off))
            }
          }
          for ((_, ts, tpe) <- rows.toSeq.sortBy(e => micros(e._2))) {
            val day = Math.floorDiv(micros(ts), DayMicros)
            if (cohort == NoCohort && tpe == signupType) {
              cohort = day
              pending.toSeq.sorted.foreach(emit)
              pending = Set.empty
            }
            if (cohort == NoCohort) pending += day else emit(day)
          }
          state.update((cohort, emitted.toSeq, pending.toSeq))
          out.result().iterator
      }
      .toDF("user_id", "cohort_day", "day_offset")
  }

  /** Streaming NEAR-dup dedup: MinHash+LSH over a document stream, keyed by
    * band bucket, with each bucket's membership held in stream state
    * (`flatMapGroupsWithState`) — the continuous-ingest form of
    * [[graft.operators.Dedup.minhashDedupIncremental]]: every arriving doc
    * is checked against all earlier docs that share one of its LSH buckets,
    * never against the whole corpus. Emits `(a, b, jaccard)` with `a` the
    * earlier doc and `b` the newcomer, exact-verified in-state at or above
    * `threshold`. A pair sharing several buckets is emitted once per shared
    * bucket (identical values) — `.distinct()` downstream or dedup in the
    * sink; state per bucket is capped at `maxBucket` members (the stop-
    * bucket guard: an over-hot bucket is boilerplate, not dedup signal).
    *
    * Scale: state is partitioned by `(band, band_hash)` — the same key the
    * batch pipeline shuffles on — so bucket membership lives next to its
    * verifications and a 1000-executor cluster spreads buckets evenly.
    */
  /** Streaming event-rate anomaly — the continuous form of
    * [[graft.operators.Events.rateAnomaly]]: per `event_type` state holds
    * the open minute's running count plus the last `trailing` CLOSED
    * minute counts; when an arriving event starts a new minute, the open
    * one closes, is z-scored against the deque exactly as the batch
    * operator scores it (`(ck−S)/√(kQ−S²)` on integers, 4dp HALF_UP),
    * emitted append-mode as `(event_type, minute, cnt, z, is_anomaly)`,
    * and pushed into the deque. The still-open final minute emits nothing
    * until a later event closes it — so the emitted rows equal the batch
    * operator's rows for every CLOSED minute (StreamingSpec pins it).
    * In-order contract as [[funnelStream]]: per-type in-order delivery
    * (each micro-batch is processed in `(ts, event_id)` order).
    *
    * Scale: state is `trailing + 2` longs per event type; keyed on
    * `event_type` — types are few, but each type's state is constant-size
    * and the per-event work is O(1), so the bottleneck is partition count,
    * not state size.
    */
  def rateAnomalyStream(
      events: DataFrame, // streaming (ts, event_type, event_id)
      trailing: Int = 8,
      zThreshold: Double = 2.0): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    require(trailing >= 2)
    val spark = events.sparkSession
    import spark.implicits._
    def score(deque: Seq[Long], c: Long): Option[Double] =
      if (deque.size < trailing) None
      else {
        val k = deque.size.toLong
        val s = deque.sum
        val q = deque.map(x => x * x).sum
        val varNum = (BigInt(k) * BigInt(q) - BigInt(s) * BigInt(s)).toDouble
        if (varNum <= 0) None
        else Some(BigDecimal.valueOf((c * k - s).toDouble / math.sqrt(varNum))
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
    events
      .select(col("event_type"), col("ts").cast("timestamp").as("ts"),
        col("event_id").cast("long"))
      .as[(String, java.sql.Timestamp, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Long, Seq[Long]),
        (String, java.sql.Timestamp, Long, Option[Double], Boolean)](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (etype: String, rows: Iterator[(String, java.sql.Timestamp, Long)],
         state: GroupState[(Long, Long, Seq[Long])]) =>
          val MinuteMicros = 60L * 1000000L
          var (openMin, openCnt, deque) =
            state.getOption.getOrElse((Long.MinValue, 0L, Seq.empty[Long]))
          val out = scala.collection.mutable.ArrayBuffer
            .empty[(String, java.sql.Timestamp, Long, Option[Double], Boolean)]
          val sorted = rows.toSeq.sortBy(r => (r._2.getTime, r._3))
          sorted.foreach { r =>
            val micros = r._2.getTime * 1000L
            val m = micros - math.floorMod(micros, MinuteMicros)
            if (openMin == Long.MinValue) { openMin = m; openCnt = 1L }
            else if (m == openMin) openCnt += 1
            else {
              val z = score(deque, openCnt)
              out += ((etype, new java.sql.Timestamp(openMin / 1000L), openCnt,
                z, z.exists(v => math.abs(v) > zThreshold)))
              deque = (deque :+ openCnt).takeRight(trailing)
              openMin = m; openCnt = 1L
            }
          }
          state.update((openMin, openCnt, deque))
          out.iterator
      }
      .toDF("event_type", "minute", "cnt", "z", "is_anomaly")
  }

  /** Streaming heavy-hitter candidates via bucketed Misra-Gries state —
    * the continuous form of [[graft.operators.TextAnalysis.heavyHitters]]'
    * pass 1. Tokens route to `buckets` hash buckets; each bucket keeps ONE
    * [[graft.functions.MgBuffer]] of `capacity` counters as its state and,
    * every micro-batch it receives data, re-emits its current summary:
    * `(bucket, n_seen, token, est)` in update mode (`n_seen` = tokens the
    * bucket has absorbed — take each bucket's max-`n_seen` rows for the
    * latest snapshot).
    *
    * Guarantee (what the spec pins): a token's occurrences all land in one
    * bucket, and the per-bucket MG bound `err ≤ n_b/(capacity+1)` with
    * `n_b ≤ n` means every token with GLOBAL count > n/(capacity+1)
    * survives in its bucket's summary, with `est` a lower bound — the
    * same superset contract the batch operator's exact re-count pass
    * consumes. Which OTHER tokens appear depends on arrival order, as in
    * any MG deployment.
    *
    * Scale: state is `capacity` counters × `buckets` — constant, spread
    * over executors by the bucket key; no token-cardinality state, no
    * watermark needed (counts only grow).
    */
  def heavyHittersStream(
      docs: DataFrame, // streaming (doc_id, text)
      capacity: Int,
      buckets: Int = 32,
      textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    require(capacity > 0 && buckets > 0)
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(explode(
        graft.operators.TextAnalysis.tokens(col(textCol))).as("token"))
      .select((graft.functions.Hash60(col("token")) % buckets).as("bucket"),
        col("token"))
      .as[(Long, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Seq[(String, Long)]),
        (Long, Long, String, Long)](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (bucket: Long, rows: Iterator[(Long, String)],
         state: GroupState[(Long, Seq[(String, Long)])]) =>
          val (seen0, entries0) = state.getOption.getOrElse((0L, Seq.empty))
          val buf = new graft.functions.MgBuffer(capacity)
          entries0.foreach { case (t, c) => buf.counts.update(t, c) }
          var seen = seen0
          rows.foreach { r => buf.add(r._2); seen += 1 }
          val entries = buf.counts.toSeq.sortBy { case (t, c) => (-c, t) }
          state.update((seen, entries))
          entries.iterator.map { case (t, c) => (bucket, seen, t, c) }
      }
      .toDF("bucket", "n_seen", "token", "est")
  }

  /** Streaming twin of [[graft.operators.Pipeline.constraintAudit]]'s
    * scan-family checks: a cumulative data-contract monitor over an
    * ingest stream — the same ONE conditional aggregate (null / range /
    * accepted-values violations), run as a streaming global aggregation
    * (complete/update mode re-emits the running totals per micro-batch).
    * `unique` and referential checks are deliberately absent: streaming
    * distinct-count and arbitrary anti-joins are unsupported/unbounded
    * state — those two families stay batch (run them on the compacted
    * table, where they are one scan).
    */
  def constraintAuditStream(
      rows: DataFrame, // streaming
      notNull: Seq[String] = Nil,
      ranges: Seq[(String, Double, Double)] = Nil,
      accepted: Seq[(String, Seq[String])] = Nil): DataFrame =
    graft.operators.Pipeline.constraintAudit(
      rows, notNull = notNull, ranges = ranges, accepted = accepted)

  /** Streaming twin of [[graft.sources.JsonlStore.ingestAudit]]: running
    * good/corrupt line counts over a JSONL drop directory as files land —
    * the live ingest monitor in front of a dirty dump feed. Same from_json
    * in-struct corrupt-record verdict as the batch op (identical counts on
    * the same lines, StreamingSpec-gated); state is the two-group running
    * aggregate — bounded by construction. Feed it
    * `spark.readStream.text(dir)`; complete/update mode re-emits totals
    * per micro-batch.
    */
  def jsonlAuditStream(
      lines: DataFrame, // streaming (value: STRING)
      schema: org.apache.spark.sql.types.StructType): DataFrame = {
    import org.apache.spark.sql.types.StringType
    val parsed = from_json(col("value"),
      schema.add("_corrupt", StringType),
      java.util.Map.of("mode", "PERMISSIVE",
        "columnNameOfCorruptRecord", "_corrupt"))
    lines
      .select(when(parsed.getField("_corrupt").isNull, lit("good"))
        .otherwise(lit("corrupt")).as("verdict"))
      .groupBy(col("verdict")).agg(count(lit(1)).as("n"))
  }

  /** Streaming twin of the drift monitors' histogram side
    * ([[graft.operators.Eval.ksStat]]/`wasserstein1`/`psi` all start from a
    * value histogram): the running integer-unit value histogram as ONE
    * streaming groupBy aggregate — the live half of a drift dashboard (the
    * frozen reference histogram sits next to it; the KS/W1/PSI readout is
    * the same bounded closed form over the two completed histograms).
    * State is one row per distinct unit value — bounded by the resolution
    * contract (the [[graft.operators.Eval.ksStat]] rule), so the store
    * never grows with the stream. StreamingSpec gates the running
    * histogram against the batch groupBy on the same rows.
    */
  def driftHistogramStream(values: DataFrame, unitCol: String): DataFrame =
    values.groupBy(col(unitCol).cast("long").as("v"))
      .agg(count(lit(1)).as("n"))

  def nearDupStream(
      docs: DataFrame, // streaming (doc_id, text)
      threshold: Double,
      numHashes: Int = 16,
      rowsPerBand: Int = 4,
      maxBucket: Int = graft.operators.Dedup.MaxBandBucket): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import graft.operators.Dedup
    import graft.functions.Hash60
    val spark = docs.sparkSession
    import spark.implicits._
    val numBands = numHashes / rowsPerBand
    val sig = array((0 until numHashes).map(j =>
      array_min(transform(col("h32arr"),
        h => (lit(Dedup.minhashA(j)) * h + lit(Dedup.minhashB(j))) % Dedup.M31))): _*)
    // same band hash as Dedup.lshBands, with the shingle array carried along
    // (a streaming frame cannot self-join the arrays back in later)
    val bandArr = array((0 until numBands).map(b =>
      Hash60(concat_ws("|", (0 until rowsPerBand).map(r =>
        col("_sig").getItem(b * rowsPerBand + r).cast("string")): _*))): _*)
    Dedup.shingleArrays(docs)
      .withColumn("_sig", sig)
      .select(col("doc_id").cast("long"), col("sharr"),
        posexplode(bandArr).as(Seq("band", "band_hash")))
      .as[(Long, Seq[String], Int, Long)]
      .groupByKey(r => (r._3, r._4))
      .flatMapGroupsWithState[Seq[(Long, Seq[String])], (Long, Long, Double)](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (_: (Int, Long), rows: Iterator[(Long, Seq[String], Int, Long)],
            state: GroupState[Seq[(Long, Seq[String])]]) =>
          var members = state.getOption.getOrElse(Seq.empty)
          val hits = Seq.newBuilder[(Long, Long, Double)]
          // id-ordered within the trigger so within-batch pairs orient a < b
          for ((id, sharr, _, _) <- rows.toSeq.sortBy(_._1)
               if !members.exists(_._1 == id)) {
            val sh = sharr.toSet
            for ((mid, msh) <- members) {
              val inter = msh.count(sh)
              val j = inter.toDouble / (sh.size + msh.size - inter)
              // HALF_UP to 4 decimals — the batch pipeline's round(_, 4)
              val jr = BigDecimal(j)
                .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
              if (jr >= threshold) hits += ((mid, id, jr))
            }
            if (members.size < maxBucket) members = members :+ ((id, sharr))
          }
          state.update(members)
          hits.result().iterator
      }
      .toDF("a", "b", "jaccard")
  }

  /** Streaming SemDeDup: the embedding-space sibling of [[nearDupStream]].
    * Arriving vectors route to their single nearest centroid via the
    * [[graft.functions.NearestHeadsExpr]] projection (centroids are the
    * bounded-broadcast contract — pure per-row expression, stream-safe with
    * no pre-state aggregation), then CLUSTER-keyed state
    * (`flatMapGroupsWithState`) verifies exact cosine distance against the
    * capped member list. Emits `(head_id, a, b, cos_dist)` with `a` the
    * earlier member — the same contract as the batch
    * [[graft.operators.SimilaritySearch.semanticDedup]], which the spec
    * holds it equal to.
    *
    * Scale: state is partitioned by centroid — the same key the batch
    * pair-join shuffles on — and capped at `maxCluster` vectors per
    * centroid (the stop-bucket idea: a cluster that hot means the centroid
    * set is undersized for the corpus; SemDeDup scales k ∝ n).
    */
  def semanticDedupStream(
      vecs: DataFrame, // streaming (id, vec)
      cents: DataFrame, // static (head_id, head_vec)
      maxCosDist: Double,
      maxCluster: Int = 1024): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = vecs.sparkSession
    import spark.implicits._
    val nn = graft.functions.NearestHeadsExpr.fromHeads(cents, col("vec"), 1, "cos")
    // mirror of functions.dist cosine: left-to-right dot and norms, then
    // 1 − dot/sqrt(na·nb) — bit-identical to the batch kernel's doubles
    def cosDist(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        val x = a(i).toDouble; val y = b(i).toDouble
        dot += x * y; na += x * x; nb += y * y; i += 1
      }
      val denom = math.sqrt(na * nb)
      if (denom == 0.0) 1.0 else 1.0 - dot / denom
    }
    vecs
      .select(col("id").cast("long"), col("vec").cast("array<float>"),
        element_at(nn, 1).getField("id").as("head_id"))
      .as[(Long, Array[Float], Long)]
      .groupByKey(_._3)
      .flatMapGroupsWithState[Seq[(Long, Array[Float])], (Long, Long, Long, Double)](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (head: Long, rows: Iterator[(Long, Array[Float], Long)],
            state: GroupState[Seq[(Long, Array[Float])]]) =>
          var members = state.getOption.getOrElse(Seq.empty)
          val hits = Seq.newBuilder[(Long, Long, Long, Double)]
          for ((id, vec, _) <- rows.toSeq.sortBy(_._1)
               if !members.exists(_._1 == id)) {
            for ((mid, mvec) <- members) {
              val cd = cosDist(mvec, vec)
              if (cd < maxCosDist) {
                val cdr = BigDecimal(cd)
                  .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
                hits += ((head, math.min(mid, id), math.max(mid, id), cdr))
              }
            }
            if (members.size < maxCluster) members = members :+ ((id, vec))
          }
          state.update(members)
          hits.result().iterator
      }
      .toDF("head_id", "a", "b", "cos_dist")
  }

  /** Online query serving (V1 as a stream, `SocketServer.h` request loop →
    * micro-batches): each trigger's query batch runs the two-stage search
    * against the STATIC index — per-trigger cost ∝ batch size, the postings
    * side stays the same partition-pruned equi-join as batch serving, and
    * the head set rides in the stage-1 expression exactly as in
    * [[graft.operators.Spann.searchTwoStage]]. `emit` receives each batch's
    * ranked results (the reference's per-connection response write).
    */
  def searchStream(
      queryStream: DataFrame, // streaming (query_id, qvec)
      heads: DataFrame,
      postings: DataFrame,
      k: Int,
      internalK: Int,
      emit: DataFrame => Unit): DataStreamWriter[org.apache.spark.sql.Row] =
    queryStream.writeStream
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          emit(Spann.searchTwoStage(batch, heads, postings, k, internalK))
        }
      }

  /** [[searchStream]] in the COMPRESSED domain: each trigger's query batch
    * runs the two-stage ADC search — stage-1 on full-precision heads,
    * stage-2 scoring the static index's STORED codes via the per-query LUT
    * ([[graft.operators.Spann.searchTwoStageAdc]]) — the streaming form of
    * the reference's quantized serving mode.
    */
  def searchStreamAdc(
      queryStream: DataFrame, // streaming (query_id, qvec)
      heads: DataFrame,
      codedPostings: DataFrame, // (head_id, id, codes[, head_bucket])
      rcb: graft.functions.PQ.RotatedCodebooks,
      k: Int,
      internalK: Int,
      emit: DataFrame => Unit): DataStreamWriter[org.apache.spark.sql.Row] =
    queryStream.writeStream
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          emit(Spann.searchTwoStageAdc(batch, heads, codedPostings, rcb, k, internalK))
        }
      }

  /** [[searchStream]] with the reference's stage-split timing
    * (`SSDServing/SSDIndex.h:284-310` prints head-search vs SSD-"Ex"
    * percentiles separately): stage-1 candidates are materialized per
    * trigger so the head search is timed apart from the posting probe.
    * Each trigger appends one `(batch_id, n_queries, stage1_ms, stage2_ms)`
    * row through `record` — feed the collected rows to
    * [[graft.operators.Eval.latencyReportByStage]].
    */
  def searchStreamTimed(
      queryStream: DataFrame, // streaming (query_id, qvec)
      heads: DataFrame,
      postings: DataFrame,
      k: Int,
      internalK: Int,
      emit: DataFrame => Unit,
      record: (Long, Long, Double, Double) => Unit): DataStreamWriter[org.apache.spark.sql.Row] =
    queryStream.writeStream
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          val b = batch.localCheckpoint(true)
          val n = b.count()
          val t0 = System.nanoTime()
          val cand = Spann.candidateHeads(b, heads, internalK).localCheckpoint(true)
          val t1 = System.nanoTime()
          val res = Spann.searchFromCandidates(cand, b, postings, k).localCheckpoint(true)
          val t2 = System.nanoTime()
          emit(res)
          record(batchId, n, (t1 - t0) / 1e6, (t2 - t1) / 1e6)
        }
      }

  /** Micro-batch index ingest: for each incoming vector batch, compute its
    * posting assignments against the CURRENT heads (B8 on the delta only —
    * cost ∝ batch size, not corpus size) and append to the postings store.
    * Returns the writer so the caller controls trigger/checkpoint.
    */
  def ingest(
      vectorStream: DataFrame, // streaming (id, vec)
      heads: DataFrame, // static, broadcastable
      replicaCount: Int,
      appendPostings: DataFrame => Unit): DataStreamWriter[org.apache.spark.sql.Row] =
    vectorStream.writeStream
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          appendPostings(Spann.buildPostings(batch, heads, replicaCount))
        }
      }
}
