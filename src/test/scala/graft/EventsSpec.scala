package graft

import graft.operators.Events
import org.apache.spark.sql.functions._

class EventsSpec extends SparkSpec {
  import spark.implicits._

  private def ev(rows: Seq[(Long, String, Long, String, Double)]) =
    rows.toDF("event_id", "_ts", "user_id", "event_type", "value")
      .withColumn("ts", to_timestamp(col("_ts"))).drop("_ts")

  test("sessionize splits on gaps over the threshold and aggregates per session") {
    val events = ev(Seq(
      // user 1: 3 events 10 min apart, then a 2h gap, then 1 more
      (1L, "2026-01-01 10:00:00", 1L, "view", 1.0),
      (2L, "2026-01-01 10:10:00", 1L, "click", 2.0),
      (3L, "2026-01-01 10:20:00", 1L, "view", 3.0),
      (4L, "2026-01-01 12:20:00", 1L, "view", 4.0),
      // user 2: single event
      (5L, "2026-01-01 09:00:00", 2L, "view", 10.0)))
    val got = Events.sessionize(events, gapMinutes = 30)
      .orderBy("user_id", "session_idx")
      .select("user_id", "session_idx", "n_events", "sum_value")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(got === Seq((1L, 1L, 3L, 6.0), (1L, 2L, 1L, 4.0), (2L, 1L, 1L, 10.0)))
  }

  test("sessionize gap is strict: exactly-at-threshold stays in session") {
    val events = ev(Seq(
      (1L, "2026-01-01 10:00:00", 1L, "view", 1.0),
      (2L, "2026-01-01 10:30:00", 1L, "view", 1.0),   // exactly 30 min later
      (3L, "2026-01-01 11:00:01", 1L, "view", 1.0)))  // 30 min + 1 s later
    val got = Events.sessionize(events, gapMinutes = 30)
      .select(max(col("session_idx"))).as[Long].head()
    assert(got === 2L)
  }

  test("rateAnomaly: planted spike scores z=5 from integer sums; constant window NULLs") {
    import graft.operators.Events
    // 8 trailing minutes alternating 8/12 events, then a 20-event spike:
    // S=80, Q=832, kQ-S²=256 → σ-denominator 16, z=(160-80)/16=5.0
    var eid = 0L
    val rows = ((1 to 8).flatMap { m =>
      val n = if (m % 2 == 1) 8 else 12
      (1 to n).map { i => eid += 1; (eid, f"2026-01-01 10:$m%02d:00", 1L, "click", 1.0) }
    } :+ { eid += 1; (eid, "2026-01-01 10:09:00", 1L, "click", 1.0) })
    val spike = (2 to 20).map { i => eid += 1; (eid, "2026-01-01 10:09:00", 1L, "click", 1.0) }
    val events = ev(rows ++ spike)
    val got = Events.rateAnomaly(events, trailing = 8, zThreshold = 2.0)
      .orderBy("minute").collect()
    assert(got.length === 9)
    // first 8 buckets: no full trailing window → NULL z, not anomalous
    got.take(8).foreach { r => assert(r.isNullAt(3) && !r.getBoolean(4)) }
    val last = got.last
    assert(last.getLong(2) === 20L)
    assert(last.getDouble(3) === 5.0)
    assert(last.getBoolean(4))
    // constant traffic: full window but σ=0 → NULL z
    var eid2 = 1000L
    val const = ev((1 to 9).flatMap { m =>
      (1 to 10).map { _ => eid2 += 1; (eid2, f"2026-01-01 11:$m%02d:00", 1L, "view", 1.0) }
    })
    val g2 = Events.rateAnomaly(const, trailing = 8, zThreshold = 2.0)
      .orderBy("minute").collect()
    g2.foreach { r => assert(r.isNullAt(3) && !r.getBoolean(4)) }
  }

  test("dedupBursts keeps the first event per burst, per (user, type)") {
    val events = ev(Seq(
      // user 1 "click": burst of 3 within the window, then a fresh burst
      (1L, "2026-01-01 10:00:00", 1L, "click", 1.0),
      (2L, "2026-01-01 10:04:00", 1L, "click", 1.0), // 4 min after #1 — dup
      (3L, "2026-01-01 10:12:00", 1L, "click", 1.0), // 8 min after #2 — still chained
      (4L, "2026-01-01 10:30:00", 1L, "click", 1.0), // 18 min gap — new burst
      // same user, different type inside the window — NOT a dup
      (5L, "2026-01-01 10:01:00", 1L, "view", 1.0),
      // other user, same type/time — NOT a dup
      (6L, "2026-01-01 10:00:00", 2L, "click", 1.0)))
    val kept = Events.dedupBursts(events, windowMinutes = 10)
      .select("event_id").as[Long].collect().toSet
    assert(kept === Set(1L, 4L, 5L, 6L))
  }

  test("dedupBursts boundary is strict: a gap of exactly the window chains") {
    val events = ev(Seq(
      (1L, "2026-01-01 10:00:00", 1L, "click", 1.0),
      (2L, "2026-01-01 10:10:00", 1L, "click", 1.0),   // exactly 10 min — dup
      (3L, "2026-01-01 10:20:01", 1L, "click", 1.0)))  // 10 min + 1 s — new burst
    val kept = Events.dedupBursts(events, windowMinutes = 10)
      .select("event_id").as[Long].collect().toSet
    assert(kept === Set(1L, 3L))
  }

  test("funnel chains stages strictly-after with a conversion window") {
    val events = ev(Seq(
      // u1 completes all three within the window
      (1L, "2026-01-01 10:00:00", 1L, "view", 0.0),
      (2L, "2026-01-01 10:05:00", 1L, "click", 0.0),
      (3L, "2026-01-01 10:10:00", 1L, "purchase", 0.0),
      // u2 clicks BEFORE viewing → stage 2 never fires
      (4L, "2026-01-01 10:05:00", 2L, "click", 0.0),
      (5L, "2026-01-01 10:10:00", 2L, "view", 0.0),
      // u3 clicks too late (2h after view, window is 1h)
      (6L, "2026-01-01 10:00:00", 3L, "view", 0.0),
      (7L, "2026-01-01 12:00:00", 3L, "click", 0.0)))
    val got = Events.funnel(events, Seq("view", "click", "purchase"), Some(60))
      .groupBy("stage").agg(count(lit(1)).as("n"), collect_set("user_id").as("u"))
      .orderBy("stage")
      .select("stage", "n").as[(Int, Long)].collect().toSeq
    assert(got === Seq((1, 3L), (2, 1L), (3, 1L)))
  }

  test("funnel picks the earliest qualifying time per stage") {
    val events = ev(Seq(
      (1L, "2026-01-01 10:00:00", 1L, "view", 0.0),
      (2L, "2026-01-01 09:00:00", 1L, "click", 0.0),  // before the view: ignored
      (3L, "2026-01-01 10:30:00", 1L, "click", 0.0),
      (4L, "2026-01-01 10:40:00", 1L, "click", 0.0))) // later duplicate: ignored
    val t2 = Events.funnel(events, Seq("view", "click"), Some(120))
      .where(col("stage") === 2).select(col("t").cast("string"))
      .as[String].head()
    assert(t2 === "2026-01-01 10:30:00")
  }

  test("retention counts distinct active users per cohort-day offset") {
    val events = ev(Seq(
      // u1 signs up Jan 1, active Jan 1 (twice) and Jan 3
      (1L, "2026-01-01 10:00:00", 1L, "signup", 0.0),
      (2L, "2026-01-01 11:00:00", 1L, "click", 0.0),
      (3L, "2026-01-03 10:00:00", 1L, "view", 0.0),
      // u2 signs up Jan 1 too, active only that day
      (4L, "2026-01-01 12:00:00", 2L, "signup", 0.0),
      // u3 never signs up: excluded entirely
      (5L, "2026-01-02 12:00:00", 3L, "view", 0.0),
      // u1 pre-signup activity is not counted
      (6L, "2025-12-31 10:00:00", 1L, "view", 0.0)))
    val got = Events.retention(events)
      .orderBy("cohort_day", "day_offset")
      .select(col("cohort_day").cast("string"), col("day_offset"), col("n_users"))
      .as[(String, Long, Long)].collect().toSeq
    assert(got === Seq(
      ("2026-01-01 00:00:00", 0L, 2L),
      ("2026-01-01 00:00:00", 2L, 1L)))
  }

  test("sessionize on the sf0.001 events matches a brute-force recount") {
    val events = Tables.events(spark, sf0001)
    val sessions = Events.sessionize(events, gapMinutes = 480)
    val nSessions = sessions.count()
    val nEvents = sessions.agg(sum("n_events")).as[Long].head()
    assert(nEvents === events.count())
    assert(nSessions > 0 && nSessions < nEvents)
    // session bounds are consistent and non-overlapping per user
    val bad = sessions.alias("a").join(sessions.alias("b"),
      col("a.user_id") === col("b.user_id") &&
        col("a.session_idx") === col("b.session_idx") - 1 &&
        col("a.session_end") >= col("b.session_start")).count()
    assert(bad === 0L)
  }

  test("funnel equals a plain-Scala chained-greedy reference on random streams") {
    val stages = Seq("view", "click", "purchase")
    val types = stages ++ Seq("error", "scroll")
    val rng = new scala.util.Random(7)
    for (trial <- 1 to 5) {
      val rows = (0 until 120).map { i =>
        val uid = 1L + rng.nextInt(6)
        val t = f"2026-01-01 ${rng.nextInt(24)}%02d:${rng.nextInt(60)}%02d:${rng.nextInt(60)}%02d"
        (i.toLong, t, uid, types(rng.nextInt(types.length)), 1.0)
      }
      val within = if (trial % 2 == 0) Some(180) else None
      // plain-Scala reference: greedy first-eligible commit in (ts, id) order
      val ref = rows.groupBy(_._3).flatMap { case (uid, evs) =>
        val times = Array.fill(stages.length)(Option.empty[String])
        val out = Seq.newBuilder[(Long, Int, String, String)]
        for ((id, t, _, tpe, _) <- evs.sortBy(e => (e._2, e._1));
             i <- stages.zipWithIndex.filter(_._1 == tpe).map(_._2)) {
          val prevOk = i == 0 || (times(i - 1).isDefined && t > times(i - 1).get &&
            within.forall { w =>
              val fmt = java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")
              val prev = java.time.LocalDateTime.parse(times(i - 1).get, fmt)
              !java.time.LocalDateTime.parse(t, fmt).isAfter(prev.plusMinutes(w))
            })
          if (times(i).isEmpty && prevOk) { times(i) = Some(t); out += ((uid, i + 1, tpe, t)) }
        }
        out.result()
      }.toSet
      val got = Events.funnel(ev(rows), stages, within)
        .select(col("user_id"), col("stage"), col("stage_name"),
          date_format(col("t"), "yyyy-MM-dd HH:mm:ss"))
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getString(3)))
        .toSet
      assert(got === ref,
        s"trial $trial (within=$within): missing ${ref -- got}, extra ${got -- ref}")
    }
  }

  test("as-of join: latest prior match, inclusive ties, greatest id on equal ts, null when none") {
    import spark.implicits._
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    def ts(min: Long) = new java.sql.Timestamp(t0 + min * 60000L)
    // views: t=10 (id 100), two at t=20 (ids 101, 102), t=40 (id 103)
    val views = Seq(
      (1L, ts(10), 100L, 1.0), (1L, ts(20), 101L, 2.0),
      (1L, ts(20), 102L, 3.0), (1L, ts(40), 103L, 4.0),
      (2L, ts(5), 200L, 9.0) // other user — must never leak
    ).toDF("user_id", "ts", "event_id", "value")
    val purchases = Seq(
      (1L, ts(5), 900L, 0.0),  // before any view -> null
      (1L, ts(15), 901L, 0.0), // after t=10 -> id 100
      (1L, ts(20), 902L, 0.0), // equal ts is inclusive; greatest id 102 wins
      (1L, ts(60), 903L, 0.0)  // latest overall -> id 103
    ).toDF("user_id", "ts", "event_id", "value")
    val r = Events.asOfJoin(purchases, views).collect()
      .map(x => x.getLong(2) -> (if (x.isNullAt(4)) -1L else x.getLong(4))).toMap
    assert(r === Map(900L -> -1L, 901L -> 100L, 902L -> 102L, 903L -> 103L))
  }

  test("asOfJoinNearest: direction choice, ties to backward, tolerance cut, " +
      "degenerates to asOfJoin when everything is backward") {
    import spark.implicits._
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    def ts(min: Long) = new java.sql.Timestamp(t0 + min * 60000L)
    val views = Seq(
      (1L, ts(10), 100L, 1.0), (1L, ts(30), 101L, 2.0),
      (2L, ts(5), 200L, 9.0) // other user — must never leak
    ).toDF("user_id", "ts", "event_id", "value")
    val purchases = Seq(
      (1L, ts(12), 900L, 0.0), // 2 min back vs 18 fwd -> backward 100
      (1L, ts(26), 901L, 0.0), // 16 back vs 4 fwd -> forward 101
      (1L, ts(20), 902L, 0.0), // exact tie 10/10 -> backward 100
      (1L, ts(55), 903L, 0.0), // 25 back, nothing fwd -> backward 101
      (1L, ts(90), 904L, 0.0)  // 60 back > 30-min tolerance -> null
    ).toDF("user_id", "ts", "event_id", "value")
    val got = Events.asOfJoinNearest(purchases, views, 1800L).collect()
      .map(x => x.getLong(2) -> (
        (if (x.isNullAt(4)) -1L else x.getLong(4)),
        if (x.isNullAt(7)) "-" else x.getString(7))).toMap
    assert(got === Map(
      900L -> (100L, "b"), 901L -> (101L, "f"), 902L -> (100L, "b"),
      903L -> (101L, "b"), 904L -> (-1L, "-")))
    // with every right row behind every left row and a huge tolerance,
    // nearest IS the plain backward as-of join
    val lateP = purchases.where(col("event_id") >= 903L)
    val near = Events.asOfJoinNearest(lateP, views, 1000000L)
      .select(col("event_id"), col("nearest_event_id"))
    val back = Events.asOfJoin(lateP, views)
      .select(col("event_id"), col("asof_event_id").as("nearest_event_id"))
    assert(near.exceptAll(back).count() === 0 && back.exceptAll(near).count() === 0)
  }

  test("funnelSummary: hand-counted stage reach and conversion ratios") {
    import spark.implicits._
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    def ts(min: Long) = new java.sql.Timestamp(t0 + min * 60000L)
    // 4 users view; 2 click within the window; 1 purchases within it
    val events = Seq(
      (1L, ts(0), 1L, "view"), (1L, ts(5), 2L, "click"), (1L, ts(9), 3L, "purchase"),
      (2L, ts(0), 4L, "view"), (2L, ts(5), 5L, "click"),
      (3L, ts(0), 6L, "view"),
      (4L, ts(0), 7L, "view"), (4L, ts(500), 8L, "click") // outside the window
    ).toDF("user_id", "ts", "event_id", "event_type")
      .withColumn("value", lit(0.0))
    val got = Events.funnelSummary(events, Seq("view", "click", "purchase"),
      Some(60)).orderBy("stage").collect()
    assert(got.map(_.getLong(2)).toSeq === Seq(4L, 2L, 1L))
    assert(got(0).isNullAt(3), "stage 1 has no previous stage")
    assert(got(1).getDouble(3) === 0.5 && got(2).getDouble(3) === 0.5)
    assert(got.map(_.getDouble(4)).toSeq === Seq(1.0, 0.5, 0.25))
  }

  test("decayedValue: whole half-lives halve exactly; tail clamps at 12") {
    import graft.operators.Events
    val events = ev(Seq(
      // user 1: at T, T-1d, T-2d → 10 + 20/2 + 40/4 = 30
      (1L, "2026-01-21 00:00:00", 1L, "view", 10.0),
      (2L, "2026-01-20 00:00:00", 1L, "view", 20.0),
      (3L, "2026-01-19 00:00:00", 1L, "view", 40.0),
      // user 2: 20 days old → k clamps at 12 → 4096·0.5^12 = 1.0
      (4L, "2026-01-01 00:00:00", 2L, "view", 4096.0),
      // user 3: 0.5 half-lives → floor → k = 0, full weight
      (5L, "2026-01-20 12:00:00", 3L, "view", 7.0)))
    val got = Events.decayedValue(events, 1.0).orderBy("user_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq === Seq((1L, 3L, 30.0), (2L, 1L, 1.0), (3L, 1L, 7.0)))
  }

  test("positionAttribution: U-shape splits 40/20/40, degenerate journeys " +
      "follow the 1.0 and 0.5/0.5 conventions, credits sum to value") {
    import spark.implicits._
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    def ts(min: Long) = new java.sql.Timestamp(t0 + min * 60000L)
    val events = Seq(
      // user 1: three views then a purchase of 10 → 4 / 2 / 4
      (1L, ts(1), 10L, "view", 0.0), (1L, ts(2), 11L, "view", 0.0),
      (1L, ts(3), 12L, "view", 0.0), (1L, ts(30), 13L, "purchase", 10.0),
      // user 2: one view → full credit
      (2L, ts(1), 20L, "view", 0.0), (2L, ts(30), 21L, "purchase", 8.0),
      // user 3: two views → 0.5 each
      (3L, ts(1), 30L, "view", 0.0), (3L, ts(2), 31L, "view", 0.0),
      (3L, ts(30), 32L, "purchase", 6.0),
      // user 4: view OUTSIDE the 60-minute window → no row
      (4L, ts(1), 40L, "view", 0.0), (4L, ts(90), 41L, "purchase", 5.0)
    ).toDF("user_id", "ts", "event_id", "event_type", "value")
    val got = Events.positionAttribution(events, 60, 0.4)
    val byView = got.collect()
      .map(r => r.getLong(2) -> r.getDouble(5)).toMap
    assert(byView === Map(
      10L -> 4.0, 11L -> 2.0, 12L -> 4.0,
      20L -> 8.0, 30L -> 3.0, 31L -> 3.0))
    // the out-of-window purchase contributes nothing
    assert(!got.select("purchase_id").collect().map(_.getLong(0)).contains(41L))
    // per-purchase credits re-sum to the purchase value
    val sums = got.groupBy("purchase_id").agg(sum(col("credit")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(sums === Map(13L -> 10.0, 21L -> 8.0, 32L -> 6.0))
  }

  test("seasonality shares sum to 1 per type; transitions probs sum to 1 per from_type; " +
    "timeToConvert percentiles are monotone and hand-exact") {
    val events = ev(Seq(
      (1L, "2026-01-04 10:00:00", 1L, "signup", 0.0),   // Sunday
      (2L, "2026-01-04 10:05:00", 1L, "view", 0.0),
      (3L, "2026-01-04 10:30:30", 1L, "purchase", 5.0), // 30.5 min after signup
      (4L, "2026-01-05 09:00:00", 2L, "signup", 0.0),
      (5L, "2026-01-05 09:01:00", 2L, "purchase", 7.0), // 1 min
      (6L, "2026-01-05 09:02:00", 2L, "view", 0.0),
      (7L, "2026-01-06 23:00:00", 3L, "signup", 0.0)))  // never converts
    val season = Events.seasonality(events)
    val bySrc = season.groupBy("event_type")
      .agg(sum(col("share")).as("s"), sum(col("n")).as("n")).collect()
    bySrc.foreach(r => assert(math.abs(r.getDouble(1) - 1.0) < 1e-4, r))
    // Sunday 10:00 signup lands in dow=1 (Spark: Sunday = 1)
    assert(season.where(col("event_type") === "signup" && col("dow") === 1 &&
      col("hod") === 10).count() === 1)

    val trans = Events.transitions(events)
    val probSums = trans.groupBy("from_type").agg(sum(col("prob"))).collect()
    probSums.foreach(r => assert(math.abs(r.getDouble(1) - 1.0) < 1e-4, r))
    // user 1: signup→view→purchase; user 2: signup→purchase→view
    val m = trans.collect().map(r =>
      (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(m(("signup", "view")) === 1L && m(("signup", "purchase")) === 1L &&
      m(("view", "purchase")) === 1L && m(("purchase", "view")) === 1L)

    // delays: 1830s → bucket 1800; 60s → bucket 60. p50 = 60, p99 = 1800
    val ttc = Events.timeToConvert(events, Seq(50, 99)).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(ttc === Map(50 -> 60L, 99 -> 1800L))
  }

  test("propsMetrics: exact typed rollup; malformed/missing/non-numeric " +
      "JSON contributes nothing") {
    import spark.implicits._
    val rows = Seq(
      ("a", """{"k": 5}"""), ("a", """{"k": 5}"""), ("a", """{"k": 7}"""),
      ("a", """{"j": 9}"""),      // missing field
      ("b", """{"k": "x"}"""),    // non-numeric value
      ("b", """not json"""),      // malformed payload
      ("b", null),                // null payload
      ("b", """{"k": -3}"""))
      .toDF("event_type", "props")
    val got = Events.propsMetrics(rows).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(got.sortBy(_._1).toSeq === Seq(
      ("a", 3L, 17L, 5L, 7L, 2L),
      ("b", 1L, -3L, -3L, -3L, 1L)))
  }

  test("kaplanMeier: hand-checked product-limit with censoring; " +
      "risk-set exhaustion zeroes the tail") {
    // 4 signups; conversions at +1h (u1), +2h (u2); u3/u4 censored at the
    // max ts (+3h from their signups at 10:00). With 1h buckets:
    //   t=3600: d=1, n=4 → S = 3/4
    //   t=7200: d=1, n=3 → S = 3/4 · 2/3 = 1/2
    // censored mass (u3, u4) falls at t=10800 (no event row emitted there)
    val events = ev(Seq(
      (1L, "2026-01-01 10:00:00", 1L, "signup", 0.0),
      (2L, "2026-01-01 11:00:00", 1L, "purchase", 1.0),
      (3L, "2026-01-01 10:00:00", 2L, "signup", 0.0),
      (4L, "2026-01-01 12:00:00", 2L, "purchase", 1.0),
      (5L, "2026-01-01 10:00:00", 3L, "signup", 0.0),
      (6L, "2026-01-01 10:00:00", 4L, "signup", 0.0),
      (7L, "2026-01-01 13:00:00", 9L, "view", 0.0))) // horizon anchor
    val got = Events.kaplanMeier(events)
      .orderBy("t_sec")
      .select("t_sec", "n_risk", "n_events", "n_censored", "survival")
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    assert(got === Seq((3600L, 4L, 1L, 0L, 0.75), (7200L, 3L, 1L, 0L, 0.5)))
    // no censoring, last event exhausts the risk set → survival hits 0.0
    val all = ev(Seq(
      (1L, "2026-01-01 10:00:00", 1L, "signup", 0.0),
      (2L, "2026-01-01 11:00:00", 1L, "purchase", 1.0),
      (3L, "2026-01-01 10:00:00", 2L, "signup", 0.0),
      (4L, "2026-01-01 12:00:00", 2L, "purchase", 1.0)))
    val g2 = Events.kaplanMeier(all).orderBy("t_sec")
      .select("t_sec", "survival").as[(Long, Double)].collect().toSeq
    assert(g2 === Seq((3600L, 0.5), (7200L, 0.0)),
      "d = n_risk must zero survival, not ln(0)")
  }

  test("nelsonAalen: hand-checked cumulative hazard on the kaplanMeier " +
      "fixture; censor-only times carry the hazard forward") {
    // same risk sets as the KM fixture: t=3600 d=1 n=4 → H = 0.25;
    // t=7200 d=1 n=3 → H = 0.25 + 1/3; t=10800 censors only → H unchanged
    val events = ev(Seq(
      (1L, "2026-01-01 10:00:00", 1L, "signup", 0.0),
      (2L, "2026-01-01 11:00:00", 1L, "purchase", 1.0),
      (3L, "2026-01-01 10:00:00", 2L, "signup", 0.0),
      (4L, "2026-01-01 12:00:00", 2L, "purchase", 1.0),
      (5L, "2026-01-01 10:00:00", 3L, "signup", 0.0),
      (6L, "2026-01-01 10:00:00", 4L, "signup", 0.0),
      (7L, "2026-01-01 13:00:00", 9L, "view", 0.0))) // horizon anchor
    val got = Events.nelsonAalen(events).orderBy("t_sec")
      .select("t_sec", "n_risk", "n_events", "n_censored", "cum_hazard")
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    assert(got === Seq((3600L, 4L, 1L, 0L, 0.25),
      (7200L, 3L, 1L, 0L, 0.583333), (10800L, 2L, 0L, 2L, 0.583333)))
  }

  test("ewmaDaily: closed form equals the sequential recurrence; gap days " +
      "decay the baseline; the level shift alarms") {
    // one type, daily counts 4,4,10 at alpha 0.5: E = 4, 4, 7;
    // resid = 0, 0, 6; sigma = sqrt(8) -> only day 3 crosses 1.5*sigma
    val rows = Seq(4, 4, 10).zipWithIndex.flatMap { case (n, d) =>
      (1 to n).map(i =>
        ((d * 100 + i).toLong, f"2026-01-${d + 1}%02d 10:00:${i % 60}%02d",
          1L, "view", 0.0))
    }
    val got = Events.ewmaDaily(ev(rows), alpha = 0.5, bandFactor = 1.5)
      .orderBy("day").select("x", "ewma", "resid", "alarm")
      .as[(Long, Double, Double, Boolean)].collect().toSeq
    assert(got === Seq((4L, 4.0, 0.0, false), (4L, 4.0, 0.0, false),
      (10L, 7.0, 6.0, true)))
    // calendar gap: counts 2,(0),2 at alpha 0.5 → E = 2, 1, 1.5 — the
    // missing day feeds x = 0 and decays the baseline
    val gap = ev(Seq(0, 2).flatMap { d =>
      (1 to 2).map(i =>
        ((d * 100 + i).toLong, f"2026-03-${d + 1}%02d 10:00:${i % 60}%02d",
          1L, "view", 0.0))
    })
    val gg = Events.ewmaDaily(gap, alpha = 0.5, bandFactor = 3.0)
      .orderBy("day").select("x", "ewma", "resid")
      .as[(Long, Double, Double)].collect().toSeq
    assert(gg === Seq((2L, 2.0, 0.0), (0L, 1.0, -2.0), (2L, 1.5, 1.0)))
    // random sequences: the weight-fold closed form ≡ the recurrence
    val rng = new scala.util.Random(7)
    for (_ <- 1 to 3) {
      val counts = Seq.fill(5)(1 + rng.nextInt(9))
      val events = ev(counts.zipWithIndex.flatMap { case (n, d) =>
        (1 to n).map(i =>
          ((d * 1000 + i).toLong, f"2026-02-${d + 1}%02d 09:00:${i % 60}%02d",
            1L, "click", 0.0))
      })
      val a = 0.3
      val ref = counts.tail.scanLeft(counts.head.toDouble)(
        (e, x) => a * x + (1 - a) * e)
      val gotR = Events.ewmaDaily(events, alpha = a).orderBy("day")
        .select("ewma").as[Double].collect().toSeq
      gotR.zip(ref).foreach { case (g, r) =>
        assert(math.abs(g - r) < 1e-5, s"$gotR vs $ref")
      }
    }
  }

  test("cusumDaily: closed form equals the max(0,·) recurrence; sustained " +
      "drift alarms where a single-day z-score would not") {
    // one type, daily counts 1,1,1,13 → k = 16/4 = 4; CUSUM 0,0,0,9;
    // alarm on day 4 (9 > 2k = 8)
    val rows = Seq(1, 1, 1, 13).zipWithIndex.flatMap { case (n, d) =>
      (1 to n).map(i =>
        ((d * 100 + i).toLong, f"2026-01-${d + 1}%02d 10:00:${i % 60}%02d",
          1L, "view", 0.0))
    }
    val got = Events.cusumDaily(ev(rows))
      .orderBy("day").select("x", "k", "cusum", "alarm")
      .as[(Long, Long, Long, Boolean)].collect().toSeq
    assert(got === Seq((1L, 4L, 0L, false), (1L, 4L, 0L, false),
      (1L, 4L, 0L, false), (13L, 4L, 9L, true)))
    // zero-event calendar gaps feed the recurrence as x = 0 − k and
    // count against the mean: days 1 and 3 carry 9 events, day 2 none →
    // k = 18 div 3 = 6 and the CUSUM decays to 0 across the gap
    val gap = ev(Seq(0, 2).flatMap { d =>
      (1 to 9).map(i =>
        ((d * 100 + i).toLong, f"2026-03-${d + 1}%02d 10:00:${i % 60}%02d",
          1L, "view", 0.0))
    })
    val gg = Events.cusumDaily(gap).orderBy("day")
      .select("x", "k", "cusum").as[(Long, Long, Long)].collect().toSeq
    assert(gg === Seq((9L, 6L, 3L), (0L, 6L, 0L), (9L, 6L, 3L)),
      s"gap day must appear with x=0 and decay the statistic: $gg")
    // random sequences: closed form ≡ the sequential recurrence
    val rng = new scala.util.Random(11)
    for (_ <- 1 to 3) {
      val counts = Seq.fill(6)(1 + rng.nextInt(9))
      val events = ev(counts.zipWithIndex.flatMap { case (n, d) =>
        (1 to n).map(i =>
          ((d * 1000 + i).toLong, f"2026-02-${d + 1}%02d 09:00:${i % 60}%02d",
            1L, "click", 0.0))
      })
      val k = counts.sum / counts.length
      var s = 0L
      val expect = counts.map { x => s = math.max(0L, s + x - k); s }
      val cs = Events.cusumDaily(events).orderBy("day")
        .select("cusum").as[Long].collect().toSeq
      assert(cs === expect, s"counts=$counts k=$k")
    }
  }
}
