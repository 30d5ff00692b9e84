package graft

import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp
import graft.ops.Events

/** Sessionization + windowing semantics on hand-built event streams. */
class EventsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  // user 1: two sessions split by a 31-min gap (30-min threshold);
  // user 2: one session, gap exactly 30:00 does NOT split (> means strict)
  private lazy val dir = TestFixtures.writeDir(Map(
    "events" -> Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "click", 1.0, "{\"k\": 1}"),
      (2L, ts("2024-01-01 10:10:00"), 1L, "view",  2.0, "{\"k\": 2}"),
      (3L, ts("2024-01-01 10:41:00"), 1L, "click", 3.0, "{\"k\": 3}"),
      (4L, ts("2024-01-01 09:00:00"), 2L, "view",  4.0, "{\"k\": 4}"),
      (5L, ts("2024-01-01 09:30:00"), 2L, "view",  5.0, "bad json"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")))

  test("sessionize: 31-min gap splits, exactly-30-min gap does not") {
    val r = Events.sessionize(spark, dir).collect()
      .map(x => (x.getLong(0), x.getLong(1)) -> x.getLong(4)).toMap
    assert(r === Map((1L, 1L) -> 2L, (1L, 2L) -> 1L, (2L, 1L) -> 2L))
  }

  test("session bounds are min/max event time") {
    val s11 = Events.sessionize(spark, dir)
      .filter($"user_id" === 1 && $"session_id" === 1).head()
    assert(s11.getTimestamp(2) === ts("2024-01-01 10:00:00"))
    assert(s11.getTimestamp(3) === ts("2024-01-01 10:10:00"))
  }

  test("tumbling 1h windows bucket by event time per type") {
    val r = Events.tumbling(spark, dir).collect()
      .map(x => (x.getTimestamp(0), x.getString(1)) -> x.getLong(2)).toMap
    assert(r((ts("2024-01-01 10:00:00"), "click")) === 2L)
    assert(r((ts("2024-01-01 09:00:00"), "view")) === 2L)
  }

  test("sliding 1h/15min windows: each event lands in 4 windows") {
    val n = Events.sliding(spark, dir).collect().map(_.getLong(2)).sum
    assert(n === 5L * 4)
  }

  test("json extraction parses valid props and rejects malformed rows") {
    val r = Events.jsonExtract(spark, dir).collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r === Map(1L -> 1L, 2L -> 2L, 3L -> 3L, 4L -> 4L)) // id 5 rejected
  }

  test("zscore chunked scale path == plain window where chunks are full; " +
       "under-full chunks fall back") {
    import org.apache.spark.sql.functions.col
    // sf0.1 has 591-739 events per (type, day): the chunked rewrite
    // engages, and must reproduce the plain single-window-per-type form
    // bit-for-bit (same frame contents in the same accumulation order).
    val e01 = Tables.events(spark, "/root/testdata/sf0.1")
      .select(col("event_id"), col("event_type"), col("value"), col("ts"))
    val chunked = Events.zscoreChunked(e01)
    assert(chunked.isDefined, "sf0.1 chunks are full: scale path must engage")
    val a = chunked.get.collect().toSeq
    val b = Events.zscorePlain(e01).collect().toSeq
    assert(a === b)
    // Single-bucket streams (the hand fixture: one day) are wholly
    // contained, so the rewrite may engage — and must still agree.
    val tiny = Tables.events(spark, dir)
      .select(col("event_id"), col("event_type"), col("value"), col("ts"))
    assert(Events.zscoreChunked(tiny).isDefined)
    assert(Events.zscoreChunked(tiny).get.collect().toSeq ===
      Events.zscorePlain(tiny).collect().toSeq)
    // A multi-day stream whose non-final day is under-full (< 100 rows)
    // could have frames spanning several buckets: the containment guard
    // must refuse the rewrite.
    val sparse = Seq(
      (1L, ts("2024-01-01 10:00:00"), "click", 1.0),
      (2L, ts("2024-01-01 11:00:00"), "click", 2.0),
      (3L, ts("2024-01-02 10:00:00"), "click", 3.0),
      (4L, ts("2024-01-02 11:00:00"), "click", 4.0))
      .toDF("event_id", "ts", "event_type", "value")
      .select(col("event_id"), col("event_type"), col("value"), col("ts"))
    assert(Events.zscoreChunked(sparse).isEmpty)
  }

  test("mad_outlier flags planted extremes and is robust to an outlier " +
       "cluster dragging the mean") {
    // 20 inliers at 10±1 plus THREE extremes at 1000 — enough to pull a
    // mean/stddev detector's center far off 10, but median/MAD ignore
    // them. All three extremes (and only they) must be flagged.
    val rows = (1L to 20L).map(i =>
        (i, ts("2024-01-01 10:00:00"), 1L, "click",
         10.0 + (i % 3) - 1, "{}")) ++
      Seq((21L, ts("2024-01-01 11:00:00"), 1L, "click", 1000.0, "{}"),
          (22L, ts("2024-01-01 11:01:00"), 1L, "click", 1000.0, "{}"),
          (23L, ts("2024-01-01 11:02:00"), 1L, "click", 1000.0, "{}"))
    val mdir = TestFixtures.writeDir(Map(
      "events" -> rows
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")))
    val flagged = Events.madOutliers(spark, mdir).collect()
      .map(_.getLong(0)).toSet
    assert(flagged === Set(21L, 22L, 23L))
  }

  test("attribution: purchases credit the latest preceding click; " +
       "direct conversions keep NULLs") {
    val adir = TestFixtures.writeDir(Map(
      "events" -> Seq(
        (1L, ts("2024-01-01 10:00:00"), 1L, "click",    1.0, "{}"),
        (2L, ts("2024-01-01 10:05:00"), 1L, "click",    1.0, "{}"),
        (3L, ts("2024-01-01 10:20:00"), 1L, "purchase", 9.0, "{}"),
        (4L, ts("2024-01-01 11:00:00"), 1L, "purchase", 5.0, "{}"),
        (5L, ts("2024-01-01 09:00:00"), 2L, "purchase", 7.0, "{}"))
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")))
    val got = graft.ops.Events.attribution(spark, adir).collect()
      .map(r => r.getLong(0) -> (Option(r.getTimestamp(3)),
        if (r.isNullAt(4)) None else Some(r.getLong(4)),
        r.getLong(5))).toMap
    assert(got(3L) === ((Some(ts("2024-01-01 10:05:00")),
      Some(15L * 60 * 1000000), 2L)))       // latest of the two clicks
    assert(got(4L) === ((Some(ts("2024-01-01 10:05:00")),
      Some(55L * 60 * 1000000), 2L)))       // purchases don't reset it
    assert(got(5L) === ((None, None, 0L)))  // direct conversion survives
  }

  test("session_stats: bounce and averages over the 3-session fixture") {
    val r = graft.ops.Events.sessionStats(spark, dir).collect()
    assert(r.length === 1)
    val row = r.head
    // sessions: u1 (2 events), u1 (1 event → bounce), u2 (2 events)
    assert(row.getLong(1) === 3L)
    assert(row.getLong(2) === 1L)
    assert(row.getDouble(3) === 1.6667)
    assert(row.getDouble(5) === 0.3333)
  }

  test("interarrival: gap count = events minus (user, type) streams") {
    val sf = "/root/testdata/sf0.001"
    val rows = graft.ops.Events.interarrival(spark, sf).collect()
    val nEvents = Tables.events(spark, sf).count()
    val nStreams = Tables.events(spark, sf)
      .select($"user_id", $"event_type").distinct().count()
    assert(rows.map(_.getLong(1)).sum === nEvents - nStreams)
    rows.foreach { r =>
      assert(r.getDouble(2) <= r.getDouble(3) &&
             r.getDouble(3) <= r.getDouble(4), "p50 <= p90 <= p99")
    }
  }

  test("events_heatmap: cells cover every event, shares sum to 1, keys " +
       "in range") {
    val sf = "/root/testdata/sf0.001"
    val rows = graft.ops.Events.heatmap(spark, sf).collect()
    assert(rows.map(_.getLong(2)).sum === Tables.events(spark, sf).count())
    assert(rows.forall(r => r.getLong(0) >= 0 && r.getLong(0) <= 6))
    assert(rows.forall(r => r.getLong(1) >= 0 && r.getLong(1) <= 23))
    assert(math.abs(rows.map(_.getDouble(3)).sum - 1.0) < 1e-3)
  }

  test("events_autocorr: a perfectly alternating series has lag-1 " +
       "correlation -1") {
    // one event on even days, three on odd days → n alternates 1,3
    val base = (0 until 10).map(i =>
      (i * 10L, ts(f"2024-01-${i + 1}%02d 10:00:00"), 1L, "click", 1.0,
       "{}"))
    val extra = (0 until 5).flatMap(i => Seq(
      (1000L + i * 2, ts(f"2024-01-${2 * i + 2}%02d 11:00:00"), 1L,
       "click", 1.0, "{}"),
      (1001L + i * 2, ts(f"2024-01-${2 * i + 2}%02d 12:00:00"), 1L,
       "click", 1.0, "{}")))
    val adir = TestFixtures.writeDir(Map(
      "events" -> (base ++ extra)
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")))
    val r = graft.ops.Events.autocorr(spark, adir).collect()
      .map(x => x.getString(0) -> x.getDouble(2)).toMap
    assert(math.abs(r("click") - (-1.0)) < 1e-4)
  }

  test("asof_forward: clicks see the NEXT purchase; clicks after the " +
       "last purchase keep NULLs") {
    val adir = TestFixtures.writeDir(Map(
      "events" -> Seq(
        (1L, ts("2024-01-01 10:00:00"), 1L, "click",    1.0, "{}"),
        (2L, ts("2024-01-01 10:30:00"), 1L, "purchase", 9.0, "{}"),
        (3L, ts("2024-01-01 10:45:00"), 1L, "click",    1.0, "{}"),
        (4L, ts("2024-01-01 11:00:00"), 1L, "purchase", 5.0, "{}"),
        (5L, ts("2024-01-01 12:00:00"), 1L, "click",    1.0, "{}"))
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")))
    val got = graft.ops.Events.asofForward(spark, adir).collect()
      .map(r => r.getLong(0) -> (Option(r.getTimestamp(3)),
        if (r.isNullAt(4)) None else Some(r.getDouble(4)))).toMap
    assert(got(1L) === ((Some(ts("2024-01-01 10:30:00")), Some(9.0))))
    assert(got(3L) === ((Some(ts("2024-01-01 11:00:00")), Some(5.0))))
    assert(got(5L) === ((None, None)))
  }

  test("rolling_median equals a naive per-row trailing-5 lower-middle") {
    val sf = "/root/testdata/sf0.001"
    val got = Events.rollingMedian(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val raw = Tables.events(spark, sf)
      .select($"event_id", $"user_id", $"ts", $"value").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2).getTime,
                 r.getDouble(3)))
    raw.groupBy(_._2).foreach { case (_, rows) =>
      val ordered = rows.sortBy(r => (r._3, r._1))
      ordered.indices.foreach { i =>
        val frame = ordered.slice(math.max(0, i - 4), i + 1).map(_._4)
          .sorted
        val want = frame((frame.length - 1) / 2)
        assert(got(ordered(i)._1) === want)
      }
    }
  }

  test("events_ewma equals a naive per-row trailing-50 left fold") {
    val sf = "/root/testdata/sf0.001"
    val got = Events.ewma(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val raw = Tables.events(spark, sf)
      .select($"event_id", $"user_id", $"ts", $"value").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2).getTime,
                 r.getDouble(3)))
    raw.groupBy(_._2).foreach { case (_, rows) =>
      val ordered = rows.sortBy(r => (r._3, r._1))
      ordered.indices.foreach { i =>
        val frame = ordered.slice(math.max(0, i - 49), i + 1).map(_._4)
        val want = frame.tail.foldLeft(frame.head)((acc, x) =>
          0.3 * x + 0.7 * acc)
        val rounded = BigDecimal(want + 1e-9)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
        assert(got(ordered(i)._1) === rounded,
          s"event ${ordered(i)._1}")
      }
    }
  }

  test("rolling_distinct equals a naive per-day trailing-7 set union") {
    val sf = "/root/testdata/sf0.001"
    // (user, day) incidence set straight off the fixture
    val ud = Tables.events(spark, sf)
      .selectExpr("user_id", "CAST(ts AS DATE) AS day").collect()
      .map(r => (r.getLong(0), r.getDate(1).toLocalDate)).toSet
    val want = ud.map(_._2).map { d =>
      val window = ud.filter { case (_, ed) =>
        !ed.isAfter(d) && !ed.isBefore(d.minusDays(6)) }
      d -> (ud.filter(_._2 == d).map(_._1).size.toLong,  // dau
            window.map(_._1).size.toLong)                // wau7
    }.toMap
    val got = Events.rollingDistinct(spark, sf).collect()
      .map(r => r.getDate(0).toLocalDate ->
        (r.getLong(1), r.getLong(2))).toMap
    assert(got === want)
  }

  test("asof_tolerance: within-bound matches equal asof_join's; stale " +
       "matches null out and are flagged") {
    val sf = "/root/testdata/sf0.001"
    val plain = Events.asofJoin(spark, sf).collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) None else Some(r.getTimestamp(3)))).toMap
    val tol = Events.asofTolerance(spark, sf).collect()
    assert(tol.length === plain.size)
    var stale, fresh = 0
    tol.foreach { r =>
      val id = r.getLong(0)
      val click = r.getTimestamp(2)
      val m = if (r.isNullAt(3)) None else Some(r.getTimestamp(3))
      val isStale = r.getBoolean(5)
      if (isStale) {
        stale += 1
        assert(m.isEmpty, s"$id stale but kept a match")
        // asof_join DID have a (too-old) match
        val pm = plain(id).get
        assert(click.getTime - pm.getTime > 3600L * 1000, s"$id not old")
      } else {
        m.foreach { mt =>
          fresh += 1
          assert(plain(id).contains(mt), s"$id match differs from asof_join")
          assert(click.getTime - mt.getTime <= 3600L * 1000, s"$id too old")
        }
      }
    }
    assert(stale > 0 && fresh > 0, s"fixture exercises both arms " +
      s"(stale=$stale fresh=$fresh)")
  }

  test("trend_fit matches a naive double-precision least squares; r2 " +
       "bounded") {
    val sf = "/root/testdata/sf0.001"
    val pts = Tables.events(spark, sf)
      .selectExpr("event_type", "CAST(ts AS DATE) AS d").collect()
      .map(r => (r.getString(0), r.getDate(1).toLocalDate))
    val d0 = pts.map(_._2).min
    val daily = pts.groupBy(identity).map { case ((t, d), v) =>
      (t, java.time.temporal.ChronoUnit.DAYS.between(d0, d).toDouble,
       v.size.toDouble) }.toSeq.groupBy(_._1)
    val got = Events.trendFit(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(got.keySet === daily.keySet)
    daily.foreach { case (t, xs) =>
      val n = xs.size.toDouble
      val (sx, sy) = (xs.map(_._2).sum, xs.map(_._3).sum)
      val sxx = xs.map(p => p._2 * p._2).sum
      val sxy = xs.map(p => p._2 * p._3).sum
      val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
      val icept = (sy - slope * sx) / n
      val (gn, gs, gi, gr2) = got(t)
      assert(gn === xs.size.toLong)
      assert(math.abs(gs - slope) < 1e-4, s"$t slope")
      assert(math.abs(gi - icept) < 1e-4, s"$t intercept")
      assert(gr2 >= -1e-9 && gr2 <= 1.0 + 1e-6, s"$t r2 $gr2")
    }
  }

  test("journey_paths equals a naive per-(user, day) trigram recompute") {
    val sf = "/root/testdata/sf0.001"
    val evs = Tables.events(spark, sf)
      .selectExpr("user_id", "CAST(ts AS DATE) AS day", "ts", "event_id",
                  "event_type").collect()
      .map(r => (r.getLong(0), r.getDate(1).toLocalDate,
                 r.getTimestamp(2).getTime, r.getLong(3), r.getString(4)))
    val naive = evs.groupBy(e => (e._1, e._2)).values.toSeq
      .flatMap { g =>
        val ordered = g.sortBy(e => (e._3, e._4)).map(_._5)
        ordered.sliding(3).filter(_.length == 3)
          .map(t => (t(0), t(1), t(2))).toSeq
      }
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val wantTop = naive.toSeq
      .sortBy { case ((a, b, c), n) => (-n, a, b, c) }.take(25)
    val got = Events.journeyPaths(spark, sf).collect()
      .map(r => ((r.getString(0), r.getString(1), r.getString(2)),
                 r.getLong(3))).toSeq
    assert(got === wantTop)
  }

  test("cumulative_users: final cumulative equals total distinct users, " +
       "cum is monotone, active >= new") {
    val sf = "/root/testdata/sf0.001"
    val rows = Events.cumulativeUsers(spark, sf).collect()
    val distinctUsers = Tables.events(spark, sf)
      .select($"user_id").distinct().count()
    assert(rows.last.getLong(3) === distinctUsers)
    val cums = rows.map(_.getLong(3)).toSeq
    assert(cums === cums.sorted)
    rows.foreach(r => assert(r.getLong(1) >= r.getLong(2)))
  }

  test("event_transitions: probabilities row-normalize to 1, pair total " +
       "= events - users") {
    val sf = "/root/testdata/sf0.001"
    val rows = Events.eventTransitions(spark, sf).collect()
    rows.groupBy(_.getString(0)).foreach { case (_, g) =>
      assert(math.abs(g.map(_.getDouble(3)).sum - 1.0) < 1e-4)
    }
    val nEvents = Tables.events(spark, sf).count()
    val nUsers = Tables.events(spark, sf)
      .select($"user_id").distinct().count()
    // each user stream of k events yields k-1 adjacent pairs
    assert(rows.map(_.getLong(2)).sum === nEvents - nUsers)
  }

  test("asof_native (custom plan) == a driver-side per-click recompute " +
       "on the real fixture") {
    val sf = "/root/testdata/sf0.001"
    val ev = Tables.events(spark, sf)
      .select($"event_id", $"user_id", $"ts", $"event_type", $"value")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2),
                 r.getString(3), r.getDouble(4)))
    // sort on MICROseconds (getTime floors to ms and would mis-order
    // same-millisecond purchases against the operator's µs semantics)
    def micros(t: java.sql.Timestamp): Long =
      t.getTime / 1000 * 1000000L + t.getNanos / 1000
    val purchases = ev.filter(_._4 == "purchase").toSeq
      .groupBy(_._2)
      .map { case (k, v) => k -> v.sortBy(p => (micros(p._3), p._1)) }
    val want = ev.filter(_._4 == "click").map { c =>
      val best = purchases.getOrElse(c._2, Seq.empty)
        .filter(p => !p._3.after(c._3))          // p.ts <= click.ts
        .lastOption                               // max (ts, event_id)
      c._1 -> best.map(p => (p._3, p._5))
    }.toMap
    val got = Events.asofNative(spark, sf).collect().map { r =>
      r.getLong(0) -> (if (r.isNullAt(3)) None
                       else Some((r.getTimestamp(3), r.getDouble(4))))
    }.toMap
    assert(got === want)
  }

  test("asof_native tie semantics: a purchase at the click's exact " +
       "instant matches regardless of event_id order") {
    val d = TestFixtures.writeDir(Map(
      "events" -> Seq(
        (2L, ts("2024-01-01 10:00:00"), 1L, "click", 0.0, "{}"),
        (5L, ts("2024-01-01 10:00:00"), 1L, "purchase", 9.0, "{}"),
        (7L, ts("2024-01-02 08:00:00"), 2L, "click", 0.0, "{}"))
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")))
    val r = Events.asofNative(spark, d).collect()
      .map(x => x.getLong(0) ->
        (if (x.isNullAt(4)) None else Some(x.getDouble(4)))).toMap
    assert(r(2L) === Some(9.0),
      "same-instant purchase must match in pure-time as-of")
    assert(r(7L) === None, "a user with no purchases joins NULL")
  }

  test("events_seasonal: hand-computed means, offsets and ANOVA strength " +
       "on a two-weekday fixture") {
    // Mon (2024-01-01): 1, 3 → mean 2; Tue: 5, 7 → mean 6; overall 4.
    // total_ss = 84 − 64 = 20, resid = 2 + 2 = 4 → strength = 16/20.
    val d = TestFixtures.writeDir(Map("events" -> Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "a", 1.0, "{}"),
      (2L, ts("2024-01-01 11:00:00"), 1L, "a", 3.0, "{}"),
      (3L, ts("2024-01-02 10:00:00"), 2L, "a", 5.0, "{}"),
      (4L, ts("2024-01-02 11:00:00"), 2L, "a", 7.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")))
    val r = Events.seasonalDow(spark, d).collect()
    assert(r.length === 2)
    val mon = r.find(_.getLong(1) == 1L).get
    val tue = r.find(_.getLong(1) == 2L).get
    assert(mon.getLong(2) === 2L && tue.getLong(2) === 2L)
    assert(mon.getDouble(3) === 2.0 && tue.getDouble(3) === 6.0)
    assert(mon.getDouble(4) === -2.0 && tue.getDouble(4) === 2.0)
    assert(mon.getDouble(5) === 0.8 && tue.getDouble(5) === 0.8)
  }

  test("events_forecast: naive Holt recurrence replay matches level/" +
       "trend and the h-step projections on the real fixture") {
    val real = "/root/testdata/sf0.001"
    val daily = graft.Tables.events(spark, real)
      .groupBy(org.apache.spark.sql.functions.col("event_type"),
        org.apache.spark.sql.functions.to_date(
          org.apache.spark.sql.functions.col("ts")).as("day"))
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n"))
      .collect()
      .map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2)))
      .groupBy(_._1)
      .map { case (t, rs) =>
        t -> rs.sortBy(_._2).map(_._3.toDouble).toList }
    def q4(x: Double) =
      BigDecimal(x + 1e-9).setScale(4, BigDecimal.RoundingMode.HALF_UP)
        .toDouble
    val rows = graft.ops.Events.forecastHolt(spark, real).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val ys = daily(r.getString(0))
      assert(r.getLong(1) === ys.length.toLong, "n_days")
      var l = ys.head
      var b = ys(1) - ys.head
      ys.drop(2).foreach { y =>
        val lNew = 0.3 * y + 0.7 * (l + b)
        val bNew = 0.1 * ((0.3 * y + 0.7 * (l + b)) - l) + 0.9 * b
        l = lNew; b = bNew
      }
      assert(r.getDouble(2) === q4(l), s"level ${r.getString(0)}")
      assert(r.getDouble(3) === q4(b), s"trend ${r.getString(0)}")
      assert(r.getDouble(4) === q4(l + 1 * b))
      assert(r.getDouble(5) === q4(l + 3 * b))
      assert(r.getDouble(6) === q4(l + 7 * b))
    }
  }
}
