package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Events

/** Gap sessionization and conversion funnels, pinned against hand
  * examples and driver-side re-derivations over seeded random feeds. */
class EventsOpsSpec extends AnyFunSuite {

  import TestKit._
  import spark.implicits._

  private def ev(rows: (Long, String, Long)*) = // (id, user, tsUs)
    rows.toSeq.toDF("event_id", "user_id", "ts_us")

  test("sessionize: gaps split sessions, positions restart, ties break on event_id") {
    val df = ev(
      (1L, "u1", 100L), (2L, "u1", 150L), // session 1 (gap 50 <= 100)
      (3L, "u1", 300L), // gap 150 > 100 → session 2
      (4L, "u1", 300L), // tie ts with id 3 ordered after: gap 0 → session 2
      (10L, "u2", 5L)) // other user: own session 1
    val got = Events.sessionize(df, "user_id", "ts_us", "event_id", gapUs = 100L)
      .select("event_id", "session_id", "session_event")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == Map(
      1L -> (1L, 1L), 2L -> (1L, 2L),
      3L -> (2L, 1L), 4L -> (2L, 2L),
      10L -> (1L, 1L)))
  }

  test("property: sessionize == driver-side linear scan (4 seeds)") {
    for (seed <- 21 to 24) {
      val rnd = new scala.util.Random(seed)
      val rows = (1L to 200L).map { id =>
        (id, "u" + rnd.nextInt(5), rnd.nextInt(1000).toLong)
      }
      val gap = 40L
      val got = Events.sessionize(ev(rows: _*), "user_id", "ts_us",
        "event_id", gap)
        .select("event_id", "session_id", "session_event")
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      val want = rows.groupBy(_._2).flatMap { case (_, es) =>
        val ordered = es.sortBy(e => (e._3, e._1))
        var sess = 0L; var pos = 0L; var prev = Option.empty[Long]
        ordered.map { case (id, _, ts) =>
          if (prev.forall(p => ts - p > gap)) { sess += 1; pos = 1 }
          else pos += 1
          prev = Some(ts)
          id -> (sess, pos)
        }
      }
      assert(got == want, s"seed=$seed")
    }
  }

  test("trailingWindow: closed interval, per-user isolation, same-ts peers mutual") {
    val df = Seq(
      ("u1", 0L, 1L), ("u1", 50L, 2L), ("u1", 100L, 4L), // 100-50=50<=100 all in
      ("u1", 300L, 8L), // window [200,300]: alone
      ("u1", 300L, 16L), // RANGE peer of the above: both see both
      ("u2", 60L, 32L)).toDF("user_id", "ts_us", "v")
    val got = Events.trailingWindow(df, "user_id", "ts_us", "v", windowUs = 100L)
      .select("user_id", "ts_us", "v", "w_count", "w_sum")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)) ->
        (r.getLong(3), r.getLong(4))).toMap
    assert(got(("u1", 0L, 1L)) == (1L, 1L))
    assert(got(("u1", 50L, 2L)) == (2L, 3L))
    assert(got(("u1", 100L, 4L)) == (3L, 7L), "closed lower bound includes ts=0")
    assert(got(("u1", 300L, 8L)) == (2L, 24L), "RANGE peers are mutual members")
    assert(got(("u1", 300L, 16L)) == (2L, 24L))
    assert(got(("u2", 60L, 32L)) == (1L, 32L), "users are isolated")
  }

  test("retentionCohorts: triangle cells count distinct users per (cohort, offset)") {
    // bucket = 10: uA first in bucket 0 (active 0, 2), uB first in 0
    // (active 0), uC first in 2 (active 2, 3); duplicates within a
    // bucket collapse
    val df = Seq(
      ("uA", 1L), ("uA", 5L), ("uA", 25L),
      ("uB", 9L),
      ("uC", 20L), ("uC", 21L), ("uC", 35L)).toDF("user_id", "ts_us")
    val got = Events.retentionCohorts(df, "user_id", "ts_us", bucketUs = 10L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == Map(
      (0L, 0L) -> 2L, // uA, uB at their own first bucket
      (0L, 2L) -> 1L, // uA back two buckets later
      (2L, 0L) -> 1L, // uC
      (2L, 1L) -> 1L)) // uC next bucket
  }

  private def fev(rows: (String, String, Long)*) = // (user, type, tsUs)
    rows.toSeq.toDF("user_id", "event_type", "ts_us")

  test("funnel: full chain, greedy edge case, step-1-less users excluded") {
    val df = fev(
      // u1 completes all three
      ("u1", "view", 10L), ("u1", "click", 20L), ("u1", "purchase", 30L),
      // u2: the greedy edge case — view@10, click@5 (before view, unusable),
      // click@15, purchase@12 (before the matched click) → stops at 2
      ("u2", "view", 10L), ("u2", "click", 5L), ("u2", "click", 15L),
      ("u2", "purchase", 12L),
      // u3: view only
      ("u3", "view", 7L),
      // u4: no view at all → absent from the output
      ("u4", "click", 1L), ("u4", "purchase", 2L))
    val got = Events.funnel(df, "user_id", "event_type", "ts_us",
      Seq("view", "click", "purchase"))
      .collect().map(r => r.getString(0) ->
        (Option(r.get(1)), Option(r.get(2)), Option(r.get(3)), r.getLong(4))).toMap
    assert(got == Map(
      "u1" -> (Some(10L), Some(20L), Some(30L), 3L),
      "u2" -> (Some(10L), Some(15L), None, 2L),
      "u3" -> (Some(7L), None, None, 1L)))
  }

  test("funnel: 4-step arity — chain columns and completion count generalize") {
    val df = fev(
      ("u1", "a", 1L), ("u1", "b", 2L), ("u1", "c", 3L), ("u1", "d", 4L),
      ("u2", "a", 1L), ("u2", "b", 2L), ("u2", "d", 3L)) // skips c
    val got = Events.funnel(df, "user_id", "event_type", "ts_us",
      Seq("a", "b", "c", "d"))
      .collect().map(r => r.getString(0) ->
        (Option(r.get(1)), Option(r.get(2)), Option(r.get(3)),
          Option(r.get(4)), r.getLong(5))).toMap
    assert(got == Map(
      "u1" -> (Some(1L), Some(2L), Some(3L), Some(4L), 4L),
      "u2" -> (Some(1L), Some(2L), None, None, 2L)))
  }

  test("funnelState: LIVE per-user chain == batch funnel on in-order feeds; state resumes across batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.stream.{Rec, Streamed}
    implicit val sql = spark.sqlContext
    val steps = Seq("view", "click", "purchase")
    val rnd = new scala.util.Random(77)
    val feed = (1L to 120L).map { i => // ts-ordered feed, 6 users
      Rec("u" + rnd.nextInt(6), steps(rnd.nextInt(3)), i * 10L)
    }
    val ms = MemoryStream[Rec[String, String]]
    val q = Streamed.funnelState(ms.toDS(), steps)
      .writeStream.format("memory").queryName("livefunnel")
      .outputMode("update").start()
    try { // split mid-chain: advances must resume from state, not restart
      ms.addData(feed.take(50): _*); q.processAllAvailable()
      ms.addData(feed.drop(50): _*); q.processAllAvailable()
    } finally q.stop()
    val live = spark.table("livefunnel")
      .collect().map(r => (r.getString(0),
        r.getStruct(1).getInt(0), r.getStruct(1).getLong(1)))
    // each user's advances are 1,2,3… exactly once each
    live.groupBy(_._1).foreach { case (u, adv) =>
      assert(adv.map(_._2).sorted.toSeq == (1 to adv.size).toSeq, s"user $u")
    }
    // final chains == the batch funnel on the same rows
    val batch = Events.funnel(
      feed.map(r => (r.key, r.value, r.tsMs)).toDF("user_id", "event_type", "ts_us"),
      "user_id", "event_type", "ts_us", steps)
      .collect().map(r => r.getString(0) ->
        (Option(r.get(1)), Option(r.get(2)), Option(r.get(3)), r.getLong(4))).toMap
    val liveChains = live.groupBy(_._1).map { case (u, adv) =>
      val byStep = adv.map(a => a._2 -> a._3).toMap
      u -> (byStep.get(1), byStep.get(2), byStep.get(3), byStep.keys.max.toLong)
    }
    assert(liveChains.keySet == batch.keySet)
    liveChains.foreach { case (u, c) => assert(c == batch(u), s"user $u") }
  }

  test("sessionizeState: LIVE assignment == batch sessionize on in-order feeds; boundaries survive a batch split") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.stream.{Rec, Streamed}
    implicit val sql = spark.sqlContext
    val rnd = new scala.util.Random(123)
    // globally increasing ts (distinct per user by construction); jumps
    // larger than the 100ms gap open new sessions mid-feed
    var t = 0L
    val feed = (1L to 150L).map { i =>
      t += (if (rnd.nextInt(4) == 0) 150L else 1L + rnd.nextInt(40))
      Rec("u" + rnd.nextInt(5), i, t)
    }
    val ms = MemoryStream[Rec[String, Long]]
    val q = Streamed.sessionizeState(ms.toDS(), gapMs = 100L)
      .writeStream.format("memory").queryName("livesess")
      .outputMode("update").start()
    try { // split mid-feed: session continuity must come from state
      ms.addData(feed.take(70): _*); q.processAllAvailable()
      ms.addData(feed.drop(70): _*); q.processAllAvailable()
    } finally q.stop()
    val live = spark.table("livesess")
      .collect().map(r => (r.getString(0), r.getLong(2)) ->
        (r.getStruct(1).getLong(0), r.getStruct(1).getLong(1))).toMap
    val batch = Events.sessionize(
      feed.map(r => (r.key, r.value, r.tsMs)).toDF("user_id", "event_id", "ts_us"),
      "user_id", "ts_us", "event_id", gapUs = 100L)
      .collect().map(r => (r.getString(0), r.getLong(2)) ->
        (r.getLong(3), r.getLong(4))).toMap
    assert(live.size == feed.size && live == batch)
  }

  test("attribution: first/last by (ts, event_id), cross-tab counts") {
    // u1: view..purchase; u2: ts tie on 5 broken by event_id (2 < 3 ->
    // first is click); u3: single event is both endpoints
    val df = Seq(
      (1L, 10L, "view", 100L), (2L, 10L, "click", 200L), (3L, 10L, "purchase", 300L),
      (2L, 20L, "click", 5L), (3L, 20L, "view", 5L), (4L, 20L, "error", 9L),
      (9L, 30L, "signup", 7L)
    ).toDF("event_id", "user_id", "event_type", "ts_us")
    val got = Events.attribution(df, "user_id", "event_type", "ts_us", "event_id")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    assert(got == Map(
      ("view", "purchase") -> ((1L, 3L)),
      ("click", "error") -> ((1L, 3L)),
      ("signup", "signup") -> ((1L, 1L))))
  }

  test("trailingWindowState: LIVE rolling (count, sum) == batch RANGE frame on in-order feeds; buffer prunes to the horizon") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.stream.{Rec, Streamed}
    implicit val sql = spark.sqlContext
    val rnd = new scala.util.Random(99)
    var t = 0L
    val feed = (1L to 120L).flatMap { i =>
      t += 1L + rnd.nextInt(60)
      // every 10th tick lands a same-ts pair (in one batch) — the RANGE
      // frame makes the peers mutual and so must the live op
      if (i % 10 == 0) Seq(Rec("u" + rnd.nextInt(4), i, t),
        Rec("u" + rnd.nextInt(4), 1000 + i, t))
      else Seq(Rec("u" + rnd.nextInt(4), i, t))
    }
    val ms = MemoryStream[Rec[String, Long]]
    val q = Streamed.trailingWindowState(ms.toDS(), windowMs = 100L)
      .writeStream.format("memory").queryName("livetrail")
      .outputMode("update").start()
    // split at a ts boundary so no same-ts run straddles the batches
    val cut = (60 until feed.size).find(i => feed(i - 1).tsMs != feed(i).tsMs).get
    try {
      ms.addData(feed.take(cut): _*); q.processAllAvailable()
      ms.addData(feed.drop(cut): _*); q.processAllAvailable()
    } finally q.stop()
    val live = spark.table("livetrail").collect()
      .map(r => (r.getString(0), r.getLong(2)) ->
        (r.getStruct(1).getLong(0), r.getStruct(1).getLong(1))).toMap
    val batch = Events.trailingWindow(
      feed.map(r => (r.key, r.value, r.tsMs)).toDF("user_id", "v", "ts_us"),
      "user_id", "ts_us", "v", windowUs = 100L)
      .collect().map(r => (r.getString(0), r.getLong(2)) ->
        (r.getLong(3), r.getLong(4))).toMap
    // keyed by (user, ts): same-user ties collapse to one entry with the
    // identical mutual (count, sum) on both sides
    val distinctKeys = feed.map(r => (r.key, r.tsMs)).distinct.size
    assert(live.size == distinctKeys)
    assert(live == batch)
  }

  test("concurrency: hand-built peaks; bucketed carry == driver-side GLOBAL sweep (3 seeds)") {
    // two overlapping + one disjoint: peak 2 in bucket 0, carry keeps
    // the long interval alive into bucket 1 (endpoint there -> row)
    val iv = Seq((0L, 150L), (50L, 80L), (300L, 310L))
      .toDF("s_us", "e_us")
    val got = Events.concurrency(iv, "s_us", "e_us", bucketUs = 100L)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got(0L) == ((2L, 2L, 1L))) // both start here, one ends (80+1)
    assert(got(1L) == ((1L, 0L, 1L))) // the long one, carried, ends at 151
    assert(got(3L) == ((1L, 1L, 1L)))
    assert(got.size == 3) // bucket 2 has no endpoint -> no row
    for (seed <- 81 to 83) {
      val rnd = new scala.util.Random(seed)
      val ivs = (1 to 200).map { _ =>
        val s = rnd.nextInt(5000).toLong; (s, s + rnd.nextInt(800).toLong)
      }
      val bucketed = Events.concurrency(ivs.toDF("s_us", "e_us"), "s_us", "e_us", 250L)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // driver-side GLOBAL sweep, peaks grouped by bucket
      val deltas = (ivs.map(i => (i._1, 1L)) ++ ivs.map(i => (i._2 + 1, -1L)))
        .sortBy(d => (d._1, d._2))
      var run = 0L
      val peaks = scala.collection.mutable.Map.empty[Long, Long]
      deltas.foreach { case (ts, d) =>
        val pre = run
        run += d
        val b = ts / 250L
        // the gauge peak sees both the carried-in level (pre) and the
        // post-delta level
        peaks(b) = math.max(peaks.getOrElse(b, Long.MinValue), math.max(pre, run))
      }
      assert(bucketed == peaks.toMap, s"seed $seed")
    }
  }

  test("property: funnel == driver-side greedy chain (4 seeds)") {
    val steps = Seq("a", "b", "c")
    for (seed <- 31 to 34) {
      val rnd = new scala.util.Random(seed)
      val rows = (1 to 300).map { _ =>
        ("u" + rnd.nextInt(8), steps(rnd.nextInt(3)), rnd.nextInt(100).toLong)
      }
      val got = Events.funnel(fev(rows: _*), "user_id", "event_type",
        "ts_us", steps)
        .collect().map(r => r.getString(0) ->
          (Option(r.get(1)), Option(r.get(2)), Option(r.get(3)), r.getLong(4))).toMap
      val want = rows.groupBy(_._1).flatMap { case (u, es) =>
        def nextMin(step: String, after: Option[Long]): Option[Long] = {
          val c = es.filter(e => e._2 == step &&
            after.forall(a => e._3 > a)).map(_._3)
          if (c.isEmpty) None else Some(c.min)
        }
        val t1 = es.filter(_._2 == "a").map(_._3).minOption
        t1.map { t1v =>
          val t2 = nextMin("b", Some(t1v))
          val t3 = t2.flatMap(t2v => nextMin("c", Some(t2v)))
          val n = if (t3.isDefined) 3L else if (t2.isDefined) 2L else 1L
          u -> (Some(t1v), t2, t3, n)
        }
      }
      assert(got == want, s"seed=$seed")
    }
  }

  test("transitionCounts: per-user consecutive pairs, ties on order col, out-degree shares") {
    // u1: a@1 → b@2 → a@3 → c@3(id5 after id4 at same ts) ⇒ a→b, b→a, a→c
    // u2: a@1 → b@2 ⇒ a→b. Last event of each user emits nothing.
    val df = Seq(
      (1L, "u1", "a", 1L), (2L, "u1", "b", 2L), (4L, "u1", "a", 3L),
      (5L, "u1", "c", 3L), (6L, "u2", "a", 1L), (7L, "u2", "b", 2L))
      .toDF("event_id", "user_id", "event_type", "ts_us")
    val got = Events.transitionCounts(df, "user_id", "event_type",
      "ts_us", "event_id")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    assert(got == Map(
      ("a", "b") -> ((2L, 0.666667)), // of a's 3 outgoing edges
      ("a", "c") -> ((1L, 0.333333)),
      ("b", "a") -> ((1L, 1.0))))
  }

  test("decayedScore: exact halving per bucket, horizon cut, data-max anchor, fixed anchor") {
    val us = 86400000000L // 1-day buckets
    val df = Seq(
      ("u1", 100L * us, 8.0),  // the max ts -> age 0, weight 1
      ("u1", 99L * us, 4.0),   // age 1 -> x0.5
      ("u1", 98L * us, 4.0),   // age 2 -> x0.25
      ("u1", 30L * us, 1000.0), // age 70 > horizon 60: dropped
      ("u2", 100L * us, 2.49), // units = round(2.49) = 2
      ("u2", 50L * us, 0.6))   // age 50 -> 1 * 2^-50 (tiny but in-horizon)
      .toDF("user_id", "ts_us", "value")
    val got = graft.ops.Events.decayedScore(df, "user_id", "ts_us",
      "value", bucketUs = us)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got("u1") == ((3L, 8.0 + 2.0 + 1.0)))
    val u2 = 2.0 + math.pow(2.0, -50)
    assert(got("u2") == ((2L,
      BigDecimal(u2).setScale(6, scala.math.BigDecimal.RoundingMode.HALF_UP).toDouble)))
    // explicit anchor: shift asOf one bucket later, everything halves
    val shifted = graft.ops.Events.decayedScore(df, "user_id", "ts_us",
      "value", bucketUs = us, asOfUs = Some(101L * us))
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(shifted("u1") == (8.0 + 2.0 + 1.0) / 2)
  }

  test("scd2History: no-change compaction, null-safe compare, interval close, version numbering") {
    val df = Seq(
      ("u", 100L, "a", 1L), ("u", 200L, "a", 2L), // same value: compacts
      ("u", 300L, "b", 3L),
      ("u", 400L, null.asInstanceOf[String], 4L), // null is a version
      ("u", 500L, null.asInstanceOf[String], 5L), // null == null: compacts
      ("u", 600L, "a", 6L), // back to a: a NEW version (not merged)
      ("v", 100L, "x", 7L))
      .toDF("user_id", "ts_us", "attr", "event_id")
    val got = graft.ops.Keyed.scd2History(df, Seq("user_id"), "ts_us",
      Seq("attr"), "event_id")
      .collect().map(r => (r.getString(0), r.getLong(4)) ->
        ((Option(r.get(1)).map(_.toString).getOrElse("-"), r.getLong(2),
          if (r.isNullAt(3)) -1L else r.getLong(3), r.getBoolean(5)))).toMap
    assert(got == Map(
      ("u", 1L) -> (("a", 100L, 300L, false)),
      ("u", 2L) -> (("b", 300L, 400L, false)),
      ("u", 3L) -> (("-", 400L, 600L, false)),
      ("u", 4L) -> (("a", 600L, -1L, true)),
      ("v", 1L) -> (("x", 100L, -1L, true))))
  }

  test("topJourneys: path assembly order, maxSteps cut, count ties by path string") {
    val df = Seq(
      // session A (u1,1): view > click > buy; B (u1,2): view > click > buy
      ("u1", 1L, "view", 10L, 1L), ("u1", 1L, "click", 20L, 2L),
      ("u1", 1L, "buy", 30L, 3L),
      ("u1", 2L, "view", 110L, 4L), ("u1", 2L, "click", 120L, 5L),
      ("u1", 2L, "buy", 130L, 6L),
      // session C (u2,1): aaa alone; D (u2,2): zzz alone — 1 each, tie
      ("u2", 1L, "aaa", 10L, 7L), ("u2", 2L, "zzz", 200L, 8L),
      // session E (u3,1): six steps — the 6th must be cut at maxSteps=5
      ("u3", 1L, "s1", 1L, 9L), ("u3", 1L, "s2", 2L, 10L),
      ("u3", 1L, "s3", 3L, 11L), ("u3", 1L, "s4", 4L, 12L),
      ("u3", 1L, "s5", 5L, 13L), ("u3", 1L, "s6", 6L, 14L))
      .toDF("user_id", "session_id", "event_type", "ts_us", "event_id")
    val got = graft.ops.Events.topJourneys(df, Seq("user_id", "session_id"),
      "event_type", "ts_us", "event_id", maxSteps = 5, k = 10)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got("view > click > buy") == ((2L, 1L)))
    assert(got("aaa")._1 == 1L && got("zzz")._1 == 1L)
    assert(got("aaa")._2 < got("zzz")._2, "equal counts tie by path string")
    assert(got.contains("s1 > s2 > s3 > s4 > s5") && !got.keys.exists(_.contains("s6")))
  }

  test("decayedState: LIVE final score == batch decayedScore on bucket-aligned feeds, across a restart") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.stream.{Rec, Streamed}
    implicit val sql = spark.sqlContext
    val us = 86400000000L
    val rnd = new scala.util.Random(61)
    // bucket-aligned feed: 4 users, increasing buckets, random values;
    // one ancient event per user (age > horizon + unit bits: vanishes
    // in both forms)
    val feed = (0 until 4).flatMap { u =>
      // in-horizon spread <= 57 buckets (< 60), so live truncation and
      // the batch horizon agree exactly on every surviving term
      val buckets = (0L until 12L).map(i => 1000L + i * 5 + rnd.nextInt(3))
        .distinct.sorted
      Seq(Rec(s"u$u", (800L * us, 500.0), 800L * us)) ++
        buckets.map(b => Rec(s"u$u", (b * us, rnd.nextInt(100).toDouble), b * us))
    }.sortBy(_.tsMs)
    val ckpt = java.nio.file.Files.createTempDirectory("graft-decay-ckpt-")
    val ms = MemoryStream[Rec[String, (Long, Double)]]
    val lastScore = scala.collection.mutable.Map.empty[String, (Long, Double)]
    def start() = Streamed.decayedState(ms.toDS(), bucketUs = us)
      .writeStream.outputMode("update")
      .option("checkpointLocation", ckpt.toString)
      .foreachBatch { (b: org.apache.spark.sql.Dataset[Streamed.DecayOut[String]], _: Long) =>
        val rows = b.collect()
        lastScore.synchronized {
          rows.sortBy(r => (r.n_events)).foreach { r =>
            lastScore(r.key) = (r.n_events, r.score) }
        }
        ()
      }.start()
    val cut = feed.size / 2
    val q1 = start()
    try { ms.addData(feed.take(cut): _*); q1.processAllAvailable() }
    finally q1.stop() // decay state must survive, not reset
    val q2 = start()
    try { ms.addData(feed.drop(cut): _*); q2.processAllAvailable() }
    finally q2.stop()
    // batch twin anchored at each user's LAST bucket
    val batch = feed.groupBy(_.key).map { case (u, rs) =>
      val asOf = rs.map(r => r.value._1 / us).max * us
      u -> graft.ops.Events.decayedScore(
        rs.map(r => (u, r.value._1, r.value._2)).toDF("k", "ts_us", "v"),
        "k", "ts_us", "v", bucketUs = us, asOfUs = Some(asOf))
        .collect().map(r => (r.getLong(1), r.getDouble(2))).head
    }
    val live = lastScore.synchronized(lastScore.toMap)
    batch.foreach { case (u, (nB, scoreB)) =>
      val (nL, scoreL) = live(u)
      assert(scoreL == scoreB, s"$u: live $scoreL != batch $scoreB")
      assert(nL == nB + 1, // live counts the vanished ancient event too
        s"$u: live n $nL vs batch in-horizon n $nB")
    }
    org.apache.commons.io.FileUtils.deleteDirectory(ckpt.toFile)
  }

  test("heavyKeysState: Space-Saving guarantees per shard, exact at shards=1 with k >= distinct, counters survive restart") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.stream.{Rec, Streamed}
    implicit val sql = spark.sqlContext
    val rnd = new scala.util.Random(47)
    // Zipf-ish: key j with prob ~ 1/(j+1); 600 events over ~40 keys
    val feed = (1L to 600L).map { i =>
      val u = rnd.nextDouble()
      Rec("u" + math.min(39, (1.0 / u - 1).toInt), 1L, i * 10L)
    }
    val trueCounts = feed.groupBy(_.key).view.mapValues(_.size.toLong).toMap
    val shards = 4
    def shardOf(key: String) = math.floorMod(key.hashCode, shards)
    val nShard = feed.groupBy(r => shardOf(r.key)).view.mapValues(_.size.toLong).toMap

    val ckpt = java.nio.file.Files.createTempDirectory("graft-hk-ckpt-")
    val ms = MemoryStream[Rec[String, Long]]
    // summary = latest emission per shard, merged across batches
    val latest = scala.collection.mutable.Map.empty[Int, Seq[(String, Long, Long)]]
    def start() = Streamed.heavyKeysState(ms.toDS(), k = 8, shards = shards)
      .writeStream.outputMode("update")
      .option("checkpointLocation", ckpt.toString)
      .foreachBatch { (b: org.apache.spark.sql.Dataset[Streamed.HeavyKey], _: Long) =>
        val rows = b.collect()
        latest.synchronized {
          rows.groupBy(_.shard).foreach { case (s, rs) =>
            latest(s) = rs.map(r => (r.key, r.est, r.err)).toSeq }
        }
        ()
      }.start()
    val q1 = start()
    try { ms.addData(feed.take(300): _*); q1.processAllAvailable() }
    finally q1.stop() // kill mid-stream: counts must resume, not reset
    val q2 = start()
    try { ms.addData(feed.drop(300): _*); q2.processAllAvailable() }
    finally q2.stop()

    val summary = latest.synchronized(latest.toMap)
    summary.foreach { case (shard, entries) =>
      assert(entries.size <= 8, "bounded state")
      entries.foreach { case (key, est, err) =>
        val t = trueCounts(key)
        assert(est - err <= t && t <= est,
          s"shard $shard $key: est=$est err=$err true=$t (restart must not reset)")
      }
      // every key over the n/k bar for its shard is tracked
      trueCounts.filter { case (key, c) =>
        shardOf(key) == shard && c > nShard(shard) / 8.0 }.keys.foreach { key =>
        assert(entries.exists(_._1 == key), s"heavy key $key missing from shard $shard")
      }
    }
    // shards=1, k >= distinct keys: exact counts == the batch aggregate
    val ms2 = MemoryStream[Rec[String, Long]]
    val out2 = scala.collection.mutable.Map.empty[String, (Long, Long)]
    val q3 = Streamed.heavyKeysState(ms2.toDS(), k = 64, shards = 1)
      .writeStream.outputMode("update")
      .foreachBatch { (b: org.apache.spark.sql.Dataset[Streamed.HeavyKey], _: Long) =>
        val rows = b.collect()
        out2.synchronized { rows.foreach(r => out2(r.key) = (r.est, r.err)) }
        ()
      }.start()
    try { ms2.addData(feed: _*); q3.processAllAvailable() } finally q3.stop()
    assert(out2.synchronized(out2.toMap) ==
      trueCounts.view.mapValues(c => (c, 0L)).toMap)
    org.apache.commons.io.FileUtils.deleteDirectory(ckpt.toFile)
  }

  test("transitionsState: LIVE pair multiset == batch transitions on in-order feeds; state spans batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.stream.{Rec, Streamed}
    implicit val sql = spark.sqlContext
    val types = Seq("a", "b", "c")
    val rnd = new scala.util.Random(31)
    val feed = (1L to 100L).map { i => // distinct ts per arrival, 5 users
      Rec("u" + rnd.nextInt(5), types(rnd.nextInt(3)), i * 10L)
    }
    val ms = MemoryStream[Rec[String, String]]
    val q = Streamed.transitionsState(ms.toDS())
      .writeStream.format("memory").queryName("livetrans")
      .outputMode("update").start()
    try { // split mid-stream: the cross-batch pair needs the stored last event
      ms.addData(feed.take(40): _*); q.processAllAvailable()
      ms.addData(feed.drop(40): _*); q.processAllAvailable()
    } finally q.stop()
    val live = spark.table("livetrans").collect()
      .map(r => (r.getStruct(1).getString(0), r.getStruct(1).getString(1)))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val batch = Events.transitionCounts(
      feed.zipWithIndex.map { case (r, i) => (i.toLong, r.key, r.value, r.tsMs) }
        .toDF("event_id", "user_id", "event_type", "ts_us"),
      "user_id", "event_type", "ts_us", "event_id")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(live == batch)
  }

  test("covisitation: pair session counts, repeats collapse, lift against independence") {
    // sessions (user, sid): s1={A,B,A}, s2={A,B,C}, s3={B}, s4={C}
    // → S=4; n_A=2 n_B=3 n_C=2; AB in 2, AC in 1, BC in 1
    val df = Seq(
      ("u1", 1L, "A"), ("u1", 1L, "B"), ("u1", 1L, "A"),
      ("u1", 2L, "A"), ("u1", 2L, "B"), ("u1", 2L, "C"),
      ("u2", 1L, "B"), ("u3", 1L, "C"))
      .toDF("user_id", "session_id", "event_type")
    val got = Events.covisitation(df, Seq("user_id", "session_id"),
        "event_type")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getDouble(6)))).toMap
    assert(got.keySet == Set(("A", "B"), ("A", "C"), ("B", "C")))
    assert(got(("A", "B")) == ((2L, 3L, 2L, 4L, // 2·4/(2·3)
      math.rint(8.0 / 6.0 * 1e6) / 1e6)))
    assert(got(("A", "C")) == ((2L, 2L, 1L, 4L, 1.0)))
    assert(got(("B", "C")) == ((3L, 2L, 1L, 4L,
      math.rint(4.0 / 6.0 * 1e6) / 1e6)))
  }

  test("rollingActiveUsers: window membership exact, repeats count once, unobserved days absent") {
    val day = 86400000000L
    // u1 active days 0 and 2 (counts once on overlap days), u2 day 0,
    // u3 day 10 (isolated); observed days = {0, 2, 10}
    val df = Seq(("u1", 0L), ("u1", 2L * day), ("u1", 2L * day + 5L),
      ("u2", 1L), ("u3", 10L * day))
      .toDF("user_id", "ts_us")
    val got = Events.rollingActiveUsers(df, "user_id", "ts_us", windowDays = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // day 0: u1+u2; day 2: u1 (both presences support it — once) + u2
    // (day 0 within 3-day window); day 10: u3 only. Days 1,3,4,11,12
    // are unobserved → absent even though windows cover them.
    assert(got == Map(0L -> 2L, 2L -> 2L, 10L -> 1L))
  }

  test("sessionStatsDaily: bounce bp exact, dwell sums exact, mean in seconds") {
    val day = 86400000000L
    // u1 day 0: events at 0 and 100 (one session, dwell 100), then at
    // 5000 (gap 4900 > 1000 → bounce). u2 day 1: one event → bounce.
    val df = Seq((1L, "u1", 0L), (2L, "u1", 100L), (3L, "u1", 5000L),
      (4L, "u2", day))
      .toDF("event_id", "user_id", "ts_us")
    val sess = Events.sessionize(df, "user_id", "ts_us", "event_id",
      gapUs = 1000L)
    val got = Events.sessionStatsDaily(sess, "user_id", "ts_us")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getDouble(6)))).toMap
    assert(got(0L) == ((2L, 1L, 5000L, 3L, 100L, 5.0e-5)),
      "2 sessions, 1 bounce → 5000 bp; dwell 100 µs → mean 5e-5 s")
    assert(got(1L) == ((1L, 1L, 10000L, 1L, 0L, 0.0)))
  }

  test("rollingActiveState: LIVE per-day counts == batch rollingActiveUsers, across a restart") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.stream.{Rec, Streamed}
    implicit val sql = spark.sqlContext
    val rnd = new scala.util.Random(83)
    val dayMs = 86400000L
    // 12 users over ~20 days, multiple events per (user, day), gaps
    val feed = (1 to 260).map { i =>
      Rec("u" + rnd.nextInt(12), 0L,
        rnd.nextInt(20).toLong * dayMs + rnd.nextInt(86400000).toLong)
    }.sortBy(_.tsMs)
    val ckpt = java.nio.file.Files.createTempDirectory("graft-ra-ckpt-")
    val ms = MemoryStream[Rec[String, Long]]
    val latest = scala.collection.mutable.Map.empty[Long, Long]
    def start() = Streamed.rollingActiveState(ms.toDS(), windowDays = 7)
      .writeStream.outputMode("update")
      .option("checkpointLocation", ckpt.toString)
      .foreachBatch { (b: org.apache.spark.sql.Dataset[Rec[Long, Long]], _: Long) =>
        val rows = b.collect()
        latest.synchronized { rows.foreach(r => latest(r.key) = r.value) }
        ()
      }.start()
    val q1 = start()
    try { ms.addData(feed.take(130): _*); q1.processAllAvailable() }
    finally q1.stop() // presence sets must survive the restart, not reset
    val q2 = start()
    try { ms.addData(feed.drop(130): _*); q2.processAllAvailable() }
    finally q2.stop()
    val batch = graft.ops.Events.rollingActiveUsers(
        feed.map(r => (r.key, r.tsMs * 1000L)).toDF("u", "ts_us"),
        "u", "ts_us", windowDays = 7)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val live = latest.synchronized(latest.toMap)
    assert(live === batch,
      s"live days ${live.keySet.toSeq.sorted} vs batch ${batch.keySet.toSeq.sorted}")
    org.apache.commons.io.FileUtils.deleteDirectory(ckpt.toFile)
  }
}
