package graft

import graft.operators.Analytics
import org.apache.spark.sql.functions._

class AnalyticsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("funnel: order is strict — same-user events must be strictly later") {
    val events = Seq(
      // user 1 completes in order
      (1L, 1L, ts("2024-01-01 10:00:00"), "signup"),
      (2L, 1L, ts("2024-01-01 11:00:00"), "click"),
      (3L, 1L, ts("2024-01-01 12:00:00"), "purchase"),
      // user 2: purchase BEFORE click -> stops at click
      (4L, 2L, ts("2024-01-01 10:00:00"), "signup"),
      (5L, 2L, ts("2024-01-01 10:30:00"), "purchase"),
      (6L, 2L, ts("2024-01-01 11:00:00"), "click"),
      // user 3: never signs up -> counts nowhere
      (7L, 3L, ts("2024-01-01 09:00:00"), "click"),
      (8L, 3L, ts("2024-01-01 09:30:00"), "purchase")
    ).toDF("event_id", "user_id", "ts", "event_type")
    val out = Analytics.funnel(events, "user_id", "ts", "event_type", "event_id",
        Seq("signup", "click", "purchase"))
      .select("step", "n_users").as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 2L, 2L -> 2L, 3L -> 1L))
  }

  test("funnel: same-timestamp tie breaks by event id (strict struct order)") {
    val t0 = ts("2024-01-01 10:00:00")
    val events = Seq(
      (1L, 1L, t0, "signup"), (2L, 1L, t0, "click"), // same ts, id 2 > 1: counts
      (20L, 2L, t0, "click"), (21L, 2L, t0, "signup") // click id < signup id: not after
    ).toDF("event_id", "user_id", "ts", "event_type")
    val out = Analytics.funnel(events, "user_id", "ts", "event_type", "event_id",
        Seq("signup", "click"))
      .select("step", "n_users").as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 2L, 2L -> 1L))
  }

  test("profile: null and distinct accounting") {
    val df = Seq[(java.lang.Long, String)]((1L, "a"), (2L, null), (2L, "b"), (null, "b"))
      .toDF("x", "s")
    val p = Analytics.profile(df, Seq("x", "s")).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getString(5))).toMap
    assert(p("x") == ((4L, 1L, 2L, "1", "2")))
    assert(p("s") == ((4L, 1L, 2L, "a", "b")))
  }

  test("profileSketch: same shape as profile, exact stats, bounded-error distinct") {
    val orders = sf("orders")
    val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus")
    val exact = Analytics.profile(orders, cols).orderBy(col("column"))
    val sk = Analytics.profileSketch(orders, cols, p = 12).orderBy(col("column"))
    // drop-in swap: identical schema (names, types, order)
    assert(sk.schema == exact.schema)
    val e = exact.collect().map(r => r.getString(0) -> r).toMap
    val s = sk.collect().map(r => r.getString(0) -> r).toMap
    cols.foreach { c =>
      // n, n_null, min_s, max_s stay exact
      assert(s(c).getLong(1) == e(c).getLong(1))
      assert(s(c).getLong(2) == e(c).getLong(2))
      assert(s(c).getString(4) == e(c).getString(4))
      assert(s(c).getString(5) == e(c).getString(5))
      // n_distinct within HLL error (p=12 → ~1.6% RSE; allow 5 sigma + slack)
      val (est, tru) = (s(c).getLong(3).toDouble, e(c).getLong(3).toDouble)
      assert(math.abs(est - tru) <= math.max(2.0, 0.10 * tru),
        s"$c: est=$est true=$tru")
    }
  }

  test("profileSketch: partition-count invariant (registers are maxima)") {
    val orders = sf("orders")
    val cols = Seq("o_orderkey", "o_orderstatus")
    val a = Analytics.profileSketch(orders.repartition(7), cols, p = 8)
      .orderBy(col("column")).collect().toSeq
    val b = Analytics.profileSketch(orders.repartition(2), cols, p = 8)
      .orderBy(col("column")).collect().toSeq
    assert(a == b)
  }

  test("retention: cohort offsets count returning users only") {
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00")), (1L, ts("2024-01-08 10:00:00")), // w0 + w1
      (2L, ts("2024-01-01 11:00:00")),                                  // w0 only
      (3L, ts("2024-01-08 12:00:00")), (3L, ts("2024-01-22 12:00:00"))  // w1 + w3
    ).toDF("user_id", "ts")
    val base = ts("2024-01-01 00:00:00").getTime / 1000
    val out = Analytics.retentionCohorts(events, "user_id", "ts",
        periodSeconds = 7L * 86400, epochStartSeconds = base)
      .select("cohort", "period_offset", "n_users")
      .as[(Long, Long, Long)].collect().toSet
    assert(out == Set((0L, 0L, 2L), (0L, 1L, 1L), (1L, 0L, 1L), (1L, 2L, 1L)))
  }

  test("scd2: consecutive duplicates collapse; intervals chain; last open") {
    val feed = Seq(
      (1L, 1L, ts("2024-01-01 10:00:00"), "A"),
      (2L, 1L, ts("2024-01-02 10:00:00"), "A"), // no-change row: collapsed
      (3L, 1L, ts("2024-01-03 10:00:00"), "B"),
      (4L, 1L, ts("2024-01-04 10:00:00"), "A") // back to A: NEW version
    ).toDF("event_id", "user_id", "ts", "status")
    val out = graft.operators.SnapshotDiff.scd2(feed, "user_id", "ts", "status", "event_id")
      .orderBy("valid_from").collect()
    assert(out.length == 3)
    assert(out.map(_.getString(1)).toSeq == Seq("A", "B", "A"))
    assert(out(0).getTimestamp(3) == ts("2024-01-03 10:00:00")) // A closes at B
    assert(out(2).isNullAt(3) && out(2).getBoolean(4))          // last open, current
    assert(!out(0).getBoolean(4) && !out(1).getBoolean(4))
  }
}
