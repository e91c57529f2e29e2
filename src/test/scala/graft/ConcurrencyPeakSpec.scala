package graft

/** Sweep-line concurrency: overlap counting and the inclusive-interval
  * boundary rule (a session ending at instant t still counts at t).
  */
class ConcurrencyPeakSpec extends SparkSpec {

  test("peak counts overlaps; touching intervals are concurrent") {
    import spark.implicits._
    val dir = tmpDir("concpeak")
    def ts(day: Int, h: Int, m: Int) = java.sql.Timestamp.valueOf(
      f"2024-01-0$day $h%02d:$m%02d:00")
    // Day 1: u1 [10:00,10:10], u2 [10:05,10:15], u3 [10:20,10:25]
    //   -> u1/u2 overlap, peak 2.
    // Day 2: u4 [11:00,11:30], u5 [11:30,11:40] — u5 starts at the
    //   exact instant u4 ends; inclusive semantics say both are open
    //   at 11:30 -> peak 2 (an exclusive sweep would report 1).
    val rows = Seq(
      (1L, 1L, "view", ts(1, 10, 0)), (1L, 2L, "view", ts(1, 10, 10)),
      (2L, 3L, "view", ts(1, 10, 5)), (2L, 4L, "view", ts(1, 10, 15)),
      (3L, 5L, "view", ts(1, 10, 20)), (3L, 6L, "view", ts(1, 10, 25)),
      (4L, 7L, "view", ts(2, 11, 0)), (4L, 8L, "view", ts(2, 11, 30)),
      (5L, 9L, "view", ts(2, 11, 30)), (5L, 10L, "view", ts(2, 11, 40)))
    rows.toDF("user_id", "event_id", "event_type", "ts")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = SparkEntry.queries("q_concurrency_peak")(spark, dir)
      .collect().map(r => (r.getTimestamp(0).toString, r.getLong(1)))
    assert(got.toSeq === Seq(
      ("2024-01-01 00:00:00.0", 2L), ("2024-01-02 00:00:00.0", 2L)))
  }

  test("a day fully spanned by an open session still reports its carry-in peak") {
    import spark.implicits._
    val dir = tmpDir("concpeak_span")
    val start = java.time.LocalDateTime.of(2024, 3, 1, 23, 0)
    // 63 events 25 min apart (< the 30-min gap) = ONE session
    // [Mar 1 23:00, Mar 3 00:50]. Mar 2 contains no session boundary at
    // all — without midnight sweep points it silently drops from the
    // output (the banked r14 under-reporting finding).
    val rows = (0 to 62).map { i =>
      (9L, 100L + i, "view",
        java.sql.Timestamp.valueOf(start.plusMinutes(25L * i)))
    }
    rows.toDF("user_id", "event_id", "event_type", "ts")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = SparkEntry.queries("q_concurrency_peak")(spark, dir)
      .collect().map(r => (r.getTimestamp(0).toString, r.getLong(1)))
    assert(got.toSeq === Seq(
      ("2024-03-01 00:00:00.0", 1L), ("2024-03-02 00:00:00.0", 1L),
      ("2024-03-03 00:00:00.0", 1L)))
  }
}
