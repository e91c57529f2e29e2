package graft

/** Session path mining: trigrams must respect the 30-minute session
  * boundary — the property that separates q_event_paths from the plain
  * per-user q_event_transitions lag.
  */
class EventPathsSpec extends SparkSpec {

  test("paths never cross a session boundary") {
    import spark.implicits._
    val dir = tmpDir("eventpaths")
    val base = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
    def ts(min: Int) = new java.sql.Timestamp(base.getTime + min * 60000L)
    val rows = Seq(
      (1L, 1L, "view", ts(0)),
      (1L, 2L, "click", ts(1)),
      (1L, 3L, "purchase", ts(2)),
      // 58-minute gap -> a new session: the (click, purchase, view)
      // and (purchase, view, click) cross-boundary trigrams must NOT
      // appear even though the per-user event order contains them.
      (1L, 4L, "view", ts(60)),
      (1L, 5L, "click", ts(61)),
      (1L, 6L, "purchase", ts(62)))
    rows.toDF("user_id", "event_id", "event_type", "ts")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = SparkEntry.queries("q_event_paths")(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(got.toSeq === Seq(("view", "click", "purchase", 2L)))
  }
}
