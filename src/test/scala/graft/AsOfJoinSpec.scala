package graft

import graft.operators.AsOfJoin
import org.apache.spark.sql.functions._

import java.sql.Timestamp

class AsOfJoinSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("as-of join picks the latest right row at or before each left ts") {
    import spark.implicits._
    val quotes = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100.0),
      (1L, ts("2024-01-01 10:05:00"), 101.0),
      (1L, ts("2024-01-01 10:10:00"), 102.0),
      (2L, ts("2024-01-01 10:07:00"), 55.0)
    ).toDF("k", "qts", "px")
    val trades = Seq(
      (1L, ts("2024-01-01 09:59:00"), "t0"), // before any quote -> null
      (1L, ts("2024-01-01 10:05:00"), "t1"), // EQUAL ts -> that quote (<= bound)
      (1L, ts("2024-01-01 10:07:30"), "t2"), // between -> 10:05 quote
      (1L, ts("2024-01-01 11:00:00"), "t3"), // after all -> latest
      (2L, ts("2024-01-01 10:06:00"), "t4"), // other key, before its quote -> null
      (3L, ts("2024-01-01 10:00:00"), "t5")  // key with no right rows -> null
    ).toDF("k", "tts", "tag")
    val out = AsOfJoin.asOf(trades, quotes, Seq("k"), "tts", "qts", Seq("px"))
      .orderBy("tag")
      .collect()
      .map(r => r.getAs[String]("tag") -> Option(r.getAs[Any]("asof_px")))
      .toMap
    assert(out("t0") === None)
    assert(out("t1") === Some(101.0))
    assert(out("t2") === Some(101.0))
    assert(out("t3") === Some(102.0))
    assert(out("t4") === None)
    assert(out("t5") === None)
  }

  test("NULL fields in the matched right row stay NULL (no back-fill from older rows)") {
    import spark.implicits._
    val quotes = Seq(
      (1L, ts("2024-01-01 10:00:00"), Some(100.0), Some("nyse")),
      (1L, ts("2024-01-01 10:05:00"), None, Some("arca")), // px NULL here
      (1L, ts("2024-01-01 10:10:00"), Some(102.0), None)   // venue NULL here
    ).toDF("k", "qts", "px", "venue")
    val trades = Seq(
      (1L, ts("2024-01-01 10:06:00"), "a"), // matches 10:05 -> px NULL, venue arca
      (1L, ts("2024-01-01 10:11:00"), "b")  // matches 10:10 -> px 102, venue NULL
    ).toDF("k", "tts", "tag")
    val out = AsOfJoin.asOf(trades, quotes, Seq("k"), "tts", "qts", Seq("px", "venue"))
      .collect()
      .map(r => r.getAs[String]("tag") ->
        ((Option(r.getAs[Any]("asof_px")), Option(r.getAs[String]("asof_venue")))))
      .toMap
    // per-column carry-forward would wrongly give a -> (100.0, arca), b -> (102.0, arca)
    assert(out("a") === ((None, Some("arca"))))
    assert(out("b") === ((Some(102.0), None)))
  }

  test("differential vs per-row scan on random data (seeded)") {
    import spark.implicits._
    val rnd = new scala.util.Random(19)
    val rights = (1 to 200).map(_ =>
      (rnd.nextInt(5).toLong, new Timestamp(1700000000000L + rnd.nextInt(100000) * 1000L),
        rnd.nextInt(1000)))
      .distinct
      .groupBy(r => (r._1, r._2)).map(_._2.maxBy(_._3)).toSeq // unique (k, ts)
    val lefts = (1 to 300).map(i =>
      (rnd.nextInt(6).toLong, new Timestamp(1700000000000L + rnd.nextInt(100000) * 1000L),
        i.toLong))
    val rdf = rights.toDF("k", "rts", "v")
    val ldf = lefts.toDF("k", "lts", "id")
    val got = AsOfJoin.asOf(ldf, rdf, Seq("k"), "lts", "rts", Seq("v"))
      .collect()
      .map(r => r.getAs[Long]("id") -> Option(r.getAs[Any]("asof_v")))
      .toMap
    lefts.foreach { case (k, lts, id) =>
      val expected = rights.filter(r => r._1 == k && !r._2.after(lts))
        .sortBy(r => (r._2.getTime, r._3)).lastOption.map(_._3)
      assert(got(id) === expected, s"left id $id")
    }
  }
}
