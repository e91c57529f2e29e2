package graft

import graft.operators.RangeJoin
import org.apache.spark.sql.functions._

import java.sql.Timestamp

class RangeJoinSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("interval containment with bucket expansion: edges and misses") {
    import spark.implicits._
    val intervals = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00"), ts("2024-01-01 12:30:00")), // spans 3 buckets
      (1L, 20L, ts("2024-01-01 14:00:00"), ts("2024-01-01 14:10:00")),
      (2L, 30L, ts("2024-01-01 10:30:00"), ts("2024-01-01 10:45:00"))
    ).toDF("k", "iid", "s", "e")
    val points = Seq(
      (1L, 100L, ts("2024-01-01 10:00:00")), // exactly at start -> inside
      (1L, 101L, ts("2024-01-01 12:30:00")), // exactly at end -> inside
      (1L, 102L, ts("2024-01-01 11:59:59")), // middle bucket of the long interval
      (1L, 103L, ts("2024-01-01 13:00:00")), // between intervals -> no match
      (2L, 104L, ts("2024-01-01 10:40:00")), // other key, inside its interval
      (3L, 105L, ts("2024-01-01 10:40:00"))  // key with no intervals -> no match
    ).toDF("k", "pid", "pts")
    val out = RangeJoin.intervalJoin(points, intervals, Seq("k"),
        "pts", "s", "e", bucketWidthSec = 3600L)
      .select("pid", "iid")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out === Set((100L, 10L), (101L, 10L), (102L, 10L), (104L, 30L)))
  }

  test("differential vs plain non-equi join on random data (seeded)") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val base = 1700000000000L
    val intervals = (1 to 60).map { i =>
      val s = base + rnd.nextInt(500000) * 1000L
      (rnd.nextInt(4).toLong, i.toLong, new Timestamp(s),
        new Timestamp(s + (1 + rnd.nextInt(7200)) * 1000L))
    }
    val points = (1 to 400).map { i =>
      (rnd.nextInt(5).toLong, i.toLong,
        new Timestamp(base + rnd.nextInt(520000) * 1000L))
    }
    val idf = intervals.toDF("k", "iid", "s", "e")
    val pdf = points.toDF("k", "pid", "pts")
    val bucketed = RangeJoin.intervalJoin(pdf, idf, Seq("k"),
        "pts", "s", "e", bucketWidthSec = 600L)
      .select("pid", "iid")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val naive = pdf.join(idf, pdf("k") === idf("k") &&
        pdf("pts") >= idf("s") && pdf("pts") <= idf("e"))
      .select("pid", "iid")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(bucketed === naive)
    assert(naive.nonEmpty)
  }
}
