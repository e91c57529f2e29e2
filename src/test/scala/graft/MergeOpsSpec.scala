package graft

import graft.operators.MergeOps
import org.apache.spark.sql.functions._

/** Set-based merge primitive semantics — reference ingestion/service.py:73-106. */
class MergeOpsSpec extends SparkSpec {

  import org.apache.spark.sql.Row

  test("coalesceMerge: staged non-null overwrites, staged null preserved, insert, passthrough") {
    import spark.implicits._
    val target = Seq(
      (1, Some("old-title-1"), Some(10)),
      (2, Some("old-title-2"), Some(20)),
      (3, Some("old-title-3"), Some(30))
    ).toDF("key", "title", "qty")
    val staged = Seq(
      (1, Some("new-title-1"), None: Option[Int]), // update title, keep qty
      (4, Some("inserted"), Some(40))              // new key -> insert
    ).toDF("key", "title", "qty")
    val out = MergeOps.coalesceMerge(target, staged, Seq("key"))
      .orderBy("key").collect()
    assert(out.map(r => (r.getInt(0), r.getString(1), r.getInt(2))).toSeq === Seq(
      (1, "new-title-1", 10),
      (2, "old-title-2", 20),
      (3, "old-title-3", 30),
      (4, "inserted", 40)))
  }

  test("coalesceMerge: touchedCol stamped only on touched/inserted rows") {
    import spark.implicits._
    val ts0 = java.sql.Timestamp.valueOf("2020-01-01 00:00:00")
    val ts1 = java.sql.Timestamp.valueOf("2021-06-15 12:00:00")
    val target = Seq((1, Some("a"), Some(ts0)), (2, Some("b"), Some(ts0)))
      .toDF("key", "title", "last_changed_on")
    val staged = Seq((1, Some("a2"), None: Option[java.sql.Timestamp]),
      (3, Some("c"), None: Option[java.sql.Timestamp]))
      .toDF("key", "title", "last_changed_on")
    val out = MergeOps.coalesceMerge(target, staged, Seq("key"),
        touchedCol = Some("last_changed_on"), stamp = lit(ts1))
      .orderBy("key").collect()
    assert(out.map(r => (r.getInt(0), r.getTimestamp(2))).toSeq ===
      Seq((1, ts1), (2, ts0), (3, ts1)))
  }

  test("lastNonNullWins: later row wins per column, null never erases") {
    import spark.implicits._
    val staged = Seq(
      (1L, "k1", Some("t1"), Some(5)),
      (2L, "k1", None: Option[String], Some(9)), // later: qty wins, title survives
      (3L, "k2", Some("x"), None: Option[Int])
    ).toDF("ord", "key", "title", "qty")
    val out = MergeOps.lastNonNullWins(staged, Seq("key"), "ord", Seq("title", "qty"))
      .orderBy("key").collect()
    assert(out.length === 2)
    assert(out(0).getString(1) === "t1")
    assert(out(0).getInt(2) === 9)
    assert(out(1).getString(1) === "x")
  }

  test("antiUpdate: rows absent from key set get updates; count matches") {
    import spark.implicits._
    val target = Seq((1, "a", true), (2, "b", true), (3, "c", true), (4, null, true))
      .toDF("key2", "sku", "active")
      .withColumnRenamed("key2", "key")
    val ingested = Seq(Tuple1("a"), Tuple1("c")).toDF("sku")
    val (updated, flag) = MergeOps.antiUpdate(target, ingested, Seq("sku"),
      scope = col("sku").isNotNull, updates = Map("active" -> lit(false)))
    val rows = updated.select("key", "active").orderBy("key").collect()
    assert(rows.map(r => (r.getInt(0), r.getBoolean(1))).toSeq ===
      Seq((1, true), (2, false), (3, true), (4, true)))
    assert(updated.filter(flag).count() === 1)
  }

  test("antiUpdate never updates null-key rows (SQL NOT IN parity)") {
    import spark.implicits._
    val target = Seq((Some("a1"), true), (None: Option[String], true))
      .toDF("sku", "active")
    val keys = Seq("zz").toDF("sku")
    val (out, _) = MergeOps.antiUpdate(target, keys, Seq("sku"),
      scope = lit(true), updates = Map("active" -> lit(false)))
    val bySku = out.collect().map(r => Option(r.getString(0)) -> r.getBoolean(1)).toMap
    assert(bySku(Some("a1")) === false, "non-ingested non-null key updates")
    assert(bySku(None) === true, "null key compares unknown under NOT IN - never updated")
  }
}
