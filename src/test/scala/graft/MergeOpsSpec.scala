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

  // -------------------------------------------------------------------
  // Generative properties over random states/batches (seeded, like
  // NativePropertiesSpec): the semantic facts the replay story rests on.
  // -------------------------------------------------------------------

  private def randState(rnd: scala.util.Random, keys: Seq[String]) = {
    import spark.implicits._
    keys.map(k => (Option(k),
      if (rnd.nextBoolean()) Some(s"t-$k-${rnd.nextInt(5)}") else None,
      if (rnd.nextBoolean()) Some(rnd.nextInt(100)) else None))
      .toDF("key", "title", "qty")
  }

  test("property: coalesceMerge under a pinned stamp is idempotent exactly on non-null keys") {
    import spark.implicits._
    val rnd = new scala.util.Random(27)
    for (trial <- 1 to 10) {
      val target = randState(rnd, rnd.shuffle(('a' to 'j').map(_.toString)).take(6))
      val nNullRows = rnd.nextInt(3)
      val staged = randState(rnd,
          rnd.shuffle(('d' to 'm').map(_.toString)).take(5))
        .unionByName((1 to nNullRows).map(i =>
          (None: Option[String], Some(s"anon$i"), Some(i)))
          .toDF("key", "title", "qty"))
      def merge(t: org.apache.spark.sql.DataFrame) =
        MergeOps.coalesceMerge(t, staged, Seq("key"),
          touchedCol = Some("title"), stamp = lit("s"))
      def canon(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(_.toSeq.map(Option(_))).toSeq
          .sortBy(_.toString)
      val once = merge(target)
      val twice = merge(once)
      if (nNullRows == 0) {
        assert(canon(twice) === canon(once),
          s"trial $trial: merge must be idempotent with no null keys")
      } else {
        // the DOCUMENTED non-idempotent window: each null-key staged row
        // inserts again (full-outer join never matches null keys) —
        // exactly what the ingest markers exist to fence
        assert(twice.count() === once.count() + nNullRows,
          s"trial $trial: second merge must re-insert exactly the null-key rows")
        assert(canon(twice.filter(col("key").isNotNull)) ===
          canon(once.filter(col("key").isNotNull)),
          s"trial $trial: non-null-key rows must be stable under re-merge")
      }
    }
  }

  test("property: lastNonNullWins == the reference's file-order setattr fold") {
    import spark.implicits._
    val rnd = new scala.util.Random(28)
    for (trial <- 1 to 10) {
      val rows = (0 until 20).map { i =>
        (s"k${rnd.nextInt(5)}", i,
          if (rnd.nextBoolean()) Some(s"t$i") else None,
          if (rnd.nextBoolean()) Some(i * 10) else None)
      }
      val got = MergeOps.lastNonNullWins(
          rows.toDF("key", "ord", "title", "qty"),
          keys = Seq("key"), orderCol = "ord", dataCols = Seq("title", "qty"))
        .collect().map(r => r.getString(0) ->
          (Option(r.get(1)), Option(r.get(2)))).toMap
      // reference: per key, fold rows in file order, each non-null
      // column overwrites (service.py:92-102 applies supplied columns)
      val want = rows.groupBy(_._1).map { case (k, rs) =>
        val fold = rs.sortBy(_._2).foldLeft(
            (Option.empty[String], Option.empty[Int])) { case ((t, q), r) =>
          (r._3.orElse(t), r._4.orElse(q))
        }
        k -> fold
      }
      want.foreach { case (k, (t, q)) =>
        assert(got(k) === ((t, q)), s"trial $trial key $k")
      }
      assert(got.keySet === want.keySet)
    }
  }
}
