package graft

import graft.operators.{IngestionService, ParserConfig, ProductStore}

import java.sql.Timestamp
import scala.collection.mutable
import scala.util.Random

/** Randomized differential test of the ENTIRE ingest path against a
  * driver-side simulation of the reference's sequential algorithm
  * (ingestion/service.py:66-109): per-row lookup, update supplied
  * non-null non-sku columns, unconditional timestamp bump on update,
  * insert otherwise, empty-sku always-insert, and full-update
  * deactivation before the upsert loop. Seeded, so failures reproduce.
  *
  * The engine's distributed plan (window dedup + full-outer coalesce
  * merge + anti-join deactivation + partition swap) must land on exactly
  * the same final table as the row-at-a-time reference semantics for
  * every generated batch sequence.
  */
class IngestReferenceDifferentialSpec extends SparkSpec {

  private val cfg = ParserConfig("csv", Seq(
    "sku" -> ("sku", "text"),
    "title" -> ("title", "text"),
    "active" -> ("active", "boolean")))

  private case class SimRow(
      sku: Option[String],
      var title: Option[String],
      var active: Boolean,
      var ts: Timestamp)

  /** One batch applied with reference semantics. Rows carry RAW csv cells
    * (None = empty cell = not supplied, matching Spark CSV's null).
    */
  private def simulate(
      state: mutable.ArrayBuffer[SimRow],
      rows: Seq[(Option[String], Option[String], Option[String])],
      fullUpdate: Boolean,
      ts: Timestamp): Unit = {
    def bool(s: String): Boolean = Seq("yes", "true", "1").contains(s.trim.toLowerCase)
    val batchSkus = rows.flatMap(_._1).filter(_.nonEmpty).toSet
    // Deactivation scope is `sku IS NOT NULL` (service.py:76) and the
    // key set EXCLUDES '' (falsy-skipped, service.py:22) — and since the
    // reference STORES '' for anonymous rows (DictReader yields '', the
    // DDL forbids NULL), those rows are IN scope and DO deactivate.
    if (fullUpdate) state.foreach { r =>
      if (!batchSkus.contains(r.sku.getOrElse(""))) {
        r.active = false; r.ts = ts
      }
    }
    rows.foreach { case (sku, title, active) =>
      // A row with EVERY cell empty is dropped by the source (blank-line
      // semantics: Spark CSV reads empty cells as null, and the reference
      // parser keeps only rows that produced elements) — documented CSV
      // deviation; the reference would instead abort on boolean('').
      if (sku.isEmpty && title.isEmpty && active.isEmpty) ()
      else {
      val keyed = sku.filter(_.nonEmpty)
      val existing = keyed.flatMap(k => state.find(_.sku.contains(k)))
      existing match {
        case Some(r) =>
          title.foreach(t => r.title = Some(t.trim))
          active.foreach(a => r.active = bool(a))
          r.ts = ts // reference bumps unconditionally on the update path
        case None =>
          // an anonymous row stores sku '' like the reference, never NULL
          state += SimRow(Some(keyed.getOrElse("")), title.map(_.trim),
            active.map(bool).getOrElse(true), ts)
      }
      }
    }
  }

  private def csvFor(rows: Seq[(Option[String], Option[String], Option[String])]): String = {
    val dir = tmpDir("diff")
    val body = rows.map { case (s, t, a) =>
      Seq(s, t, a).map(_.getOrElse("")).mkString(",")
    }
    writeText(dir, "b.csv", ("sku,title,active" +: body).mkString("\n"))
  }

  test("random batch sequences: engine == reference simulation (seeded)") {
    val rnd = new Random(77)
    val skuPool = Seq("A1", "B2", "C3", "D4", "E5", "F6")
    val boolPool = Seq("1", "0", "yes", "no", "TRUE", " False ")
    (1 to 3).foreach { trial =>
      val store = new ProductStore(spark, tmpDir(s"dstore$trial"))
      val svc = new IngestionService(spark, store, clientId = 1)
      val state = mutable.ArrayBuffer.empty[SimRow]
      (1 to 4).foreach { b =>
        val n = 1 + rnd.nextInt(10)
        val rows = (1 to n).map { _ =>
          val sku = rnd.nextInt(10) match {
            case 0 => None                                  // empty -> insert
            case _ => Some(skuPool(rnd.nextInt(skuPool.length)))
          }
          val title =
            if (rnd.nextInt(4) == 0) None
            else Some(s"T${rnd.nextInt(50)}")
          val active =
            if (rnd.nextInt(4) == 0) None
            else Some(boolPool(rnd.nextInt(boolPool.length)))
          (sku, title, active)
        }
        val fullUpdate = rnd.nextInt(3) == 0
        val ts = Timestamp.valueOf(f"2024-02-0$b%d 00:00:00")
        val rep = svc.ingest(cfg, csvFor(rows), fullUpdate, ts)
        assert(rep.success, s"trial $trial batch $b: ${rep.message}")
        simulate(state, rows, fullUpdate, ts)

        val actual = store.read()
          .collect()
          .map(r => (Option(r.getAs[String]("sku")),
            Option(r.getAs[String]("title")),
            r.getAs[Boolean]("active"),
            r.getAs[Timestamp]("last_changed_on")))
          .sortBy(_.toString)
        val expected = state
          .map(r => (r.sku, r.title, r.active, r.ts))
          .sortBy(_.toString)
        assert(actual.toSeq === expected.toSeq, s"trial $trial after batch $b")
      }
    }
  }

  test("random sequences with abort batches: failures commit nothing (seeded)") {
    // Same differential, but ~1 in 3 batches carries an unparseable strict
    // boolean: the engine must report failure WITHOUT touching the table
    // (the reference's transaction rollback), and resume cleanly on the
    // next good batch.
    val rnd = new Random(101)
    val skuPool = Seq("A1", "B2", "C3", "D4")
    val boolPool = Seq("1", "0", "yes", "no")
    (1 to 3).foreach { trial =>
      val store = new ProductStore(spark, tmpDir(s"astore$trial"))
      val svc = new IngestionService(spark, store, clientId = 1)
      val state = mutable.ArrayBuffer.empty[SimRow]
      (1 to 5).foreach { b =>
        val n = 1 + rnd.nextInt(8)
        val poison = rnd.nextInt(3) == 0
        val badAt = if (poison) rnd.nextInt(n) else -1
        val rows = (0 until n).map { i =>
          val sku = Some(skuPool(rnd.nextInt(skuPool.length)))
          val title = Some(s"T${rnd.nextInt(30)}")
          val active =
            if (i == badAt) Some(s"bogus${rnd.nextInt(9)}")
            else if (rnd.nextInt(4) == 0) None
            else Some(boolPool(rnd.nextInt(boolPool.length)))
          (sku, title, active)
        }
        val fullUpdate = rnd.nextInt(3) == 0
        val ts = Timestamp.valueOf(f"2024-03-0$b%d 00:00:00")
        val rep = svc.ingest(cfg, csvFor(rows), fullUpdate, ts)
        if (poison) {
          assert(!rep.success, s"trial $trial batch $b must abort")
          assert(rep.report.nonEmpty, "abort must carry row details")
          // state NOT simulated: table must equal the pre-batch state
        } else {
          assert(rep.success, s"trial $trial batch $b: ${rep.message}")
          simulate(state, rows, fullUpdate, ts)
        }
        val actual = store.read()
          .collect()
          .map(r => (Option(r.getAs[String]("sku")),
            Option(r.getAs[String]("title")),
            r.getAs[Boolean]("active"),
            r.getAs[Timestamp]("last_changed_on")))
          .sortBy(_.toString)
        val expected = state
          .map(r => (r.sku, r.title, r.active, r.ts))
          .sortBy(_.toString)
        assert(actual.toSeq === expected.toSeq, s"trial $trial after batch $b")
      }
    }
  }
}
