package graft

import graft.operators.{IngestionReport, IngestionService, ParserConfig, ProductStore}
import graft.streaming.IngestStream
import org.apache.spark.sql.functions._

import java.sql.Timestamp
import scala.collection.mutable

/** Stream==batch differential for the drop-directory ingest endpoint:
  * the same fixture sequence through [[IngestStream]] and through
  * direct sequential [[IngestionService.ingest]] calls must produce an
  * identical product table and identical report sequence — including a
  * failing batch that writes nothing but does not stop the stream, and
  * the `*.full.*` full-update naming convention.
  */
class IngestStreamSpec extends SparkSpec {

  private val cfg = ParserConfig("csv", Seq(
    "sku" -> ("sku", "text"),
    "title" -> ("title", "text"),
    "active" -> ("active", "boolean")))

  private def ts(i: Int) = Timestamp.valueOf(f"2024-$i%02d-01 00:00:00")

  // (file name, content, batch stamp index): create → mixed upsert /
  // fresh insert / empty-sku insert → bad boolean (MUST abort, write
  // nothing) → full-update (deactivates the absent b9).
  private val fixtures = Seq(
    ("b1.csv", "sku,title,active\na1,Widget,1\nb9,Gadget,1", 1),
    ("b2.csv", "sku,title,active\na1,Widget v2,0\nc3,Fresh,1\n,Anon,1", 2),
    ("b3.csv", "sku,title,active\na1,Poison,notabool", 3),
    ("b4.full.csv", "sku,title,active\na1,Widget v3,1\nc3,Fresh,1", 4))

  private def tsFor(path: String): Timestamp = {
    val name = path.substring(path.lastIndexOf('/') + 1)
    ts(fixtures.indexWhere(_._1 == name) + 1)
  }

  test("drop-directory stream replays the batch ingest sequence exactly") {
    // --- batch twin: direct sequential service calls ------------------
    val batchStore = new ProductStore(spark, tmpDir("store-batch"))
    val batchSvc = new IngestionService(spark, batchStore, clientId = 1)
    val batchReports = fixtures.map { case (name, content, i) =>
      val p = writeText(tmpDir("seq"), name, content)
      batchSvc.ingest(cfg, p, fullUpdate = name.contains(".full."),
        batchTs = ts(i))
    }
    assert(batchReports.map(_.success) === Seq(true, true, false, true))

    // --- streaming twin: files land one at a time ---------------------
    val streamStore = new ProductStore(spark, tmpDir("store-stream"))
    val streamSvc = new IngestionService(spark, streamStore, clientId = 1)
    val dropDir = tmpDir("drop")
    val reports = mutable.ArrayBuffer.empty[(String, IngestionReport)]
    val q = IngestStream.start(spark, streamSvc, cfg, dropDir,
      checkpointDir = tmpDir("ckpt"), batchTsFor = tsFor,
      onReport = (p, r) => reports.synchronized { reports += ((p, r)) })
    try {
      fixtures.foreach { case (name, content, _) =>
        writeText(dropDir, name, content)
        q.processAllAvailable()
      }
    } finally q.stop()

    // report sequences match, in arrival order
    assert(reports.map(_._1.split('/').last).toSeq === fixtures.map(_._1))
    assert(reports.map(_._2.success).toSeq === Seq(true, true, false, true))
    assert(reports.map(_._2.processedCount).toSeq ===
      batchReports.map(_.processedCount))
    assert(reports.map(_._2.stats).toSeq === batchReports.map(_.stats))

    // the failed batch reported details and wrote nothing (a1 is not
    // 'Poison' in either store)
    assert(reports(2)._2.report.nonEmpty)

    // final tables identical
    val cols = Seq("sku", "title", "active", "client_id")
    val got = streamStore.read().select(cols.map(col): _*)
      .orderBy("sku", "title").collect().toSeq
    val want = batchStore.read().select(cols.map(col): _*)
      .orderBy("sku", "title").collect().toSeq
    assert(got === want)
    // full-update semantics arrived through the naming convention:
    // b9 (absent from b4.full.csv) is deactivated, a1 re-active
    val bySku = streamStore.read().collect()
      .groupBy(r => Option(r.getAs[String]("sku")).getOrElse(""))
    assert(bySku("b9").head.getAs[Boolean]("active") === false)
    assert(bySku("a1").head.getAs[String]("title") === "Widget v3")
    assert(bySku("a1").head.getAs[Boolean]("active") === true)
    assert(bySku("a1").head.getAs[Timestamp]("last_changed_on") === ts(4))
  }

  test("replay after a crash between publish and batch marker duplicates nothing") {
    // The worst case the per-file store marker exists for: a file of
    // SKU-LESS rows (the non-idempotent insert path) whose ingest
    // PUBLISHED, followed by a crash before any checkpoint-side marker
    // was written. On restart the batch replays — and must skip the
    // file because its token committed atomically with the publish.
    val store = new ProductStore(spark, tmpDir("store-crash"))
    val svc = new IngestionService(spark, store, clientId = 1)
    val dropDir = tmpDir("drop-crash")
    val ckpt = tmpDir("ckpt-crash")
    writeText(dropDir, "anon.csv", "sku,title,active\n,Anon A,1\n,Anon B,1")
    val q1 = IngestStream.start(spark, svc, cfg, dropDir,
      checkpointDir = ckpt, batchTsFor = _ => ts(1))
    try q1.processAllAvailable() finally q1.stop()
    assert(store.read().count() === 2)

    // simulate the crash: reconstruct the checkpoint as it would look
    // had the process died right after the store publish — offsets
    // written, but NO commit log entry and NO fast-path batch marker.
    // (A fresh path sidesteps Spark's same-JVM guard against rewriting
    // a commit log it has already seen at the original path.)
    import java.nio.file.{Files => F, Path, Paths => P}
    val ckpt2 = tmpDir("ckpt-crash-restored")
    def copyTree(src: Path, dst: Path): Unit = {
      val w = F.walk(src)
      try {
        import scala.jdk.CollectionConverters._
        w.iterator().asScala.foreach { p =>
          val t = dst.resolve(src.relativize(p))
          if (F.isDirectory(p)) F.createDirectories(t)
          else { F.createDirectories(t.getParent); F.copy(p, t) }
        }
      } finally w.close()
    }
    copyTree(P.get(ckpt), P.get(ckpt2))
    assert(F.deleteIfExists(P.get(ckpt2, "commits", "0")),
      "expected Spark commit log entry for batch 0")
    // Hadoop's local ChecksumFileSystem keeps a .crc sidecar per file;
    // a stale one left behind makes the re-written commit look like a
    // concurrent writer's
    F.deleteIfExists(P.get(ckpt2, "commits", ".0.crc"))
    def rmTree(p: Path): Unit =
      if (F.exists(p)) {
        val w = F.walk(p)
        try {
          import scala.jdk.CollectionConverters._
          w.iterator().asScala.toVector.reverse.foreach(F.delete)
        } finally w.close()
      }
    rmTree(P.get(ckpt2, "graft-processed"))

    val replayReports = mutable.ArrayBuffer.empty[String]
    val q2 = IngestStream.start(spark, svc, cfg, dropDir,
      checkpointDir = ckpt2, batchTsFor = _ => ts(1),
      onReport = (p, _) => replayReports.synchronized { replayReports += p })
    try q2.processAllAvailable() finally q2.stop()

    assert(store.read().count() === 2,
      "replayed file re-ran its sku-less inserts — the marker did not ride the publish")
    assert(replayReports.isEmpty, "skipped file must not re-fire onReport")
  }

  test("marker retention: tokens a full window old retire; recent ones survive") {
    import java.nio.file.{Files => F, Paths => P}
    val store = new ProductStore(spark, tmpDir("store-retain"))
    val svc = new IngestionService(spark, store, clientId = 1)
    val dropDir = tmpDir("drop-retain")
    val ckpt = tmpDir("ckpt-retain")
    // window of 2: the retire hook fires at batch 2 (cutoff 0 — drops
    // nothing) and batch 4 (cutoff 2 — retires batches 0 and 1)
    // capture the EXACT path strings the stream hashes into its tokens
    val seen = mutable.ArrayBuffer.empty[String]
    val q = IngestStream.start(spark, svc, cfg, dropDir,
      checkpointDir = ckpt, batchTsFor = _ => ts(1),
      onReport = (p, _) => seen.synchronized { seen += p },
      markerRetentionBatches = 2)
    try {
      (0 until 5).foreach { i =>
        writeText(dropDir, s"f$i.csv", s"sku,title,active\ns$i,T$i,1")
        q.processAllAvailable()
      }
    } finally q.stop()
    val digests = seen.map(p => java.security.MessageDigest.getInstance("MD5")
      .digest(p.getBytes("UTF-8")).map("%02x".format(_)).mkString)
    // batches 0,1 retired at the batch-4 hook; 2,3,4 inside the window
    assert(!svc.alreadyIngested(s"ingest_0_${digests(0)}"))
    assert(!svc.alreadyIngested(s"ingest_1_${digests(1)}"))
    (2 until 5).foreach(i => assert(
      svc.alreadyIngested(s"ingest_${i}_${digests(i)}"),
      s"batch $i's token must survive retention"))
    // the fast-path batch markers pruned to the same cutoff
    val root = P.get(ckpt, "graft-processed")
    assert(!F.exists(root.resolve("batch=0")) && !F.exists(root.resolve("batch=1")))
    assert(F.exists(root.resolve("batch=4")))
    // and all five rows are live — retention never touches data
    assert(store.read().count() === 5)
  }

  test("same-trigger arrivals process in lexicographic path order") {
    val store = new ProductStore(spark, tmpDir("store-multi"))
    val svc = new IngestionService(spark, store, clientId = 1)
    val dropDir = tmpDir("drop-multi")
    // both files land BEFORE the stream starts: one trigger set, the
    // path sort makes z overwrite a deterministically
    writeText(dropDir, "a_first.csv", "sku,title,active\nk1,First,1")
    writeText(dropDir, "z_last.csv", "sku,title,active\nk1,Last,1")
    val order = mutable.ArrayBuffer.empty[String]
    val q = IngestStream.start(spark, svc, cfg, dropDir,
      checkpointDir = tmpDir("ckpt-multi"), batchTsFor = _ => ts(1),
      onReport = (p, _) => order.synchronized { order += p })
    try q.processAllAvailable() finally q.stop()
    assert(order.map(_.split('/').last).toSeq ===
      Seq("a_first.csv", "z_last.csv"))
    assert(store.read().head().getAs[String]("title") === "Last")
  }
}
