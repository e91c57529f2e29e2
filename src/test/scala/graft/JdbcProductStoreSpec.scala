package graft

import graft.operators.{IngestionService, JdbcProductStore, ParserConfig}
import org.apache.spark.sql.functions._

/** The JDBC backend against embedded Derby — the reference's storage
  * shape (a transactional database) behind the same ProductBackend
  * contract the parquet store honors.
  */
class JdbcProductStoreSpec extends SparkSpec {

  private var dbN = 0
  private def freshStore(): JdbcProductStore = {
    dbN += 1
    new JdbcProductStore(spark,
      s"jdbc:derby:memory:graft_test_${System.nanoTime()}_$dbN;create=true")
  }

  private val cfg = ParserConfig.fromJson(
    """{"parser_id": "csv", "column_mapping": {
      |  "sku": ["sku", "text"],
      |  "title": ["title", "text"],
      |  "active": ["active", "boolean"],
      |  "price": ["max_price", "decimal"]
      |}}""".stripMargin)

  test("round-trip: write through the swap transaction, read with pushdown") {
    import spark.implicits._
    val store = freshStore()
    assert(store.exists)
    assert(store.read().count() === 0)
    val df = Seq(
      (1, "a1", "Red Widget", true, "10.50"),
      (1, "a2", "Blue Widget", false, "20.00"),
      (2, "b1", "Other Tenant", true, "5.00")
    ).toDF("client_id", "sku", "title", "active", "max_price")
    store.overwriteClientAtomic(1, df) // rows for client 2 filtered out
    store.overwriteClientAtomic(2, df)
    assert(store.read().count() === 3)
    val c1 = store.readClient(1).orderBy("sku").collect()
    assert(c1.map(_.getAs[String]("sku")).toSeq === Seq("a1", "a2"))
    assert(c1.head.getAs[java.math.BigDecimal]("max_price")
      .compareTo(new java.math.BigDecimal("10.50")) === 0)
    assert(store.readClient(2).count() === 1)
  }

  test("client overwrite replaces only that tenant; empty batch aborts") {
    import spark.implicits._
    val store = freshStore()
    store.overwriteClientAtomic(1,
      Seq((1, "a1", "Old")).toDF("client_id", "sku", "title"))
    store.overwriteClientAtomic(2,
      Seq((2, "b1", "Keep")).toDF("client_id", "sku", "title"))
    store.overwriteClientAtomic(1,
      Seq((1, "a9", "New")).toDF("client_id", "sku", "title"))
    assert(store.readClient(1).collect().map(_.getAs[String]("sku")).toSeq === Seq("a9"))
    assert(store.readClient(2).count() === 1, "other tenant untouched")
    // a batch with rows only for ANOTHER client must abort, not truncate
    val other = Seq((2, "zz", "Other")).toDF("client_id", "sku", "title")
    intercept[IllegalStateException] { store.overwriteClientAtomic(1, other) }
    assert(store.readClient(1).count() === 1, "abort left tenant intact")
    // deliberate truncation is its own operation
    store.truncateClient(1)
    assert(store.readClient(1).count() === 0)
    assert(store.readClient(2).count() === 1)
  }

  test("ingest service runs unchanged against the JDBC backend") {
    val store = freshStore()
    val dir = tmpDir("jdbc_upload")
    val p = writeText(dir, "u.csv",
      """sku,title,active,price
        |A1,Red Widget,1,$10.00
        |A2,Blue Widget,yes,"1,234.50"
        |""".stripMargin)
    val svc = new IngestionService(spark, store, clientId = 7)
    val rep = svc.ingest(cfg, p)
    assert(rep.success && rep.processedCount === 2)
    val rows = store.readClient(7).orderBy("sku").collect()
    assert(rows.length === 2)
    assert(rows(1).getAs[java.math.BigDecimal]("max_price")
      .compareTo(new java.math.BigDecimal("1234.50")) === 0)
    // upsert batch: A2 re-ingested with new title, A3 inserted
    val p2 = writeText(dir, "u2.csv",
      """sku,title,active,price
        |A2,Renamed Widget,yes,2.00
        |A3,Green Gadget,1,3.00
        |""".stripMargin)
    assert(svc.ingest(cfg, p2).success)
    val after = store.readClient(7).orderBy("sku").collect()
    assert(after.map(_.getAs[String]("sku")).toSeq === Seq("A1", "A2", "A3"))
    assert(after(1).getAs[String]("title") === "Renamed Widget")
  }

  test("concurrent tenant writers serialize on the database transaction") {
    import java.util.concurrent.atomic.AtomicReference
    import spark.implicits._
    val store = freshStore()
    val failure = new AtomicReference[Throwable](null)
    val threads = (1 to 4).map { c =>
      new Thread(() => {
        try (1 to 3).foreach { round =>
          val df = Seq((c, s"sku-$c", s"C$c round $round"))
            .toDF("client_id", "sku", "title")
          store.overwriteClientAtomic(c, df)
        } catch { case t: Throwable => failure.compareAndSet(null, t) }
      })
    }
    threads.foreach(_.start())
    threads.foreach(_.join(120000))
    assert(failure.get() == null, s"writer failed: ${failure.get()}")
    (1 to 4).foreach { c =>
      val rows = store.readClient(c).collect()
      assert(rows.length === 1, s"client $c lost its rows")
      assert(rows.head.getAs[String]("title") === s"C$c round 3")
    }
  }

  test("tenant filter is pushed down into the JDBC scan") {
    val store = freshStore()
    val plan = store.readClient(3).queryExecution.executedPlan.toString
    // Derby reports upper-case identifiers, so match case-insensitively.
    assert(plan.contains("PushedFilters") &&
      plan.toLowerCase.contains("equalto(client_id,3)"),
      s"expected pushed tenant filter in:\n$plan")
  }
}
