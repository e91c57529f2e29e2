package graft

import graft.operators.ProductStore
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import java.nio.file.{Files, Path, Paths}

/** Scratch measurement for the sub-tenant sku-hash bucket layout: a
  * small batch merged into one LARGE tenant, plain store vs bucketed
  * store — wall time of the read-merge-publish sequence and, the claim
  * that actually matters at 100 TB, BYTES PHYSICALLY WRITTEN by the
  * publish (new inodes in the new version vs hard links carried from
  * the previous one). The plain store must rewrite the whole tenant
  * partition; the bucketed store only the few `_bucket=B` dirs the
  * batch's skus hash into.
  */
object ProfStore {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.local.dir", Scratch.localDir("scratch-local"))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val tenantRows = args.headOption.map(_.toInt).getOrElse(400000)
    val batchRows = args.drop(1).headOption.map(_.toInt).getOrElse(20)
    val nBuckets = args.drop(2).headOption.map(_.toInt).getOrElse(256)

    def inodes(p: Path): Map[Long, Long] = {
      val w = Files.walk(p)
      try {
        import scala.jdk.CollectionConverters._
        w.iterator().asScala.filter(Files.isRegularFile(_)).map { f =>
          (Files.getAttribute(f, "unix:ino").asInstanceOf[Long], Files.size(f))
        }.toMap
      } finally w.close()
    }
    def currentDir(root: String): Path = {
      val cur = Paths.get(root, "CURRENT")
      Paths.get(root, "versions",
        new String(Files.readAllBytes(cur), "UTF-8").trim)
    }

    val tenant = spark.range(tenantRows.toLong).select(
      lit(1).as("client_id"),
      concat(lit("sku"), col("id")).as("sku"),
      concat(lit("Title "), col("id")).as("title"))
    val batch = spark.range(batchRows.toLong).select(
      lit(1).as("client_id"),
      concat(lit("sku"), col("id") * 13L).as("sku"), // existing skus
      lit("Updated").as("title"))

    for ((label, buckets) <- Seq(("plain", None), ("bucketed", Some(nBuckets)))) {
      val root = Scratch.localDir(s"profstore-$label")
      val store = new ProductStore(spark, root, keepVersions = 2,
        skuBuckets = buckets)
      store.overwriteClientAtomic(1, tenant)
      val before = inodes(currentDir(root))
      val t0 = System.nanoTime()
      buckets match {
        case None =>
          // plain: merge the batch into the full tenant read, replace all
          val merged = store.readClient(1)
            .join(batch.select(col("sku"), col("title").as("_new")),
              Seq("sku"), "left")
            .select(col("client_id"), col("sku"),
              coalesce(col("_new"), col("title")).as("title"))
          store.overwriteClientAtomic(1, merged)
        case Some(n) =>
          val touched = batch
            .select(ProductStore.bucketOf(col("sku").cast("string"), n).as("b"))
            .distinct().collect().map(_.getInt(0)).toSeq
          val merged = store.readClientBuckets(1, touched)
            .join(batch.select(col("sku"), col("title").as("_new")),
              Seq("sku"), "left")
            .select(col("client_id"), col("sku"),
              coalesce(col("_new"), col("title")).as("title"))
          store.overwriteClientBucketsAtomic(1, touched, merged)
      }
      val wallMs = (System.nanoTime() - t0) / 1000000
      val after = inodes(currentDir(root))
      val fresh = after.filterNot { case (ino, _) => before.contains(ino) }
      val freshMb = fresh.values.sum / 1e6
      val totalMb = after.values.sum / 1e6
      println(f"PROFSTORE $label%-9s tenant=$tenantRows batch=$batchRows " +
        f"buckets=${buckets.getOrElse(0)}%4d publish=${wallMs}%5d ms " +
        f"freshBytes=$freshMb%8.2f MB of $totalMb%8.2f MB " +
        f"(${100.0 * fresh.values.sum / math.max(1L, after.values.sum)}%5.1f%%)")
    }
    spark.stop()
  }
}
