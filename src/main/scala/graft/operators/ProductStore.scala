package graft.operators

import graft.ProductSchema
import org.apache.spark.sql.{DataFrame, Row, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.util.Try

/** Parquet-backed product table with atomic overwrite.
  *
  * The reference's transactional guarantee is a single Postgres commit at
  * the end of a batch — any failure rolls everything back
  * (ingestion/service.py:56-64,108). Plain parquet has no MERGE or
  * transactions, so the store writes every new table version to a staging
  * directory and swaps it in with two atomic renames; readers never see a
  * partial write (each version directory is complete before it becomes
  * visible), though there is a short no-directory window between the two
  * renames — see [[swap]] for the exact guarantee and recovery path.
  *
  * Scale design: the table is written `partitionBy(client_id)` so tenant
  * scoped reads prune to one partition, and [[overwriteClientAtomic]]
  * rewrites ONLY the ingesting client's partition directory — other
  * tenants' files stay byte-identical across a batch. On a real
  * deployment this store is the place to swap in a table format with
  * MERGE (Delta/Iceberg) — the operator semantics above it do not change.
  */
class ProductStore(spark: SparkSession, root: String) {

  private val dataDir = Paths.get(root, "data")

  def exists: Boolean = Files.exists(dataDir)

  def read(): DataFrame =
    if (exists)
      spark.read.schema(ProductSchema.CLIENT_PRODUCTS_SCHEMA).parquet(dataDir.toString)
    else
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row], ProductSchema.CLIENT_PRODUCTS_SCHEMA)

  /** Read only one client's partition — partition pruning makes this a
    * scan of the `client_id=X` directory alone, not the whole table.
    */
  def readClient(clientId: Int): DataFrame =
    read().filter(col("client_id") === clientId)

  /** Write a full new table version and atomically swap it in. Used for
    * whole-table operations; per-client batches should use
    * [[overwriteClientAtomic]] so one tenant's MB-scale upload does not
    * rewrite every other tenant's files.
    */
  def overwriteAtomic(df: DataFrame): Unit = {
    val tmp = Paths.get(root, s"_staging_${System.nanoTime()}")
    align(df).write
      .mode(SaveMode.Overwrite)
      .partitionBy("client_id")
      .parquet(tmp.toString)
    swap(tmp)
  }

  /** Replace ONLY `client_id=clientId`'s partition directory with the
    * given rows (all rows must belong to that client). Every other
    * client's files are untouched — byte-identical across another
    * tenant's ingest. Same two-rename swap discipline as [[swap]], scoped
    * to the one partition directory.
    */
  def overwriteClientAtomic(clientId: Int, df: DataFrame): Unit = {
    val tmp = Paths.get(root, s"_staging_${System.nanoTime()}")
    align(df).write
      .mode(SaveMode.Overwrite)
      .partitionBy("client_id")
      .parquet(tmp.toString)
    val part = s"client_id=$clientId"
    val src = tmp.resolve(part)
    Files.createDirectories(dataDir)
    val dst = dataDir.resolve(part)
    val old = Paths.get(root, s"_old_${System.nanoTime()}")
    if (Files.exists(dst)) Files.move(dst, old, StandardCopyOption.ATOMIC_MOVE)
    if (Files.exists(src)) Files.move(src, dst, StandardCopyOption.ATOMIC_MOVE)
    Try(deleteRecursively(old))
    Try(deleteRecursively(tmp))
  }

  /** Plain append (insert-only ingest without merge). */
  def append(df: DataFrame): Unit =
    align(df).write.mode(SaveMode.Append).partitionBy("client_id")
      .parquet(dataDir.toString)

  private def align(df: DataFrame): DataFrame =
    df.select(ProductSchema.CLIENT_PRODUCTS_SCHEMA.fields.toSeq.map(f =>
      (if (df.columns.contains(f.name)) col(f.name)
       else lit(null)).cast(f.dataType).as(f.name)): _*)

  /** Swap discipline: move the live dir (or partition dir) aside, move the
    * staged one in. Each rename is atomic, but there IS a short window
    * between the two where the path does not exist — a concurrent read()
    * in that window sees an empty table, and a crash between the moves
    * leaves the data recoverable under `_old_*` (re-run recovery: move the
    * newest `_old_*` back). The reference gets full atomicity from a
    * Postgres commit; plain-parquet cannot, and closing the window needs a
    * versioned-directory + current-pointer scheme or a table format with a
    * transaction log (Delta/Iceberg) — which is the documented production
    * swap-in point for this store.
    */
  private def swap(tmp: Path): Unit = {
    val old = Paths.get(root, s"_old_${System.nanoTime()}")
    if (Files.exists(dataDir)) Files.move(dataDir, old, StandardCopyOption.ATOMIC_MOVE)
    Files.move(tmp, dataDir, StandardCopyOption.ATOMIC_MOVE)
    Try(deleteRecursively(old))
  }

  private def deleteRecursively(p: Path): Unit = {
    if (Files.exists(p)) {
      import scala.jdk.CollectionConverters._
      Files.walk(p).iterator().asScala.toSeq.reverse.foreach(Files.delete)
    }
  }
}
