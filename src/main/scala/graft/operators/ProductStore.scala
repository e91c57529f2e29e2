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
  * directory and atomically swaps it in; readers see either the old or the
  * new version, never a partial write.
  *
  * Scale design: the table is written `partitionBy(client_id)` so tenant
  * scoped reads prune to one partition and a single client's merge only
  * rewrites that client's files. On a real deployment this store is the
  * place to swap in a table format with MERGE (Delta/Iceberg) — the
  * operator semantics above it do not change.
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

  /** Write a full new table version and atomically swap it in. */
  def overwriteAtomic(df: DataFrame): Unit = {
    val tmp = Paths.get(root, s"_staging_${System.nanoTime()}")
    align(df).write
      .mode(SaveMode.Overwrite)
      .partitionBy("client_id")
      .parquet(tmp.toString)
    swap(tmp)
  }

  /** Plain append (insert-only ingest without merge). */
  def append(df: DataFrame): Unit =
    align(df).write.mode(SaveMode.Append).partitionBy("client_id")
      .parquet(dataDir.toString)

  private def align(df: DataFrame): DataFrame =
    df.select(ProductSchema.CLIENT_PRODUCTS_SCHEMA.fields.toSeq.map(f =>
      (if (df.columns.contains(f.name)) col(f.name)
       else lit(null)).cast(f.dataType).as(f.name)): _*)

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
