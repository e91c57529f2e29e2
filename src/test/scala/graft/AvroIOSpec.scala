package graft

import graft.sources.AvroIO
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Avro container roundtrip: value/null fidelity across the supported
  * types, multi-partition write + distributed read-back, explicit
  * reader-schema projection.
  */
class AvroIOSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("name", StringType),
    StructField("score", DoubleType), StructField("n", IntegerType)))

  test("roundtrip preserves values and nulls across partitions") {
    val dir = java.nio.file.Files.createTempDirectory("avroio").toString
    val rows = Seq(
      Row(1L, "alpha", 1.5, 10),
      Row(2L, null, -2.25, null),
      Row(3L, "gamma", null, 0),
      Row(null, "delta", 0.0, -7))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 3), schema)
    AvroIO.write(df, s"$dir/t")
    val back = AvroIO.read(spark, s"$dir/t", schema)
    assert(back.schema === schema)
    val got = back.collect().sortBy(r =>
      if (r.isNullAt(0)) Long.MinValue else r.getLong(0))
    val want = rows.sortBy(r =>
      if (r.get(0) == null) Long.MinValue else r.getLong(0))
    assert(got.toSeq === want)
    // the write really produced standard Avro container files
    val files = new java.io.File(s"$dir/t").listFiles()
      .filter(_.getName.endsWith(".avro"))
    assert(files.nonEmpty)
    val magic = java.nio.file.Files.readAllBytes(files.head.toPath).take(4)
    assert(magic.toSeq === Seq[Byte]('O', 'b', 'j', 1))
  }

  test("explicit reader schema projects a field subset") {
    val dir = java.nio.file.Files.createTempDirectory("avroio").toString
    val df = spark.range(0, 100)
      .select(col("id"), concat(lit("n"), col("id")).as("name"),
        (col("id") * 1.5).as("score"), col("id").cast("int").as("n"))
    AvroIO.write(df, s"$dir/t")
    // reader schema mentions only (id, score): Avro schema resolution
    // must drop the other fields — the explicit-schema read path.
    val proj = StructType(Seq(
      StructField("id", LongType), StructField("score", DoubleType)))
    val back = AvroIO.read(spark, s"$dir/t", proj)
    assert(back.schema.fieldNames.toSeq === Seq("id", "score"))
    assert(back.count() === 100L)
    assert(back.agg(sum(col("score"))).collect()(0).getDouble(0) ===
      (0 until 100).map(_ * 1.5).sum)
  }

  test("unsupported column types fail loudly at schema build") {
    intercept[RuntimeException] {
      AvroIO.toAvroSchema("bad", StructType(Seq(
        StructField("ts", TimestampType))))
    }
  }
}
