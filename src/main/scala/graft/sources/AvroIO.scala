package graft.sources

import org.apache.avro.Schema
import org.apache.avro.SchemaBuilder
import org.apache.avro.generic.{GenericData, GenericRecord}
import org.apache.avro.mapred.AvroKey
import org.apache.avro.mapreduce.{AvroJob, AvroKeyInputFormat, AvroKeyOutputFormat}
import org.apache.hadoop.fs.Path
import org.apache.hadoop.io.NullWritable
import org.apache.hadoop.mapreduce.Job
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Avro container source/sink on the public Hadoop
  * `AvroKeyInputFormat`/`AvroKeyOutputFormat` path (avro + avro-mapred
  * ship on the classpath; the `spark-avro` datasource module does not,
  * and this classic formulation predates it anyway). Semantics match
  * the engine's other roundtrip sources: explicit schema on BOTH sides
  * — at 100 TB a schema-inferring reader costs a full extra pass before
  * the first real job — and standard Avro object-container files any
  * external Avro tool can read.
  *
  * Scale shape: both directions are per-partition streaming through
  * Hadoop's splittable Avro format — the write is one task per input
  * partition, the read parallelizes on container blocks (Avro files
  * are sync-marker splittable), and no driver ever holds rows.
  *
  * Types cover the engine's interchange needs (long / int / double /
  * string, all nullable via the canonical ["null", T] union); anything
  * else fails loudly at schema build time rather than corrupting data.
  */
object AvroIO {

  /** Spark schema -> Avro record schema (nullable-union fields). */
  def toAvroSchema(name: String, schema: StructType): Schema = {
    var b = SchemaBuilder.record(name).namespace("graft").fields()
    schema.fields.foreach { f =>
      b = f.dataType match {
        case LongType => b.optionalLong(f.name)
        case IntegerType => b.optionalInt(f.name)
        case DoubleType => b.optionalDouble(f.name)
        case StringType => b.optionalString(f.name)
        case other =>
          sys.error(s"AvroIO: unsupported type $other for field ${f.name}")
      }
    }
    b.endRecord()
  }

  /** Write `df` as Avro object-container files under `path`
    * (overwrite). The Avro schema travels to executors as its JSON
    * string — `Schema` itself is not serializable.
    */
  def write(df: DataFrame, path: String): Unit = {
    val sparkSchema = df.schema
    val avroJson = toAvroSchema("GraftRecord", sparkSchema).toString
    val sc = df.sparkSession.sparkContext
    val out = new Path(path)
    val fs = out.getFileSystem(sc.hadoopConfiguration)
    if (fs.exists(out)) fs.delete(out, true)
    val job = Job.getInstance(sc.hadoopConfiguration)
    AvroJob.setOutputKeySchema(job, new Schema.Parser().parse(avroJson))
    df.rdd.mapPartitions { rows =>
      val schema = new Schema.Parser().parse(avroJson)
      rows.map { row =>
        val rec = new GenericData.Record(schema)
        var i = 0
        while (i < sparkSchema.length) {
          val f = sparkSchema(i)
          val v: AnyRef =
            if (row.isNullAt(i)) null
            else f.dataType match {
              case LongType => java.lang.Long.valueOf(row.getLong(i))
              case IntegerType => java.lang.Integer.valueOf(row.getInt(i))
              case DoubleType => java.lang.Double.valueOf(row.getDouble(i))
              case StringType => row.getString(i)
              case other =>
                sys.error(s"AvroIO: unsupported type $other for ${f.name}")
            }
          rec.put(f.name, v)
          i += 1
        }
        (new AvroKey[GenericRecord](rec), NullWritable.get)
      }
    }.saveAsNewAPIHadoopFile(path,
      classOf[AvroKey[GenericRecord]], classOf[NullWritable],
      classOf[AvroKeyOutputFormat[GenericRecord]], job.getConfiguration)
  }

  /** Read Avro container files at `path` with the EXPLICIT `schema` as
    * the Avro reader schema (projection + evolution follow Avro's
    * standard resolution rules). Values are materialized into `Row`s
    * immediately — the Hadoop record reader reuses its key object, so
    * nothing may escape the iterator lazily.
    */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    val job = Job.getInstance(spark.sparkContext.hadoopConfiguration)
    AvroJob.setInputKeySchema(job, toAvroSchema("GraftRecord", schema))
    val fields = schema.fields
    val rows = spark.sparkContext.newAPIHadoopFile(
        path,
        classOf[AvroKeyInputFormat[GenericRecord]],
        classOf[AvroKey[GenericRecord]],
        classOf[NullWritable],
        job.getConfiguration)
      .mapPartitions { it =>
        it.map { case (k, _) =>
          val rec = k.datum()
          val vals = new Array[Any](fields.length)
          var i = 0
          while (i < fields.length) {
            vals(i) = rec.get(fields(i).name) match {
              case null => null
              case u: org.apache.avro.util.Utf8 => u.toString
              case other => other
            }
            i += 1
          }
          Row.fromSeq(vals.toIndexedSeq)
        }
      }
    spark.createDataFrame(rows, schema)
  }
}
