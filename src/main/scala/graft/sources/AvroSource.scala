package graft.sources

import java.nio.ByteBuffer

import org.apache.avro.generic.GenericRecord
import org.apache.avro.mapred.AvroKey
import org.apache.avro.mapreduce.AvroKeyInputFormat
import org.apache.hadoop.io.NullWritable
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Explicit-schema Avro container-file ingestion.
  *
  * This environment ships Avro core + avro-mapred but NOT the spark-avro
  * connector, so this source reads through `AvroKeyInputFormat` (container
  * files are splittable by sync markers — input splits parallelize exactly
  * like any other Hadoop input) and converts records to Rows against the
  * supplied StructType. Same explicit-schema discipline as [[CsvSource]]:
  * the caller's schema is authoritative; fields the file lacks read as
  * null, writer-schema extras are ignored. Conversion is per-partition in
  * the same narrow stage as the scan — no shuffle, no driver involvement.
  *
  * Scope: Avro primitives (boolean/int/long/float/double/string/bytes),
  * their nullable unions, and arrays of those primitives (the embedding-
  * vector interchange shape) — what a lakehouse interchange layer
  * actually uses. On a cluster with the spark-avro connector installed,
  * swap to `spark.read.format("avro").schema(s)` — the contract here is
  * deliberately identical so the swap is one line.
  */
object AvroSource {

  def read(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    val raw = spark.sparkContext.newAPIHadoopFile(
      path,
      classOf[AvroKeyInputFormat[GenericRecord]],
      classOf[AvroKey[GenericRecord]],
      classOf[NullWritable])
    val fields = schema.fields
    // AvroKey is not serializable: convert to Row inside the scan stage,
    // before anything can shuffle or cache the raw keys.
    val rows = raw.map { case (k, _) =>
      val rec = k.datum()
      // Record.get(name) THROWS on a field the writer schema lacks (Avro
      // 1.12); probe the schema so reader-side extras read as null instead.
      val writerSchema = rec.getSchema
      Row.fromSeq(fields.toIndexedSeq.map { f =>
        if (writerSchema.getField(f.name) == null) null
        else convert(rec.get(f.name), f.dataType)
      })
    }
    spark.createDataFrame(rows, schema)
  }

  private def convert(v: Any, dt: DataType): Any = (v, dt) match {
    case (null, _) => null
    case (x, StringType) => x.toString // covers Utf8, String, enum symbols
    case (x: Number, LongType) => x.longValue()
    case (x: Number, IntegerType) => x.intValue()
    case (x: Number, DoubleType) => x.doubleValue()
    case (x: Number, FloatType) => x.floatValue()
    case (x: java.lang.Boolean, BooleanType) => x
    case (b: ByteBuffer, BinaryType) =>
      val out = new Array[Byte](b.remaining()); b.duplicate().get(out); out
    case (xs: java.util.Collection[_], ArrayType(elem, _)) =>
      val it = xs.iterator()
      val out = Seq.newBuilder[Any]
      while (it.hasNext) out += convert(it.next(), elem)
      out.result()
    case (x, other) =>
      throw new IllegalArgumentException(
        s"AvroSource supports primitives and arrays of primitives; " +
          s"cannot read $x as ${other.catalogString}")
  }
}
