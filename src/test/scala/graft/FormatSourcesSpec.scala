package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{AvroSource, OrcSource}

/** ORC and Avro ingestion under the explicit-schema contract. */
class FormatSourcesSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  test("OrcSource: explicit schema read round-trips, filters push to the scan") {
    val dir = Files.createTempDirectory("orc-src").toString + "/t"
    val df = Seq((1L, "a", 1.5), (2L, "b", 2.5), (3L, "c", 3.5)).toDF("id", "name", "x")
    df.write.orc(dir)

    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("x", DoubleType)))
    val back = OrcSource.read(spark, dir, schema)
    assert(back.orderBy("id").collect().map(_.toSeq).toSeq ==
      df.orderBy("id").collect().map(_.toSeq).toSeq)

    // The format must keep the engine's pushdown guarantees: predicate
    // reaches the ORC scan, projection prunes to the read schema.
    val plan = back.where(col("id") > 1L).select("name")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(id), GreaterThan(id,1)]"), plan)
    assert(plan.contains("ReadSchema: struct<id:bigint,name:string>"), plan)
  }

  test("AvroSource: container file reads with caller schema; missing fields null") {
    val avroSchema = new org.apache.avro.Schema.Parser().parse(
      """{"type":"record","name":"doc","fields":[
        |  {"name":"id","type":"long"},
        |  {"name":"title","type":["null","string"],"default":null},
        |  {"name":"score","type":"double"},
        |  {"name":"flag","type":"boolean"},
        |  {"name":"payload","type":"bytes"}
        |]}""".stripMargin)
    val dir = Files.createTempDirectory("avro-src")
    val file = dir.resolve("part-0.avro").toFile
    val writer = new org.apache.avro.file.DataFileWriter(
      new org.apache.avro.generic.GenericDatumWriter[org.apache.avro.generic.GenericRecord](avroSchema))
    writer.create(avroSchema, file)
    (1L to 5L).foreach { i =>
      val rec = new org.apache.avro.generic.GenericData.Record(avroSchema)
      rec.put("id", i)
      rec.put("title", if (i == 3L) null else s"doc-$i")
      rec.put("score", i * 0.5)
      rec.put("flag", i % 2 == 0)
      rec.put("payload", java.nio.ByteBuffer.wrap(Array[Byte](i.toByte, (i + 1).toByte)))
      writer.append(rec)
    }
    writer.close()

    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("title", StringType),
      StructField("score", DoubleType),
      StructField("flag", BooleanType),
      StructField("payload", BinaryType),
      StructField("not_in_file", StringType))) // reader-side extra → null
    val back = AvroSource.read(spark, dir.toString, schema).orderBy("id").collect()
    assert(back.length == 5)
    assert(back.map(_.getLong(0)).toSeq == (1L to 5L))
    assert(back(2).isNullAt(1) && back(0).getString(1) == "doc-1")
    assert(back(3).getDouble(2) == 2.0 && back(1).getBoolean(3))
    assert(back(0).getAs[Array[Byte]]("payload").toSeq == Seq[Byte](1, 2))
    assert(back.forall(_.isNullAt(5)), "field absent from the file must read as null")

    // and it's a real DataFrame: engine operators compose on top
    val agg = AvroSource.read(spark, dir.toString, schema)
      .groupBy("flag").agg(sum("score").as("s")).orderBy("flag").collect()
    assert(agg.map(_.getDouble(1)).toSeq == Seq(4.5, 3.0))
  }

  test("AvroSource: embedding vectors (array<float>) round-trip into engine operators") {
    val avroSchema = new org.apache.avro.Schema.Parser().parse(
      """{"type":"record","name":"emb","fields":[
        |  {"name":"vec_id","type":"long"},
        |  {"name":"embedding","type":{"type":"array","items":"float"}}
        |]}""".stripMargin)
    val dir = Files.createTempDirectory("avro-emb")
    val writer = new org.apache.avro.file.DataFileWriter(
      new org.apache.avro.generic.GenericDatumWriter[org.apache.avro.generic.GenericRecord](avroSchema))
    writer.create(avroSchema, dir.resolve("part-0.avro").toFile)
    (0L until 20L).foreach { i =>
      val rec = new org.apache.avro.generic.GenericData.Record(avroSchema)
      rec.put("vec_id", i)
      val arr = new java.util.ArrayList[java.lang.Float]()
      (0 until 8).foreach(d => arr.add((if (d == (i % 8)) 1.0f else 0.0f)))
      rec.put("embedding", arr)
      writer.append(rec)
    }
    writer.close()

    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType))))
    val emb = AvroSource.read(spark, dir.toString, schema)
    assert(emb.count() == 20)
    // straight into the similarity operator: identical one-hot directions
    // of vec 0 (ids 0, 8, 16) must top its neighbor list at cosine 1.0
    val top = graft.operators.Similarity
      .bruteForceTopK(emb, "vec_id", "embedding", queryId = 0L, k = 2)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(top.map(_._1).toSet == Set(8L, 16L) && top.forall(_._2 == 1.0), top.mkString(","))
  }
}
