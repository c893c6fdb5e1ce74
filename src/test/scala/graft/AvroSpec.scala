package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.sources.AvroIo

/** Avro read/write over avro-core (the image ships Avro's core jars but
  * not the spark-avro DataSource; AvroIo implements the container format
  * directly — the last open sources checkbox). */
class AvroSpec extends GraftSpec {

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft-avro").toString

  test("lineitem round-trips through the avro container byte-exactly") {
    val src = graft.sources.Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_partkey", "l_quantity", "l_extendedprice",
        "l_returnflag", "l_shipdate")
      .limit(2000)
    val dir = tmp()
    AvroIo.write(src, dir)
    val back = AvroIo.read(spark, dir)
    assert(back.schema == src.schema, back.schema.treeString)
    val a = src.collect().map(_.toSeq).sortBy(_.toString)
    val b = back.collect().map(_.toSeq).sortBy(_.toString)
    assert(a.length == 2000 && a.sameElements(b) || a.toSeq == b.toSeq)
  }

  test("full type surface round-trips: nulls, arrays, binary, timestamp, decimal, struct") {
    val schema = StructType(Seq(
      StructField("i", IntegerType), StructField("l", LongType),
      StructField("f", FloatType), StructField("d", DoubleType),
      StructField("b", BooleanType), StructField("s", StringType),
      StructField("bin", BinaryType),
      StructField("dt", DateType), StructField("ts", TimestampType),
      StructField("dec", DecimalType(10, 2)),
      StructField("arr", ArrayType(LongType)),
      StructField("rec", StructType(Seq(
        StructField("x", StringType), StructField("y", DoubleType))))))
    val rows = Seq(
      Row(1, 2L, 1.5f, 2.5, true, "hi", Array[Byte](1, 2),
        java.sql.Date.valueOf("2024-02-29"),
        java.sql.Timestamp.valueOf("2024-01-02 03:04:05.123456"),
        new java.math.BigDecimal("12345.67"),
        Seq(7L, 8L), Row("in", 0.25)),
      Row(null, null, null, null, null, null, null, null, null, null,
        null, null))
    val src = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
    val dir = tmp()
    AvroIo.write(src, dir)
    val back = AvroIo.read(spark, dir).orderBy(org.apache.spark.sql.functions
      .col("i").asc_nulls_last).collect()
    assert(back.length == 2)
    val r = back(0)
    assert(r.getInt(0) == 1 && r.getLong(1) == 2L && r.getFloat(2) == 1.5f)
    assert(r.getAs[Array[Byte]]("bin").toSeq == Seq[Byte](1, 2))
    assert(r.getDate(7).toString == "2024-02-29")
    assert(r.getTimestamp(8).toString == "2024-01-02 03:04:05.123456")
    assert(r.getDecimal(9) == new java.math.BigDecimal("12345.67"))
    assert(r.getSeq[Long](10) == Seq(7L, 8L))
    assert(r.getStruct(11).getString(0) == "in" && r.getStruct(11).getDouble(1) == 0.25)
    assert((0 until 12).forall(back(1).isNullAt), back(1).toString)
  }

  test("distributed shape: one container file per non-empty partition") {
    val src = spark.range(0, 1000, 1, 8).selectExpr("id", "id * 2 AS v")
    val dir = tmp()
    AvroIo.write(src, dir)
    val parts = new java.io.File(dir).listFiles().map(_.getName)
      .filter(_.endsWith(".avro"))
    assert(parts.length == 8, parts.mkString(","))
    assert(AvroIo.read(spark, dir).count() == 1000)
    // empty frame still readable (schema-carrier file)
    val dir2 = tmp()
    AvroIo.write(src.filter("id < 0"), dir2)
    val empty = AvroIo.read(spark, dir2)
    assert(empty.count() == 0 && empty.schema.fieldNames.toSeq == Seq("id", "v"))
  }

  test("misuse is refused loudly: maps, nested arrays, missing paths") {
    val mapDf = spark.sql("SELECT map('k', 1) AS m")
    val e1 = intercept[Exception](AvroIo.write(mapDf, tmp()))
    assert(e1.getMessage.contains("unsupported type"), e1.getMessage)
    val nested = spark.sql("SELECT array(array(1)) AS a")
    val e2 = intercept[Exception](AvroIo.write(nested, tmp()))
    assert(e2.getMessage.contains("nested container"), e2.getMessage)
    intercept[Exception](AvroIo.read(spark, "/no/such/dir-avro").collect())
  }
}
