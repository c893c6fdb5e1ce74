package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.sources.AvroIo

/** A RawLocalFileSystem under a custom scheme, resolvable ONLY through
  * `fs.graftl.impl` in the driver's hadoop conf — the standard Hadoop
  * test trick for proving a conf reached the place that built the
  * FileSystem. */
class GraftSchemeFs extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getUri: java.net.URI = java.net.URI.create("graftl:///")
}

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

  test("the driver's hadoop conf ships into write/read tasks") {
    // r18 ADVICE: executor tasks built their FileSystem from a fresh
    // `new Configuration()`, silently dropping spark.hadoop.* settings
    // (S3A credentials, custom schemes). Pin both halves: the wrapper
    // carries a driver-set key where a fresh Configuration does not...
    val hc = spark.sparkContext.hadoopConfiguration
    hc.set("graft.test.key", "shipped")
    val wrapped = new graft.sources.SerializableHadoopConf(hc)
    val seen = spark.sparkContext.parallelize(1 to 2, 2).map { _ =>
      val fresh = new org.apache.hadoop.conf.Configuration()
      wrapped.value.get("graft.test.key", "missing") + ":" +
        fresh.get("graft.test.key", "missing")
    }.collect().toSet
    assert(seen == Set("shipped:missing"), seen.toString)
    // ... and end-to-end: a conf-DEFINED filesystem scheme (resolvable
    // only through the driver conf — caching disabled so every task
    // resolves it from the conf it was handed) round-trips write+read
    hc.set("fs.graftl.impl", classOf[GraftSchemeFs].getName)
    hc.set("fs.graftl.impl.disable.cache", "true")
    val dir = "graftl:" + tmp() + "/out"
    AvroIo.write(spark.range(0, 10, 1, 2).toDF("id"), dir)
    assert(AvroIo.read(spark, dir).count() == 10)
  }

  test("a mid-write crash leaves the target absent or previous, never partial") {
    val base = tmp()
    val dir = base + "/out"
    // ANSI integer division by zero throws inside a task at id=57 —
    // after some rows have already streamed to part files
    val failing = spark.range(0, 100, 1, 4)
      .selectExpr("id", "100 div (id - 57) AS v")
    intercept[Exception](AvroIo.write(failing, dir))
    // target never appeared, and the temp staging dir was cleaned up
    assert(!new java.io.File(dir).exists())
    assert(new java.io.File(base).listFiles().isEmpty,
      new java.io.File(base).listFiles().mkString(","))
    // a successful write commits; a FAILED overwrite preserves it
    AvroIo.write(spark.range(5).toDF("id"), dir)
    assert(AvroIo.read(spark, dir).count() == 5)
    intercept[Exception](AvroIo.write(failing, dir))
    assert(AvroIo.read(spark, dir).count() == 5)
  }

  test("an early-terminated read (LIMIT) closes its container stream") {
    // r18 ADVICE: the per-file iterator closed only on full consumption;
    // now a task-completion listener closes it however the task ends.
    // Observable on Linux: no fd under /proc/self/fd may still point
    // into the avro directory after the action returns (local[4] tasks
    // run in this JVM).
    val dir = tmp()
    AvroIo.write(spark.range(0, 100000, 1, 4).selectExpr("id", "id * 2 AS v"), dir)
    val got = AvroIo.read(spark, dir).limit(3).collect()
    assert(got.length == 3)
    def openFds(substr: String): Seq[String] = {
      val d = new java.io.File("/proc/self/fd")
      d.listFiles().toSeq.flatMap { f =>
        try Some(java.nio.file.Files.readSymbolicLink(f.toPath).toString)
        catch { case _: Exception => None }
      }.filter(_.contains(substr))
    }
    assert(openFds(dir).isEmpty, openFds(dir).mkString(","))
  }

  test("a single large container splits across tasks on sync markers") {
    // r18 verdict (What's-missing #4, second half): one task per FILE
    // serializes a multi-GB container on one core. The read now tiles
    // each file into maxPartitionBytes ranges that re-sync on the
    // container's block markers — prove a ONE-file write scans as MANY
    // tasks, with every row exactly once.
    val dir = tmp()
    AvroIo.write(
      spark.range(0, 200000, 1, 1)
        .selectExpr("id", "repeat('x', 40) AS pad"), dir, codec = "null")
    val files = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".avro"))
    assert(files.length == 1, files.mkString(","))
    // own-session conf so the shared suite session's scan sizing is untouched
    val s = spark.newSession()
    s.conf.set("spark.sql.files.maxPartitionBytes", "256k")
    val back = AvroIo.read(s, dir)
    val nSplits = back.rdd.getNumPartitions
    assert(nSplits >= 8, s"expected >=8 splits for a ~10MB file, got $nSplits")
    // exactly-once: count, distinct count, and sum all match closed form
    val agg = back.selectExpr(
      "count(*) c", "count(distinct id) d", "sum(id) s").head()
    assert(agg.getLong(0) == 200000L && agg.getLong(1) == 200000L &&
      agg.getLong(2) == 199999L * 200000L / 2, agg.toString)
    // more than one split actually produced rows (the work distributed)
    val perPart = back.rdd.mapPartitions(it => Iterator(it.size)).collect()
    assert(perPart.count(_ > 0) > 1, perPart.mkString(","))
  }

  test("split tiling is exact for any split size (no dup/drop at boundaries)") {
    // Boundary proof: replay the same file under deliberately odd split
    // sizes (not multiples of the block size, smaller than one block,
    // larger than the file) — identical multiset of rows every time.
    val dir = tmp()
    AvroIo.write(
      spark.range(0, 50000, 1, 1).selectExpr("id", "id * 3 AS v"), dir)
    val s = spark.newSession()
    val sums = Seq("10k", "77777b", "1m", "1g").map { sz =>
      s.conf.set("spark.sql.files.maxPartitionBytes", sz)
      AvroIo.read(s, dir)
        .selectExpr("count(*) c", "sum(id) s", "sum(v) sv").head().toSeq
    }
    assert(sums.distinct.size == 1, sums.mkString(" | "))
    assert(sums.head == Seq(50000L, 49999L * 50000L / 2, 3L * 49999L * 50000L / 2),
      sums.head.toString)
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
