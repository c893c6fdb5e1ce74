package graft

import java.nio.file.Files
import graft.sources.{Formats, Tables}

class SourcesSpec extends GraftSpec {
  import spark.implicits._

  private lazy val tmp = Files.createTempDirectory("graft-sources").toString
  private lazy val nation = Tables.nation(spark, sf)

  private def roundTrip(write: String => Unit, read: String => org.apache.spark.sql.DataFrame,
                        path: String): Unit = {
    write(path)
    val back = read(path)
    assert(back.count() == nation.count())
    assert(back.columns.sorted.sameElements(nation.columns.sorted))
    val a = nation.orderBy("n_nationkey").collect().map(_.toString).toSeq
    val b = back.select(nation.columns.map(org.apache.spark.sql.functions.col): _*)
      .orderBy("n_nationkey").collect().map(_.toString).toSeq
    assert(a == b)
  }

  test("parquet round-trip") {
    roundTrip(p => Formats.writeParquet(nation, p), p => Formats.readParquet(spark, p), s"$tmp/pq")
  }

  test("csv round-trip with explicit schema") {
    roundTrip(p => Formats.writeCsv(nation, p),
      p => Formats.readCsv(spark, p, nation.schema), s"$tmp/csv")
  }

  test("json round-trip with explicit schema") {
    roundTrip(p => Formats.writeJson(nation, p),
      p => Formats.readJson(spark, p, Some(nation.schema)), s"$tmp/json")
  }

  test("orc round-trip") {
    roundTrip(p => Formats.writeOrc(nation, p), p => Formats.readOrc(spark, p), s"$tmp/orc")
  }

  test("partitioned parquet write prunes partitions on read") {
    val p = s"$tmp/part"
    Formats.writeParquet(nation, p, partitionBy = Seq("n_regionkey"))
    val one = Formats.readParquet(spark, p).where("n_regionkey = 2")
    val plan = one.queryExecution.executedPlan.toString
    assert(one.count() == nation.where("n_regionkey = 2").count())
    // partition filter must reach the scan, not a post-filter
    assert(plan.contains("PartitionFilters") || !plan.contains("Filter"))
  }

  test("binaryFile source reads opaque payloads with file metadata") {
    // the ingestion path for multimodal corpora: files on distributed
    // storage → (path, length, content) rows, no decode on the scan
    val dir = Files.createTempDirectory("graft-bin")
    Files.write(dir.resolve("a.jpg"), Array[Byte](1, 2, 3, 4))
    Files.write(dir.resolve("b.jpg"), Array[Byte](9, 8, 7))
    val df = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.jpg").load(dir.toString)
    assert(df.columns.toSet == Set("path", "modificationTime", "length", "content"))
    val byName = df.collect().map(r =>
      r.getAs[String]("path").split('/').last -> r.getAs[Array[Byte]]("content")).toMap
    assert(byName("a.jpg").sameElements(Array[Byte](1, 2, 3, 4)))
    assert(byName("b.jpg").sameElements(Array[Byte](9, 8, 7)))
  }

  test("mergeSchema reads unify evolving parquet schemas") {
    // schema evolution: a later batch adds a column; mergeSchema exposes
    // the union with NULLs for the old files
    val p = s"$tmp/evolve"
    Seq((1L, "a")).toDF("id", "v1").write.parquet(s"$p/d1")
    Seq((2L, "b", 9.9)).toDF("id", "v1", "v2").write.parquet(s"$p/d2")
    val df = spark.read.option("mergeSchema", "true").parquet(s"$p/d1", s"$p/d2")
    assert(df.columns.toSet == Set("id", "v1", "v2"))
    val r1 = df.where("id = 1").head()
    assert(r1.isNullAt(r1.fieldIndex("v2")))
  }

  test("in-memory Dataset source") {
    val ds = Seq((1, "a"), (2, "b")).toDS()
    assert(ds.count() == 2)
  }

  test("malformed JSON records are captured, not fatal (PERMISSIVE ingestion)") {
    // dirty data is a fact of 100 TB ingestion: bad records must land in
    // _corrupt_record so the clean rows flow and the junk is auditable
    val dir = Files.createTempDirectory("graft-dirty")
    Files.write(dir.resolve("part.json"), java.util.Arrays.asList(
      """{"id": 1, "v": "ok"}""",
      """{"id": 2, "v": broken""",
      """{"id": 3, "v": "fine"}"""))
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "id LONG, v STRING, _corrupt_record STRING")
    val df = spark.read.schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(dir.toString).cache()
    try {
      assert(df.count() == 3)
      assert(df.filter($"_corrupt_record".isNotNull).count() == 1)
      assert(df.filter($"_corrupt_record".isNull)
        .select(org.apache.spark.sql.functions.sum($"id")).head().getLong(0) == 4L)
      // DROPMALFORMED: the strict pipeline variant keeps only clean rows
      val clean = spark.read.schema(schema.add("ignored", "STRING"))
        .option("mode", "DROPMALFORMED").json(dir.toString)
      assert(clean.filter($"v".isNotNull).count() == 2)
    } finally df.unpersist()
  }

  test("raw text-file corpus ingestion: line and whole-file modes") {
    // the rawest LLM-corpus source: .txt files on distributed storage
    val dir = Files.createTempDirectory("graft-txt")
    Files.write(dir.resolve("a.txt"), java.util.Arrays.asList("first doc line 1", "first doc line 2"))
    Files.write(dir.resolve("b.txt"), java.util.Arrays.asList("second doc"))
    val lines = spark.read.text(dir.toString)
    assert(lines.count() == 3)
    val whole = spark.read.option("wholetext", "true").text(dir.toString)
      .select(org.apache.spark.sql.functions.input_file_name().as("f"), $"value")
    assert(whole.count() == 2)
    val byFile = whole.collect().map(r => r.getString(0).split('/').last -> r.getString(1)).toMap
    assert(byFile("a.txt").contains("line 2") && byFile("b.txt").trim == "second doc")
  }

  test("jdbc builder constructs a partitioned reader config") {
    val j = Formats.Jdbc("jdbc:mysql://localhost:3306/test", "user_table", "u", "p",
      partitionColumn = Some("id"), lowerBound = 0, upperBound = 1000, numPartitions = 8)
    // no DB in the container: assert the reader carries the sharding options
    val reader = j.reader(spark)
    assert(reader.getClass.getSimpleName == "DataFrameReader")
  }
}
