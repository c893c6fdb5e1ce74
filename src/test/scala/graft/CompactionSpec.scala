package graft

import org.apache.spark.sql.functions._
import graft.sources.Compaction

class CompactionSpec extends GraftSpec {

  private def partFiles(dir: String): Array[java.io.File] =
    new java.io.File(dir).listFiles()
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))

  test("compaction merges a many-small-file table into range-sorted files") {
    val base = java.nio.file.Files.createTempDirectory("graft-compact").toString
    val in = s"$base/in"
    val out = s"$base/out"
    // ingestion-shaped input: 64 shuffled fragments
    graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"), col("n_chars"))
      .repartition(64)
      .write.parquet(in)
    assert(partFiles(in).length == 64)

    Compaction.compact(spark, in, out, "doc_id", nFiles = 4)
    assert(partFiles(out).length == 4, "compaction must produce exactly nFiles files")

    // contents unchanged
    val a = spark.read.parquet(in).orderBy("doc_id").collect().toSeq
    val b = spark.read.parquet(out).orderBy("doc_id").collect().toSeq
    assert(a == b)

    // files are value-ranged: per-file [min,max] doc_id intervals disjoint,
    // which is what gives parquet min/max stats file-level pruning power
    val ranges = partFiles(out).map { f =>
      val r = spark.read.parquet(f.getAbsolutePath)
        .agg(min("doc_id"), max("doc_id")).head()
      (r.getLong(0), r.getLong(1))
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi), (lo2, _)) => assert(hi < lo2, s"overlap: ${ranges.toSeq}")
      case _ =>
    }
  }

  test("targetFilesFor sizes the file count from actual bytes") {
    val base = java.nio.file.Files.createTempDirectory("graft-compact2").toString
    graft.sources.Tables.documents(spark, sf).write.parquet(s"$base/t")
    val n1 = Compaction.targetFilesFor(spark, s"$base/t", targetFileBytes = 1L)
    val nBig = Compaction.targetFilesFor(spark, s"$base/t")
    assert(n1 > 1, "1-byte target must demand many files")
    assert(nBig == 1, "128MB target over a tiny table is a single file")
  }
}
