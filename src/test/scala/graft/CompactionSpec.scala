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

  test("z-order clusters BOTH columns; single-column sort leaves the other unclustered") {
    val base = java.nio.file.Files.createTempDirectory("graft-zorder").toString
    val in = s"$base/in"
    spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_orderkey"), col("l_partkey"), col("l_quantity"))
      .repartition(32)
      .write.parquet(in)

    // mean per-file span of `c`, normalized by its global span: ~1.0 when
    // every file covers the whole value range (no pruning possible),
    // → 0 as files tighten (this is exactly what min/max pruning sees)
    def meanSpan(dir: String, c: String): Double = {
      val g = spark.read.parquet(dir).agg(min(c), max(c)).head()
      val global = (g.getLong(1) - g.getLong(0)).toDouble
      val spans = partFiles(dir).map { f =>
        val r = spark.read.parquet(f.getAbsolutePath).agg(min(c), max(c)).head()
        (r.getLong(1) - r.getLong(0)) / global
      }
      spans.sum / spans.length
    }

    Compaction.compact(spark, in, s"$base/plain", "l_orderkey", nFiles = 16)
    Compaction.zOrder(spark, in, s"$base/z", Seq("l_orderkey", "l_partkey"), nFiles = 16)
    assert(partFiles(s"$base/z").length == 16)

    // same rows either way
    assert(spark.read.parquet(s"$base/z").count() ==
      spark.read.parquet(in).count())

    val plainOther = meanSpan(s"$base/plain", "l_partkey")
    assert(plainOther > 0.8,
      f"single-column sort should leave l_partkey unclustered, got $plainOther%.2f")
    val zA = meanSpan(s"$base/z", "l_orderkey")
    val zB = meanSpan(s"$base/z", "l_partkey")
    assert(zA < 0.65 && zB < 0.65,
      f"z-order must tighten BOTH columns' file spans, got $zA%.2f / $zB%.2f")
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
