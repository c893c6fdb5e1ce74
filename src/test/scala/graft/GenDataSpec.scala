package graft

import org.apache.spark.sql.functions._

import graft.tools.GenData

/** The synthetic-corpus generator's contracts: byte-determinism (the
  * scale gates regenerate data per run and verify against it), the
  * dup structure both vocabulary arms share, and the open-vocab arm's
  * defining property — vocabulary that GROWS with the corpus (the
  * default arm's fixed 30 words saturate shingle multiplicity at scale,
  * which the r16 decade bench showed measures corpus degeneracy as much
  * as algorithm growth). */
class GenDataSpec extends GraftSpec {

  test("documents generation is deterministic and partition-count independent") {
    val a = GenData.documents(spark, 2000).orderBy("doc_id").collect()
    val b = GenData.documents(spark, 2000).repartition(7).orderBy("doc_id").collect()
    assert(a.sameElements(b))
    val ov1 = GenData.documentsOpenVocab(spark, 2000).orderBy("doc_id").collect()
    val ov2 = GenData.documentsOpenVocab(spark, 2000).repartition(5).orderBy("doc_id").collect()
    assert(ov1.sameElements(ov2))
  }

  test("open-vocab arm keeps the dup structure but grows the vocabulary") {
    def vocabOf(df: org.apache.spark.sql.DataFrame): Long =
      df.select(explode(split(col("text"), " ")).as("w"))
        .agg(count_distinct(col("w"))).head.getLong(0)
    val closed = GenData.documents(spark, 5000)
    val open = GenData.documentsOpenVocab(spark, 5000)
    // default arm: the fixed 30-word vocabulary (+ the 'dup' marker)
    assert(vocabOf(closed) <= 31)
    // open arm: thousands of distinct words at 5k docs, and more at 20k —
    // the Heaps-style growth the decade bench's open arm exists to supply
    val v5k = vocabOf(open)
    assert(v5k > 2000, s"open-vocab 5k docs: $v5k distinct words")
    val v20k = vocabOf(GenData.documentsOpenVocab(spark, 20000))
    assert(v20k > v5k * 2, s"vocab must grow with corpus: $v5k -> $v20k")
    // both arms share the exact-duplicate structure: ~0.16% of docs copy
    // an earlier doc byte-for-byte
    val dups = open.groupBy(md5(col("text"))).count()
      .filter(col("count") > 1).count()
    assert(dups > 0, "open arm must still contain exact duplicates")
    // Zipf head: the most common word is far more frequent than the
    // median word (a uniform draw over a large vocab would be flat)
    val freqs = open.select(explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "dup")
      .groupBy("w").count().select("count").collect().map(_.getLong(0)).sorted
    assert(freqs.last > 20 * freqs(freqs.length / 2),
      s"head=${freqs.last} median=${freqs(freqs.length / 2)}")
  }
}
