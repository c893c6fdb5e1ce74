package graft

import org.apache.spark.unsafe.types.UTF8String

import graft.functions.Kernels

/** Randomized property harness for the fused t23/t25 featurizer: the
  * byte-identity contract vs the definitional form (hash64 of the
  * "u "/"b "-marked concatenated feature strings) checked on seeded
  * random token streams — multibyte UTF-8, empty tokens, repeats,
  * whitespace-only docs and 0/1-token edges get exercised beyond the
  * hand-built spec. Seeds fixed — failures reproduce, never flake. */
class HashedNgramPropertySpec extends GraftSpec {

  private val Alphabet: IndexedSeq[String] = IndexedSeq(
    "the", "cat", "Ünïcode", "日本語", "x", "", "1234", "a-b", "éclair",
    "naïve", "word9", "ß", "emoji😀", "tab\tinside", "longer-token-value")

  private def refBuckets(toks: IndexedSeq[String], seed: Long,
      bits: Int): IndexedSeq[Long] = {
    val mask = (1L << bits) - 1L
    def h(f: String): Long =
      Kernels.hash64(UTF8String.fromString(f), seed) & mask
    toks.map(t => h("u " + t)) ++
      (if (toks.length >= 2)
         toks.sliding(2).map(p => h(s"b ${p(0)} ${p(1)}")).toIndexedSeq
       else IndexedSeq.empty)
  }

  private def refScore(toks: IndexedSeq[String], seed: Long): (Int, Long) = {
    val bs = refBuckets(toks, seed, 16)
    (bs.length, bs.map(b => ((b * 2654435761L) & 0xffffffffL) % 2001L - 1000L).sum)
  }

  private def toArrayData(toks: IndexedSeq[String]) =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      toks.map(UTF8String.fromString).toArray[Any])

  test("bucket kernel is byte-identical to the definitional hash chain on random docs") {
    for (seed <- 1 to 20) {
      val r = new scala.util.Random(seed)
      val toks = IndexedSeq.fill(r.nextInt(40))(Alphabet(r.nextInt(Alphabet.length)))
      val hashSeed = r.nextLong()
      val bits = 1 + r.nextInt(20)
      val got = Kernels.hashedNgramBuckets(toArrayData(toks), hashSeed, bits)
      val want = refBuckets(toks, hashSeed, bits)
      assert(got.numElements() == want.length, s"seed $seed: count")
      want.indices.foreach { i =>
        assert(got.getLong(i) == want(i), s"seed $seed: position $i")
      }
    }
  }

  test("score kernel equals the bucket->weight fold on random docs") {
    for (seed <- 1 to 20) {
      val r = new scala.util.Random(seed)
      val toks = IndexedSeq.fill(r.nextInt(40))(Alphabet(r.nextInt(Alphabet.length)))
      val hashSeed = r.nextLong() | 1L
      val got = Kernels.hashedNgramScore(toArrayData(toks), hashSeed)
      val (nf, sum) = refScore(toks, hashSeed)
      assert(got.getInt(0) == nf && got.getLong(1) == sum, s"seed $seed")
    }
  }

  test("the split(lower) -> kernel pipeline matches a plain-Scala replay end-to-end") {
    import org.apache.spark.sql.functions.{col, lower, split}
    import spark.implicits._
    val docs = Seq(
      "", " ", "ONE", "Two tokens", "  leading and   gaps  ",
      "mixedCASE Ünïcode 日本語 words", "a b c d e f g", "ß ß ß")
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val seed = 0x5851f42d4c957f2dL
    val got = docs.toDF("id", "text")
      .select(col("id"), graft.functions.GraftFunctions.hashedNgramBuckets(
        split(lower(col("text")), "\\s+"), seed, 13).as("bs"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    docs.foreach { case (id, text) =>
      val toks = text.toLowerCase(java.util.Locale.ROOT)
        .split("\\s+", -1).toIndexedSeq
      assert(got(id) == refBuckets(toks, seed, 13), s"doc $id '$text'")
    }
  }
}
