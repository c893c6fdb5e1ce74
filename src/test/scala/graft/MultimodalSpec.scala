package graft

import graft.multimodal.Multimodal

class MultimodalSpec extends GraftSpec {

  test("media table carries binary payload + typed metadata") {
    val ds = Multimodal.mediaTable(spark, sf)
    val first = ds.head()
    assert(first.payload.nonEmpty)
    assert(Set("image", "audio", "video").contains(first.meta.kind))
    assert(first.meta.width >= 1 && first.meta.height >= 1)
  }

  test("partition-wise stub decode emits features for every record, deterministically") {
    val n = Multimodal.mediaTable(spark, sf).count()
    val a = Multimodal.features(spark, sf).collect()
    val b = Multimodal.features(spark, sf).collect()
    assert(a.length == n)
    assert(a.sameElements(b))
    a.foreach { r =>
      assert(r.getAs[Boolean]("decode_ok"))
      assert(r.getAs[Long]("n_bytes") > 0)
      val ent = r.getAs[Double]("byte_entropy")
      assert(ent >= 0.0 && ent <= 8.0)
    }
  }
}
