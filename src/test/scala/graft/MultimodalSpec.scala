package graft

import graft.multimodal.{ImageHeaders, Multimodal}

class MultimodalSpec extends GraftSpec {

  test("media table carries binary payload + typed metadata") {
    val ds = Multimodal.mediaTable(spark, sf)
    val first = ds.head()
    assert(first.payload.nonEmpty)
    assert(Set("image", "audio", "video").contains(first.meta.kind))
    assert(first.meta.width >= 1 && first.meta.height >= 1)
  }

  test("header codec round-trips PNG/JPEG/GIF dims through real bytes") {
    import graft.multimodal.ImageHeaders
    for ((mk, fmt) <- Seq(
        (ImageHeaders.png _, "png"), (ImageHeaders.jpeg _, "jpeg"),
        (ImageHeaders.gif _, "gif"));
      (w, h) <- Seq((1, 1), (64, 48), (640, 480), (65535, 1))) {
      val body = "decoded media body".getBytes("UTF-8")
      val p = ImageHeaders.parse(mk(w, h) ++ body)
      assert(p.isDefined, s"$fmt $w x $h did not parse")
      assert(p.get.format == fmt && p.get.width == w && p.get.height == h,
        s"got ${p.get} for $fmt $w x $h")
      assert((mk(w, h) ++ body).drop(p.get.headerLen).sameElements(body),
        s"$fmt headerLen ${p.get.headerLen} does not isolate the body")
    }
    assert(ImageHeaders.parse("not media at all".getBytes("UTF-8")).isEmpty)
    assert(ImageHeaders.parse(Array[Byte]()).isEmpty)
    // truncated header: magic alone must not crash the scan
    assert(ImageHeaders.parse(ImageHeaders.png(4, 4).take(10)).isEmpty)
  }

  test("m01 features report dims parsed from header bytes, per format") {
    val rows = Multimodal.features(spark, sf).collect()
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val expected = (id % 3) match { case 0 => "png"; case 1 => "jpeg"; case _ => "gif" }
      assert(r.getAs[String]("format") == expected)
      assert(r.getAs[Int]("width") == (id % 64 + 1).toInt)
      assert(r.getAs[Int]("height") == (id % 48 + 1).toInt)
    }
  }

  test("m02 resize shrinks payloads and clamps dims to the target") {
    val rows = Multimodal.resized(spark, sf, targetW = 8, targetH = 6).collect()
    assert(rows.nonEmpty)
    val src = Multimodal.mediaTable(spark, sf).collect()
      .map(r => r.doc_id -> r.payload.length).toMap
    rows.foreach { r =>
      assert(r.getAs[Int]("width") <= 8 && r.getAs[Int]("height") <= 6)
      assert(r.getAs[Int]("n_bytes_out") <= src(r.getAs[Long]("doc_id")))
    }
  }

  test("m03 frame sampling keeps every k-th frame of video payloads only") {
    val rows = Multimodal.frameSample(spark, sf, frameBytes = 64, every = 4).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Int]("frame_idx") % 4 == 0)
      assert(r.getAs[Int]("frame_bytes") <= 64)
      val m = r.getAs[Double]("frame_mean")
      assert(m >= 0.0 && m <= 255.0)
    }
    // only video-kind records contribute (doc_id % 3 == 2 in the fake table)
    rows.foreach(r => assert(r.getAs[Long]("doc_id") % 3 == 2))
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

  test("WAV codec round-trips, walks extra chunks, and rejects corrupt bytes") {
    import graft.multimodal.AudioHeaders
    val h = AudioHeaders.wav(44100, 2, 16, 1000L)
    assert(h.length == 44)
    val p = AudioHeaders.parseWav(h ++ Array.fill[Byte](64)(7)).get
    assert(p.sampleRate == 44100 && p.channels == 2 && p.bits == 16 &&
      p.nSamples == 1000L && p.headerLen == 44)
    // a LIST chunk between fmt and data must be skipped by declared size
    val withList = h.take(36) ++
      "LIST".getBytes("US-ASCII") ++ Array[Byte](4, 0, 0, 0) ++
      "INFO".getBytes("US-ASCII") ++ h.drop(36)
    val p2 = AudioHeaders.parseWav(withList).get
    assert(p2.nSamples == 1000L && p2.sampleRate == 44100)
    // corrupt magic / truncated / non-PCM all refuse instead of garbage
    assert(AudioHeaders.parseWav("JUNKJUNKJUNK".getBytes ++ h.drop(12)).isEmpty)
    assert(AudioHeaders.parseWav(h.take(20)).isEmpty)
    val nonPcm = h.clone(); nonPcm(20) = 3 // format tag != 1
    assert(AudioHeaders.parseWav(nonPcm).isEmpty)
  }

  test("MP4 codec round-trips v0 and v1 mvhd and refuses malformed boxes") {
    import graft.multimodal.VideoHeaders
    val b = VideoHeaders.mp4(90000, 12345)
    val p = VideoHeaders.parseMp4(b ++ "trailing-bytes".getBytes).get
    assert(p.brand == "isom" && p.timescale == 90000L && p.durationTicks == 12345L)
    // hand-build a v1 mvhd (64-bit times) and check the other layout
    def be32(v: Int) = Array((v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
    val v1body = Array[Byte](1, 0, 0, 0) ++ new Array[Byte](16) ++
      be32(1000) ++ be32(0) ++ be32(7000)
    val mvhd = be32(8 + v1body.length) ++ "mvhd".getBytes ++ v1body
    val moov = be32(8 + mvhd.length) ++ "moov".getBytes ++ mvhd
    val ftyp = be32(16) ++ "ftyp".getBytes ++ "mp42".getBytes ++ be32(0)
    val p1 = VideoHeaders.parseMp4(ftyp ++ moov).get
    assert(p1.brand == "mp42" && p1.timescale == 1000L && p1.durationTicks == 7000L)
    // malformed: missing moov, truncated, lying box size
    assert(VideoHeaders.parseMp4(ftyp).isEmpty)
    assert(VideoHeaders.parseMp4(b.take(30)).isEmpty)
    val lying = b.clone(); lying(0) = 127 // ftyp size far past the buffer
    assert(VideoHeaders.parseMp4(lying).isEmpty)
  }

  test("m06 video metadata parses every record from real MP4 boxes") {
    val rows = Multimodal.videoMeta(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("decode_ok"))
      assert(r.getAs[String]("brand") == "isom")
      assert(Set(600L, 1000L, 90000L).contains(r.getAs[Long]("timescale")))
      assert(r.getAs[Long]("duration_ms") ==
        r.getAs[Long]("duration_ticks") * 1000L / r.getAs[Long]("timescale"))
    }
  }

  test("m07 image dup clusters: every image labeled, labels are component minima") {
    val rows = Multimodal.imageDupClusters(spark, sf).collect()
    val hashes = Multimodal.perceptualHash(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("dhash")).toMap
    assert(rows.length == hashes.size, "every image gets a cluster label")
    val cluster = rows.map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster")).toMap
    cluster.foreach { case (id, c) => assert(c <= id, "label = component min id") }
    // exact-dHash duplicates are Hamming-0 pairs -> must share a cluster
    hashes.groupBy(_._2).values.filter(_.size > 1).foreach { g =>
      assert(g.map(kv => cluster(kv._1)).toSet.size == 1,
        s"identical dhash group split across clusters: $g")
    }
    val p = Multimodal.imageDupClusters(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"), p)
  }

  test("m08 audio energy decodes hand-built PCM exactly and tolerates truncation") {
    import graft.multimodal.AudioHeaders
    import spark.implicits._
    val samples = Seq(1000, -1000, 30000, -32768, 0)
    val pcm = samples.flatMap { v =>
      val u = v & 0xffff
      Seq((u & 0xff).toByte, ((u >> 8) & 0xff).toByte)
    }.toArray
    val good = AudioHeaders.wav(16000, 1, 16, samples.length.toLong) ++ pcm
    // declared 100 samples but only 2.5 present: torn-file tolerance
    val torn = AudioHeaders.wav(8000, 1, 16, 100L) ++ pcm.take(5)
    val junk = "JUNK".getBytes("US-ASCII") ++ Array.fill(60)(0.toByte)
    val res = Multimodal
      .audioEnergyOf(Seq((1L, good), (2L, torn), (3L, junk)).toDS())
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    val g = res(1L)
    assert(g.getAs[Long]("n_samples16") == 5L)
    assert(g.getAs[Long]("peak") == 32768L)
    val ss = samples.map(v => v.toLong * v).sum
    assert(math.abs(g.getAs[Double]("rms") - math.sqrt(ss.toDouble / 5)) < 1e-3)
    assert(g.getAs[Double]("clip_ratio") == 0.4) // 30000 and -32768 clip
    assert(g.getAs[Double]("dc_mean") == samples.sum / 5.0)
    val t = res(2L)
    assert(t.getAs[Boolean]("decode_ok") && t.getAs[Long]("n_samples16") == 2L)
    assert(!res(3L).getAs[Boolean]("decode_ok"))
  }

  test("m05 audio metadata parses every record from real RIFF bytes") {
    val rows = Multimodal.audioMeta(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("decode_ok"))
      assert(Set(8000, 16000, 44100).contains(r.getAs[Int]("sample_rate")))
      val id = r.getAs[Long]("doc_id")
      assert(r.getAs[Int]("channels") == (id % 2 + 1).toInt)
      assert(r.getAs[Long]("duration_us") ==
        r.getAs[Long]("n_samples") * 1000000L / r.getAs[Int]("sample_rate"))
    }
  }

  test("DQT codec round-trips the IJG quality scaling through real bytes") {
    import graft.multimodal.ImageHeaders
    // zigzag is a permutation of 0..63 (a bad constant would silently
    // reorder coefficients and the estimator below would still pass on
    // symmetric tables — pin the permutation property itself)
    assert(ImageHeaders.JpegZigZag.sorted.sameElements(0 until 64))
    for (q <- Seq(1, 3, 10, 50, 75, 90, 98, 100)) {
      val payload = ImageHeaders.jpegWithDqt(20, 10, q) ++ "body".getBytes("UTF-8")
      val tbl = ImageHeaders.parseDqt(payload)
      assert(tbl.isDefined, s"q=$q DQT did not parse")
      assert(tbl.get.sameElements(ImageHeaders.jpegQuantTable(q)),
        s"q=$q table did not round-trip through zigzag wire order")
      assert(ImageHeaders.estimateJpegQuality(tbl.get) <= q,
        s"q=$q estimate overshot") // min-q tiebreak can only go down
      assert(ImageHeaders.jpegQuantTable(
        ImageHeaders.estimateJpegQuality(tbl.get)).sameElements(tbl.get),
        s"q=$q estimate is not an exact-table match")
      // the SOF walk still recovers dims past the inserted DQT segment
      val p = ImageHeaders.parse(payload)
      assert(p.exists(x => x.width == 20 && x.height == 10), s"q=$q dims lost")
    }
    // quality-50 scale factor is 100 => the table IS the Annex-K base
    assert(ImageHeaders.jpegQuantTable(50).sameElements(ImageHeaders.JpegStdLuminance))
    // malformed: DQT-less JPEG, truncated DQT, 16-bit (Pq=1) table
    assert(ImageHeaders.parseDqt(ImageHeaders.jpeg(4, 4)).isEmpty)
    assert(ImageHeaders.parseDqt(ImageHeaders.jpegWithDqt(4, 4, 80).take(30)).isEmpty)
    val pq1 = ImageHeaders.jpegWithDqt(4, 4, 80)
    val dqtAt = {
      var i = 2
      while (!((pq1(i) & 0xff) == 0xff && (pq1(i + 1) & 0xff) == 0xdb)) i += 1
      i
    }
    pq1(dqtAt + 4) = 0x10.toByte // Pq=1
    assert(ImageHeaders.parseDqt(pq1).isEmpty)
  }

  test("EXIF codec round-trips both byte orders and rejects corrupt bytes") {
    import graft.multimodal.ExifHeaders
    for (be <- Seq(false, true)) {
      val b = ExifHeaders.jpegWithExif(640, 480, 6, "Acme Cameras", be)
      val x = ExifHeaders.parse(b).get
      assert(x.byteOrder == (if (be) "MM" else "II"))
      assert(x.width == 640 && x.height == 480)
      assert(x.orientation == 6)
      assert(x.make == "Acme Cameras") // read through the value-offset path
      assert(x.nEntries == 4)
      // the plain dim parser still sees the JFIF/SOF tail behind the APP1
      val dims = ImageHeaders.parse(b).get
      assert(dims.format == "jpeg" && dims.width == 640 && dims.height == 480)
    }
    // short Make (< 4 bytes incl. NUL) exercises the inline-value path
    val inl = ExifHeaders.parseTiff(ExifHeaders.tiffBody(8, 9, 1, "ab", false)).get
    assert(inl.make == "ab" && inl.width == 8 && inl.height == 9)
    // corrupt shapes: no APP1, truncation, bad byte-order mark, bad magic
    assert(ExifHeaders.parse(ImageHeaders.jpeg(10, 10)).isEmpty)
    assert(ExifHeaders.parse(
      ExifHeaders.jpegWithExif(10, 10, 1, "m", false).take(16)).isEmpty)
    val badOrder = ExifHeaders.tiffBody(1, 1, 1, "m", false)
    badOrder(0) = 'X'.toByte
    assert(ExifHeaders.parseTiff(badOrder).isEmpty)
    val badMagic = ExifHeaders.tiffBody(1, 1, 1, "m", true)
    badMagic(3) = 41.toByte
    assert(ExifHeaders.parseTiff(badMagic).isEmpty)
  }

  test("m10 extracts EXIF orientation and dims from real APP1 bytes") {
    val rows = Multimodal.exifMeta(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert(id % 5 == 2)
      assert(r.getAs[Boolean]("decode_ok"))
      assert(r.getAs[String]("byte_order") == (if (id % 2 == 0) "MM" else "II"))
      assert(r.getAs[Int]("orientation") == (id % 8 + 1).toInt)
      assert(r.getAs[Long]("width") == id % 512 + 16)
      assert(r.getAs[Long]("height") == id % 384 + 16)
      val transposed = r.getAs[Int]("orientation") >= 5
      assert(r.getAs[Long]("disp_width") ==
        (if (transposed) r.getAs[Long]("height") else r.getAs[Long]("width")))
      assert(r.getAs[String]("make") == s"maker${id % 7}")
    }
    // the corpus genuinely mixes endianness and transposed orientations
    assert(rows.map(_.getAs[String]("byte_order")).toSet == Set("II", "MM"))
    assert(rows.exists(_.getAs[Int]("orientation") >= 5))
  }

  test("m09 estimates encoder quality from parsed DQT bytes") {
    val rows = Multimodal.jpegQuality(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert(id % 3 == 1)
      assert(r.getAs[Boolean]("decode_ok"))
      val qTrue = ((id * 37) % 96 + 3).toInt
      // the estimate must reproduce a table identical to the true one
      // (min-q tiebreak means est <= qTrue, equal except where adjacent
      // qualities scale to the same saturated table)
      val est = r.getAs[Int]("quality_est")
      assert(est <= qTrue && est >= 1)
      assert(graft.multimodal.ImageHeaders.jpegQuantTable(est)
        .sameElements(graft.multimodal.ImageHeaders.jpegQuantTable(qTrue)))
      assert(r.getAs[Int]("dqt_min") >= 1 && r.getAs[Int]("dqt_max") <= 255)
    }
  }
}
