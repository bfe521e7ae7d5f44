package graft.engine

/** North-star multimodal operators: REAL javax.imageio PNG codec over the
  * binary-column plumbing (schema, mapPartitions batch shape, generator
  * sampling). Expected values are recomputed here from the pixel formula —
  * agreement proves the encode→PNG→decode round trip is lossless and the
  * emitted facts really come off the decoded raster. */
class MultimodalSpec extends SparkTestBase {

  private def md5Byte(text: String, i: Int): Int =
    java.security.MessageDigest.getInstance("MD5")
      .digest(text.getBytes("UTF-8"))(i) & 0xff

  private def px(docId: Long, frame: Int, x: Int, y: Int): Int =
    ((docId * 31 + frame * 7 + y * 16 + x) % 256).toInt

  private val d0 = "alpha beta gamma delta epsilon"

  test("q70 decode: decoded dims/bands/raster size match the closed forms; " +
    "gray and rgb PNGs both round-trip") {
    val rows = Multimodal.q70(spark, fx).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(rows.size === 4)
    for ((id, text) <- Seq(0L -> d0, 1L -> d0,
        2L -> "alpha beta gamma delta zeta", 3L -> "omega psi chi")) {
      val (w, h) = (md5Byte(text, 0) % 16 + 1, md5Byte(text, 1) % 16 + 1)
      val gray = md5Byte(text, 2) % 2 == 1
      val r = rows(id)
      assert(r.getAs[Int]("width") === w && r.getAs[Int]("height") === h)
      assert(r.getAs[String]("fmt") === (if (gray) "gray" else "rgb"))
      assert(r.getAs[Int]("n_bytes") === w * h * (if (gray) 1 else 3))
      assert(r.getAs[Int]("frames") === (id % 4 + 1).toInt)
      assert(r.getAs[Int]("resized_w") === math.max(w / 2, 1))
      assert(r.getAs[Int]("resized_h") === math.max(h / 2, 1))
    }
    // the fixture must exercise BOTH pixel formats
    assert(rows.values.map(_.getAs[String]("fmt")).toSet === Set("rgb", "gray"))
  }

  test("q71 frame sampling: every 2nd frame, decoded red-channel sums " +
    "equal the pixel formula") {
    val byDoc = Multimodal.q71(spark, fx).collect().groupBy(_.getLong(0))
    // doc 3: 4 frames → sampled 0, 2; doc 0: 1 frame → frame 0 only
    assert(byDoc(3L).map(_.getInt(1)).toSeq.sorted === Seq(0, 2))
    assert(byDoc(0L).map(_.getInt(1)).toSeq === Seq(0))
    val (w3, h3) = (md5Byte("omega psi chi", 0) % 16 + 1,
      md5Byte("omega psi chi", 1) % 16 + 1)
    for (row <- byDoc(3L)) {
      val f = row.getInt(1)
      val expected = (for (y <- 0 until h3; x <- 0 until w3)
        yield px(3L, f, x, y).toLong).sum
      assert(row.getLong(2) === expected,
        s"decoded pixel sum must match the formula for frame $f")
    }
  }

  test("q72 decoded features: red values match the pixel formula and wrap " +
    "past the raster end; duplicate text ⇒ dims match but features differ " +
    "by doc id") {
    val feats = Multimodal.q72(spark, fx).collect()
      .map(r => r.getLong(0) -> r).toMap
    val (w, h) = (md5Byte(d0, 0) % 16 + 1, md5Byte(d0, 1) % 16 + 1)
    for (id <- Seq(0L, 1L)) {
      val expected = (0 until 8).map { i =>
        val j = i % (w * h)
        px(id, 0, j % w, j / w).toDouble / 255.0
      }
      assert((1 to 8).map(feats(id).getDouble) === expected,
        s"doc $id features must come off the decoded raster")
    }
    // pixel formula is doc-id-seeded: the exact-dup TEXT pair 0/1 shares
    // dims but not pixels (features are per-document, not per-content)
    assert((1 to 8).map(feats(0L).getDouble) !==
      (1 to 8).map(feats(1L).getDouble))
  }

  // ---------------------- video container (q150) ----------------------

  test("q150 video container: one animated GIF per doc, frame count read " +
    "off the container, every frame's gray sum matches the pixel formula") {
    val rows = Multimodal.q150(spark, fx).collect()
    val byDoc = rows.groupBy(_.getLong(0))
    assert(byDoc.keySet === Set(0L, 1L, 2L, 3L))
    for ((id, text) <- Seq(0L -> d0, 1L -> d0,
        2L -> "alpha beta gamma delta zeta", 3L -> "omega psi chi")) {
      val (w, h) = (md5Byte(text, 0) % 16 + 1, md5Byte(text, 1) % 16 + 1)
      val frames = (id % 4 + 1).toInt
      val docRows = byDoc(id).sortBy(_.getInt(1))
      assert(docRows.map(_.getInt(1)).toSeq === (0 until frames),
        s"doc $id: all frames, in order, from the container directory")
      for (row <- docRows) {
        assert(row.getInt(2) === frames)
        val f = row.getInt(1)
        val expected = (for (y <- 0 until h; x <- 0 until w)
          yield px(id, f, x, y).toLong).sum
        assert(row.getLong(3) === expected,
          s"doc $id frame $f: GIF-decoded sum must match the formula")
      }
    }
    // the fixture exercises multi-frame containers (doc 3 has 4 frames)
    assert(byDoc(3L).length === 4)
  }

  test("q150 malformed containers fail loudly, naming the doc: non-GIF " +
    "bytes and a frame count contradicting the carried spec") {
    val s = spark
    import s.implicits._
    val e1 = intercept[org.apache.spark.SparkException] {
      Multimodal.videoFrames(Seq(
        GifPayload(11L, 1, "not a gif".getBytes("UTF-8"))).toDS()).collect()
    }
    val m1 = Option(e1.getCause).fold(e1.getMessage)(_.getMessage)
    assert(m1.contains("video decode failed for doc 11"), m1)
    // a REAL 2-frame GIF carried with a spec claiming 3 — the truncated-
    // tail shape the count cross-check exists for
    val twoFrame = {
      val bos = new java.io.ByteArrayOutputStream()
      val wtr = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
      val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
      wtr.setOutput(ios); wtr.prepareWriteSequence(null)
      for (f <- 0 until 2) {
        val img = new java.awt.image.BufferedImage(3, 3,
          java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
        val meta = wtr.getDefaultImageMetadata(
          new javax.imageio.ImageTypeSpecifier(img),
          wtr.getDefaultWriteParam)
        wtr.writeToSequence(new javax.imageio.IIOImage(img, null, meta), null)
      }
      wtr.endWriteSequence(); wtr.dispose(); ios.close()
      bos.toByteArray
    }
    val e2 = intercept[org.apache.spark.SparkException] {
      Multimodal.videoFrames(Seq(
        GifPayload(12L, 3, twoFrame)).toDS()).collect()
    }
    val m2 = Option(e2.getCause).fold(e2.getMessage)(_.getMessage)
    assert(m2.contains("video decode failed for doc 12") &&
      m2.contains("container has 2 frames"), m2)
  }

  // ------------------------- audio (q149) -------------------------

  private def sample(docId: Long, i: Int): Int =
    (((docId * 31 + i.toLong * 7) % 65536) - 32768).toInt

  private def audioSpec(text: String): (Int, Int) = (
    if (md5Byte(text, 3) % 2 == 0) 8000 else 16000,
    (md5Byte(text, 4) * 3 + md5Byte(text, 5)) % 800 + 200)

  test("q149 audio windows: rate/duration come off the parsed header and " +
    "per-window abs-sum/peak match the sample formula, partial tail " +
    "window included") {
    val byDoc = Multimodal.q149(spark, fx).collect().groupBy(_.getLong(0))
    assert(byDoc.keySet === Set(0L, 1L, 2L, 3L))
    for ((id, text) <- Seq(0L -> d0, 1L -> d0,
        2L -> "alpha beta gamma delta zeta", 3L -> "omega psi chi")) {
      val (rate, n) = audioSpec(text)
      val rows = byDoc(id).sortBy(_.getInt(1))
      assert(rows.length === (n + 255) / 256, s"doc $id window count")
      for ((row, w) <- rows.zipWithIndex) {
        val lo = w * 256
        val hi = math.min(lo + 256, n)
        val abss = (lo until hi).map(i => math.abs(sample(id, i)).toLong)
        assert(row.getInt(1) === w)
        assert(row.getInt(2) === hi - lo, s"doc $id window $w width")
        assert(row.getLong(3) === abss.sum, s"doc $id window $w abs_sum")
        assert(row.getInt(4) === abss.max.toInt, s"doc $id window $w peak")
        assert(row.getInt(5) === rate)
        assert(row.getLong(6) === n.toLong * 1000 / rate)
      }
    }
    // the fixture must exercise both rates and at least one partial tail
    assert(byDoc.values.flatten.map(_.getInt(5)).toSet === Set(8000, 16000))
    assert(byDoc.values.exists(_.exists(r => r.getInt(2) < 256)))
  }

  test("q149 parser is a real chunk walk: an odd-sized junk chunk " +
    "(pad byte per the RIFF spec) before fmt/data parses identically") {
    val s = spark
    import s.implicits._
    // canonical WAV for doc 5, then the same samples re-wrapped with a
    // 3-byte 'LIST' chunk (+1 pad) inserted before fmt
    val n = 300
    val rate = 8000
    def le32(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte,
      (v >> 16).toByte, (v >> 24).toByte)
    def le16(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte)
    val data = (0 until n).flatMap(i => le16(sample(5L, i) & 0xffff))
    val junk = "LIST".getBytes("US-ASCII") ++ le32(3) ++
      Array[Byte](9, 9, 9, 0) // 3 junk bytes + 1 pad
    val fmt = "fmt ".getBytes("US-ASCII") ++ le32(16) ++ le16(1) ++
      le16(1) ++ le32(rate) ++ le32(rate * 2) ++ le16(2) ++ le16(16)
    val dch = "data".getBytes("US-ASCII") ++ le32(2 * n) ++ data
    val body = junk ++ fmt ++ dch
    val wav = "RIFF".getBytes("US-ASCII") ++ le32(4 + body.length) ++
      "WAVE".getBytes("US-ASCII") ++ body
    val rows = Multimodal.audioWindows(
        Seq(AuPayload(5L, wav)).toDS()).collect().sortBy(_.win_idx)
    assert(rows.length === 2)
    assert(rows.map(_.n_in_win).toSeq === Seq(256, 44))
    assert(rows.head.abs_sum ===
      (0 until 256).map(i => math.abs(sample(5L, i)).toLong).sum)
    assert(rows.head.rate === rate && rows.head.dur_ms === n * 1000L / rate)
  }

  test("malformed audio payloads fail loudly, naming the doc: bad magic, " +
    "truncated chunk, data before fmt, stereo layout") {
    val s = spark
    import s.implicits._
    def le32(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte,
      (v >> 16).toByte, (v >> 24).toByte)
    def le16(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte)
    val fmtStereo = "fmt ".getBytes("US-ASCII") ++ le32(16) ++ le16(1) ++
      le16(2) ++ le32(8000) ++ le32(32000) ++ le16(4) ++ le16(16)
    val bad = Seq(
      AuPayload(7L, "not audio at all".getBytes("UTF-8")),
      AuPayload(8L, "RIFF".getBytes("US-ASCII") ++ le32(100) ++
        "WAVE".getBytes("US-ASCII") ++
        "data".getBytes("US-ASCII") ++ le32(999)), // truncated + before fmt
      AuPayload(9L, "RIFF".getBytes("US-ASCII") ++ le32(4 + fmtStereo.length) ++
        "WAVE".getBytes("US-ASCII") ++ fmtStereo ++
        "data".getBytes("US-ASCII") ++ le32(0)))
    for (p <- bad) {
      val e = intercept[org.apache.spark.SparkException] {
        Multimodal.audioWindows(Seq(p).toDS()).collect()
      }
      val msg = Option(e.getCause).fold(e.getMessage)(_.getMessage)
      assert(msg.contains(s"audio decode failed for doc ${p.doc_id}"),
        s"doc ${p.doc_id}: got $msg")
    }
  }

  test("corrupt payload: the decode stage fails loudly, naming the doc") {
    val s = spark
    import s.implicits._
    val bad = Seq(
      MmPayload(7L, Array[Byte](1, 2, 3, 4)),
      MmPayload(8L, "definitely not a png".getBytes("UTF-8"))).toDS()
    val e = intercept[org.apache.spark.SparkException] {
      Multimodal.decodeFeatures(bad).collect()
    }
    val msg = Option(e.getCause).fold(e.getMessage)(_.getMessage)
    assert(msg.contains("multimodal decode failed for doc"))
  }
}
