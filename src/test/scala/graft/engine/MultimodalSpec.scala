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
