package graft.engine

/** North-star multimodal operators: stubbed decode over real binary-column
  * plumbing (schema, mapPartitions batch shape, generator sampling). */
class MultimodalSpec extends SparkTestBase {

  test("q70 decode: payload length scales with doc_id, dims within header range") {
    val rows = Multimodal.q70(spark, fx).collect().map(r => r.getLong(0) -> r).toMap
    // payload = md5 repeated (1 + doc_id % 4) times
    assert(rows(0L).getAs[Int]("n_bytes") === 16)
    assert(rows(1L).getAs[Int]("n_bytes") === 32)
    assert(rows(3L).getAs[Int]("n_bytes") === 64)
    rows.values.foreach { r =>
      assert(r.getAs[Int]("width") >= 1 && r.getAs[Int]("width") <= 16)
      assert(r.getAs[Int]("resized_w") >= 1)
      assert(Set("rgb", "gray", "yuv").contains(r.getAs[String]("fmt")))
    }
  }

  test("q71 frame sampling: every 2nd frame, count tracks payload size") {
    val byDoc = Multimodal.q71(spark, fx).collect().groupBy(_.getLong(0))
    // doc 3: 64 bytes → 4 frames → sampled frames 0,2
    assert(byDoc(3L).map(_.getInt(1)).toSeq.sorted === Seq(0, 2))
    assert(byDoc(0L).map(_.getInt(1)).toSeq === Seq(0)) // 1 frame
    // frame hashes are distinct per (doc, frame)
    val hashes = byDoc(3L).map(_.getString(2))
    assert(hashes.distinct.length === hashes.length)
  }

  test("q72 mapPartitions features: byte values match the digest hex pairs") {
    val feats = Multimodal.q72(spark, fx).collect().map(r => r.getLong(0) -> r).toMap
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest("alpha beta gamma delta epsilon".getBytes("UTF-8"))
    val expected = digest.take(8).map(b => (b & 0xff).toDouble / 255.0)
    val actual = (1 to 8).map(i => feats(0L).getDouble(i))
    assert(actual === expected.toSeq)
    // exact duplicate text ⇒ identical features
    assert((1 to 8).map(feats(1L).getDouble) === actual)
  }
}
