package graft.api

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.SparkTestBase

/** The tokenizer → pack seam (the last stage boundary in the
  * pretraining walkthrough: gate → dedup → select → TOKENIZE → pack →
  * shuffle): bpeVocab freezes a deterministic id space from the train
  * corpus + merge list, bpeTokenIds maps bpeEncode's token strings
  * onto it losslessly, and packSequences lays the ID STREAMS out
  * exactly as it laid the token counts — so a loader that concatenates
  * each shard's ids in pack order reads a gap-free, overlap-free
  * stream whose every token decodes back to the original text. */
class TokenizePackSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val Eow = "</w>"

  private def corpus = {
    val s = spark
    import s.implicits._
    Seq(
      0L -> "abab ab cd",
      1L -> "cd cd abab",
      2L -> "b a d c",
      3L -> "abcd ab ab b").toDF("doc_id", "text")
  }

  test("bpeVocab: base chars code-unit ascending, then the marker, " +
    "then merges in rank order — 0-based contiguous ids") {
    val merges = graft.api.TextAnalysis.bpeTrain(corpus, "text", 3,
      method = "local")
    val vocab = graft.api.TextAnalysis.bpeVocab(corpus, "text", merges)
      .orderBy("id").collect().map(r => r.getInt(0) -> r.getString(1))
    val mergeToks = merges.orderBy("rank").collect()
      .map(r => r.getString(1) + r.getString(2))
    val want = (Seq("a", "b", "c", "d", Eow) ++ mergeToks)
      .distinct.zipWithIndex.map { case (t, i) => i -> t }
    assert(vocab.toSeq == want)
  }

  test("bpeVocab: a merge string colliding with an earlier symbol " +
    "keeps the earlier id (one string = one id)") {
    val s = spark
    import s.implicits._
    // hand-built trained-shaped list: rank 1 fuses (a,b) -> "ab"; a
    // corpus word "ab" would also put... chars a,b only, so inject the
    // collision via two merges producing the same string through
    // different formations is impossible with distinct ranks here —
    // instead collide merge output with a BASE char by training on a
    // corpus whose alphabet already contains the fused string: not
    // expressible with single chars, so pin the dedup rule directly:
    val merges = Seq((1, "a", "b"), (2, "a", "b")).toDF(
      "rank", "left", "right")
    val vocab = graft.api.TextAnalysis.bpeVocab(
      Seq(9L -> "ab ba").toDF("doc_id", "text"), "text", merges)
      .orderBy("id").collect().map(r => r.getInt(0) -> r.getString(1))
    assert(vocab.toSeq ==
      Seq(0 -> "a", 1 -> "b", 2 -> Eow, 3 -> "ab"))
  }

  test("bpeTokenIds: ids decode back to the exact token strings, and " +
    "their concat reproduces every word + marker (lossless through " +
    "the id layer)") {
    val s = spark
    import s.implicits._
    val merges = graft.api.TextAnalysis.bpeTrain(corpus, "text", 4,
      method = "local")
    val vocab = graft.api.TextAnalysis.bpeVocab(corpus, "text", merges)
    val enc = graft.api.TextAnalysis.bpeEncode(corpus, "doc_id", "text",
      merges)
    val ids = graft.api.TextAnalysis.bpeTokenIds(enc, "doc_id", "tokens",
      vocab)
    val idToTok = vocab.collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap
    val encToks = enc.collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val got = ids.collect()
      .map(r => (r.getLong(0), r.getSeq[Int](1), r.getInt(2))).toSeq
    assert(got.map(_._1).toSet == encToks.keySet)
    got.foreach { case (did, idSeq, nt) =>
      assert(nt == idSeq.length)
      val decoded = idSeq.map(idToTok)
      assert(decoded == encToks(did),
        s"doc $did ids decode to $decoded, encode emitted ${encToks(did)}")
      val text = corpus.filter(col("doc_id") === did)
        .head().getString(1)
      assert(decoded.mkString ==
        text.split(" ", -1).map(_ + Eow).mkString)
    }
  }

  test("bpeTokenIds: an out-of-vocabulary token fails loudly without " +
    "unkId and maps to it when given") {
    val s = spark
    import s.implicits._
    val merges = graft.api.TextAnalysis.bpeTrain(corpus, "text", 2,
      method = "local")
    val vocab = graft.api.TextAnalysis.bpeVocab(corpus, "text", merges)
    val alien = Seq(7L -> "az").toDF("doc_id", "text") // 'z' unseen
    val encAlien = graft.api.TextAnalysis.bpeEncode(alien, "doc_id",
      "text", merges)
    val e = intercept[Exception] {
      graft.api.TextAnalysis.bpeTokenIds(encAlien, "doc_id", "tokens",
        vocab).collect()
    }
    assert(e.getMessage.contains("not in the vocabulary") ||
      Option(e.getCause).exists(_.getMessage.contains(
        "not in the vocabulary")))
    val mapped = graft.api.TextAnalysis.bpeTokenIds(encAlien, "doc_id",
        "tokens", vocab, unkId = Some(-1))
      .head().getSeq[Int](1)
    assert(mapped.contains(-1))
    assert(mapped.count(_ == -1) == 1) // only 'z' is alien
  }

  test("pack(bpeTokenIds(bpeEncode(docs))): per-shard offsets tile the " +
    "id stream with no gap or overlap, and the layout is the one the " +
    "token-count frame produces") {
    val s = spark
    import s.implicits._
    val merges = graft.api.TextAnalysis.bpeTrain(corpus, "text", 3,
      method = "local")
    val vocab = graft.api.TextAnalysis.bpeVocab(corpus, "text", merges)
    val enc = graft.api.TextAnalysis.bpeEncode(corpus, "doc_id", "text",
      merges)
    val ids = graft.api.TextAnalysis.bpeTokenIds(enc, "doc_id", "tokens",
      vocab)
    val packed = GraftOps.packSequences(ids, "doc_id", "n_tokens",
      seqLen = 4L, nShards = 2)
    val rows = packed
      .select("doc_id", "shard", "pack_off", "n_tokens")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getInt(3)))
    // tiling: within each shard the sorted offsets are a running sum —
    // stream position nt(i) ends exactly where doc i+1 begins
    rows.groupBy(_._2).foreach { case (_, docs) =>
      val sorted = docs.sortBy(_._3)
      assert(sorted.head._3 == 0L)
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(b._3 == a._3 + a._4)
        case _ => ()
      }
    }
    // total stream length = total BPE tokens (nothing dropped or padded
    // before the final partial sequence)
    assert(rows.map(_._4.toLong).sum ==
      enc.agg(sum("n_tokens")).head().getLong(0))
    // the layout is a pure function of (id, n_tokens): the id frame and
    // the count-only frame place every doc identically
    val fromCounts = GraftOps.packSequences(
        enc.select(col("doc_id"), col("n_tokens")), "doc_id", "n_tokens",
        seqLen = 4L, nShards = 2)
      .select("doc_id", "shard", "pack_off").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(rows.map(r => (r._1, r._2, r._3)).toSet == fromCounts)
  }

  // ─────────────────── vocab store (11th family) ───────────────────

  private def idsOf(df: org.apache.spark.sql.DataFrame) = df
    .collect().map(r => r.getLong(0) -> r.getSeq[Int](1).toList).toMap

  test("vocabStoreTokenize(B | store) ≡ bpeTokenIds(bpeEncode(B), " +
    "bpeVocab) under the frozen vocab — the store law") {
    val merges = graft.api.TextAnalysis.bpeTrain(corpus, "text", 4,
      method = "local")
    val dir = java.nio.file.Files.createTempDirectory("graft_vs_")
      .toString
    graft.api.TextAnalysis.vocabStoreBuild(corpus, "text", merges, dir)
    val direct = graft.api.TextAnalysis.bpeTokenIds(
      graft.api.TextAnalysis.bpeEncode(corpus, "doc_id", "text", merges),
      "doc_id", "tokens",
      graft.api.TextAnalysis.bpeVocab(corpus, "text", merges))
    val served = graft.api.TextAnalysis.vocabStoreTokenize(
      corpus, "doc_id", "text", dir)
    assert(idsOf(served) == idsOf(direct))
  }

  test("vocab store: appended tokens get fresh contiguous ids above " +
    "the frozen prefix, existing ids never move, and tokenize of a " +
    "non-OOV batch is unchanged") {
    val s = spark
    val merges = graft.api.TextAnalysis.bpeTrain(corpus, "text", 3,
      method = "local")
    val dir = java.nio.file.Files.createTempDirectory("graft_vs_")
      .toString
    graft.api.TextAnalysis.vocabStoreBuild(corpus, "text", merges, dir)
    val before = graft.api.TextAnalysis.vocabStoreVocab(s, dir)
      .collect().map(r => r.getInt(0) -> r.getString(1)).sortBy(_._1)
    val beforeIds = idsOf(
      graft.api.TextAnalysis.vocabStoreTokenize(corpus, "doc_id",
        "text", dir))
    graft.api.TextAnalysis.vocabStoreAppendTokens(s,
      Seq("<unk>", "<pad>"), dir)
    val after = graft.api.TextAnalysis.vocabStoreVocab(s, dir)
      .collect().map(r => r.getInt(0) -> r.getString(1)).sortBy(_._1)
    assert(after.take(before.length).toSeq == before.toSeq,
      "the frozen prefix renumbered")
    assert(after.drop(before.length).toSeq ==
      Seq(before.length -> "<unk>", (before.length + 1) -> "<pad>"))
    assert(idsOf(graft.api.TextAnalysis.vocabStoreTokenize(corpus,
      "doc_id", "text", dir)) == beforeIds)
  }

  test("vocab store OOV policy: fail-loud bare, mapped under a " +
    "REGISTERED unk token, loud under an unregistered one; re-adding " +
    "an existing token and in-batch duplicates are loud") {
    val s = spark
    import s.implicits._
    val merges = graft.api.TextAnalysis.bpeTrain(corpus, "text", 2,
      method = "local")
    val dir = java.nio.file.Files.createTempDirectory("graft_vs_")
      .toString
    graft.api.TextAnalysis.vocabStoreBuild(corpus, "text", merges, dir)
    val alien = Seq(7L -> "az").toDF("doc_id", "text") // 'z' unseen
    val e1 = intercept[Exception] {
      graft.api.TextAnalysis.vocabStoreTokenize(alien, "doc_id", "text",
        dir).collect()
    }
    assert(e1.getMessage.contains("not in the vocabulary") ||
      Option(e1.getCause).exists(_.getMessage.contains(
        "not in the vocabulary")))
    val e2 = intercept[IllegalArgumentException] {
      graft.api.TextAnalysis.vocabStoreTokenize(alien, "doc_id", "text",
        dir, unkToken = Some("<unk>"))
    }
    assert(e2.getMessage.contains("register it first"))
    graft.api.TextAnalysis.vocabStoreAppendTokens(s, Seq("<unk>"), dir)
    val unkId = graft.api.TextAnalysis.vocabStoreVocab(s, dir)
      .filter(col("token") === "<unk>").head().getInt(0)
    val mapped = graft.api.TextAnalysis.vocabStoreTokenize(alien,
        "doc_id", "text", dir, unkToken = Some("<unk>"))
      .head().getSeq[Int](1)
    assert(mapped.count(_ == unkId) == 1) // only 'z' is alien
    val e3 = intercept[IllegalArgumentException] {
      graft.api.TextAnalysis.vocabStoreAppendTokens(s, Seq("<unk>"), dir)
    }
    assert(e3.getMessage.contains("already in the vocabulary"))
    val e4 = intercept[IllegalArgumentException] {
      graft.api.TextAnalysis.vocabStoreAppendTokens(s,
        Seq("<bos>", "<bos>"), dir)
    }
    assert(e4.getMessage.contains("duplicate token"))
  }

  test("vocab store replay: a re-delivered append batchId is a no-op " +
    "(ids and segments flat), below the watermark fails loudly") {
    val s = spark
    val merges = graft.api.TextAnalysis.bpeTrain(corpus, "text", 2,
      method = "local")
    val dir = java.nio.file.Files.createTempDirectory("graft_vs_")
      .toString
    graft.api.TextAnalysis.vocabStoreBuild(corpus, "text", merges, dir)
    graft.api.TextAnalysis.vocabStoreAppendTokens(s, Seq("<unk>"), dir,
      batchId = Some(5L))
    val snap = () => graft.api.TextAnalysis.vocabStoreVocab(s, dir)
      .collect().map(r => r.getInt(0) -> r.getString(1)).toSet
    val afterFirst = snap()
    // replay: same batch id, same tokens — the crash-recovery shape
    graft.api.TextAnalysis.vocabStoreAppendTokens(s, Seq("<unk>"), dir,
      batchId = Some(5L))
    assert(snap() == afterFirst, "a replayed append changed the vocab")
    val e = intercept[IllegalArgumentException] {
      graft.api.TextAnalysis.vocabStoreAppendTokens(s, Seq("<pad>"), dir,
        batchId = Some(3L))
    }
    assert(e.getMessage.contains("below the append replay watermark"))
  }
}
