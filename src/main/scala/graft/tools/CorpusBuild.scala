package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** The worked end-to-end TRAINING-CORPUS BUILD — the README's runnable
  * reference for the packing side of the library, the stage after
  * [[IndexLifecycle]]'s curation loop has frozen a survivor set. Every
  * step's output is ASSERTED (the suite runs [[run]] as a drift check;
  * `main` is the standalone form):
  *
  *  0. DISTRIBUTION-GATED INTAKE: a raw crawl scores against a clean
  *     seed before curation ever sees it — [[graft.api.GraftOps
  *     .dsirSelect]] keeps the target-like docs and
  *     [[graft.api.GraftOps.lmPerplexity]] names the degenerate
  *     outlier (relative ratio + absolute fluency, the two
  *     complementary distribution signals);
  *  0b. the INCREMENTAL twin: the pool/seed counts persist once in a
  *     [[graft.api.GraftOps.dsirStatsBuild]] store (relative ratio)
  *     and a [[graft.api.GraftOps.lmStatsBuild]] store (absolute
  *     fluency — read-only under the step, the frozen-reference
  *     contract), and [[graft.api.CurationPipeline.curateIncremental]]
  *     gates an arriving batch against BOTH (`dsirStatsDir` +
  *     `lmStatsDir`) composed in front of its dedup stages — each
  *     drop names its stage (spam falls to the distribution gates,
  *     the 80%-overlap doc to near-dup), and the seed is never
  *     re-counted per batch;
  *  0c. TOKENIZE the curated corpus — the stage that closes the
  *     string-typed part of the pipeline: [[graft.api.TextAnalysis
  *     .bpeTrain]] learns the merge list on the survivors,
  *     [[graft.api.TextAnalysis.bpeVocab]] freezes the id space,
  *     [[graft.api.TextAnalysis.bpeEncode]] +
  *     [[graft.api.TextAnalysis.bpeTokenIds]] emit per-doc id streams,
  *     and [[graft.api.GraftOps.packSequences]] lays the ID streams
  *     out — offsets tile each shard with no gap or overlap, every id
  *     decodes back to the original text (the walkthrough now runs
  *     gate → dedup → select → tokenize → pack → shuffle end-to-end);
  *  1. FREEZE the curated corpus's layout behind a pack index
  *     ([[graft.api.GraftOps.packIndexBuild]]) — the returned layout is
  *     byte-identical to one-shot [[graft.api.GraftOps.packSequences]];
  *  2. MATERIALIZE the loader-facing manifest
  *     ([[graft.api.GraftOps.packLayoutRows]]) — slices tile every
  *     sequence exactly;
  *  3. a REFRESH arrives: [[graft.api.GraftOps.corpusDiff]] audits the
  *     new snapshot against the frozen corpus — `added` rows go on to
  *     the append, and the `removed` work-list drives the erasure
  *     steps (4–5) instead of being dropped on the floor;
  *  4. RETRACT the removed doc from the corpus's dedup index
  *     ([[graft.api.GraftOps.digestIndexRetract]]) — re-ingests of its
  *     content are accepted again, while still-indexed content keeps
  *     gating (the full add/change/remove cycle, not just adds);
  *  4b. RE-CLUSTER ([[graft.api.GraftOps.clusterRetract]] +
  *     compact): the same removed work-list takes the doc out of the
  *     near-dup cluster store — resolve never shows it again, and the
  *     compact re-derives affected components from surviving edges;
  *  5. MASK the removed doc's packed spans
  *     ([[graft.api.GraftOps.packSkipManifest]]) — the frozen layout
  *     cannot unpack history, so removal there is a loader-side
  *     skip-manifest: exactly the doc's manifest rows, nothing else;
  *  6. APPEND the fresh docs ([[graft.api.GraftOps.packIndexAppend]])
  *     — history's manifest rows are UNCHANGED row-for-row (the reason
  *     the index exists), the batch tiles each shard stream right after
  *     the recorded lengths;
  *  7. ORDER an epoch ([[graft.api.GraftOps.epochShuffle]]) over the
  *     union's sequences — a seed-keyed permutation per shard,
  *     reproducible on re-run, re-drawn under a new seed.
  *
  * Run: `sbt "runMain graft.tools.CorpusBuild"` — prints one OK line
  * per step and exits nonzero on any drift. */
object CorpusBuild {

  def run(spark: SparkSession): Unit = {
    import spark.implicits._
    import graft.api.GraftOps
    val dir = graft.engine.Tables.scratchDir("graft_corpusbuild_")
    def check(name: String, cond: Boolean): Unit = {
      require(cond, s"corpus-build step FAILED: $name")
      println(s"  OK $name")
    }
    val seqLen = 8L
    def withToks(rows: Seq[(Long, String)]) =
      rows.toDF("doc_id", "text").withColumn("nt",
        size(split(col("text"), " ")).cast("long"))

    // the curated corpus (IndexLifecycle's survivor shape)
    val corpus = Seq(
      0L -> "alpha beta gamma delta epsilon",
      2L -> "one two three four five six seven",
      11L -> "totally new words arrive here",
      20L -> "alpha beta gamma delta zeta")

    // 0. DISTRIBUTION-GATED INTAKE — the stage before curation ever
    // sees a doc: a raw crawl scores against a clean seed; the DSIR
    // ratio (q138) keeps what looks like the target, the LM-perplexity
    // gate (q139) names the degenerate outlier. The two signals are
    // complementary by construction (relative ratio vs absolute
    // fluency) and both are asserted here on the same batch.
    val seed = Seq("alpha beta gamma delta", "one two three four")
      .toDF("text")
    val crawl = Seq(
      40L -> "alpha beta gamma epsilon", // target-like → selected
      41L -> "zz zz zz zz zz zz", // degenerate OOV spam
      42L -> "one two three nine") // target-like → selected
      .toDF("doc_id", "text")
    val kept = GraftOps.dsirSelect(crawl, "doc_id", "text", seed,
        "text", k = 2)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    check("intake: DSIR keeps the two target-like docs and drops the " +
      "spam", kept == Set(40L, 42L))
    val ppl = GraftOps.lmPerplexity(crawl, "doc_id", "text", seed,
        "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    check("intake: the OOV spam is the most perplexing under the seed " +
      "LM", ppl(41L) == ppl.values.max && ppl(40L) < ppl(41L))

    // 0b. the INCREMENTAL twin of step 0 — production intake doesn't
    // re-count the seed per batch: the pool and seed counts persist
    // once in a dsirStats store (q140) and curateIncremental gates each
    // ARRIVING batch against it (dsirStatsDir), composed in front of
    // its dedup stages; the batch's own counts then append to the raw
    // side so the reference distribution tracks arrivals. Repetition
    // dials are opened wide so the assertion isolates the distribution
    // gate — the spam doc must fall to DSIR, not the rep gate.
    val sDir = graft.engine.Tables.scratchDir("graft_cb_dsir_")
    val fDir = graft.engine.Tables.scratchDir("graft_cb_fp_")
    GraftOps.dsirStatsBuild(corpus.toDF("doc_id", "text"), "doc_id",
      "text", seed, "text", sDir, nBuckets = 8)
    GraftOps.fingerprintBuild(corpus.toDF("doc_id", "text"), "doc_id",
      "text", fDir)
    val sc = GraftOps.dsirScoreAgainstStats(crawl, "doc_id", "text", sDir)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    check("incremental intake: the store-scores order the spam below " +
      "both target-like docs", sc(41L) < sc(40L) && sc(41L) < sc(42L))
    val thr = (sc(41L) + math.min(sc(40L), sc(42L))) / 2
    // the ABSOLUTE twin rides the same step: the seed's LM counts
    // persist once (lmStatsBuild — read-only under the step, the
    // frozen-reference contract) and the store-probe reproduces step
    // 0's one-shot perplexities exactly, so the same spam doc fails
    // BOTH distribution signals in one composed call
    val lDir = graft.engine.Tables.scratchDir("graft_cb_lm_")
    GraftOps.lmStatsBuild(seed, "text", lDir, nBuckets = 8)
    val pplStore = GraftOps.lmPerplexityAgainstStats(crawl, "doc_id",
        "text", lDir)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // equal to the shared 4dp rounding boundary — FP aggregation order
    // can flip a boundary-straddling round(,4), so compare with the one-
    // 4dp-ulp tolerance the LmStatsProps property suite pins, not ==
    check("incremental intake: the store-probe reproduces the one-shot " +
      "perplexities to the 4dp boundary",
      pplStore.keySet == ppl.keySet && ppl.keys.forall(k =>
        math.abs(pplStore(k) - ppl(k)) <= 1.01e-4))
    val pplThr = (ppl(41L) + ppl.values.filter(_ < ppl(41L)).max) / 2
    val gatedSurvivors = graft.api.CurationPipeline.curateIncremental(
        crawl, "doc_id", "text", fDir,
        maxDupWordFrac = 1.0, maxTopWordRatio = 1.0,
        maxDupBigramFrac = 1.0,
        dsirStatsDir = Some(sDir), minDsirScore = thr,
        lmStatsDir = Some(lDir), maxPpl = pplThr)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // each drop names its stage: 41 falls to the DISTRIBUTION gate (it
    // is nobody's near-dup — without the gate it would survive), 40 to
    // the NEAR-DUP stage (J("alpha beta gamma epsilon", corpus doc 0)
    // = 4/5 ≥ 80%), 42 passes both — one composed call, no seed
    // re-count
    check("incremental intake: the composed gates drop the spam (DSIR " +
      "AND perplexity agree) and the near-dup stage drops the " +
      "80%-overlap doc", gatedSurvivors == Set(42L))

    // 0d. the LEARNED gate's incremental form (q147): the classifier's
    // training corpus lives in a clf store, so a LABELING ERROR can be
    // erased — a spam doc mislabeled as reference taught the gate that
    // spam words are good; retracting it and retraining (O(feature
    // rows), no history text re-read) flips the gate's verdict on a
    // spam lookalike, end-to-end through curateIncremental
    val clfDir = graft.engine.Tables.scratchDir("corpus_clf_")
    graft.api.TextAnalysis.clfStoreBuild(Seq(
        (1L, "alpha beta gamma", 1), (2L, "alpha gamma delta", 1),
        (3L, "buy pills now", 0), (4L, "pills cheap buy", 0),
        (5L, "buy pills cheap", 1)) // the mislabeled spam
        .toDF("doc_id", "text", "label"),
      "doc_id", "text", "label", clfDir, numFeatures = 64)
    val probe = Seq(60L -> "buy pills fast").toDF("doc_id", "text")
    def probeScore(): Double = graft.api.TextAnalysis.qualityScore(probe,
      "doc_id", "text", graft.api.TextAnalysis
        .trainClassifierAgainstStore(spark, clfDir, iters = 10))
      .head().getDouble(1)
    val poisoned = probeScore()
    graft.api.TextAnalysis.clfStoreRetract(
      Seq((5L, "buy pills cheap", 1)).toDF("doc_id", "text", "label"),
      "doc_id", "text", "label", clfDir)
    val fixed = probeScore()
    check("clf store: erasing the mislabeled doc makes the retrained " +
      "gate stricter on its lookalikes", fixed < poisoned)
    val clfThr = (fixed + poisoned) / 2
    val clfModel = graft.api.TextAnalysis.trainClassifierAgainstStore(
      spark, clfDir, iters = 10)
    val clfGate = graft.api.CurationPipeline.curateIncremental(
        probe, "doc_id", "text", fDir,
        maxDupWordFrac = 1.0, maxTopWordRatio = 1.0,
        maxDupBigramFrac = 1.0, appendToIndex = false,
        qualityModel = Some(clfModel), minQuality = clfThr)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    check("clf store: the retrained model drops the spam lookalike in " +
      "the composed pipeline where the poisoned one admitted it",
      clfGate.isEmpty)

    // 0c. TOKENIZE: the curated survivors train their own tokenizer,
    // the frozen vocab maps encode output to id streams, and the pack
    // layout of the ID frame is the layout of its token counts —
    // gate → dedup → select → tokenize → pack, no string-typed seam left
    val corpusDf = corpus.toDF("doc_id", "text")
    val bpeMerges = graft.api.TextAnalysis.bpeTrain(corpusDf, "text", 6,
      method = "local")
    val bpeVoc = graft.api.TextAnalysis.bpeVocab(corpusDf, "text",
      bpeMerges)
    val bpeEnc = graft.api.TextAnalysis.bpeEncode(corpusDf, "doc_id",
      "text", bpeMerges)
    val bpeIds = graft.api.TextAnalysis.bpeTokenIds(bpeEnc, "doc_id",
      "tokens", bpeVoc)
    val idToTok = bpeVoc.collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap
    val decodedOk = bpeIds.collect().forall { r =>
      val did = r.getLong(0)
      val text = corpus.toMap.apply(did)
      r.getSeq[Int](1).map(idToTok).mkString ==
        text.split(" ", -1).map(_ + "</w>").mkString
    }
    check("tokenize: every id stream decodes back to its document " +
      "(word + marker, lossless through the frozen vocab)", decodedOk)
    val tokPacked = GraftOps.packSequences(bpeIds, "doc_id", "n_tokens",
        seqLen, nShards = 2)
      .select("shard", "pack_off", "n_tokens").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getInt(2)))
    val tokTiled = tokPacked.groupBy(_._1).forall { case (_, docs) =>
      val sorted = docs.sortBy(_._2)
      sorted.head._2 == 0L && sorted.sliding(2).forall {
        case Array(a, b) => b._2 == a._2 + a._3
        case _ => true
      }
    }
    check("tokenize: the packed id streams tile each shard with no " +
      "gap or overlap", tokTiled && tokPacked.nonEmpty)

    // 1. freeze the layout behind the pack index
    val laid = GraftOps.packIndexBuild(withToks(corpus), "doc_id", "nt",
      dir, seqLen, nShards = 2)
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getInt(2), r.getLong(3))
    val oneShot = GraftOps.packSequences(withToks(corpus), "doc_id", "nt",
      seqLen, 2).select("doc_id", "nt", "shard", "pack_off")
    check("build returns the one-shot layout byte-for-byte",
      laid.select("doc_id", "nt", "shard", "pack_off").collect().map(key)
        .toSet == oneShot.collect().map(key).toSet)

    // 2. the loader-facing manifest tiles every sequence
    def manifest(l: org.apache.spark.sql.DataFrame) =
      GraftOps.packLayoutRows(l, "nt", seqLen)
        .select("doc_id", "shard", "seq_id", "doc_from", "doc_to",
          "seq_from").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5)))
    val hist = manifest(laid)
    val tiled = hist.groupBy(r => (r._2, r._3)).forall { case (_, slices) =>
      val sorted = slices.sortBy(_._6)
      sorted.head._6 == 0L && sorted.sliding(2).forall {
        case Array(a, b) => b._6 == a._6 + (a._5 - a._4)
        case _ => true
      }
    }
    check("manifest slices tile every sequence with no gap or overlap",
      tiled && hist.nonEmpty)

    // 3. a refresh: diff the new snapshot — added rows feed the append,
    // the removed work-list feeds the erasure steps below
    val refreshed = corpus.filterNot(_._1 == 11L) ++ Seq(
      30L -> "fresh crawl content lands now",
      31L -> "more fresh words to pack tightly")
    val diff = GraftOps.corpusDiff(withToks(corpus), withToks(refreshed),
        "doc_id", Seq("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    check("diff reports the removal and both arrivals",
      diff == Map(11L -> "removed", 30L -> "added", 31L -> "added"))
    val fresh = refreshed.filter(d => diff.get(d._1).contains("added"))
    val removedIds = diff.collect { case (id, "removed") => id }.toSeq

    // 4. the dedup index FORGETS the removed doc — its content is
    // ingestable again, still-present content keeps gating
    val digDir = graft.engine.Tables.scratchDir("graft_corpusbuild_dig_")
    GraftOps.digestIndexBuild(withToks(corpus), "text", digDir,
      nBuckets = 8)
    val removedDocs = withToks(corpus.filter(d => removedIds.contains(d._1)))
    GraftOps.digestIndexRetract(removedDocs, "text", digDir)
    val reingest = Seq(40L -> "totally new words arrive here", // doc 11's text
      41L -> "alpha beta gamma delta epsilon")                // doc 0's, kept
    val accepted = GraftOps.dedupExactAgainstCorpus(
        withToks(reingest).withColumn("score", lit(1)),
        "doc_id", "text", "score", digDir)
      .collect().map(_.getLong(0)).toSet
    check("after the retract, the removed doc's content re-ingests; " +
      "kept content still drops", accepted == Set(40L))

    // 4b. the CLUSTER store forgets the removed doc too — the ONE
    // removed work-list drives every erasure surface (digest content,
    // cluster membership, packed spans). The pairs are the corpus's
    // REAL token-set near-dups (jaccardPairs at 60%: docs 0 and 20,
    // J = 4/6); the takedown retracts, the compact re-derives from
    // surviving edges, and resolve never shows the removed id again
    // (the bridge-split case is pinned in IndexLifecycle step 7)
    val clDir = graft.engine.Tables.scratchDir("graft_corpusbuild_cl_")
    val pairs = GraftOps.jaccardPairs(
      withToks(corpus).withColumn("tk",
        array_distinct(split(col("text"), " "))),
      "doc_id", "tk", 60)
    GraftOps.clusterIndexBuild(pairs, "d1", "d2", clDir, nBuckets = 8)
    def clusters() = GraftOps.clusterResolve(spark, clDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    check("cluster store: the corpus's real near-dup pair clusters",
      clusters() == Map(0L -> 0L, 20L -> 0L))
    GraftOps.clusterRetract(removedIds.toDF("doc_id"), "doc_id", clDir)
    GraftOps.clusterIndexCompact(spark, clDir)
    val cl = clusters()
    check("cluster store: the removed doc is gone, survivors keep " +
      "their cluster", !cl.contains(removedIds.head) &&
        !cl.values.toSet.contains(removedIds.head) &&
        cl.get(20L).contains(0L))

    // 4c. the GRAM store forgets too: span-level duplication is a
    // COUNT, so the takedown is one negative segment — the removed
    // doc's spans stop marking re-ingests the moment it commits, while
    // spans the corpus still holds keep scrubbing (doc 0's text
    // re-ingested = probe occurrence + surviving history = threshold)
    val grDir = graft.engine.Tables.scratchDir("graft_corpusbuild_gr_")
    GraftOps.gramIndexBuild(withToks(corpus), "text", grDir, k = 4,
      nBuckets = 8)
    def probeScrub(): Map[Long, String] =
      GraftOps.substringScrubAgainstCorpus(
          withToks(reingest), "doc_id", "text", grDir)
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    check("gram store: both re-ingests' spans count as duplicated " +
      "while history holds them",
      probeScrub() == Map(40L -> "", 41L -> ""))
    GraftOps.gramIndexRetract(removedDocs, "text", grDir)
    check("gram store: the removed doc's spans stop counting; kept " +
      "content still scrubs",
      probeScrub() == Map(40L -> "totally new words arrive here",
        41L -> ""))

    // 5. the frozen pack layout cannot unpack history — removal there
    // is a loader-side skip mask: exactly the removed doc's spans
    val skip = GraftOps.packSkipManifest(laid, "doc_id", "nt", seqLen,
        removedIds.toDF("doc_id"))
      .select("doc_id", "shard", "seq_id", "doc_from", "doc_to",
        "seq_from").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSet
    check("the skip-manifest is exactly the removed doc's manifest rows",
      skip == hist.filter(r => removedIds.contains(r._1)).toSet &&
        skip.nonEmpty)

    // 6. append — history's manifest rows never move
    val appended = GraftOps.packIndexAppend(withToks(fresh), "doc_id",
      "nt", dir)
    val histAfter = manifest(laid)
    check("history's manifest is unchanged row-for-row after the append",
      histAfter.toSet == hist.toSet)
    val batchRows = manifest(appended)
    val basePerShard = laid.groupBy("shard").agg(sum("nt").as("t"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    check("the batch starts exactly at each shard's recorded length",
      batchRows.groupBy(_._2).forall { case (sh, rows) =>
        val firstTok = rows.map(r => r._3 * seqLen + r._6).min
        firstTok == basePerShard.getOrElse(sh, 0L)
      })

    // 7. an epoch order over the union's sequences
    val seqs = (hist ++ batchRows).map(r => (r._2, r._3)).distinct
      .toSeq.toDF("shard", "seq_id")
    def epoch(seed: Long) = GraftOps.epochShuffle(seqs, "shard",
        Seq("seq_id"), seed)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    val e7 = epoch(7L)
    check("epoch positions are a per-shard permutation",
      e7.groupBy(_._1).forall { case (_, rs) =>
        rs.map(_._3).toSeq.sorted == (0L until rs.size).toSeq
      })
    check("the same seed reproduces the epoch; a new seed re-draws it",
      epoch(7L) == e7 && epoch(8L) != e7)
    println("corpus build: all steps OK")
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    run(spark)
    spark.stop()
  }
}
