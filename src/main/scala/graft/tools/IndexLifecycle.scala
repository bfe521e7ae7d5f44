package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** The worked end-to-end INCREMENTAL CURATION lifecycle — the README's
  * runnable reference for operating a persistent fingerprint index in
  * production shape, with every step's output ASSERTED (the suite runs
  * [[run]] as a drift check; `main` is the standalone form):
  *
  *  1. BOOTSTRAP an empty index (`fingerprintBuild` on a zero-row
  *     corpus — the manifest and sketch shape exist before any data);
  *  2. N [[graft.api.CurationPipeline.curateIncremental]] ticks with
  *     streaming batch ids: gate → near-dedup vs history → append,
  *     each batch's survivors asserted;
  *  3. a FORCE-REPLAYED tick (same batchId) — re-emits identical
  *     survivors, appends nothing (the crash-recovery contract) —
  *     including AFTER a cron'd `indexVacuum` lands inside the
  *     crash-replay window (the replay-base manifest is retained by
  *     construction);
  *  4. `fingerprintCompact` + `indexVacuum` — small-file hygiene, rows
  *     and answers pinned unchanged across the swap;
  *  5. a read-only dedup query (`appendToIndex = false`) against the
  *     compacted index — the "search" a downstream consumer runs;
  *  6. ERASURE: a takedown retracts docs by id
  *     ([[graft.api.GraftOps.fingerprintRetract]]) — their content
  *     stops gating re-ingests while everything else still does, and
  *     the next compact folds the tombstones away (the index has
  *     genuinely forgotten).
  *
  * Run: `sbt "runMain graft.tools.IndexLifecycle"` — prints one OK line
  * per step and exits nonzero on any drift. */
object IndexLifecycle {

  def run(spark: SparkSession): Unit = {
    import spark.implicits._
    import graft.api.{CurationPipeline, GraftOps, IndexStore}
    val dir = graft.engine.Tables.scratchDir("graft_lifecycle_")

    def step(rows: Seq[(Long, String)], batchId: Long,
        append: Boolean = true): Set[Long] =
      CurationPipeline.curateIncremental(rows.toDF("doc_id", "text"),
          "doc_id", "text", dir, maxTopWordRatio = 0.3,
          appendToIndex = append, batchId = Some(batchId))
        .collect().map(_.getLong(0)).toSet
    def indexedDocs(): Set[Long] = IndexStore.readTable(spark, dir,
        IndexStore.resolve(spark, dir).get, "docs")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    def check(name: String, cond: Boolean): Unit = {
      require(cond, s"lifecycle step FAILED: $name")
      println(s"  OK $name")
    }

    // 1. bootstrap: an index with a shape but no documents
    GraftOps.fingerprintBuild(
      Seq.empty[(Long, String)].toDF("doc_id", "text"), "doc_id", "text", dir)
    check("bootstrap: empty index resolves, zero docs", indexedDocs().isEmpty)

    // 2. three monotone micro-batches
    val b0 = Seq(
      0L -> "alpha beta gamma delta epsilon", // novel
      1L -> "spam spam spam spam", // fails the repetition gate
      2L -> "one two three four five six seven") // novel
    val b1 = Seq(
      10L -> "alpha beta gamma delta epsilon", // exact dup of history
      11L -> "totally new words arrive here") // novel
    val b2 = Seq(
      20L -> "alpha beta gamma delta zeta", // near-dup of 0 (J = 2/3 < 0.8) survives
      21L -> "one two three four five six seven eight") // near-dup of 2 (J = 7/8) drops
    check("tick 0: both gated docs survive vs empty history",
      step(b0, 0L) == Set(0L, 2L))
    check("tick 0: gate-failed doc was never indexed",
      indexedDocs() == Set(0L, 2L))
    check("tick 1: exact dup drops, novel survives",
      step(b1, 1L) == Set(11L))
    check("tick 2: J=7/8 near-dup drops, J=2/3 survives",
      step(b2, 2L) == Set(20L))
    check("index holds every gated doc, drops included",
      indexedDocs() == Set(0L, 2L, 10L, 11L, 20L, 21L))

    // 3. force-replay tick 2 (crash between step and sink commit)
    val verBefore = IndexStore.resolve(spark, dir).get.version
    check("replayed tick 2 re-emits identical survivors",
      step(b2, 2L) == Set(20L))
    check("replay appended nothing (no new index version)",
      IndexStore.resolve(spark, dir).get.version == verBefore &&
        indexedDocs() == Set(0L, 2L, 10L, 11L, 20L, 21L))
    // 3b. a CRON'D VACUUM lands between the crash and the replay: the
    // replay-base manifest survives by construction, so the replay still
    // re-derives its original survivors afterwards
    GraftOps.indexVacuum(spark, dir)
    val replayBase = IndexStore.resolve(spark, dir).get
      .props("last_batch_base").toInt
    check("vacuum retains the replay-base manifest",
      IndexStore.resolveAt(spark, dir, replayBase).isDefined)
    check("replay after the vacuum still re-emits identical survivors",
      step(b2, 2L) == Set(20L) &&
        IndexStore.resolve(spark, dir).get.version == verBefore)

    // 4. compact + vacuum: one segment per table, answers unchanged
    GraftOps.fingerprintCompact(spark, dir)
    check("compact leaves one live segment per table",
      IndexStore.resolve(spark, dir).get.tables
        .forall { case (_, segs) => segs.size == 1 })
    check("vacuum reclaims the superseded segments",
      GraftOps.indexVacuum(spark, dir).nonEmpty)
    check("rows survive compact + vacuum",
      indexedDocs() == Set(0L, 2L, 10L, 11L, 20L, 21L))

    // 5. read-only dedup query against the compacted index
    check("read-only query: history dup drops, novel survives",
      step(Seq(90L -> "alpha beta gamma delta epsilon",
        91L -> "genuinely unseen closing words"), 3L, append = false)
        == Set(91L))
    check("dry run left the index untouched",
      indexedDocs() == Set(0L, 2L, 10L, 11L, 20L, 21L))

    // 6. erasure: take down the "alpha beta gamma delta epsilon"
    // content — BOTH docs holding it (0 and its exact re-ingest 10)
    GraftOps.fingerprintRetract(Seq(0L, 10L).toDF("doc_id"), "doc_id", dir)
    check("takedown: the removed docs' content stops gating re-ingests",
      step(Seq(95L -> "alpha beta gamma delta epsilon"), 4L,
        append = false) == Set(95L))
    check("content the index still holds keeps gating",
      step(Seq(96L -> "totally new words arrive here"), 5L,
        append = false).isEmpty)
    GraftOps.fingerprintCompact(spark, dir)
    check("compact folds the tombstones — the index has forgotten",
      indexedDocs() == Set(2L, 11L, 20L, 21L) &&
        !IndexStore.resolve(spark, dir).get.tables.contains("tombstones"))

    // 7. CLUSTER erasure: the union-find store forgets too. Bridge node
    // 5 alone connects {1,2,3} to {10,11}; its takedown excludes it
    // from resolve IMMEDIATELY, and the compact re-derives from the
    // surviving persisted edges — the merged cluster actually SPLITS
    val cdir = graft.engine.Tables.scratchDir("graft_lifecycle_cl_")
    GraftOps.clusterIndexBuild(
      Seq((1L, 2L), (2L, 3L), (3L, 5L), (5L, 10L), (10L, 11L))
        .toDF("a", "b"), "a", "b", cdir, nBuckets = 8)
    def clusters(): Map[Long, Long] = GraftOps.clusterResolve(spark, cdir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    check("cluster bootstrap: one merged cluster through the bridge",
      clusters().values.toSet == Set(1L))
    GraftOps.clusterRetract(Seq(5L).toDF("id"), "id", cdir)
    check("cluster takedown: the retracted id leaves resolve at once",
      { val c = clusters(); !c.contains(5L) && !c.values.toSet.contains(5L) })
    GraftOps.clusterIndexCompact(spark, cdir)
    check("cluster compact: the bridge's merge is undone from " +
      "surviving edges",
      { val c = clusters()
        Set(1L, 2L, 3L).flatMap(c.get) == Set(1L) &&
          Set(10L, 11L).flatMap(c.get) == Set(10L) &&
          !IndexStore.resolve(spark, cdir).get.tables.contains("tombstones") })
    check("cluster vacuum reclaims the retracted bytes",
      GraftOps.indexVacuum(spark, cdir).nonEmpty)

    // 8. GRAM erasure: the count store forgets by ARITHMETIC — a
    // retract is a negative segment, the compact folds it away, and a
    // span stops being "duplicated" the moment its other occurrence is
    // taken down
    val gdir = graft.engine.Tables.scratchDir("graft_lifecycle_gr_")
    GraftOps.gramIndexBuild(
      Seq(1L -> "one two three four tail words here",
          2L -> "one two three four other ending text")
        .toDF("id", "txt"), "txt", gdir, k = 4, nBuckets = 8)
    def scrubbed(): String = GraftOps.substringScrubAgainstCorpus(
        Seq(50L -> "one two three four probe suffix").toDF("id", "txt"),
        "id", "txt", gdir)
      .head().getString(1)
    check("gram bootstrap: the twice-ingested span scrubs from a probe",
      scrubbed() == "probe suffix")
    GraftOps.gramIndexRetract(
      Seq(2L -> "one two three four other ending text").toDF("id", "txt"),
      "txt", gdir)
    check("gram takedown of ONE holder: still scrubs — the probe's own " +
      "occurrence plus the survivor reach the threshold (one-shot law)",
      scrubbed() == "probe suffix")
    GraftOps.gramIndexRetract(
      Seq(1L -> "one two three four tail words here").toDF("id", "txt"),
      "txt", gdir)
    check("gram takedown of BOTH holders: the span stops counting the " +
      "moment the negative segment commits",
      scrubbed() == "one two three four probe suffix")
    GraftOps.gramIndexCompact(spark, gdir)
    check("gram compact folds the arithmetic to one positive segment",
      scrubbed() == "one two three four probe suffix" &&
        IndexStore.resolve(spark, gdir).get.tables("grams").size == 1)
    check("gram vacuum reclaims the folded segments",
      GraftOps.indexVacuum(spark, gdir).nonEmpty)

    // 9. RETRIEVAL: the postings index forgets by the same arithmetic
    // (negative segments), and the two persisted retrieval members —
    // BM25 postings + IVF — compose into one hybrid RRF ranking (the
    // q136 recipe on persisted substrates instead of one-shot scans)
    graft.GraftExtensions.register(spark)
    val bdir = graft.engine.Tables.scratchDir("graft_lifecycle_bm_")
    val vdir = graft.engine.Tables.scratchDir("graft_lifecycle_iv_")
    // doc 1 is the lexical hit (short, both query terms), doc 2 is both
    // (longer text, but the embedding matches the query vector exactly),
    // doc 3 is the dense runner-up, doc 4 is neither
    val hdocs = Seq(
      1L -> "laser optics", 2L -> "laser optics with spare words",
      3L -> "quantum cooling rig", 4L -> "gardening almanac")
    GraftOps.bm25IndexBuild(hdocs.take(2).toDF("id", "txt"), "id", "txt",
      bdir, nBuckets = 8)
    GraftOps.bm25IndexAppend(hdocs.drop(2).toDF("id", "txt"), "id", "txt",
      bdir)
    val hq = Seq((0L, Seq("laser", "optics"))).toDF("qid", "terms")
    def lex(): Seq[Long] = GraftOps.bm25AgainstCorpus(hq, "qid", "terms",
      bdir, k = 2).select("doc_id").collect().map(_.getLong(0)).toSeq
    check("bm25 index: shorter doc outranks the longer at equal tf",
      lex() == Seq(1L, 2L))
    val hemb = Seq(
      (1L, Seq(0.0f, 1.0f)), (2L, Seq(1.0f, 0.0f)),
      (3L, Seq(0.9f, 0.1f)), (4L, Seq(-1.0f, 0.0f)))
    GraftOps.ivfBuild(hemb.toDF("vid", "v"), "vid", "v", vdir, nLists = 2,
      lloydIters = 2)
    val hqv = Seq((0L, Seq(1.0f, 0.0f))).toDF("qid", "v")
    val dense = GraftOps.ivfSearch(hqv, "qid", "v", vdir, k = 2,
        nProbe = 2)
      .select(col("qid"), col("rn"), col("vid").as("doc_id"))
    check("ivf index: the aligned vector and its neighbor rank 1-2",
      dense.select("doc_id").collect().map(_.getLong(0)).toSeq ==
        Seq(2L, 3L))
    // the composed assertion: doc 2 is retrieved by BOTH members (lex
    // rank 2, dense rank 1) so RRF fuses it to the top; the one-member
    // docs 1 (lex rank 1) and 3 (dense rank 2) follow by rank arithmetic
    val lexRanks = GraftOps.bm25AgainstCorpus(hq, "qid", "terms", bdir,
      k = 2).select("qid", "rn", "doc_id")
    val fused = GraftOps.rrfFuse(Seq(lexRanks, dense), k = 3)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    check("hybrid RRF over the two persisted members: both-member doc " +
      "fuses to the top (1/61 + 1/62 beats either single 1/61)",
      fused == Seq(2L, 1L, 3L))
    // erasure: retract the lexical winner — it leaves the ranking AND
    // the df/N statistics at commit; compact folds the bytes away
    GraftOps.bm25IndexRetract(Seq(1L -> "laser optics").toDF("id", "txt"),
      "id", "txt", bdir)
    check("bm25 takedown: the retracted doc stops ranking at commit",
      lex() == Seq(2L))
    GraftOps.bm25IndexCompact(spark, bdir)
    check("bm25 compact folds to one positive postings segment",
      lex() == Seq(2L) &&
        IndexStore.resolve(spark, bdir).get.tables("postings").size == 1)
    check("bm25 vacuum reclaims the folded segments",
      GraftOps.indexVacuum(spark, bdir).nonEmpty)

    // 10. DSIR stats: the distribution store forgets on BOTH sides —
    // pool and target seed evolve by additive segments, and a takedown
    // moves every batch's score the way the one-shot law predicts
    val ddir = graft.engine.Tables.scratchDir("graft_lifecycle_ds_")
    val dprobe = Seq(70L -> "alpha beta").toDF("id", "txt")
    def dscore(): Double = GraftOps.dsirScoreAgainstStats(
      dprobe, "id", "txt", ddir).head().getDouble(1)
    GraftOps.dsirStatsBuild(
      Seq(1L -> "alpha beta gamma", 2L -> "delta epsilon zeta")
        .toDF("id", "txt"),
      "id", "txt", Seq("alpha beta").toDF("txt"), "txt", ddir,
      nBuckets = 8)
    val s0 = dscore()
    // more target mass on the probe's own features raises its ratio
    GraftOps.dsirStatsAppend(Seq(90L -> "alpha beta alpha")
      .toDF("id", "txt"), "id", "txt", ddir, side = "target")
    val s1 = dscore()
    check("dsir stats: appending target mass on the probe's features " +
      "raises its score", s1 > s0)
    // retracting the pool doc that shares those features raises it
    // further (the raw denominator drops)
    GraftOps.dsirStatsRetract(Seq(1L -> "alpha beta gamma")
      .toDF("id", "txt"), "id", "txt", ddir)
    val s2 = dscore()
    check("dsir stats: retracting the feature-sharing pool doc raises " +
      "the target-over-raw ratio", s2 > s1)
    GraftOps.dsirStatsCompact(spark, ddir)
    // same 4dp-boundary caveat as the LM checks below: compact reorders
    // the FP aggregation, so compare with the property-suite tolerance
    check("dsir compact: folded store scores identically",
      math.abs(dscore() - s2) <= 1.01e-4)
    check("dsir vacuum reclaims the folded segments",
      GraftOps.indexVacuum(spark, ddir).nonEmpty)

    // 11. LM stats: the perplexity reference forgets — a retracted
    // clean doc stops lending fluency to lookalikes at commit (the
    // CCNet gate's erasure story), and the probe tracks the one-shot
    // law at every point of the script
    val ldir = graft.engine.Tables.scratchDir("graft_lifecycle_lm_")
    val lprobe = Seq(80L -> "xx yy zz xx yy").toDF("id", "txt")
    def lppl(): Double = GraftOps.lmPerplexityAgainstStats(
      lprobe, "id", "txt", ldir).head().getDouble(1)
    GraftOps.lmStatsBuild(Seq("aa bb cc dd aa bb").toDF("txt"), "txt",
      ldir, nBuckets = 8)
    val p0 = lppl()
    GraftOps.lmStatsAppend(Seq("xx yy zz xx yy zz").toDF("txt"), "txt",
      ldir)
    val p1 = lppl()
    check("lm stats: appending reference text in the probe's language " +
      "lowers its perplexity", p1 < p0)
    GraftOps.lmStatsRetract(Seq("xx yy zz xx yy zz").toDF("txt"), "txt",
      ldir)
    val p2 = lppl()
    // equality claims hold to the shared 4dp rounding boundary only —
    // FP aggregation order can flip a boundary-straddling round(,4), so
    // compare with the one-4dp-ulp tolerance LmStatsProps pins, not ==
    check("lm stats: retracting it raises the perplexity back — the " +
      "takedown stops lending fluency at commit",
      p2 > p1 && math.abs(p2 - p0) <= 1.01e-4)
    GraftOps.lmStatsCompact(spark, ldir)
    check("lm compact: folded store scores identically",
      math.abs(lppl() - p2) <= 1.01e-4)
    check("lm vacuum reclaims the folded segments",
      GraftOps.indexVacuum(spark, ldir).nonEmpty)

    // 12. IVF-PQ: the compressed ANN index walks the same lifecycle as
    // the flat one — append under frozen quantizers, takedown at
    // commit, compact folds tombstones without moving results. The
    // corpus is PQ-lossless (every subvector a codebook center), so
    // ADC ranks exactly and the steps assert precise hit sets.
    val qdir = graft.engine.Tables.scratchDir("graft_lifecycle_pq_")
    val pqEmb = Seq(
      0L -> Array(1f, 0f, 1f, 0f), 1L -> Array(1f, 0f, 0f, 1f),
      2L -> Array(0f, 1f, 1f, 0f), 3L -> Array(0f, 1f, 0f, 1f))
      .toDF("vec_id", "embedding")
    GraftOps.ivfPqBuild(pqEmb, "vec_id", "embedding", qdir,
      nLists = 2, m = 2, ksub = 2, lloydIters = 2)
    val pqQ = pqEmb.filter(col("vec_id") === 0)
    def pqHits(): Set[Long] = GraftOps.ivfPqSearch(pqQ, "vec_id",
        "embedding", qdir, k = 3, nProbe = 2, rerankFactor = 2)
      .collect().map(_.getLong(2)).toSet
    val h0 = pqHits()
    GraftOps.ivfPqAppend(Seq(9L -> Array(1f, 0f, 1f, 0f))
      .toDF("vec_id", "embedding"), "vec_id", "embedding", qdir)
    check("ivfPq append: the new exact-duplicate vector becomes the " +
      "top hit under the frozen quantizers", pqHits().contains(9L))
    GraftOps.ivfPqRetract(Seq(9L).toDF("id"), "id", qdir)
    check("ivfPq takedown: the retracted vector leaves the results at " +
      "commit", pqHits() == h0)
    GraftOps.ivfPqCompact(spark, qdir)
    check("ivfPq compact: results unchanged, tombstones folded",
      pqHits() == h0 && !IndexStore.resolve(spark, qdir).get
        .tables.contains("tombstones"))
    check("ivfPq vacuum reclaims the folded segments",
      GraftOps.indexVacuum(spark, qdir).nonEmpty)

    // 13. Classifier store: the learned gate's training corpus
    // forgets — a retracted labeled doc provably stops influencing the
    // next retrain (trainAgainstStore ≡ one-shot over the net docs, the
    // ClfStoreProps law, asserted here at one concrete script), and
    // compact folds the cancelled bytes away without moving the model.
    val cfdir = graft.engine.Tables.scratchDir("graft_lifecycle_clf_")
    val clfDocs = Seq(
      (0L, "ref alpha beta", 1), (1L, "web gamma delta", 0),
      (2L, "ref alpha gamma", 1), (3L, "web beta delta", 0))
      .toDF("doc_id", "text", "label")
    def cw(m: org.apache.spark.sql.DataFrame): Map[Int, Double] =
      m.collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    def closeW(a: Map[Int, Double], b: Map[Int, Double]): Boolean =
      a.keySet == b.keySet && a.forall { case (k, v) =>
        math.abs(v - b(k)) <= 1e-6 }
    graft.api.TextAnalysis.clfStoreBuild(clfDocs.filter(col("doc_id") <= 1),
      "doc_id", "text", "label", cfdir, numFeatures = 16)
    graft.api.TextAnalysis.clfStoreAppend(clfDocs.filter(col("doc_id") >= 2),
      "doc_id", "text", "label", cfdir)
    graft.api.TextAnalysis.clfStoreRetract(clfDocs.filter(col("doc_id") === 3),
      "doc_id", "text", "label", cfdir)
    val netModel = cw(graft.api.TextAnalysis.trainClassifierAgainstStore(
      spark, cfdir, iters = 5))
    check("clf store forget: retrain after retract equals the one-shot " +
      "train that never saw the doc",
      closeW(netModel, cw(graft.api.TextAnalysis.trainQualityClassifier(
        clfDocs.filter(col("doc_id") =!= 3), "doc_id", "text", "label",
        numFeatures = 16, iters = 5))))
    graft.api.TextAnalysis.clfStoreCompact(spark, cfdir)
    check("clf compact: folded store trains the identical model and " +
      "folds to one feats segment",
      closeW(cw(graft.api.TextAnalysis.trainClassifierAgainstStore(
          spark, cfdir, iters = 5)), netModel) &&
        IndexStore.resolve(spark, cfdir).get.tables("feats").size == 1)
    check("clf vacuum reclaims the folded segments",
      GraftOps.indexVacuum(spark, cfdir).nonEmpty)
    println("lifecycle: all steps OK")
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
