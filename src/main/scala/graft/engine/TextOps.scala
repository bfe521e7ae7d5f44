package graft.engine

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import Tables._

/** SURVEY §2.9 (text half): LLM-data-pipeline operators over `documents` —
  * exact/near dedup, tokenization, TF-IDF, quality filters.
  *
  * Scale design: q61 uses AllPairs/PPJoin-style prefix filtering (global
  * rarity order, prefix length ⌊(1−t)·s⌋+1) so the candidate join is
  * subquadratic — the exact-result path that MinHashLSH (q62) approximates
  * at 100 TB.
  */
object TextOps {

  /** q60: exact dedup by content hash — keep min doc_id per md5(text). */
  def q60(s: SparkSession, d: String): DataFrame =
    graft.api.GraftOps.exactDedup(documents(s, d), "doc_id", "text")

  /** Distinct-token sets per doc, with set size. */
  private[engine] def docToks(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(col("doc_id"), array_distinct(toks(col("text"))).as("tk"))
      .withColumn("sz", size(col("tk")))

  /** q61: exact near-dup pairs, token-set Jaccard ≥ 0.8.
    *
    * Two exact strategies. The default is AllPairs/PPJoin prefix filtering
    * ([[graft.api.GraftOps.jaccardPairs]]) — subquadratic candidates, the
    * 100 TB exact path that MinHashLSH (q62) approximates. Only when BOTH
    * the vocabulary fits 64 tokens AND the corpus is small (≤100k docs —
    * all-pairs compare cost is inherent to the bitset form) does it switch
    * to the bitmask fast path: each doc's token set becomes one 64-bit
    * mask, Jaccard is bit_count(a&b) in pure whole-stage codegen, and the
    * all-pairs self-join is TILED over an equi-join on tile pairs (no
    * corpus broadcast, no nested loop). Both probes are bounded —
    * `limit(n+1).count()` short-circuits, never an exact global distinct.
    *
    * The ≥-threshold test is the integer form inter·5 ≥ union·4 (no float
    * at the boundary); emitted jac is a raw double ratio of identical ints.
    */
  def q61(s: SparkSession, d: String): DataFrame =
    q61Pairs(s, docToks(s, d))

  /** q61 with the dispatch made explicit (mirrors q62's `smallVocab`
    * option): `dt` is a (doc_id, tk: array<string>, sz) tokenized frame
    * (see docToks). Pass `smallVocab`/`smallCorpus` to assert the regime
    * and the plan is constructed with ZERO Spark jobs; leave them `None`
    * and two bounded probes (`limit(65)` / `limit(100001)` counts —
    * short-circuit, never a global distinct) decide. */
  def q61Pairs(s: SparkSession, dt: DataFrame,
      smallVocab: Option[Boolean] = None,
      smallCorpus: Option[Boolean] = None): DataFrame = {
    lazy val tok = dt.select(col("doc_id"), col("sz"), explode(col("tk")).as("token"))
    val vocabSmall = smallVocab.getOrElse(
      tok.select("token").distinct().limit(65).count() <= 64)
    val corpusSmall = smallCorpus.getOrElse(
      dt.select("doc_id").limit(100001).count() <= 100000)
    if (vocabSmall && corpusSmall) q61Bitset(s, tok)
    else graft.api.GraftOps.jaccardPairs(dt, "doc_id", "tk", 80)
  }

  /** Small-vocab small-corpus exact path: one-long bitmask per doc, tiled
    * all-pairs popcount over a tile-pair EQUI-join (each row replicates to
    * its tile's pair row/column; every unordered pair meets exactly once
    * after the same-tile id filter). */
  private def q61Bitset(s: SparkSession, tok: DataFrame): DataFrame = {
    val tiles = 8
    // bit position per token: plain alphabetical rank over the (≤64)
    // distinct tokens — any stable order works, the mask is only ever
    // popcount-compared
    val rk = tok.select("token").distinct()
      .withColumn("rk", row_number().over(Window.orderBy(col("token"))) - 1)
    val masks = tok.join(broadcast(rk), "token")
      .groupBy("doc_id")
      .agg(bit_or(expr("shiftleft(CAST(1 AS BIGINT), rk)")).as("mask"), count(lit(1)).as("sz"))
      .withColumn("tile", pmod(xxhash64(col("doc_id")), lit(tiles)).cast("int"))
    val a = masks.select(col("tile").as("ti"),
      explode(expr(s"sequence(tile, ${tiles - 1})")).as("tj"),
      col("doc_id").as("id1"), col("mask").as("m1"), col("sz").as("sz1"))
    val b = masks.select(explode(expr("sequence(0, tile)")).as("ti"),
      col("tile").as("tj"),
      col("doc_id").as("id2"), col("mask").as("m2"), col("sz").as("sz2"))
    val inter = bit_count(col("m1").bitwiseAND(col("m2")))
    val uni = col("sz1") + col("sz2") - inter
    a.join(b, Seq("ti", "tj"))
      .filter(col("ti") =!= col("tj") || col("id1") < col("id2"))
      .filter(col("sz1") * 5 >= col("sz2") * 4 && col("sz2") * 5 >= col("sz1") * 4)
      .filter(inter * 5 >= uni * 4)
      .select(least(col("id1"), col("id2")).as("d1"),
        greatest(col("id1"), col("id2")).as("d2"),
        (inter.cast("double") / uni).as("jac"))
      .orderBy("d1", "d2")
  }

  /** q62: MinHash + LSH banding — the approximate 100 TB path for q61.
    * Full algorithm (32 minhashes, 8×4 banding, exact verify inside the
    * bucket join with a vocabulary-size dispatch, first-band pair
    * ownership) in [[graft.api.GraftOps.minhashLshPairs]]. Oracle-omitted —
    * tests assert recall vs q61. */
  def q62(s: SparkSession, d: String): DataFrame =
    graft.api.GraftOps.minhashLshPairs(documents(s, d), "doc_id", "text",
      nHashes = 32, bands = 8, minPct = 80)

  /** q63: term frequencies — top-10 terms per language, binding of
    * [[graft.api.TextAnalysis.topTermsPerGroup]]. */
  def q63(s: SparkSession, d: String): DataFrame =
    graft.api.TextAnalysis.topTermsPerGroup(documents(s, d), "lang", "text", 10)
      .orderBy("lang", "rn")

  /** q64: TF-IDF, top-scoring term per document — binding of
    * [[graft.api.TextAnalysis.tfidfTopTerms]] (scalar-subquery corpus
    * count, no join against the 1-row aggregate). Same integer inputs on
    * both engines ⇒ bit-identical doubles ⇒ identical ranking. */
  def q64(s: SparkSession, d: String): DataFrame =
    graft.api.TextAnalysis.tfidfTopTerms(documents(s, d), "doc_id", "text")
      .select(col("doc_id"), col("word"), col("tf"), col("df"),
        r4(col("score_raw")).as("score"))
      .orderBy("doc_id")

  /** q65: C4-style quality flags per document — binding of
    * [[graft.api.TextAnalysis.qualityFlags]] with the testdata's
    * precomputed `n_chars` as the length column. */
  def q65(s: SparkSession, d: String): DataFrame =
    graft.api.TextAnalysis.qualityFlags(documents(s, d), "doc_id", "text",
      charLen = col("n_chars"),
      stopWords = Seq("data", "table", "row", "query", "the", "a"))
      .orderBy("doc_id")

  /** q73: language identification — token-profile heuristic, binding of
    * [[graft.api.TextAnalysis.langProfiles]] (train: top-10 tokens per
    * language from the labeled corpus itself) + [[graft.api.TextAnalysis
    * .langId]] (score: distinct profile-token overlap, deterministic
    * argmax), then the accuracy audit against the actual label. (On this
    * synthetic corpus languages share one vocabulary, so accuracy is
    * near-chance — the operator shape is what matters.) */
  def q73(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
    val profiles = graft.api.TextAnalysis.langProfiles(docs, "lang", "text")
    graft.api.TextAnalysis.langId(docs, "doc_id", "text", profiles)
      .join(docs.select(col("doc_id"), col("lang")), "doc_id")
      .select(col("doc_id"), col("pred_lang"), col("score"),
        col("lang").as("actual_lang"),
        (col("pred_lang") === col("lang")).cast("int").as("correct"))
      .orderBy("doc_id")
  }

  /** q74: token counting — whitespace tokens plus BPE-ish regex token
    * classes (letter runs, digit runs, alpha char count). */
  def q74(s: SparkSession, d: String): DataFrame =
    documents(s, d).select(
      col("doc_id"),
      size(toks(col("text"))).as("ws_tokens"),
      expr("size(regexp_extract_all(text, '[a-z]+', 0))").as("alpha_tokens"),
      expr("size(regexp_extract_all(text, '[0-9]+', 0))").as("digit_tokens"),
      length(regexp_replace(col("text"), "[^a-z]", "")).as("alpha_chars"))
      .orderBy("doc_id")

  /** q75: document fingerprinting — rolling 3-gram shingle hash, emitting
    * the minimum shingle digest (winnowing-style representative) and the
    * shingle count; in-row transform, no shuffle. */
  def q75(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .withColumn("tk", toks(col("text")))
      .select(col("doc_id"),
        when(size(col("tk")) >= 3,
          expr("""array_min(transform(sequence(0, size(tk) - 3),
                 i -> md5(concat_ws(' ', tk[i], tk[i+1], tk[i+2]))))"""))
          .as("fingerprint"),
        greatest(size(col("tk")) - 2, lit(0)).as("n_shingles"))
      .orderBy("doc_id")

  /** q79: SimHash near-dup detection — the third dedup family next to exact
    * (q60) and MinHash (q62). Full algorithm + scale notes in
    * [[graft.api.GraftOps.simhashPairs]]; this is the testdata binding. */
  def q79(s: SparkSession, d: String): DataFrame =
    graft.api.GraftOps.simhashPairs(documents(s, d), "doc_id", "text")

  /** q81: word-3-gram shingle Jaccard near-dup — EXACT (prefix-filtered
    * candidates, recall 1.0); completes the dedup family (exact q60 /
    * token-Jaccard q61 / MinHash q62 / SimHash q79 / embedding-cosine
    * q80). Algorithm in [[graft.api.GraftOps.ngramJaccardPairs]]; the
    * oracle is an independent all-pairs formulation. */
  def q81(s: SparkSession, d: String): DataFrame =
    graft.api.GraftOps.ngramJaccardPairs(documents(s, d), "doc_id", "text",
      n = 3, minPct = 60)

  /** q82: deterministic train/val/test split audit — hash-bucket
    * assignment from [[graft.api.GraftOps.hashSplit]] (80/10/10), then a
    * per-(lang, split) count + chars summary for leakage review. */
  def q82(s: SparkSession, d: String): DataFrame =
    graft.api.GraftOps.hashSplit(documents(s, d), "doc_id")
      .groupBy("lang", "split")
      .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("total_chars"))
      .orderBy("lang", "split")

  /** The q81 pair list clustered, computed ONCE per (session, sfDir):
    * q88 and q94 are two CONSUMERS of the same pair pipeline — in
    * deployment the pairs/components frame is computed once and fanned
    * out, so the registry memoizes it instead of re-running the ~2 s
    * shingle join in each binding (connectedComponents' label frame is
    * already eagerly localCheckpoint-ed, so the cached value is
    * materialized data — one (node, label) row per clustered doc — not a
    * lazy plan that would recompute anyway). Keyed by session so a stale
    * frame never crosses a session boundary. Bench accounting: whichever
    * of q88/q94 runs first pays the one-time build; a min-of-passes bench
    * therefore reports both rows at their amortized (reuse) cost, while
    * the pair-generation cost itself stays independently measured by
    * q81's row. */
  /** Memo bound + lifecycle (the SURVEY §3.2 sanctioned exception): at
    * most [[DocCompCacheMax]] entries live at once — each memoized
    * corpus holds TWO (its pair list and its component labels), so the
    * bound of 8 is four corpora — LRU insertion order, the eldest
    * entry is EVICTED with its local checkpoint blocks actively
    * unpersisted (not left to GC), so a long-lived session sweeping
    * many corpora holds a constant number of materialized frames.
    * [[docCompClear]] releases everything (tests and session
    * teardown). Access is synchronized — the memo serves the
    * single-threaded registry/bench path. EVICTION CONTRACT:
    * unpersisting truncated-lineage checkpoint blocks makes an evicted
    * frame unexecutable, so a caller holding a q88/q94/q126 result
    * must consume it before querying 4+ OTHER corpora through the memo
    * (registry bindings collect immediately; a longer-lived handle
    * belongs outside the memo — call the public pair/cluster API
    * directly). */
  private[graft] val DocCompCacheMax = 8
  private[graft] val docCompCache =
    new java.util.LinkedHashMap[(SparkSession, String), DataFrame]()
  /** Unpersist the materialized blocks behind a localCheckpoint-ed
    * frame: the checkpoint plan is a LogicalRDD leaf whose RDD holds the
    * blocks; unpersisting it frees executor memory/disk immediately. */
  private def releaseLocalCheckpoint(df: DataFrame): Unit =
    // best-effort: an entry whose SESSION has been stopped has no blocks
    // left to free, and its unpersist RPC would throw against the dead
    // driver endpoint — never let a stale entry's cleanup fail the LIVE
    // session's query
    try df.queryExecution.analyzed.collectLeaves().foreach {
      case l: org.apache.spark.sql.execution.LogicalRDD =>
        l.rdd.unpersist(blocking = true)
      case _ => ()
    } catch { case _: Throwable => () }
  private[graft] def docCompClear(): Unit = docCompCache.synchronized {
    docCompCache.values.forEach(releaseLocalCheckpoint(_))
    docCompCache.clear()
  }
  /** The q81 near-dup PAIR list, memoized like [[docComponents]] (same
    * LRU map, keyed with a tag so the two never collide): q88/q94
    * cluster it and q126 replays it through the incremental
    * cluster index — in deployment the pair pipeline runs once and
    * fans out, so the registry amortizes it identically. q81's own row
    * stays UN-memoized on purpose: it is where the pair-generation
    * cost itself is measured. */
  private def nearDupPairs(s: SparkSession, d: String): DataFrame =
    memoized(s, d + "#pairs") {
      graft.api.GraftOps.ngramJaccardPairs(documents(s, d),
          "doc_id", "text", n = 3, minPct = 60)
        .localCheckpoint(false)
    }

  private def docComponents(s: SparkSession, d: String): DataFrame = {
    // touch the pairs entry UNCONDITIONALLY (not inside the by-name
    // build block, which a hit never evaluates): a corpus the memo is
    // actively serving must keep BOTH its entries fresh in the LRU, or
    // repeated component hits would let the pairs slot age out and a
    // later q126 re-pay the pair pipeline
    val pairs = nearDupPairs(s, d)
    memoized(s, d) {
      graft.api.GraftOps.connectedComponents(pairs, "d1", "d2")
    }
  }

  private def memoized(s: SparkSession, key: String)(
      build: => DataFrame): DataFrame =
    docCompCache.synchronized {
      val k = (s, key)
      val hit = docCompCache.remove(k) // re-insert refreshes LRU position
      val v = if (hit != null) hit else build
      docCompCache.put(k, v)
      if (docCompCache.size > DocCompCacheMax) {
        val it = docCompCache.entrySet().iterator()
        val eldest = it.next()
        releaseLocalCheckpoint(eldest.getValue)
        it.remove()
      }
      v
    }

  /** q88: near-dup CLUSTERS — [[graft.api.GraftOps.connectedComponents]]
    * over the q81 n-gram-Jaccard pair list ([[docComponents]]). Every
    * document gets its component id (min reachable doc_id), the component
    * size, and a keeper flag — the "keep one per cluster" step that turns
    * pairwise dedup into an actual dataset reduction. Isolated documents
    * are their own singleton component. (The DuckDB oracle computes a full
    * recursive transitive CLOSURE — |component|² rows — feasible at the
    * driver's sf0.01 gate but quadratic-blowup at bench scale on this
    * degenerate corpus; the Spark side's label propagation carries only
    * one label per node per pass and has no such limit.) */
  def q88(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
    val comp = docComponents(s, d)
    val w = Window.partitionBy("component")
    docs.select(col("doc_id"))
      .join(comp, col("doc_id") === col("node"), "left")
      .select(col("doc_id"), coalesce(col("label"), col("doc_id")).as("component"))
      .withColumn("csize", count(lit(1)).over(w))
      .withColumn("is_keeper", (col("doc_id") === col("component")).cast("int"))
      .orderBy("doc_id")
  }

  /** q90: deterministic corpus-sampling audit — a 20% hash sample of the
    * documents table via [[graft.api.GraftOps.hashSample]] (key-pure:
    * append-stable, partition-invariant — rand()-based sampling is
    * neither), summarized per language. */
  def q90(s: SparkSession, d: String): DataFrame =
    graft.api.GraftOps.hashSample(documents(s, d), "doc_id", 20)
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("total_chars"))
      .orderBy("lang")

  /** q92: keep-best exact dedup — the q60 variant a curation pipeline
    * actually wants ([[graft.api.GraftOps.exactDedupKeepBest]]): the
    * survivor of each duplicate group maximizes quality (here n_chars)
    * instead of minimizing id, as a plain aggregate — no window shuffle. */
  def q92(s: SparkSession, d: String): DataFrame =
    graft.api.GraftOps.exactDedupKeepBest(documents(s, d),
      "doc_id", "text", "n_chars")

  /** q94: the dedup capstone APPLIED — q88's near-dup clusters reduce the
    * documents table in one call ([[graft.api.GraftOps.dedupApply]]): the
    * longest row per cluster survives (ties to the smallest id),
    * singletons pass through. Same pair list + components as q88 — served
    * from the shared [[docComponents]] memo (the deployment shape: pairs
    * computed once, consumed twice) — so the oracle shares its
    * recursive-closure CTE. */
  def q94(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
    val comp = docComponents(s, d)
    graft.api.GraftOps.dedupApply(docs, "doc_id", comp, Some("n_chars"))
      .select(col("doc_id"), col("n_chars"), col("cluster"), col("cluster_size"))
      .orderBy("doc_id")
  }

  /** q97: Gopher-style repetition filters — binding of
    * [[graft.api.TextAnalysis.repetitionStats]]; thresholds sized to this
    * corpus's measured distributions (committed in CORPUS_STATS.md) so the
    * keep bit actually splits it. Zero-shuffle: every metric is an in-row
    * HOF projection. */
  def q97(s: SparkSession, d: String): DataFrame =
    graft.api.TextAnalysis.repetitionStats(documents(s, d), "doc_id", "text",
      maxDupWordFrac = 0.55, maxTopWordRatio = 0.12, maxDupBigramFrac = 0.05)
      .orderBy("doc_id")

  /** q98: cross-document boilerplate detection — binding of
    * [[graft.api.TextAnalysis.boilerplateNgrams]] (3-grams shared by ≥ 2
    * documents). The per-document complement of q97: repetition ACROSS
    * documents that no per-row filter can see. */
  def q98(s: SparkSession, d: String): DataFrame =
    graft.api.TextAnalysis.boilerplateNgrams(documents(s, d), "doc_id", "text",
      n = 3, minDocs = 2)
      .orderBy("doc_id")

  /** q99: train/test decontamination — [[graft.api.GraftOps.hashSplit]]
    * carves the corpus 80/10/10, then
    * [[graft.api.TextAnalysis.contaminationReport]] reports each train
    * document's 3-gram overlap against the test split (flag at ≥ 15% ≈
    * the corpus's p90 overlap fraction — CORPUS_STATS.md — so the flag
    * marks the genuinely overlapping tail). */
  def q99(s: SparkSession, d: String): DataFrame = {
    val split = graft.api.GraftOps.hashSplit(documents(s, d), "doc_id")
    graft.api.TextAnalysis.contaminationReport(
      split.filter(col("split") === "train"),
      split.filter(col("split") === "test"),
      "doc_id", "text", n = 3, minFrac = 0.15)
      .orderBy("doc_id")
  }

  /** q101: the curation CAPSTONE — [[graft.api.CurationPipeline.curate]]
    * runs the full quality-gate → exact-dedup → near-dup-cluster → split
    * pipeline in one call (thresholds = q97's corpus-sized dials, near-dup
    * dials = q81's). Every stage is an already-oracle-checked operator;
    * the oracle chains their CTEs. Per-stage survival counts are
    * committed in CORPUS_STATS.md (sf0.01: 500 → 154 quality → 10 pairs
    * → 144 survivors), split 80/10/10. */
  def q101(s: SparkSession, d: String): DataFrame =
    graft.api.CurationPipeline.curate(documents(s, d), "doc_id", "text",
      scoreCol = "n_chars",
      maxDupWordFrac = 0.55, maxTopWordRatio = 0.12, maxDupBigramFrac = 0.05)
      .select(col("doc_id"), col("n_chars"), col("cluster"),
        col("cluster_size"), col("split"))
      .orderBy("doc_id")

  /** q103: stratified deterministic sampling —
    * [[graft.api.GraftOps.hashSampleBy]] rebalances the corpus per
    * language (downsample the dominant en, oversample the rest, default
    * rate for unlisted strata), audited per language. Key-pure and
    * append-stable like q90; zero shuffle before the audit aggregation. */
  def q103(s: SparkSession, d: String): DataFrame =
    graft.api.GraftOps.hashSampleBy(documents(s, d), "doc_id", "lang",
      rates = Seq("en" -> 20, "zh" -> 60, "es" -> 60), defaultPct = 40)
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("total_chars"))
      .orderBy("lang")

  /** q104: edit-distance near-dup pairs over customer names —
    * [[graft.api.GraftOps.editDistancePairs]] at Levenshtein ≤ 1 (the
    * entity-resolution member of the dedup family). Deletion-neighborhood
    * candidates on an equi-join, exact codegen levenshtein verify; the
    * oracle is the independent all-pairs formulation. */
  def q104(s: SparkSession, d: String): DataFrame =
    graft.api.GraftOps.editDistancePairs(customer(s, d), "c_custkey", "c_name",
      maxDist = 1)

  /** q105: single-pass column profiling over orders —
    * [[graft.api.GraftOps.profileColumns]] on the integral/string columns
    * (float/timestamp min/max stringification is engine-specific; the
    * operator docs call it out). One scan, one aggregation job. */
  def q105(s: SparkSession, d: String): DataFrame =
    graft.api.GraftOps.profileColumns(orders(s, d),
      Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"))

  /** q106: per-source cap — [[graft.api.GraftOps.capPerGroup]] keeps each
    * source's 10 longest documents (ties to the smaller id) so no single
    * crawl host dominates the mix. One shuffle on the cap key, per-group
    * sort only. */
  def q106(s: SparkSession, d: String): DataFrame =
    graft.api.GraftOps.capPerGroup(documents(s, d), "source", "n_chars",
        "doc_id", 10)
      .select(col("doc_id"), col("source"), col("n_chars"), col("grp_rank"))
      .orderBy("doc_id")

  /** q107: token-budget fill — [[graft.api.GraftOps.budgetByTokens]]
    * keeps each language's longest documents while the running
    * whitespace-token sum stays within 2000 — the "best N tokens per
    * stratum" selection a pretraining mix is built from. */
  def q107(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
      .withColumn("n_tokens", size(toks(col("text"))).cast("long"))
    graft.api.GraftOps.budgetByTokens(docs, "lang", "n_chars", "n_tokens",
        "doc_id", 2000L)
      .select(col("doc_id"), col("lang"), col("n_tokens"), col("cum_tokens"))
      .orderBy("doc_id")
  }

  /** q108: PII scrubbing — [[graft.api.TextAnalysis.piiScrub]] over a
    * contact string derived deterministically from the customer table
    * (the synthetic corpus carries no PII-shaped text, so the binding
    * MAKES some from real columns — email, E.164 phone, IPv4 per row —
    * and the oracle re-derives it identically, making this an honest
    * cross-engine parity check of the scrub regexes, not a vacuous
    * all-zeros row). */
  def q108(s: SparkSession, d: String): DataFrame = {
    val txt = customer(s, d).select(
      col("c_custkey"),
      concat(lit("reach "), col("c_name"), lit("@mail.example or +"),
        (col("c_custkey") * 7919 + 1000000).cast("string"),
        lit(" at 10.0."), (col("c_custkey") % 256).cast("string"),
        lit(".25 today")).as("contact"))
    graft.api.TextAnalysis.piiScrub(txt, "c_custkey", "contact")
      .orderBy("doc_id")
  }

  /** q109: vocabulary coverage — [[graft.api.TextAnalysis.vocabOov]]:
    * top-20 corpus vocabulary (of this corpus's 31 distinct tokens),
    * per-document out-of-vocabulary occurrence rate. */
  def q109(s: SparkSession, d: String): DataFrame =
    graft.api.TextAnalysis.vocabOov(documents(s, d), "doc_id", "text", 20)
      .orderBy("doc_id")

  /** q110: cross-document segment dedup —
    * [[graft.api.GraftOps.segmentDedup]] with a word separator (this
    * corpus has no line structure) and a 0.78-of-corpus threshold: a
    * scale-invariant dial (resolved as a scalar subquery) that splits
    * this corpus's doc-frequency distribution — tokens in ≥78% of
    * documents are boilerplate and are removed from every document,
    * position-exact reassembly of the rest. */
  def q110(s: SparkSession, d: String): DataFrame =
    graft.api.GraftOps.segmentDedup(documents(s, d), "doc_id", "text",
        sep = " ", minDocFrac = Some(0.78))
      .orderBy("doc_id")

  /** q111: temperature resampling — [[graft.api.GraftOps
    * .temperatureResample]] at α = 0.5 rebalances the language mix
    * (surviving counts ∝ n^0.5, the smallest language kept whole),
    * audited per language. Deterministic and append-stable where
    * rand()-based resampling is neither. */
  def q111(s: SparkSession, d: String): DataFrame =
    graft.api.GraftOps.temperatureResample(documents(s, d), "doc_id",
        "lang", alpha = 0.5)
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("total_chars"))
      .orderBy("lang")

  /** q112: incremental dedup against history —
    * [[graft.api.GraftOps.dedupAgainstCorpus]]: the doc_id % 5 == 0 slice
    * arrives as the "new batch", the rest is the existing corpus; batch
    * rows whose content already exists in the corpus drop, the batch then
    * keep-best dedups within itself. */
  def q112(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
    graft.api.GraftOps.dedupAgainstCorpus(
        docs.filter(col("doc_id") % 5 === 0),
        docs.filter(col("doc_id") % 5 =!= 0),
        "doc_id", "text", "n_chars")
      .select(col("doc_id"), col("lang"), col("n_chars"))
      .orderBy("doc_id")
  }

  /** q113: span-level overlap — [[graft.api.TextAnalysis
    * .winnowedOverlapPairs]] (MOSS winnowing) between the doc_id % 5
    * train/test slices: which test doc does each train doc overlap, and
    * by how many shared fingerprints (k = 3, w = 4 — any shared 6-token
    * run is guaranteed caught). The md5 hash mode makes the window-min
    * selection reproducible in the DuckDB oracle (hex strings order
    * identically everywhere); the xxhash64 default is the 8-byte scale
    * form of the same selection. */
  def q113(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
    graft.api.TextAnalysis.winnowedOverlapPairs(
        docs.filter(col("doc_id") % 5 =!= 0),
        docs.filter(col("doc_id") % 5 === 0),
        "doc_id", "text", k = 3, w = 4, minShared = 3, hash = "md5")
      .orderBy("d1", "d2")
  }

  /** q114: incremental NEAR-dup dedup against history — the near-dup
    * twin of q112: [[graft.api.GraftOps.fingerprintBuild]] persists the
    * doc_id % 5 != 0 corpus's MinHash band index, then the arriving
    * doc_id % 5 == 0 batch drops every doc near-duplicating the corpus
    * (token Jaccard ≥ 0.8, history wins) or a smaller-id batch-mate
    * ([[graft.api.GraftOps.dedupNearAgainstCorpus]]). Rows-only by
    * design (LSH-recall approximate, like q62); the suite pins
    * precision 1.0 (dropped ⊆ exact-dropped) and batch∘append ≡
    * one-shot on controlled corpora. */
  def q114(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
    val dir = Tables.scratchDir("graft_q114_")
    StageTimer.time("q114:index_build") {
      graft.api.GraftOps.fingerprintBuild(docs.filter(col("doc_id") % 5 =!= 0),
        "doc_id", "text", dir)
    }
    graft.api.GraftOps.dedupNearAgainstCorpus(
        docs.filter(col("doc_id") % 5 === 0), "doc_id", "text", dir,
        minPct = 80, stageKey = Some("q114"))
      .select(col("doc_id"), col("lang"), col("n_chars"))
      .orderBy("doc_id")
  }

  /** q116: incremental exact dedup against a PERSISTED digest index —
    * q112 with the history side swapped from "re-hash all of history's
    * text per batch" to [[graft.api.GraftOps.digestIndexBuild]]'s
    * bucket-partitioned distinct-digest table: the probe reads only the
    * bucket partitions the batch's own digests touch
    * ([[graft.api.GraftOps.dedupExactAgainstCorpus]]), so per-batch cost
    * is governed by the batch, not history. Same answer as q112
    * row-for-row (exact dedup has no recall trade), so it shares q112's
    * oracle SQL verbatim. */
  def q116(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
    val dir = Tables.scratchDir("graft_q116_")
    StageTimer.time("q116:index_build") {
      graft.api.GraftOps.digestIndexBuild(
        docs.filter(col("doc_id") % 5 =!= 0), "text", dir, nBuckets = 64)
    }
    graft.api.GraftOps.dedupExactAgainstCorpus(
        docs.filter(col("doc_id") % 5 === 0), "doc_id", "text", "n_chars",
        dir)
      .select(col("doc_id"), col("lang"), col("n_chars"))
      .orderBy("doc_id")
  }

  /** q117: sequence packing — [[graft.api.GraftOps.packSequences]] over
    * the documents table (whitespace token counts, 512-token sequences,
    * 8 shards at this scale): the corpus concatenated into deterministic
    * per-shard token streams and cut at fixed boundaries, each doc
    * reporting its stream offset, first sequence, in-sequence offset,
    * and how many sequences it straddles — the stage after
    * selection/mixing (q106/q107/q111) that turns a curated corpus into
    * fixed-length training rows. Fully SQL-expressible (md5 shard +
    * windowed running sum), so oracle-exact. */
  def q117(s: SparkSession, d: String): DataFrame = {
    graft.api.GraftOps.packSequences(
        documents(s, d).withColumn("n_tokens",
          size(split(col("text"), " ")).cast("long")),
        "doc_id", "n_tokens", seqLen = 512, nShards = 8)
      .select(col("doc_id"), col("n_tokens"), col("shard"), col("pack_off"),
        col("seq_first"), col("seq_off"), col("seq_spans"))
      .orderBy("doc_id")
  }

  /** q118: packed-sequence manifest —
    * [[graft.api.GraftOps.packSequenceRows]] over the documents table
    * (same 512-token/8-shard layout as q117): q117 reports each doc's
    * offsets; this row materializes the loader-facing manifest — one row
    * per (doc, sequence) with the doc-relative slice [doc_from, doc_to)
    * and its position `seq_from` inside the fixed-length sequence. The
    * slices of any sequence tile [0, 512) exactly (ScalaCheck-pinned);
    * fully SQL-expressible (explode of the span count), so
    * oracle-exact. */
  def q118(s: SparkSession, d: String): DataFrame = {
    graft.api.GraftOps.packSequenceRows(
        documents(s, d).withColumn("n_tokens",
          size(split(col("text"), " ")).cast("long")),
        "doc_id", "n_tokens", seqLen = 512, nShards = 8)
      .select(col("doc_id"), col("shard"), col("seq_id"), col("doc_from"),
        col("doc_to"), col("seq_from"))
      .orderBy("doc_id", "seq_id")
  }

  /** q119: sliding-window chunking —
    * [[graft.api.TextAnalysis.chunkByTokens]] over the documents table
    * (64-token chunks, 16-token overlap): each document split into
    * overlapping fixed-size windows with slice bounds and re-joined
    * chunk text — the RAG-indexing / long-doc-eval counterpart to
    * q117's concatenating layout. Zero-shuffle explode; fully
    * SQL-expressible (list slicing), so oracle-exact. */
  def q119(s: SparkSession, d: String): DataFrame = {
    graft.api.TextAnalysis.chunkByTokens(
        documents(s, d), "text", chunkSize = 64, overlap = 16)
      .select(col("doc_id"), col("chunk_id"), col("tok_from"), col("tok_to"),
        col("chunk_text"))
      .orderBy("doc_id", "chunk_id")
  }

  /** q120: corpus snapshot diff — [[graft.api.GraftOps.corpusDiff]]
    * between two deterministic views of the documents table (old =
    * doc_id % 4 ≠ 3; new = doc_id % 4 ≠ 1 with ' v2' appended to the
    * text of even doc_ids), auditing what a re-ingest changed:
    * added / removed / changed per doc_id. The Spark side compares md5
    * payload digests (only ~48 bytes per doc cross the shuffle); the
    * oracle compares the text directly — same answer by construction.
    * Status logic is a full-outer equi-join, so oracle-exact. */
  def q120(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
    val oldSnap = docs.filter(col("doc_id") % 4 =!= 3)
    val newSnap = docs.filter(col("doc_id") % 4 =!= 1)
      .withColumn("text", when(col("doc_id") % 2 === 0,
        concat(col("text"), lit(" v2"))).otherwise(col("text")))
    graft.api.GraftOps.corpusDiff(oldSnap, newSnap, "doc_id", Seq("text"))
      .select(col("doc_id"), col("status"))
      .orderBy("doc_id")
  }

  /** q121: deterministic epoch shuffle —
    * [[graft.api.GraftOps.epochShuffle]] over the distinct packed
    * sequences of q118's layout (512-token/8-shard): each shard's
    * sequences get a seed-keyed pseudo-random epoch position,
    * reproducible across re-runs and engines (md5 ordering key) — the
    * stage that hands a training loader its epoch order. Per-shard
    * window + row_number, so oracle-exact. */
  def q121(s: SparkSession, d: String): DataFrame = {
    val seqs = graft.api.GraftOps.packSequenceRows(
        documents(s, d).withColumn("n_tokens",
          size(split(col("text"), " ")).cast("long")),
        "doc_id", "n_tokens", seqLen = 512, nShards = 8)
      .select(col("shard"), col("seq_id")).distinct()
    graft.api.GraftOps.epochShuffle(seqs, "shard", Seq("seq_id"), seed = 7L)
      .select(col("shard"), col("seq_id"), col("epoch_pos"))
      .orderBy("shard", "epoch_pos")
  }

  /** q122: incremental packing against a PERSISTED pack index —
    * [[graft.api.GraftOps.packIndexBuild]] freezes the layout of the
    * history docs (doc_id % 3 ≠ 0; 512-token/8-shard — q117's dials),
    * then [[graft.api.GraftOps.packIndexAppend]] lays the arriving
    * batch (doc_id % 3 = 0) out AFTER history: within-batch md5 order
    * rebased by each shard's recorded stream length, so history's
    * already-materialized training rows stay valid. Fully
    * SQL-expressible (history's per-shard totals + the batch's windowed
    * running sum), so oracle-exact. */
  def q122(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d).withColumn("n_tokens",
      size(split(col("text"), " ")).cast("long"))
    val dir = Tables.scratchDir("graft_q122_")
    StageTimer.time("q122:index_build") {
      graft.api.GraftOps.packIndexBuild(
        docs.filter(col("doc_id") % 3 =!= 0), "doc_id", "n_tokens", dir,
        seqLen = 512, nShards = 8)
    }
    graft.api.GraftOps.packIndexAppend(
        docs.filter(col("doc_id") % 3 === 0), "doc_id", "n_tokens", dir)
      .select(col("doc_id"), col("n_tokens"), col("shard"), col("pack_off"),
        col("seq_first"), col("seq_off"), col("seq_spans"))
      .orderBy("doc_id")
  }

  /** q123: length-bucketed inference batches —
    * [[graft.api.GraftOps.lengthBucketBatches]] over the documents
    * table (batches of 32, 4 shards at this scale): rows grouped into
    * fixed-size batches of similar token length so a padded inference
    * run (embedding generation, classifier scoring) wastes minimal pad
    * tokens. The row aggregates per batch — (n_rows, max/sum tokens) —
    * the padding-efficiency audit a pipeline reads. Fully
    * SQL-expressible (per-shard row_number), so oracle-exact. */
  def q123(s: SparkSession, d: String): DataFrame = {
    graft.api.GraftOps.lengthBucketBatches(
        documents(s, d).withColumn("n_tokens",
          size(split(col("text"), " ")).cast("long")),
        "doc_id", "n_tokens", batchSize = 32, nShards = 4)
      .groupBy("shard", "batch_id")
      .agg(count(lit(1)).as("n_rows"), max("n_tokens").as("max_tokens"),
        sum("n_tokens").as("sum_tokens"))
      .orderBy("shard", "batch_id")
  }

  /** q124: document assembly — [[graft.api.GraftOps.assembleDocs]] over
    * the events table: each (user, day)'s event types joined in
    * (ts, type) order into one activity document — the step BEFORE the
    * whole document surface in an event/message-sourced pipeline (chat
    * logs → conversations); the assembled text flows into q65/q60/q117.
    * One shuffle on the group key; `string_agg(... ORDER BY ts, part)`
    * agrees byte-for-byte cross-engine, so oracle-exact. */
  def q124(s: SparkSession, d: String): DataFrame = {
    // ts2 is Tables.events' TimestampType view (`ts` itself is the
    // normalized epoch-nanos long)
    graft.api.GraftOps.assembleDocs(
        events(s, d).withColumn("day", to_date(col("ts2"))),
        Seq("user_id", "day"), "ts2", "event_type")
      .orderBy("user_id", "day")
  }

  /** q125: index retraction — the erasure half of the q116 lifecycle:
    * [[graft.api.GraftOps.digestIndexBuild]] persists the doc_id % 5 ≠ 0
    * corpus's digest index, a takedown batch (the corpus docs with
    * doc_id % 3 = 0 — [[graft.api.GraftOps.corpusDiff]]'s `removed`
    * work-list shape) is RETRACTED
    * ([[graft.api.GraftOps.digestIndexRetract]] — merge-on-read
    * tombstones, O(batch) per retract), then an arriving batch — the
    * doc_id % 5 = 0 docs PLUS the taken-down content re-submitted under
    * new ids (id + 1000000, the re-ingest a takedown is followed by) —
    * dedups against what remains. Every re-submission SURVIVES (its
    * digest was retracted — the answer visibly depends on the retract:
    * a silently inert tombstone path would drop all of them and fail
    * the hash), while content still held by the index keeps dropping.
    * Retraction is DIGEST-level set subtraction (content-keyed,
    * refcount-free): the effective gate is digests(corpus) ∖
    * digests(removed), which the oracle states as an EXCEPT — fully
    * SQL-expressible, so oracle-exact. */
  def q125(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
    val corpus = docs.filter(col("doc_id") % 5 =!= 0)
    val removed = corpus.filter(col("doc_id") % 3 === 0)
    val dir = Tables.scratchDir("graft_q125_")
    StageTimer.time("q125:index_build") {
      graft.api.GraftOps.digestIndexBuild(corpus, "text", dir, nBuckets = 64)
    }
    StageTimer.time("q125:retract") {
      graft.api.GraftOps.digestIndexRetract(removed, "text", dir)
    }
    val fresh = docs.filter(col("doc_id") % 5 === 0)
      .select("doc_id", "text", "lang", "n_chars")
      .unionByName(removed
        .select("doc_id", "text", "lang", "n_chars")
        .withColumn("doc_id", col("doc_id") + 1000000L))
    graft.api.GraftOps.dedupExactAgainstCorpus(
        fresh, "doc_id", "text", "n_chars", dir)
      .select(col("doc_id"), col("lang"), col("n_chars"))
      .orderBy("doc_id")
  }

  /** q126: INCREMENTAL near-dup clustering — q88's transitive clusters
    * maintained batch-at-a-time through a persisted union-find
    * ([[graft.api.GraftOps.clusterIndexBuild]] /
    * [[graft.api.GraftOps.clusterIndexAppend]] /
    * [[graft.api.GraftOps.clusterResolve]]): the q81 pair list splits
    * by pair hash into a 90% HISTORY slice (builds the forest — the
    * one-shot cost every build pays) and two 5% ARRIVING batches that
    * union in, each touching only its own chains — never re-clustering
    * history. The resolved clustering is row-for-row the ONE-SHOT q88
    * answer for any batch composition, so it shares q88's oracle SQL
    * verbatim (the recursive-CTE closure), the q112/q116 pattern for
    * incremental twins. */
  def q126(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
    val pairs = nearDupPairs(s, d) // memoized — computed once, fanned out
    val dir = Tables.scratchDir("graft_q126_")
    // the operator's intended shape: a large standing corpus (90% of
    // the pairs — the one-shot cost EVERY build pays) unioning in two
    // small refresh batches (5% each), never re-clustering history
    val h = pmod(col("d1") + col("d2"), lit(20))
    StageTimer.time("q126:index_build") {
      graft.api.GraftOps.clusterIndexBuild(pairs.filter(h < 18),
        "d1", "d2", dir, nBuckets = 64)
    }
    StageTimer.time("q126:appends") {
      graft.api.GraftOps.clusterIndexAppend(pairs.filter(h === 18),
        "d1", "d2", dir)
      graft.api.GraftOps.clusterIndexAppend(pairs.filter(h === 19),
        "d1", "d2", dir)
    }
    val comp = graft.api.GraftOps.clusterResolve(s, dir)
    val w = Window.partitionBy("component")
    docs.select(col("doc_id"))
      .join(comp, col("doc_id") === col("node"), "left")
      .select(col("doc_id"),
        coalesce(col("cluster"), col("doc_id")).as("component"))
      .withColumn("csize", count(lit(1)).over(w))
      .withColumn("is_keeper", (col("doc_id") === col("component")).cast("int"))
      .orderBy("doc_id")
  }

  /** q127: CLUSTER-INDEX ERASURE — the takedown path of q126's
    * persisted union-find ([[graft.api.GraftOps.clusterRetract]] →
    * [[graft.api.GraftOps.clusterIndexCompact]] →
    * [[graft.api.GraftOps.clusterResolve]]): the q81 pair list builds
    * the forest, a deterministic takedown set (doc_id % 17 = 3)
    * retracts, and the compact re-derives every affected component
    * from the SURVIVING persisted edges — so clusters a taken-down
    * bridge document alone connected actually SPLIT, and a retracted
    * id appears nowhere in the output (not as a member, not as a
    * label). Oracle-exact: the q88/q126 recursive-CTE closure over
    * pairs with BOTH endpoints live, labeled over the live document
    * set — erasure graded by the same hash gate as everything else. */
  def q127(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
    val pairs = nearDupPairs(s, d) // memoized — shared with q126/q88
    val dir = Tables.scratchDir("graft_q127_")
    val retracted = docs.filter(col("doc_id") % 17 === 3).select("doc_id")
    StageTimer.time("q127:index_build") {
      graft.api.GraftOps.clusterIndexBuild(pairs, "d1", "d2", dir,
        nBuckets = 64)
    }
    StageTimer.time("q127:retract") {
      graft.api.GraftOps.clusterRetract(retracted, "doc_id", dir)
    }
    StageTimer.time("q127:compact") {
      graft.api.GraftOps.clusterIndexCompact(s, dir)
    }
    val comp = graft.api.GraftOps.clusterResolve(s, dir)
    val w = Window.partitionBy("component")
    docs.join(retracted, Seq("doc_id"), "left_anti").select(col("doc_id"))
      .join(comp, col("doc_id") === col("node"), "left")
      .select(col("doc_id"),
        coalesce(col("cluster"), col("doc_id")).as("component"))
      .withColumn("csize", count(lit(1)).over(w))
      .withColumn("is_keeper", (col("doc_id") === col("component")).cast("int"))
      .orderBy("doc_id")
  }

  /** q128: weighted sampling without replacement —
    * [[graft.api.GraftOps.weightedSampleBy]], 40 docs per language with
    * inclusion probability ∝ n_chars (length-proportional draw, the
    * doc-granular route to token-proportional mixes). Efraimidis–
    * Spirakis exponential-race clocks over the key-pure md5 uniform:
    * no RNG state, so the oracle re-derives the exact winner set —
    * a SAMPLING operator graded by the hash gate, not by statistics.
    * The statistical twin of greedy q107: q107 takes the head of the
    * score order and never represents the tail; this draws P ∝ weight
    * across the whole distribution. */
  def q128(s: SparkSession, d: String): DataFrame =
    graft.api.GraftOps.weightedSampleBy(documents(s, d),
        "doc_id", "n_chars", "lang", k = 40)
      .select(col("doc_id"), col("lang"), col("n_chars"))
      .orderBy("doc_id")

  /** q130: q116's probe with the Bloom sidecar engaged —
    * [[graft.api.GraftOps.digestIndexBuild]] with `bloomFpp = 0.01`, so
    * the probe splits the arriving batch BEFORE the index scan:
    * bloom-miss rows are definitively novel (no false negatives) and
    * never touch history at all; only hit buckets are read. Verdicts
    * are identical to the plain index by construction (the sidecar
    * property in the suite) — same oracle as q116 — which is the point:
    * this row prices the 100 TB ingest steady state, where most
    * arriving content is new and the probe's cost driver becomes the
    * batch's own sketch, not history's touched slice. */
  def q130(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
    val dir = Tables.scratchDir("graft_q130_")
    StageTimer.time("q130:index_build") {
      graft.api.GraftOps.digestIndexBuild(
        docs.filter(col("doc_id") % 5 =!= 0), "text", dir, nBuckets = 64,
        bloomFpp = Some(0.01))
    }
    StageTimer.time("q130:probe") {
      graft.api.GraftOps.dedupExactAgainstCorpus(
          docs.filter(col("doc_id") % 5 === 0), "doc_id", "text", "n_chars",
          dir)
        .select(col("doc_id"), col("lang"), col("n_chars"))
        .orderBy("doc_id")
    }
  }

  /** q131: corpus-wide duplicated-span scrub —
    * [[graft.api.GraftOps.substringScrub]] at k = 4, the "remove long
    * duplicated substrings" pass between whole-document (q60) and
    * segment (q110) dedup: any 4-token window occurring at least twice
    * anywhere in the corpus marks its positions, and documents are
    * reassembled from the surviving tokens. k = 4 is this corpus's
    * measured bracket (i.i.d. 31-word text): ~18% of tokens sit in a
    * duplicated window — real removal, documents mostly survive (k = 3
    * blanks 92%, k = 5 touches 9%). */
  def q131(s: SparkSession, d: String): DataFrame =
    graft.api.GraftOps.substringScrub(documents(s, d), "doc_id", "text",
        k = 4)
      .orderBy("doc_id")

  /** q132: incremental duplicated-span scrub — q131 with the corpus side
    * swapped from "re-window all of history per batch" to a persisted
    * [[graft.api.GraftOps.gramIndexBuild]] frequency index: the arriving
    * 20% batch is scrubbed against the other 80% WITHOUT re-reading it
    * (history prunes to the batch's touched buckets and arrives
    * pre-folded, one count per distinct batch window). The spec-pinned
    * law makes the oracle exact: scrub(batch | history) equals the
    * one-shot scrub over ALL documents restricted to the batch's docs,
    * so the SQL is q131's with the output filtered. */
  def q132(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
    val dir = Tables.scratchDir("graft_q132_")
    StageTimer.time("q132:index_build") {
      graft.api.GraftOps.gramIndexBuild(
        docs.filter(col("doc_id") % 5 =!= 0), "text", dir, k = 4,
        nBuckets = 64)
    }
    StageTimer.time("q132:probe") {
      graft.api.GraftOps.substringScrubAgainstCorpus(
          docs.filter(col("doc_id") % 5 === 0), "doc_id", "text", dir)
        .orderBy("doc_id")
    }
  }

  /** q129: per-language length-distribution report —
    * [[graft.api.GraftOps.quantileByRank]], the EXACT p25/p50/p75/p90/p99
    * of n_chars per lang by type-1 rank selection (rank arithmetic is
    * integer-exact, so the oracle re-derives the report byte-for-byte;
    * interpolating estimators cannot cross the engine boundary — decimal
    * vs IEEE literal arithmetic flips ceil at some n). The sketch twin
    * `quantileSketch` (percentile_approx, mergeable, no sort) is pinned
    * to this exact path in the suite. */
  def q129(s: SparkSession, d: String): DataFrame =
    graft.api.GraftOps.quantileByRank(documents(s, d), "n_chars", "lang",
        Seq(25, 50, 75, 90, 99))
      .orderBy("lang", "pct")

  /** q134: corpus-wide heavy hitters, the TWO-PASS bounded-memory way —
    * [[graft.api.GraftOps.heavyHittersTwoPass]]: the top-20 most
    * frequent tokens of the corpus, found by a mergeable Misra–Gries
    * summary (every executor bounded at 64 counters; O(partitions × 64)
    * map entries shuffle, never the vocabulary) whose ≤ 64 candidates
    * are then re-counted EXACTLY and ranked — the frequency table that
    * feeds stopword lists, boilerplate alarms, and q109's vocabulary
    * audits when the token domain no longer fits a plain groupBy's
    * shuffle. Oracle-exact: MG's coverage guarantee (every value more
    * frequent than N/65 survives pass 1) makes the two-pass output
    * EQUAL the plain top-20 — the suite pins that equivalence for
    * arbitrary corpora and partition layouts whenever the k-th count
    * clears the line, and this corpus clears it by construction. */
  def q134(s: SparkSession, d: String): DataFrame =
    graft.api.GraftOps.heavyHittersTwoPass(
        documents(s, d).select(
          explode(split(col("text"), " ")).as("token")),
        "token", k = 20, capacity = 64)
      .withColumnRenamed("key", "token")
      .orderBy("rn")

  /** q135: BM25 keyword retrieval — [[graft.api.GraftOps.bm25TopK]]:
    * each of the first 10 documents queries the corpus with its own
    * first 4 tokens (the more-like-this shape; the self-document ranks
    * where the weighting puts it, no special-casing), top-5 by the
    * classic Okapi BM25 score at the textbook dials k1 = 1.2 /
    * b = 0.75. The lexical member of the retrieval family — q66/q102
    * are the dense member, q136 fuses the two. Oracle-exact: the
    * formula re-derives in SQL over the same all-DOUBLE arithmetic,
    * and both engines rank by the 4dp-rounded score with doc-id
    * tiebreak. */
  def q135(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
    val qs = docs.filter(col("doc_id") < 10)
      .select(col("doc_id"), slice(split(col("text"), " "), 1, 4).as("terms"))
    graft.api.GraftOps.bm25TopK(docs, "doc_id", "text",
      qs, "doc_id", "terms", k = 5)
  }

  /** q137: BM25 retrieval against a PERSISTED postings index — q135
    * with the corpus side swapped from "re-derive tf/df/avgdl per call"
    * to [[graft.api.GraftOps.bm25IndexBuild]]'s IndexStore member (the
    * retrieval family's persisted index, like every other family has):
    * 80% of the corpus builds the index, the remaining 20% arrives as
    * an APPEND, and the same 10 more-like-this queries probe it reading
    * only their query terms' buckets — history never re-tokenizes. The
    * spec-pinned law bm25AgainstCorpus(Q | index) ≡ bm25TopK(C, Q) over
    * the net corpus makes the oracle exact: the SQL is q135's verbatim
    * (same corpus, same queries, same 4dp-rounded ranking). */
  def q137(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
    val dir = Tables.scratchDir("graft_q137_")
    StageTimer.time("q137:index_build") {
      graft.api.GraftOps.bm25IndexBuild(
        docs.filter(col("doc_id") % 5 =!= 0), "doc_id", "text", dir,
        nBuckets = 64)
      graft.api.GraftOps.bm25IndexAppend(
        docs.filter(col("doc_id") % 5 === 0), "doc_id", "text", dir)
    }
    val qs = docs.filter(col("doc_id") < 10)
      .select(col("doc_id"), slice(split(col("text"), " "), 1, 4).as("terms"))
    StageTimer.time("q137:probe") {
      graft.api.GraftOps.bm25AgainstCorpus(qs, "doc_id", "terms", dir, k = 5)
    }
  }

  /** q138: DSIR data selection — [[graft.api.GraftOps.dsirSelect]]
    * (Xie et al., NeurIPS 2023): every 7th document plays the TARGET
    * seed ("the data you want more of"), the rest is the RAW pool, and
    * the 50 raw docs whose unigram+bigram bags are most
    * target-over-raw likely are selected — the distribution-matching
    * selector that complements the isolation quality gates (q65/q97)
    * and the diversity keeps (q133). Text-keyed features here (the
    * oracle re-derives counts, add-one smoothing, and the per-doc
    * log-ratio sum to the shared 4dp boundary); `featureBuckets` is the
    * bounded-memory hash variant for corpora whose vocabulary no longer
    * fits a count table (suite-pinned deterministic across layouts). */
  def q138(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
    graft.api.GraftOps.dsirSelect(
      docs.filter(col("doc_id") % 7 =!= 0), "doc_id", "text",
      docs.filter(col("doc_id") % 7 === 0), "text", k = 50, n = 2)
  }

  /** q139: language-model perplexity per document —
    * [[graft.api.GraftOps.lmPerplexity]] (the CCNet fluency gate,
    * Wenzek et al. 2020): an add-one bigram model trains on the q138
    * reference slice (every 7th doc) and every document scores
    * exp(−mean ln p(w | prev)) under it — low = fluent under the
    * reference, high = out-of-distribution or degenerate; CCNet's
    * head/middle/tail buckets are the [[graft.api.GraftOps
    * .quantileByRank]] composition (suite-pinned). The ABSOLUTE
    * fluency signal next to q138's RELATIVE target-over-raw ratio.
    * Oracle-exact: counts, smoothing, and the per-event log sum
    * re-derive in SQL to the shared 4dp boundary; docs shorter than
    * two tokens emit NULL ppl on both sides. */
  def q139(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
    graft.api.GraftOps.lmPerplexity(docs, "doc_id", "text",
        docs.filter(col("doc_id") % 7 === 0), "text", n = 2)
      .orderBy("doc_id")
  }

  /** q140: INCREMENTAL DSIR — q138 with the pool side swapped from
    * "re-count the whole raw corpus per call" to a persisted
    * [[graft.api.GraftOps.dsirStatsBuild]] feature-count store: the
    * arriving 20%-of-pool batch scores against the other 80% WITHOUT
    * re-reading it (the batch's own counts add to the frozen raw
    * distribution — q132's batch-plus-history convention — so the
    * spec-pinned law scoreAgainstStats(B \| stats(H, T)) ≡
    * dsirScores(H ∪ B, T) restricted to B makes the oracle exact:
    * q138's score SQL, filtered to the batch's ids). Counts and the
    * two N scalars are ADDITIVE segments (append positive, retract
    * negated, compact folds), so the pool AND the target seed both
    * evolve and both forget. */
  def q140(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
    val pool = docs.filter(col("doc_id") % 7 =!= 0)
    val dir = Tables.scratchDir("graft_q140_")
    StageTimer.time("q140:index_build") {
      graft.api.GraftOps.dsirStatsBuild(
        pool.filter(col("doc_id") % 5 =!= 0), "doc_id", "text",
        docs.filter(col("doc_id") % 7 === 0), "text", dir, n = 2,
        nBuckets = 64)
    }
    StageTimer.time("q140:probe") {
      graft.api.GraftOps.dsirScoreAgainstStats(
          pool.filter(col("doc_id") % 5 === 0), "doc_id", "text", dir)
        .orderBy("doc_id")
    }
  }

  /** q141: BPE tokenizer training — [[graft.api.TextAnalysis.bpeTrain]]
    * (Sennrich et al., ACL 2016): learn the 24 most frequent adjacent
    * symbol merges of the corpus, from characters + an end-of-word
    * marker up — the subword vocabulary a training pipeline learns
    * BEFORE it can token-count, pack, or budget (q74/q107/q117 all
    * presuppose a tokenizer; this is where one comes from). The corpus
    * reduces once to a vocabulary-sized (word, freq) table; each merge
    * is one small aggregation + a 1-row argmax (the Lloyd-loop
    * convention), ties lexicographic so the same corpus always learns
    * the same list. Rows-only by design (an iterative argmax is not
    * SQL-expressible — q52's class); the suite pins the whole merge
    * list against an in-memory reference for arbitrary corpora, and
    * pins [[graft.api.TextAnalysis.bpeEncode]]'s lossless round-trip
    * (every word's tokens concatenate back to word + marker). */
  def q141(s: SparkSession, d: String): DataFrame =
    graft.api.TextAnalysis.bpeTrain(documents(s, d), "text",
        numMerges = 24)
      .orderBy("rank")

  /** q143: INCREMENTAL LM perplexity — q139 with the reference side
    * swapped from "re-reduce the clean corpus per call" to a persisted
    * [[graft.api.GraftOps.lmStatsBuild]] count store (the NINTH index
    * family): 80% of the reference slice builds the store, the rest
    * arrives as an APPEND, and every document scores against the net
    * counts WITHOUT re-reading the reference — history prunes to the
    * batch's event buckets, V folds from count-table data. The CCNet
    * production shape: one curated reference, every crawl batch gated
    * against it; the reference itself can forget
    * ([[graft.api.GraftOps.lmStatsRetract]] — a removed clean doc
    * stops lending fluency at commit). The spec-pinned law
    * probeAgainstStats(B \| stats(R_net)) ≡ lmPerplexity(B, R_net)
    * makes the oracle exact: q139's SQL verbatim. */
  def q143(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
    val ref = docs.filter(col("doc_id") % 7 === 0)
    val dir = Tables.scratchDir("graft_q143_")
    StageTimer.time("q143:index_build") {
      graft.api.GraftOps.lmStatsBuild(
        ref.filter(col("doc_id") % 5 =!= 0), "text", dir, n = 2,
        nBuckets = 64)
      graft.api.GraftOps.lmStatsAppend(
        ref.filter(col("doc_id") % 5 === 0), "text", dir)
    }
    StageTimer.time("q143:probe") {
      graft.api.GraftOps.lmPerplexityAgainstStats(
          docs, "doc_id", "text", dir)
        .orderBy("doc_id")
    }
  }

  /** q144: fastText-style QUALITY CLASSIFIER — [[graft.api.TextAnalysis
    * .trainQualityClassifier]] (Joulin et al., EACL 2017): a logistic
    * model over hashed bag-of-words features, trained
    * reference-vs-crawl (every 7th doc plays the curated reference —
    * the q138/q139 seed convention) by deterministic full-batch GD
    * (zero init, fixed iterations — the same corpus always learns the
    * same model), then every document scores its reference-class
    * probability — the learned quality gate the GPT-3/CCNet-era
    * pipelines filter web text with, complementing the RULE-based
    * gates (q65/q97 score in isolation, q138 matches distributions,
    * q139 measures fluency; this one LEARNS the boundary from labels).
    * The corpus reduces once to hashed feature rows; each iteration is
    * one action collecting a ≤ B+1-row gradient (bounded metadata, the
    * Lloyd convention); scoring is one broadcast join + per-doc sum.
    * Rows-only by design (iterative GD, q52's class); the whole weight
    * table is ScalaCheck-pinned against an in-memory reference over
    * the same feature rows. */
  def q144(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
      .withColumn("label", (col("doc_id") % 7 === 0).cast("int"))
    val model = StageTimer.time("q144:train") {
      graft.api.TextAnalysis.trainQualityClassifier(docs, "doc_id",
        "text", "label", numFeatures = 256, iters = 15)
    }
    StageTimer.time("q144:score") {
      graft.api.TextAnalysis.qualityScore(docs, "doc_id", "text", model)
        .orderBy("doc_id")
    }
  }

  /** q145: TOKENIZE → PACK — the composed seam the pretraining
    * walkthrough ends on (gate → dedup → select → TOKENIZE → pack):
    * [[graft.api.TextAnalysis.bpeTrain]] learns the merge list on the
    * corpus (method "local" — the word table is vocabulary-sized, zero
    * jobs per merge), [[graft.api.TextAnalysis.bpeVocab]] freezes the
    * id space, [[graft.api.TextAnalysis.bpeEncode]] +
    * [[graft.api.TextAnalysis.bpeTokenIds]] emit per-doc integer id
    * streams, and [[graft.api.GraftOps.packSequences]] lays the ID
    * STREAMS out into fixed-length training sequences — after this
    * stage nothing downstream touches a string. Rows-only by design
    * (BPE's iterative argmax is not SQL-expressible — q141's class);
    * the TokenizePackSpec pins id-stream decode losslessness,
    * gap-free per-shard tiling, and layout equality between the id
    * frame and its token-count projection, and CorpusBuild step 0c
    * asserts the composition end-to-end. Emits one row per document:
    * (doc_id, n_tokens, shard, pack_off, seq_first, seq_off,
    * seq_spans). */
  def q145(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
    val (enc, voc) = StageTimer.time("q145:tokenize") {
      val merges = graft.api.TextAnalysis.bpeTrain(docs, "text",
        numMerges = 24, method = "local")
      (graft.api.TextAnalysis.bpeEncode(docs, "doc_id", "text", merges),
        graft.api.TextAnalysis.bpeVocab(docs, "text", merges))
    }
    StageTimer.time("q145:pack") {
      val ids = graft.api.TextAnalysis.bpeTokenIds(enc, "doc_id",
        "tokens", voc)
      graft.api.GraftOps.packSequences(ids.drop("ids"), "doc_id",
          "n_tokens", seqLen = 512L, nShards = 8)
        .select("doc_id", "n_tokens", "shard", "pack_off", "seq_first",
          "seq_off", "seq_spans")
        .orderBy("doc_id")
    }
  }

  /** q147: INCREMENTAL quality classifier — q144 against a persisted
    * [[graft.api.TextAnalysis.clfStoreBuild]] feature store (the TENTH
    * index family), completing the claim that every gate in the intake
    * stack has an incremental persisted form: rules are stateless,
    * DSIR has q140's feature-count store, the LM gate q143's
    * gram-count store; the LEARNED gate's training corpus now lives as
    * reduced hashed feature segments, so labeled batches arrive as
    * appends, documents RETRACT (after the commit the next retrain
    * provably never saw them — the right-to-be-forgotten story for a
    * trained model's inputs), and every retrain is O(feature rows) —
    * never a re-tokenization of history text, which may no longer even
    * exist. The binding builds the store on two label batches, appends
    * a third, retracts an erasure slice, retrains against the store,
    * and scores the corpus under the resulting model. Rows-only by
    * design (iterative GD, q144's class); ClfStoreProps pins
    * trainAgainstStore(store after any append/retract script) ≡
    * trainQualityClassifier(net docs) at the suite's 1e-6 weight
    * tolerance, and the compact's loud checks + forget cycle run in
    * IndexLifecycle. */
  def q147(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
      .withColumn("label", (col("doc_id") % 7 === 0).cast("int"))
    val dir = Tables.scratchDir("graft_q147_")
    StageTimer.time("q147:index_build") {
      graft.api.TextAnalysis.clfStoreBuild(
        docs.filter(col("doc_id") % 3 =!= 2), "doc_id", "text", "label",
        dir, numFeatures = 256)
      graft.api.TextAnalysis.clfStoreAppend(
        docs.filter(col("doc_id") % 3 === 2), "doc_id", "text", "label",
        dir)
      graft.api.TextAnalysis.clfStoreRetract(
        docs.filter(col("doc_id") % 11 === 0), "doc_id", "text", "label",
        dir)
    }
    val model = StageTimer.time("q147:train") {
      graft.api.TextAnalysis.trainClassifierAgainstStore(s, dir,
        iters = 15)
    }
    StageTimer.time("q147:score") {
      graft.api.TextAnalysis.qualityScore(docs, "doc_id", "text", model)
        .orderBy("doc_id")
    }
  }

  /** q148: PERSISTED TOKENIZER — q145's tokenize stage against a
    * [[graft.api.TextAnalysis.vocabStoreBuild]] VOCAB store (the
    * ELEVENTH index family), completing the claim that every stage
    * artifact of the pretraining walkthrough is store-backed: the
    * trained merge list + the frozen id vocabulary persist under the
    * versioned-manifest protocol instead of dying with the session, a
    * registered `<unk>` special (fresh contiguous id above the frozen
    * prefix — [[graft.api.TextAnalysis.vocabStoreAppendTokens]];
    * history never renumbers) carries the EXPLICIT out-of-vocabulary
    * policy, and arriving batches tokenize against the store
    * ([[graft.api.TextAnalysis.vocabStoreTokenize]] — merges, vocab,
    * and marker from ONE resolved snapshot). The binding trains on
    * two-thirds of the corpus, freezes the store, registers `<unk>`,
    * and tokenizes EVERYTHING — held-out docs' unseen characters land
    * on the unk id rather than desyncing the stream (n_unk counts
    * them). Rows-only by design (BPE's iterative argmax, q141's
    * class); TokenizePackSpec pins the store law tokenize(B | store) ≡
    * bpeTokenIds(bpeEncode(B, merges), bpeVocab(train, merges)), the
    * frozen-prefix invariant under appends, the loud OOV/collision/
    * duplicate gates, and the append replay watermark. */
  def q148(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
    val dir = Tables.scratchDir("graft_q148_")
    StageTimer.time("q148:train_build") {
      val train = docs.filter(col("doc_id") % 3 =!= 2)
      val merges = graft.api.TextAnalysis.bpeTrain(train, "text",
        numMerges = 24, method = "local")
      graft.api.TextAnalysis.vocabStoreBuild(train, "text", merges, dir)
      graft.api.TextAnalysis.vocabStoreAppendTokens(s, Seq("<unk>"), dir)
    }
    StageTimer.time("q148:tokenize") {
      val unkId = graft.api.TextAnalysis.vocabStoreVocab(s, dir)
        .filter(col("token") === "<unk>").head().getInt(0)
      graft.api.TextAnalysis.vocabStoreTokenize(docs, "doc_id", "text",
          dir, unkToken = Some("<unk>"))
        .select(col("doc_id"), col("n_tokens"),
          size(filter(col("ids"), x => x === lit(unkId)))
            .cast("int").as("n_unk"))
        .orderBy("doc_id")
    }
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q60_exact_dedup" -> q60, "q61_near_dup_jaccard" -> q61,
    "q62_minhash_lsh" -> q62, "q63_tokenize_tf" -> q63,
    "q64_tfidf" -> q64, "q65_text_quality" -> q65,
    "q73_lang_id" -> q73, "q74_token_count" -> q74,
    "q75_fingerprint" -> q75, "q79_simhash_dedup" -> q79,
    "q81_ngram_jaccard" -> q81, "q82_train_test_split" -> q82,
    "q88_near_dup_clusters" -> q88, "q90_hash_sample" -> q90,
    "q92_dedup_keep_best" -> q92, "q94_dedup_apply" -> q94,
    "q97_repetition_quality" -> q97, "q98_boilerplate_ngrams" -> q98,
    "q99_decontaminate" -> q99, "q101_curate_corpus" -> q101,
    "q103_stratified_sample" -> q103, "q104_edit_dist_pairs" -> q104,
    "q105_profile_columns" -> q105, "q106_source_cap" -> q106,
    "q107_token_budget" -> q107, "q108_pii_scrub" -> q108,
    "q109_vocab_oov" -> q109, "q110_segment_dedup" -> q110,
    "q111_temperature_mix" -> q111, "q112_dedup_incremental" -> q112,
    "q113_winnow_overlap" -> q113, "q114_near_dedup_incr" -> q114,
    "q116_exact_dedup_index" -> q116, "q117_pack_sequences" -> q117,
    "q118_pack_rows" -> q118, "q119_chunk_overlap" -> q119,
    "q120_corpus_diff" -> q120, "q121_epoch_shuffle" -> q121,
    "q122_pack_incremental" -> q122, "q123_length_batches" -> q123,
    "q124_assemble_docs" -> q124, "q125_index_retract" -> q125,
    "q126_cluster_incremental" -> q126, "q127_cluster_retract" -> q127,
    "q128_weighted_sample" -> q128, "q129_length_quantiles" -> q129,
    "q130_exact_dedup_bloom" -> q130, "q131_substring_scrub" -> q131,
    "q132_scrub_incremental" -> q132, "q134_heavy_hitters" -> q134,
    "q135_bm25_retrieval" -> q135, "q137_bm25_index" -> q137,
    "q138_dsir_select" -> q138, "q139_lm_perplexity" -> q139,
    "q140_dsir_incremental" -> q140, "q141_bpe_train" -> q141,
    "q143_lm_incremental" -> q143, "q144_quality_classifier" -> q144,
    "q145_tokenize_pack" -> q145, "q147_classifier_incremental" -> q147,
    "q148_vocab_store" -> q148)

  /** Shared by q88 and q126 — one-shot clustering and its incremental
    * union-find twin compute the same transitive answer by
    * construction, so one recursive-CTE closure oracles both. */
  private val NearDupClustersSql =
    """WITH RECURSIVE sh0 AS (
      |  SELECT doc_id, list_distinct(list_transform(
      |    range(0, len(string_split(text, ' ')) - 2),
      |    i -> md5(string_split(text, ' ')[i+1] || ' ' ||
      |             string_split(text, ' ')[i+2] || ' ' ||
      |             string_split(text, ' ')[i+3]))) AS sh
      |  FROM documents WHERE len(string_split(text, ' ')) >= 3),
      |s2 AS (SELECT doc_id, sh, len(sh) AS sz FROM sh0),
      |pairs AS (
      |  SELECT a.doc_id AS d1, b.doc_id AS d2
      |  FROM s2 a JOIN s2 b ON a.doc_id < b.doc_id
      |  WHERE len(list_intersect(a.sh, b.sh)) * 100
      |    >= (a.sz + b.sz - len(list_intersect(a.sh, b.sh))) * 60),
      |edges AS (SELECT d1 AS a, d2 AS b FROM pairs
      |          UNION ALL SELECT d2, d1 FROM pairs),
      |reach AS (
      |  SELECT a AS node, b AS other FROM edges
      |  UNION
      |  SELECT r.node, e.b AS other FROM reach r JOIN edges e ON e.a = r.other),
      |comp AS (SELECT node, LEAST(node, MIN(other)) AS component
      |         FROM reach GROUP BY node),
      |lab AS (
      |  SELECT d.doc_id, COALESCE(c.component, d.doc_id) AS component
      |  FROM documents d LEFT JOIN comp c ON c.node = d.doc_id)
      |SELECT doc_id, component,
      |  COUNT(*) OVER (PARTITION BY component) AS csize,
      |  CAST(doc_id = component AS INT) AS is_keeper
      |FROM lab ORDER BY doc_id""".stripMargin

  /** q127's takedown twin of [[NearDupClustersSql]]: the same
    * recursive-CTE closure, over pairs with BOTH endpoints outside the
    * retracted set, labeled over the live document set — exactly what
    * clusterRetract → clusterIndexCompact → clusterResolve must
    * produce (surviving-edge re-derivation). */
  private val ClusterRetractSql =
    """WITH RECURSIVE sh0 AS (
      |  SELECT doc_id, list_distinct(list_transform(
      |    range(0, len(string_split(text, ' ')) - 2),
      |    i -> md5(string_split(text, ' ')[i+1] || ' ' ||
      |             string_split(text, ' ')[i+2] || ' ' ||
      |             string_split(text, ' ')[i+3]))) AS sh
      |  FROM documents WHERE len(string_split(text, ' ')) >= 3),
      |s2 AS (SELECT doc_id, sh, len(sh) AS sz FROM sh0),
      |retr AS (SELECT doc_id FROM documents WHERE doc_id % 17 = 3),
      |pairs AS (
      |  SELECT a.doc_id AS d1, b.doc_id AS d2
      |  FROM s2 a JOIN s2 b ON a.doc_id < b.doc_id
      |  WHERE len(list_intersect(a.sh, b.sh)) * 100
      |    >= (a.sz + b.sz - len(list_intersect(a.sh, b.sh))) * 60
      |    AND a.doc_id NOT IN (SELECT doc_id FROM retr)
      |    AND b.doc_id NOT IN (SELECT doc_id FROM retr)),
      |edges AS (SELECT d1 AS a, d2 AS b FROM pairs
      |          UNION ALL SELECT d2, d1 FROM pairs),
      |reach AS (
      |  SELECT a AS node, b AS other FROM edges
      |  UNION
      |  SELECT r.node, e.b AS other FROM reach r JOIN edges e ON e.a = r.other),
      |comp AS (SELECT node, LEAST(node, MIN(other)) AS component
      |         FROM reach GROUP BY node),
      |lab AS (
      |  SELECT d.doc_id, COALESCE(c.component, d.doc_id) AS component
      |  FROM documents d LEFT JOIN comp c ON c.node = d.doc_id
      |  WHERE d.doc_id NOT IN (SELECT doc_id FROM retr))
      |SELECT doc_id, component,
      |  COUNT(*) OVER (PARTITION BY component) AS csize,
      |  CAST(doc_id = component AS INT) AS is_keeper
      |FROM lab ORDER BY doc_id""".stripMargin

  /** Shared by q112 and q116 — the two bindings compute the same answer
    * (raw-scan vs digest-index history side). */
  private val DedupIncrementalSql =
    """WITH fresh AS (SELECT * FROM documents WHERE doc_id % 5 = 0),
      |corp AS (SELECT DISTINCT md5(text) AS h FROM documents
      |  WHERE doc_id % 5 <> 0),
      |novel AS (SELECT f.* FROM fresh f
      |  WHERE md5(f.text) NOT IN (SELECT h FROM corp)),
      |best AS (SELECT doc_id, lang, n_chars,
      |  ROW_NUMBER() OVER (PARTITION BY md5(text)
      |    ORDER BY n_chars DESC, doc_id) AS rn FROM novel)
      |SELECT doc_id, lang, n_chars FROM best WHERE rn = 1
      |ORDER BY doc_id""".stripMargin

  /** Shared by q117 and q118 — the packSequences layout (md5 shard +
    * windowed running sum). The CASE/error() guard mirrors the Spark
    * side's raise_error on null text: packSequences rejects token count
    * < 1, and size(split(NULL)) is -1 on Spark while
    * len(string_split(NULL)) is NULL on DuckDB — without the guard the
    * two paths would diverge DIFFERENTLY (loud vs silent) if fixtures
    * ever gained null text. With it, both fail loudly. */
  private val PackTokSql =
    """WITH t AS (
      |  SELECT doc_id,
      |    CASE WHEN text IS NULL
      |      THEN CAST(error('pack: null text') AS BIGINT)
      |      ELSE CAST(len(string_split(text, ' ')) AS BIGINT)
      |    END AS n_tokens,
      |    md5(CAST(doc_id AS VARCHAR)) AS h,
      |    CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS INT)
      |      % 8 AS shard
      |  FROM documents)""".stripMargin

  private val PackLayoutSql = PackTokSql +
    """,
      |o AS (
      |  SELECT doc_id, n_tokens, shard,
      |    CAST(SUM(n_tokens) OVER (PARTITION BY shard ORDER BY h, doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens
      |      AS BIGINT) AS pack_off
      |  FROM t)""".stripMargin

  private val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val PhoneRe = "\\+[0-9]{7,15}"
  private val IpRe = "\\b((25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)\\.){3}" +
    "(25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)\\b"

  /** q139 AND q143 share this oracle verbatim: the spec-pinned
    * probe ≡ one-shot law means the incremental binding answers
    * exactly q139's question — its net reference is the same
    * every-7th slice, assembled as build(80%) + append(20%)
    * instead of one scan. */
  private val LmPerplexitySql =
    """WITH d AS (SELECT doc_id, string_split(text, ' ') AS ts
        |           FROM documents),
        |ref AS (SELECT ts FROM d WHERE doc_id % 7 = 0),
        |uni AS (SELECT w, COUNT(*) AS cu FROM
        |  (SELECT unnest(ts) AS w FROM ref) GROUP BY w),
        |vv AS (SELECT COUNT(*) AS v FROM uni),
        |big AS (SELECT ts[u.i] AS prev, ts[u.i + 1] AS w, COUNT(*) AS cb
        |        FROM ref, unnest(range(1, len(ts))) AS u(i)
        |        GROUP BY 1, 2),
        |ev AS (SELECT doc_id, ts[u.i] AS prev, ts[u.i + 1] AS w
        |       FROM d, unnest(range(1, len(ts))) AS u(i)),
        |lnp AS (SELECT e.doc_id,
        |  ln((COALESCE(cb, 0) + 1.0) / (COALESCE(cu, 0) + v)) AS lnp
        |  FROM ev e LEFT JOIN big ON e.prev = big.prev AND e.w = big.w
        |            LEFT JOIN uni ON e.prev = uni.w, vv),
        |sc AS (SELECT doc_id, ROUND(exp(-AVG(lnp)), 4) AS ppl,
        |       CAST(COUNT(*) AS INT) AS n_events FROM lnp
        |       GROUP BY doc_id)
        |SELECT d.doc_id, sc.ppl, COALESCE(sc.n_events, 0) AS n_events
        |FROM d LEFT JOIN sc ON d.doc_id = sc.doc_id
        |ORDER BY d.doc_id""".stripMargin

  val oracle: Map[String, String] = Map(
    "q113_winnow_overlap" ->
      """WITH seg AS (
        |  SELECT doc_id, r.i AS pos,
        |    md5(l[r.i+1] || ' ' || l[r.i+2] || ' ' || l[r.i+3]) AS h,
        |    len(l) - 2 AS m
        |  FROM (SELECT doc_id, string_split(text, ' ') AS l FROM documents
        |        WHERE len(string_split(text, ' ')) >= 3),
        |    unnest(range(len(l) - 2)) AS r(i)),
        |fp AS (
        |  SELECT DISTINCT doc_id, fh FROM (
        |    SELECT doc_id, pos, m,
        |      MIN(h) OVER (PARTITION BY doc_id ORDER BY pos
        |        ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fh
        |    FROM seg)
        |  WHERE pos <= m - 4
        |  UNION
        |  SELECT doc_id, MIN(h) AS fh FROM seg WHERE m < 4 GROUP BY doc_id),
        |pairs AS (
        |  SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS n_shared
        |  FROM fp a JOIN fp b ON a.fh = b.fh
        |  WHERE a.doc_id % 5 <> 0 AND b.doc_id % 5 = 0
        |  GROUP BY 1, 2)
        |SELECT d1, d2, n_shared FROM pairs WHERE n_shared >= 3
        |ORDER BY d1, d2""".stripMargin,
    "q111_temperature_mix" ->
      """WITH c AS (SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang),
        |r AS (SELECT lang,
        |  CAST(floor(power(CAST((SELECT MIN(n) FROM c) AS DOUBLE) / n, 0.5)
        |    * 1000000) AS BIGINT) AS thr FROM c)
        |SELECT d.lang, COUNT(*) AS n_docs,
        |  CAST(SUM(d.n_chars) AS BIGINT) AS total_chars
        |FROM documents d JOIN r USING (lang)
        |WHERE CAST('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 12)
        |    AS BIGINT) % 1000000 < r.thr
        |GROUP BY d.lang ORDER BY lang""".stripMargin,
    "q112_dedup_incremental" -> DedupIncrementalSql,
    // q116 is q112 with the history side served by the persisted digest
    // index — same answer by construction, same oracle verbatim
    "q116_exact_dedup_index" -> DedupIncrementalSql,
    // q130 = q116 with the Bloom sidecar: verdicts identical by the
    // sidecar law (bloom-miss ⇒ truly novel; hits verify exactly), so
    // the same SQL oracles both
    "q130_exact_dedup_bloom" -> DedupIncrementalSql,
    // q125 is q116 after a retract batch, probed by a fresh batch that
    // re-submits the taken-down content under new ids: the effective
    // gate is the digest-level set subtraction the EXCEPT states
    // (tombstone semantics — content-keyed, so a digest shared by a
    // kept doc is still retracted)
    "q125_index_retract" ->
      """WITH corp0 AS (SELECT doc_id, text, lang, n_chars FROM documents
        |  WHERE doc_id % 5 <> 0),
        |rem AS (SELECT * FROM corp0 WHERE doc_id % 3 = 0),
        |eff AS (
        |  SELECT DISTINCT md5(text) AS h FROM corp0
        |  EXCEPT
        |  SELECT DISTINCT md5(text) FROM rem),
        |fresh AS (
        |  SELECT doc_id, text, lang, n_chars FROM documents
        |    WHERE doc_id % 5 = 0
        |  UNION ALL
        |  SELECT doc_id + 1000000, text, lang, n_chars FROM rem),
        |novel AS (SELECT f.* FROM fresh f
        |  WHERE md5(f.text) NOT IN (SELECT h FROM eff)),
        |best AS (SELECT doc_id, lang, n_chars,
        |  ROW_NUMBER() OVER (PARTITION BY md5(text)
        |    ORDER BY n_chars DESC, doc_id) AS rn FROM novel)
        |SELECT doc_id, lang, n_chars FROM best WHERE rn = 1
        |ORDER BY doc_id""".stripMargin,
    "q117_pack_sequences" -> (PackLayoutSql +
      """
        |SELECT doc_id, n_tokens, shard, pack_off,
        |  pack_off // 512 AS seq_first,
        |  pack_off % 512 AS seq_off,
        |  (pack_off + n_tokens - 1) // 512 - pack_off // 512 + 1 AS seq_spans
        |FROM o ORDER BY doc_id""".stripMargin),
    "q118_pack_rows" -> (PackLayoutSql +
      """,
        |e AS (
        |  SELECT doc_id, n_tokens, shard,
        |    pack_off // 512 + r.k AS seq_id, pack_off
        |  FROM o, unnest(range(
        |    (pack_off + n_tokens - 1) // 512 - pack_off // 512 + 1)) AS r(k))
        |SELECT doc_id, shard, CAST(seq_id AS BIGINT) AS seq_id,
        |  CAST(GREATEST(0, seq_id * 512 - pack_off) AS BIGINT) AS doc_from,
        |  CAST(LEAST(n_tokens, (seq_id + 1) * 512 - pack_off) AS BIGINT)
        |    AS doc_to,
        |  CAST(GREATEST(0, pack_off - seq_id * 512) AS BIGINT) AS seq_from
        |FROM e ORDER BY doc_id, seq_id""".stripMargin),
    // chunkSize 64, overlap 16 => stride 48; same null-text error() guard
    // convention as the pack oracles (Spark raises, so must DuckDB)
    "q119_chunk_overlap" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS l,
        |    CASE WHEN text IS NULL
        |      THEN CAST(error('chunk: null text') AS BIGINT)
        |      ELSE CAST(len(string_split(text, ' ')) AS BIGINT)
        |    END AS n
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, l, n,
        |    CASE WHEN n <= 64 THEN CAST(1 AS BIGINT)
        |      ELSE (n - 64 + 47) // 48 + 1 END AS n_chunks
        |  FROM t)
        |SELECT doc_id, CAST(r.k AS BIGINT) AS chunk_id,
        |  CAST(r.k * 48 AS BIGINT) AS tok_from,
        |  CAST(LEAST(n, r.k * 48 + 64) AS BIGINT) AS tok_to,
        |  array_to_string(l[CAST(r.k * 48 + 1 AS BIGINT):
        |    CAST(LEAST(n, r.k * 48 + 64) AS BIGINT)], ' ') AS chunk_text
        |FROM c, unnest(range(n_chunks)) AS r(k)
        |ORDER BY doc_id, chunk_id""".stripMargin,
    // the oracle compares text directly; the Spark side compares md5
    // payload digests — identical verdicts by construction
    "q120_corpus_diff" ->
      """WITH oldc AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id % 4 <> 3),
        |newc AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 2 = 0 THEN text || ' v2' ELSE text END AS text
        |  FROM documents WHERE doc_id % 4 <> 1)
        |SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
        |  CASE WHEN o.doc_id IS NULL THEN 'added'
        |       WHEN n.doc_id IS NULL THEN 'removed'
        |       ELSE 'changed' END AS status
        |FROM oldc o FULL OUTER JOIN newc n ON o.doc_id = n.doc_id
        |WHERE o.doc_id IS NULL OR n.doc_id IS NULL
        |  OR o.text IS DISTINCT FROM n.text
        |ORDER BY doc_id""".stripMargin,
    // history = doc_id % 3 <> 0 (its per-shard token totals are the
    // recorded stream lengths); the batch's within-batch running sum is
    // rebased by them — the packIndexAppend layout law
    "q122_pack_incremental" -> (PackTokSql +
      """,
        |old AS (
        |  SELECT shard, SUM(n_tokens) AS base FROM t
        |  WHERE doc_id % 3 <> 0 GROUP BY shard),
        |nw AS (SELECT * FROM t WHERE doc_id % 3 = 0),
        |o AS (
        |  SELECT nw.doc_id, nw.n_tokens, nw.shard,
        |    CAST(COALESCE(old.base, 0)
        |      + SUM(nw.n_tokens) OVER (PARTITION BY nw.shard
        |        ORDER BY nw.h, nw.doc_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      - nw.n_tokens AS BIGINT) AS pack_off
        |  FROM nw LEFT JOIN old ON nw.shard = old.shard)
        |SELECT doc_id, n_tokens, shard, pack_off,
        |  pack_off // 512 AS seq_first,
        |  pack_off % 512 AS seq_off,
        |  (pack_off + n_tokens - 1) // 512 - pack_off // 512 + 1 AS seq_spans
        |FROM o ORDER BY doc_id""".stripMargin),
    // the Spark side raises on null order/part (a silent array_join drop
    // would lose text); the error() guards keep both engines loud
    "q124_assemble_docs" ->
      """WITH e AS (
        |  SELECT user_id,
        |    CASE WHEN ts IS NULL
        |      THEN CAST(error('assemble: null order') AS TIMESTAMP)
        |      ELSE ts END AS ts,
        |    CASE WHEN event_type IS NULL
        |      THEN CAST(error('assemble: null part') AS VARCHAR)
        |      ELSE event_type END AS event_type
        |  FROM events)
        |SELECT user_id, CAST(ts AS DATE) AS day,
        |  string_agg(event_type, ' ' ORDER BY ts, event_type) AS text,
        |  COUNT(*) AS n_parts
        |FROM e GROUP BY user_id, CAST(ts AS DATE)
        |ORDER BY user_id, day""".stripMargin,
    // batchSize 32, 4 shards; same null-text error() guard convention
    "q123_length_batches" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    CASE WHEN text IS NULL
        |      THEN CAST(error('batch: null text') AS BIGINT)
        |      ELSE CAST(len(string_split(text, ' ')) AS BIGINT)
        |    END AS nt,
        |    CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS INT)
        |      % 4 AS shard
        |  FROM documents),
        |a AS (
        |  SELECT shard, nt,
        |    (ROW_NUMBER() OVER (PARTITION BY shard
        |      ORDER BY nt DESC, doc_id) - 1) // 32 AS batch_id
        |  FROM t)
        |SELECT shard, CAST(batch_id AS BIGINT) AS batch_id,
        |  COUNT(*) AS n_rows, MAX(nt) AS max_tokens,
        |  CAST(SUM(nt) AS BIGINT) AS sum_tokens
        |FROM a GROUP BY shard, batch_id ORDER BY shard, batch_id""".stripMargin,
    // seed 7; ordering key md5('7:' || shard || ':' || seq_id) matches the
    // Spark side's concat_ws(":", ...) byte-for-byte
    "q121_epoch_shuffle" -> (PackLayoutSql +
      """,
        |e AS (
        |  SELECT shard, CAST(pack_off // 512 + r.k AS BIGINT) AS seq_id
        |  FROM o, unnest(range(
        |    (pack_off + n_tokens - 1) // 512 - pack_off // 512 + 1)) AS r(k)),
        |s AS (SELECT DISTINCT shard, seq_id FROM e),
        |k AS (
        |  SELECT shard, seq_id,
        |    md5('7:' || CAST(shard AS VARCHAR) || ':'
        |      || CAST(seq_id AS VARCHAR)) AS ek
        |  FROM s)
        |SELECT shard, seq_id,
        |  CAST(ROW_NUMBER() OVER (PARTITION BY shard ORDER BY ek, seq_id) - 1
        |    AS BIGINT) AS epoch_pos
        |FROM k ORDER BY shard, epoch_pos""".stripMargin),
    "q110_segment_dedup" ->
      """WITH seg AS (
        |  SELECT doc_id, r.i AS pos, l[r.i + 1] AS seg FROM
        |    (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
        |    unnest(range(len(l))) AS r(i)),
        |common AS (
        |  SELECT seg FROM seg GROUP BY seg
        |  HAVING COUNT(DISTINCT doc_id) >=
        |    GREATEST(2, ceil(0.78 * (SELECT COUNT(*) FROM documents)))),
        |re AS (
        |  SELECT doc_id, string_agg(seg, ' ' ORDER BY pos) AS text_deduped,
        |    COUNT(*) AS n_kept
        |  FROM seg WHERE seg NOT IN (SELECT seg FROM common)
        |  GROUP BY doc_id)
        |SELECT d.doc_id,
        |  COALESCE(re.text_deduped, '') AS text_deduped,
        |  CAST(len(string_split(d.text, ' ')) AS INT) AS n_segments,
        |  CAST(len(string_split(d.text, ' ')) - COALESCE(re.n_kept, 0) AS INT)
        |    AS n_removed
        |FROM documents d LEFT JOIN re USING (doc_id) ORDER BY doc_id""".stripMargin,
    // q132: the incremental scrub's spec-pinned law IS the oracle —
    // scrub(batch | history-index) ≡ one-shot scrub(all docs) restricted
    // to the batch's docs, so q131's SQL with the output filtered
    "q132_scrub_incremental" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
        |grams AS (
        |  SELECT doc_id, u.i AS pos, array_to_string(ts[u.i:u.i+3], ' ')
        |    AS gram
        |  FROM toks, unnest(range(1, len(ts) - 2)) AS u(i)),
        |dup AS (SELECT gram FROM grams GROUP BY gram HAVING count(*) >= 2),
        |cov AS (
        |  SELECT DISTINCT doc_id, pos + u.i AS cpos
        |  FROM grams JOIN dup USING (gram), unnest(range(0, 4)) AS u(i)
        |  WHERE doc_id % 5 = 0),
        |tok AS (
        |  SELECT doc_id, u.pos AS pos, ts[u.pos] AS tok
        |  FROM toks, unnest(range(1, len(ts) + 1)) AS u(pos)
        |  WHERE doc_id % 5 = 0)
        |SELECT t.doc_id,
        |  coalesce(string_agg(t.tok, ' ' ORDER BY t.pos)
        |    FILTER (WHERE c.cpos IS NULL), '') AS text_scrubbed,
        |  count(*)::INT AS n_tokens,
        |  count(c.cpos)::INT AS n_removed
        |FROM tok t LEFT JOIN cov c ON t.doc_id = c.doc_id AND t.pos = c.cpos
        |GROUP BY t.doc_id ORDER BY t.doc_id""".stripMargin,
    // q131: the duplicated-span model re-derived literally — windows by
    // gram TEXT (the Spark side's xxhash64 is the identity convention),
    // coverage as the distinct union of duplicated windows' positions,
    // reassembly by position order
    "q131_substring_scrub" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
        |grams AS (
        |  SELECT doc_id, u.i AS pos, array_to_string(ts[u.i:u.i+3], ' ')
        |    AS gram
        |  FROM toks, unnest(range(1, len(ts) - 2)) AS u(i)),
        |dup AS (SELECT gram FROM grams GROUP BY gram HAVING count(*) >= 2),
        |cov AS (
        |  SELECT DISTINCT doc_id, pos + u.i AS cpos
        |  FROM grams JOIN dup USING (gram), unnest(range(0, 4)) AS u(i)),
        |tok AS (
        |  SELECT doc_id, u.pos AS pos, ts[u.pos] AS tok
        |  FROM toks, unnest(range(1, len(ts) + 1)) AS u(pos))
        |SELECT t.doc_id,
        |  coalesce(string_agg(t.tok, ' ' ORDER BY t.pos)
        |    FILTER (WHERE c.cpos IS NULL), '') AS text_scrubbed,
        |  count(*)::INT AS n_tokens,
        |  count(c.cpos)::INT AS n_removed
        |FROM tok t LEFT JOIN cov c ON t.doc_id = c.doc_id AND t.pos = c.cpos
        |GROUP BY t.doc_id ORDER BY t.doc_id""".stripMargin,
    // q135: the BM25 formula re-derived literally — every operand cast
    // to DOUBLE so the engines share IEEE arithmetic (DuckDB decimal
    // literals promote on contact with the double operands), ranking by
    // the 4dp-rounded score with doc-id tiebreak on both sides
    "q135_bm25_retrieval" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS ts
        |           FROM documents),
        |st AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n,
        |              AVG(CAST(len(ts) AS DOUBLE)) AS avgdl FROM d),
        |q AS (SELECT DISTINCT doc_id AS qid, unnest(ts[1:4]) AS term
        |      FROM d WHERE doc_id < 10),
        |tok AS (SELECT doc_id AS did, CAST(len(ts) AS DOUBLE) AS dl,
        |               unnest(ts) AS term FROM d),
        |tf AS (SELECT did, term, dl, CAST(COUNT(*) AS DOUBLE) AS tf
        |       FROM tok GROUP BY did, term, dl),
        |dfq AS (SELECT term, CAST(COUNT(*) AS DOUBLE) AS df FROM tf
        |        WHERE term IN (SELECT term FROM q) GROUP BY term),
        |sc AS (SELECT q.qid, tf.did,
        |  ROUND(SUM(ln(1.0 + (st.n - dfq.df + 0.5) / (dfq.df + 0.5)) *
        |    tf.tf * 2.2 / (tf.tf + 1.2 * (0.25 + 0.75 * tf.dl / st.avgdl))),
        |    4) AS score
        |  FROM q JOIN tf USING (term) JOIN dfq USING (term), st
        |  GROUP BY q.qid, tf.did),
        |r AS (SELECT qid, did, score,
        |  ROW_NUMBER() OVER (PARTITION BY qid
        |    ORDER BY score DESC, did ASC) AS rn FROM sc)
        |SELECT qid, CAST(rn AS INT) AS rn, did AS doc_id, score
        |FROM r WHERE rn <= 5 ORDER BY qid, rn""".stripMargin,
    // q137: the probe ≡ bm25TopK over the net indexed corpus (the
    // spec-pinned law), and the binding's build(80%) + append(20%)
    // nets to the FULL documents table — so the oracle is q135's SQL
    // verbatim: same corpus, same queries, same 4dp-rounded ranking
    "q137_bm25_index" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS ts
        |           FROM documents),
        |st AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n,
        |              AVG(CAST(len(ts) AS DOUBLE)) AS avgdl FROM d),
        |q AS (SELECT DISTINCT doc_id AS qid, unnest(ts[1:4]) AS term
        |      FROM d WHERE doc_id < 10),
        |tok AS (SELECT doc_id AS did, CAST(len(ts) AS DOUBLE) AS dl,
        |               unnest(ts) AS term FROM d),
        |tf AS (SELECT did, term, dl, CAST(COUNT(*) AS DOUBLE) AS tf
        |       FROM tok GROUP BY did, term, dl),
        |dfq AS (SELECT term, CAST(COUNT(*) AS DOUBLE) AS df FROM tf
        |        WHERE term IN (SELECT term FROM q) GROUP BY term),
        |sc AS (SELECT q.qid, tf.did,
        |  ROUND(SUM(ln(1.0 + (st.n - dfq.df + 0.5) / (dfq.df + 0.5)) *
        |    tf.tf * 2.2 / (tf.tf + 1.2 * (0.25 + 0.75 * tf.dl / st.avgdl))),
        |    4) AS score
        |  FROM q JOIN tf USING (term) JOIN dfq USING (term), st
        |  GROUP BY q.qid, tf.did),
        |r AS (SELECT qid, did, score,
        |  ROW_NUMBER() OVER (PARTITION BY qid
        |    ORDER BY score DESC, did ASC) AS rn FROM sc)
        |SELECT qid, CAST(rn AS INT) AS rn, did AS doc_id, score
        |FROM r WHERE rn <= 5 ORDER BY qid, rn""".stripMargin,
    // q138: the DSIR arithmetic re-derived literally — per-occurrence
    // unigram + bigram features, add-one smoothing over the SHARED
    // feature space V = |features(raw) ∪ features(target)|, per-doc
    // Σ c_d(g)·(ln p̂_T − ln p̂_R) rounded at the shared 4dp boundary,
    // hard top-50 with doc-id tiebreak on both sides
    "q138_dsir_select" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS ts
        |           FROM documents),
        |rf AS (
        |  SELECT doc_id, ts[u.i] AS feat
        |  FROM d, unnest(range(1, len(ts) + 1)) AS u(i)
        |  WHERE doc_id % 7 <> 0
        |  UNION ALL
        |  SELECT doc_id, ts[u.i] || ' ' || ts[u.i + 1]
        |  FROM d, unnest(range(1, len(ts))) AS u(i)
        |  WHERE doc_id % 7 <> 0),
        |tf AS (
        |  SELECT doc_id, ts[u.i] AS feat
        |  FROM d, unnest(range(1, len(ts) + 1)) AS u(i)
        |  WHERE doc_id % 7 = 0
        |  UNION ALL
        |  SELECT doc_id, ts[u.i] || ' ' || ts[u.i + 1]
        |  FROM d, unnest(range(1, len(ts))) AS u(i)
        |  WHERE doc_id % 7 = 0),
        |rc AS (SELECT feat, COUNT(*) AS cr FROM rf GROUP BY feat),
        |tc AS (SELECT feat, COUNT(*) AS ct FROM tf GROUP BY feat),
        |tot AS (SELECT
        |  (SELECT COUNT(*) FROM rf) AS nr,
        |  (SELECT COUNT(*) FROM tf) AS nt,
        |  (SELECT COUNT(DISTINCT feat) FROM
        |    (SELECT feat FROM rc UNION ALL SELECT feat FROM tc)) AS v),
        |lr AS (SELECT COALESCE(rc.feat, tc.feat) AS feat,
        |  ln((COALESCE(ct, 0) + 1.0) / (nt + v)) -
        |    ln((COALESCE(cr, 0) + 1.0) / (nr + v)) AS lr
        |  FROM rc FULL JOIN tc ON rc.feat = tc.feat, tot),
        |sc AS (SELECT rf.doc_id, ROUND(SUM(lr.lr), 4) AS score
        |  FROM rf JOIN lr ON rf.feat = lr.feat GROUP BY rf.doc_id),
        |r AS (SELECT doc_id, score, ROW_NUMBER() OVER (
        |  ORDER BY score DESC, doc_id ASC) AS rn FROM sc)
        |SELECT doc_id, score, CAST(rn AS INT) AS rn FROM r
        |WHERE rn <= 50 ORDER BY rn""".stripMargin,
    // q139: the bigram-LM arithmetic re-derived literally — reference
    // unigram/bigram counts, add-one smoothing with the V vocabulary
    // scalar, per-doc mean ln p and the 4dp-rounded exp on both sides;
    // eventless (sub-2-token) docs are NULL ppl in both engines
    "q139_lm_perplexity" -> LmPerplexitySql,
    "q143_lm_incremental" -> LmPerplexitySql,
    // q140: the incremental probe ≡ the one-shot DSIR over the whole
    // pool restricted to the batch (the spec-pinned batch-plus-history
    // law), so the oracle is q138's score derivation with the final
    // top-k swapped for the batch filter
    "q140_dsir_incremental" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS ts
        |           FROM documents),
        |rf AS (
        |  SELECT doc_id, ts[u.i] AS feat
        |  FROM d, unnest(range(1, len(ts) + 1)) AS u(i)
        |  WHERE doc_id % 7 <> 0
        |  UNION ALL
        |  SELECT doc_id, ts[u.i] || ' ' || ts[u.i + 1]
        |  FROM d, unnest(range(1, len(ts))) AS u(i)
        |  WHERE doc_id % 7 <> 0),
        |tf AS (
        |  SELECT doc_id, ts[u.i] AS feat
        |  FROM d, unnest(range(1, len(ts) + 1)) AS u(i)
        |  WHERE doc_id % 7 = 0
        |  UNION ALL
        |  SELECT doc_id, ts[u.i] || ' ' || ts[u.i + 1]
        |  FROM d, unnest(range(1, len(ts))) AS u(i)
        |  WHERE doc_id % 7 = 0),
        |rc AS (SELECT feat, COUNT(*) AS cr FROM rf GROUP BY feat),
        |tc AS (SELECT feat, COUNT(*) AS ct FROM tf GROUP BY feat),
        |tot AS (SELECT
        |  (SELECT COUNT(*) FROM rf) AS nr,
        |  (SELECT COUNT(*) FROM tf) AS nt,
        |  (SELECT COUNT(DISTINCT feat) FROM
        |    (SELECT feat FROM rc UNION ALL SELECT feat FROM tc)) AS v),
        |lr AS (SELECT COALESCE(rc.feat, tc.feat) AS feat,
        |  ln((COALESCE(ct, 0) + 1.0) / (nt + v)) -
        |    ln((COALESCE(cr, 0) + 1.0) / (nr + v)) AS lr
        |  FROM rc FULL JOIN tc ON rc.feat = tc.feat, tot),
        |sc AS (SELECT rf.doc_id, ROUND(SUM(lr.lr), 4) AS score
        |  FROM rf JOIN lr ON rf.feat = lr.feat GROUP BY rf.doc_id)
        |SELECT doc_id, score FROM sc WHERE doc_id % 5 = 0
        |ORDER BY doc_id""".stripMargin,
    // q134: the two-pass output equals the plain exact top-20 whenever
    // the 20th count clears N/(capacity+1) — this corpus does by
    // construction (31-token vocabulary under capacity 64, so pass 1
    // holds every counter exactly); the general-case equivalence under
    // the bound is suite-pinned for arbitrary corpora and layouts
    "q134_heavy_hitters" ->
      """WITH t AS (
        |  SELECT unnest(string_split(text, ' ')) AS token FROM documents),
        |c AS (SELECT token, COUNT(*) AS cnt FROM t GROUP BY token),
        |r AS (SELECT token, cnt,
        |  ROW_NUMBER() OVER (ORDER BY cnt DESC, token ASC) AS rn FROM c)
        |SELECT token, cnt, CAST(rn AS INT) AS rn FROM r
        |WHERE rn <= 20 ORDER BY rn""".stripMargin,
    "q106_source_cap" ->
      """SELECT doc_id, source, n_chars, CAST(rn AS INT) AS grp_rank FROM (
        |  SELECT doc_id, source, n_chars,
        |    ROW_NUMBER() OVER (PARTITION BY source
        |      ORDER BY n_chars DESC, doc_id) AS rn
        |  FROM documents)
        |WHERE rn <= 10 ORDER BY doc_id""".stripMargin,
    "q107_token_budget" ->
      """SELECT doc_id, lang, n_tokens, CAST(cum AS BIGINT) AS cum_tokens FROM (
        |  SELECT doc_id, lang,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |    SUM(CAST(len(string_split(text, ' ')) AS BIGINT)) OVER (
        |      PARTITION BY lang ORDER BY n_chars DESC, doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM documents)
        |WHERE cum <= 2000 ORDER BY doc_id""".stripMargin,
    "q108_pii_scrub" ->
      s"""WITH t AS (
         |  SELECT c_custkey AS doc_id,
         |    'reach ' || c_name || '@mail.example or +' ||
         |    CAST(c_custkey * 7919 + 1000000 AS VARCHAR) ||
         |    ' at 10.0.' || CAST(c_custkey % 256 AS VARCHAR) || '.25 today'
         |      AS contact
         |  FROM customer)
         |SELECT doc_id,
         |  regexp_replace(regexp_replace(regexp_replace(contact,
         |    '$EmailRe', '<EMAIL>', 'g'),
         |    '$IpRe', '<IP>', 'g'),
         |    '$PhoneRe', '<PHONE>', 'g') AS scrubbed,
         |  CAST(len(regexp_extract_all(contact, '$EmailRe')) AS INT) AS n_emails,
         |  CAST(len(regexp_extract_all(contact, '$PhoneRe')) AS INT) AS n_phones,
         |  CAST(len(regexp_extract_all(contact, '$IpRe')) AS INT) AS n_ips
         |FROM t ORDER BY doc_id""".stripMargin,
    "q109_vocab_oov" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS token
        |  FROM documents),
        |vocab AS (
        |  SELECT token FROM (
        |    SELECT token, COUNT(*) AS cnt FROM tok GROUP BY token
        |    ORDER BY cnt DESC, token LIMIT 20)),
        |per AS (
        |  SELECT t.doc_id, COUNT(*) AS wc,
        |    SUM(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END) AS n_oov
        |  FROM tok t LEFT JOIN vocab v USING (token) GROUP BY t.doc_id)
        |SELECT doc_id, wc, CAST(n_oov AS BIGINT) AS n_oov,
        |  CAST(n_oov AS DOUBLE) / wc AS oov_frac
        |FROM per ORDER BY doc_id""".stripMargin,
    "q105_profile_columns" ->
      Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority")
        .map(c =>
          s"""SELECT '$c' AS col_name, COUNT(*) AS n_rows,
             |  CAST(SUM(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_nulls,
             |  COUNT(DISTINCT $c) AS n_distinct,
             |  CAST(MIN($c) AS VARCHAR) AS min_value,
             |  CAST(MAX($c) AS VARCHAR) AS max_value
             |FROM orders""".stripMargin)
        .mkString("", "\nUNION ALL\n", "\nORDER BY col_name"),
    "q104_edit_dist_pairs" ->
      """SELECT a.c_custkey AS d1, b.c_custkey AS d2,
        |  CAST(levenshtein(a.c_name, b.c_name) AS INT) AS dist
        |FROM customer a JOIN customer b ON a.c_custkey < b.c_custkey
        |WHERE levenshtein(a.c_name, b.c_name) <= 1
        |ORDER BY d1, d2""".stripMargin,
    "q103_stratified_sample" ->
      """WITH b AS (
        |  SELECT lang, n_chars,
        |    CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS INT)
        |      % 100 AS bucket,
        |    CASE lang WHEN 'en' THEN 20 WHEN 'zh' THEN 60 WHEN 'es' THEN 60
        |      ELSE 40 END AS pct
        |  FROM documents)
        |SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars
        |FROM b WHERE bucket < pct GROUP BY lang ORDER BY lang""".stripMargin,
    // q128: the A-ES race re-derived — same md5 million-bucket uniform,
    // same ln(u)/w clock, same (clock DESC, doc_id) total order; ln() is
    // natural log in DuckDB (log() is base 10 there — Spark's log IS ln)
    "q128_weighted_sample" ->
      """WITH b AS (
        |  SELECT doc_id, lang, n_chars,
        |    (CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12)
        |       AS BIGINT) % 1000000 + 1) / 1000000.0 AS u
        |  FROM documents),
        |r AS (
        |  SELECT doc_id, lang, n_chars,
        |    ROW_NUMBER() OVER (PARTITION BY lang
        |      ORDER BY ln(u) / n_chars DESC, doc_id) AS rn
        |  FROM b)
        |SELECT doc_id, lang, n_chars
        |FROM r WHERE rn <= 40 ORDER BY doc_id""".stripMargin,
    // q129: type-1 quantiles re-derived — same integer rank
    // ceil(pct*n/100) via floor((pct*n+99)/100), same ascending rank;
    // tied values permute rn among themselves but the value AT a rank
    // is order-independent
    "q129_length_quantiles" ->
      """WITH o AS (
        |  SELECT lang, n_chars,
        |    ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n_chars) AS rn,
        |    COUNT(*) OVER (PARTITION BY lang) AS n_rows
        |  FROM documents),
        |p AS (SELECT UNNEST([25, 50, 75, 90, 99]) AS pct)
        |SELECT o.lang, p.pct, o.n_chars AS value, o.n_rows
        |FROM o, p
        |WHERE o.rn = CAST(floor((p.pct * o.n_rows + 99) / 100.0) AS BIGINT)
        |ORDER BY lang, pct""".stripMargin,
    "q101_curate_corpus" ->
      """WITH RECURSIVE base AS (
        |  SELECT doc_id, text, n_chars, string_split(text, ' ') AS tk
        |  FROM documents),
        |m AS (
        |  SELECT doc_id, text, n_chars, len(tk) AS wc,
        |    len(list_distinct(tk)) AS uniq,
        |    list_max(list_transform(list_distinct(tk),
        |      w -> len(list_filter(tk, x -> x = w)))) AS top_tf,
        |    CASE WHEN len(tk) >= 2 THEN list_transform(range(0, len(tk) - 1),
        |      i -> tk[i+1] || ' ' || tk[i+2]) ELSE [] END AS bg
        |  FROM base),
        |quality AS (
        |  SELECT doc_id, text, n_chars FROM m
        |  WHERE CAST(wc - uniq AS DOUBLE) / wc <= 0.55
        |    AND CAST(top_tf AS DOUBLE) / wc <= 0.12
        |    AND (CASE WHEN len(bg) > 0 THEN
        |      CAST(len(bg) - len(list_distinct(bg)) AS DOUBLE) / len(bg)
        |    ELSE 0.0 END) <= 0.05),
        |k2 AS (
        |  SELECT doc_id, text, n_chars FROM (
        |    SELECT *, ROW_NUMBER() OVER (PARTITION BY md5(text)
        |      ORDER BY n_chars DESC, doc_id ASC) AS rn FROM quality)
        |  WHERE rn = 1),
        |sh AS (
        |  SELECT doc_id, list_distinct(list_transform(
        |    range(0, len(string_split(text, ' ')) - 2),
        |    i -> string_split(text, ' ')[i+1] || ' ' ||
        |         string_split(text, ' ')[i+2] || ' ' ||
        |         string_split(text, ' ')[i+3])) AS g
        |  FROM k2 WHERE len(string_split(text, ' ')) >= 3),
        |pairs AS (
        |  SELECT a.doc_id AS d1, b.doc_id AS d2
        |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        |  WHERE len(list_intersect(a.g, b.g)) * 100
        |    >= (len(a.g) + len(b.g) - len(list_intersect(a.g, b.g))) * 60),
        |edges AS (SELECT d1 AS a, d2 AS b FROM pairs
        |          UNION ALL SELECT d2, d1 FROM pairs),
        |reach AS (
        |  SELECT a AS node, b AS other FROM edges
        |  UNION
        |  SELECT r.node, e.b AS other FROM reach r JOIN edges e ON e.a = r.other),
        |comp AS (SELECT node, LEAST(node, MIN(other)) AS component
        |         FROM reach GROUP BY node),
        |lab AS (
        |  SELECT k.doc_id, k.n_chars,
        |    COALESCE(c.component, k.doc_id) AS cluster
        |  FROM k2 k LEFT JOIN comp c ON c.node = k.doc_id),
        |ranked AS (
        |  SELECT doc_id, n_chars, cluster,
        |    ROW_NUMBER() OVER (PARTITION BY cluster
        |      ORDER BY n_chars DESC, doc_id ASC) AS rn,
        |    COUNT(*) OVER (PARTITION BY cluster) AS cluster_size
        |  FROM lab)
        |SELECT doc_id, n_chars, cluster, cluster_size,
        |  CASE WHEN CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)
        |      AS INT) % 100 < 80 THEN 'train'
        |    WHEN CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)
        |      AS INT) % 100 < 90 THEN 'val'
        |    ELSE 'test' END AS split
        |FROM ranked WHERE rn = 1 ORDER BY doc_id""".stripMargin,
    "q97_repetition_quality" ->
      """WITH base AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
        |m AS (
        |  SELECT doc_id, len(tk) AS wc, len(list_distinct(tk)) AS uniq,
        |    list_max(list_transform(list_distinct(tk),
        |      w -> len(list_filter(tk, x -> x = w)))) AS top_tf,
        |    CASE WHEN len(tk) >= 2 THEN list_transform(range(0, len(tk) - 1),
        |      i -> tk[i+1] || ' ' || tk[i+2]) ELSE [] END AS bg
        |  FROM base),
        |r AS (
        |  SELECT doc_id, CAST(wc AS INT) AS wc,
        |    CAST(wc - uniq AS DOUBLE) / wc AS dup_word_frac,
        |    CAST(top_tf AS DOUBLE) / wc AS top_word_ratio,
        |    CASE WHEN len(bg) > 0 THEN
        |      CAST(len(bg) - len(list_distinct(bg)) AS DOUBLE) / len(bg)
        |    ELSE 0.0 END AS dup_bigram_frac
        |  FROM m)
        |SELECT doc_id, wc, dup_word_frac, top_word_ratio, dup_bigram_frac,
        |  CAST(dup_word_frac <= 0.55 AND top_word_ratio <= 0.12
        |    AND dup_bigram_frac <= 0.05 AS INT) AS keep
        |FROM r ORDER BY doc_id""".stripMargin,
    "q98_boilerplate_ngrams" ->
      """WITH sh AS (
        |  SELECT doc_id, unnest(list_distinct(list_transform(
        |    range(0, len(string_split(text, ' ')) - 2),
        |    i -> string_split(text, ' ')[i+1] || ' ' ||
        |         string_split(text, ' ')[i+2] || ' ' ||
        |         string_split(text, ' ')[i+3]))) AS g
        |  FROM documents WHERE len(string_split(text, ' ')) >= 3),
        |dfr AS (SELECT g, COUNT(*) AS df FROM sh GROUP BY g),
        |per AS (
        |  SELECT doc_id, COUNT(*) AS n_shingles,
        |    CAST(SUM(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_common
        |  FROM sh JOIN dfr USING (g) GROUP BY doc_id)
        |SELECT d.doc_id,
        |  CAST(COALESCE(n_shingles, 0) AS BIGINT) AS n_shingles,
        |  CAST(COALESCE(n_common, 0) AS BIGINT) AS n_common,
        |  CASE WHEN COALESCE(n_shingles, 0) > 0 THEN
        |    CAST(COALESCE(n_common, 0) AS DOUBLE) / n_shingles
        |  ELSE 0.0 END AS bp_ratio
        |FROM documents d LEFT JOIN per USING (doc_id) ORDER BY d.doc_id""".stripMargin,
    "q99_decontaminate" ->
      """WITH b AS (
        |  SELECT doc_id, text,
        |    CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS INT)
        |      % 100 AS bucket
        |  FROM documents),
        |sh AS (
        |  SELECT doc_id, bucket, unnest(list_distinct(list_transform(
        |    range(0, len(string_split(text, ' ')) - 2),
        |    i -> string_split(text, ' ')[i+1] || ' ' ||
        |         string_split(text, ' ')[i+2] || ' ' ||
        |         string_split(text, ' ')[i+3]))) AS g
        |  FROM b WHERE len(string_split(text, ' ')) >= 3),
        |testg AS (SELECT DISTINCT g FROM sh WHERE bucket >= 90),
        |per AS (
        |  SELECT doc_id, COUNT(*) AS n_shingles,
        |    CAST(SUM(CASE WHEN g IN (SELECT g FROM testg) THEN 1 ELSE 0 END)
        |      AS BIGINT) AS hits
        |  FROM sh WHERE bucket < 80 GROUP BY doc_id),
        |r AS (
        |  SELECT b.doc_id,
        |    CAST(COALESCE(n_shingles, 0) AS BIGINT) AS n_shingles,
        |    CAST(COALESCE(hits, 0) AS BIGINT) AS hits,
        |    CASE WHEN COALESCE(n_shingles, 0) > 0 THEN
        |      CAST(COALESCE(hits, 0) AS DOUBLE) / n_shingles
        |    ELSE 0.0 END AS contam_frac
        |  FROM b LEFT JOIN per USING (doc_id) WHERE b.bucket < 80)
        |SELECT doc_id, n_shingles, hits, contam_frac,
        |  CAST(contam_frac >= 0.15 AS INT) AS contaminated
        |FROM r ORDER BY doc_id""".stripMargin,
    "q94_dedup_apply" ->
      """WITH RECURSIVE sh0 AS (
        |  SELECT doc_id, list_distinct(list_transform(
        |    range(0, len(string_split(text, ' ')) - 2),
        |    i -> md5(string_split(text, ' ')[i+1] || ' ' ||
        |             string_split(text, ' ')[i+2] || ' ' ||
        |             string_split(text, ' ')[i+3]))) AS sh
        |  FROM documents WHERE len(string_split(text, ' ')) >= 3),
        |s2 AS (SELECT doc_id, sh, len(sh) AS sz FROM sh0),
        |pairs AS (
        |  SELECT a.doc_id AS d1, b.doc_id AS d2
        |  FROM s2 a JOIN s2 b ON a.doc_id < b.doc_id
        |  WHERE len(list_intersect(a.sh, b.sh)) * 100
        |    >= (a.sz + b.sz - len(list_intersect(a.sh, b.sh))) * 60),
        |edges AS (SELECT d1 AS a, d2 AS b FROM pairs
        |          UNION ALL SELECT d2, d1 FROM pairs),
        |reach AS (
        |  SELECT a AS node, b AS other FROM edges
        |  UNION
        |  SELECT r.node, e.b AS other FROM reach r JOIN edges e ON e.a = r.other),
        |comp AS (SELECT node, LEAST(node, MIN(other)) AS component
        |         FROM reach GROUP BY node),
        |lab AS (
        |  SELECT d.doc_id, d.n_chars, COALESCE(c.component, d.doc_id) AS cluster
        |  FROM documents d LEFT JOIN comp c ON c.node = d.doc_id),
        |ranked AS (
        |  SELECT doc_id, n_chars, cluster,
        |    ROW_NUMBER() OVER (PARTITION BY cluster
        |      ORDER BY n_chars DESC, doc_id ASC) AS rn,
        |    COUNT(*) OVER (PARTITION BY cluster) AS cluster_size
        |  FROM lab)
        |SELECT doc_id, n_chars, cluster, cluster_size
        |FROM ranked WHERE rn = 1 ORDER BY doc_id""".stripMargin,
    "q92_dedup_keep_best" ->
      """WITH g AS (
        |  SELECT md5(text) AS hash, doc_id, n_chars,
        |    ROW_NUMBER() OVER (PARTITION BY md5(text)
        |      ORDER BY n_chars DESC, doc_id ASC) AS rn,
        |    COUNT(*) OVER (PARTITION BY md5(text)) AS cnt
        |  FROM documents)
        |SELECT hash, doc_id AS keeper, CAST(n_chars AS BIGINT) AS best_score,
        |  cnt
        |FROM g WHERE rn = 1 ORDER BY hash""".stripMargin,
    "q90_hash_sample" ->
      """WITH b AS (
        |  SELECT lang, n_chars,
        |    CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS INT)
        |      % 100 AS bucket
        |  FROM documents)
        |SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars
        |FROM b WHERE bucket < 20 GROUP BY lang ORDER BY lang""".stripMargin,
    "q88_near_dup_clusters" -> NearDupClustersSql,
    // q126 maintains q88's clusters incrementally through the persisted
    // union-find — same transitive answer for any batch composition by
    // construction, same oracle verbatim (the q112/q116 pattern)
    "q126_cluster_incremental" -> NearDupClustersSql,
    "q127_cluster_retract" -> ClusterRetractSql,
    "q82_train_test_split" ->
      """WITH b AS (
        |  SELECT lang, n_chars,
        |    CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS INT)
        |      % 100 AS bucket
        |  FROM documents)
        |SELECT lang,
        |  CASE WHEN bucket < 80 THEN 'train'
        |       WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split,
        |  COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars
        |FROM b GROUP BY 1, 2 ORDER BY lang, split""".stripMargin,
    "q79_simhash_dedup" ->
      """WITH tf AS (
        |  SELECT doc_id, token, COUNT(*) AS tf, substring(md5(token), 1, 16) AS h
        |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents)
        |  GROUP BY doc_id, token, substring(md5(token), 1, 16)),
        |bits AS (SELECT doc_id, tf, h, UNNEST(range(64)) AS i FROM tf),
        |sgn AS (
        |  SELECT doc_id, i,
        |    SUM(tf * (2 * (((strpos('0123456789abcdef',
        |      substring(h, CAST(i // 4 + 1 AS INT), 1)) - 1)
        |      >> CAST(i % 4 AS INT)) & 1) - 1)) AS sgn
        |  FROM bits GROUP BY doc_id, i),
        |fp AS (
        |  SELECT doc_id,
        |    string_agg(CASE WHEN sgn >= 0 THEN '1' ELSE '0' END, '' ORDER BY i) AS fp
        |  FROM sgn GROUP BY doc_id)
        |SELECT a.doc_id AS d1, b.doc_id AS d2,
        |  CAST(hamming(a.fp, b.fp) AS INT) AS hamming
        |FROM fp a JOIN fp b ON a.doc_id < b.doc_id
        |WHERE hamming(a.fp, b.fp) <= 3
        |ORDER BY d1, d2""".stripMargin,
    "q81_ngram_jaccard" ->
      """WITH sh0 AS (
        |  SELECT doc_id, list_distinct(list_transform(
        |    range(0, len(string_split(text, ' ')) - 2),
        |    i -> md5(string_split(text, ' ')[i+1] || ' ' ||
        |             string_split(text, ' ')[i+2] || ' ' ||
        |             string_split(text, ' ')[i+3]))) AS sh
        |  FROM documents WHERE len(string_split(text, ' ')) >= 3),
        |s2 AS (SELECT doc_id, sh, len(sh) AS sz FROM sh0)
        |SELECT a.doc_id AS d1, b.doc_id AS d2,
        |  CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
        |    / (a.sz + b.sz - len(list_intersect(a.sh, b.sh))) AS jac
        |FROM s2 a JOIN s2 b ON a.doc_id < b.doc_id
        |WHERE len(list_intersect(a.sh, b.sh)) * 100
        |  >= (a.sz + b.sz - len(list_intersect(a.sh, b.sh))) * 60
        |ORDER BY d1, d2""".stripMargin,
    "q73_lang_id" ->
      """WITH tok AS (
        |  SELECT doc_id, lang, unnest(list_distinct(string_split(text, ' '))) AS token
        |  FROM documents),
        |profiles AS (
        |  SELECT p_lang, token FROM (
        |    SELECT lang AS p_lang, token, COUNT(*) AS cnt,
        |      ROW_NUMBER() OVER (PARTITION BY lang
        |        ORDER BY COUNT(*) DESC, token ASC) AS rn
        |    FROM tok GROUP BY lang, token) WHERE rn <= 10),
        |scores AS (
        |  SELECT t.doc_id, p.p_lang, COUNT(*) AS score
        |  FROM tok t JOIN profiles p USING (token)
        |  GROUP BY t.doc_id, p.p_lang),
        |pred AS (
        |  SELECT doc_id, p_lang, score,
        |    ROW_NUMBER() OVER (PARTITION BY doc_id
        |      ORDER BY score DESC, p_lang ASC) AS rn
        |  FROM scores)
        |SELECT d.doc_id, COALESCE(p.p_lang, 'unknown') AS pred_lang,
        |  COALESCE(p.score, 0) AS score, d.lang AS actual_lang,
        |  CAST(COALESCE(p.p_lang, 'unknown') = d.lang AS INT) AS correct
        |FROM documents d LEFT JOIN (SELECT * FROM pred WHERE rn = 1) p
        |  USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin,
    "q74_token_count" ->
      """SELECT doc_id,
        |  CAST(len(string_split(text, ' ')) AS INT) AS ws_tokens,
        |  CAST(len(regexp_extract_all(text, '[a-z]+')) AS INT) AS alpha_tokens,
        |  CAST(len(regexp_extract_all(text, '[0-9]+')) AS INT) AS digit_tokens,
        |  CAST(length(regexp_replace(text, '[^a-z]', '', 'g')) AS INT) AS alpha_chars
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q75_fingerprint" ->
      """SELECT doc_id,
        |  CASE WHEN len(string_split(text, ' ')) >= 3 THEN
        |    list_aggregate(list_transform(
        |      range(0, len(string_split(text, ' ')) - 2),
        |      i -> md5(string_split(text, ' ')[i+1] || ' ' ||
        |               string_split(text, ' ')[i+2] || ' ' ||
        |               string_split(text, ' ')[i+3])), 'min')
        |  END AS fingerprint,
        |  CAST(GREATEST(len(string_split(text, ' ')) - 2, 0) AS INT) AS n_shingles
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q60_exact_dedup" ->
      """SELECT md5(text) AS hash, MIN(doc_id) AS keeper, COUNT(*) AS cnt
        |FROM documents GROUP BY md5(text) ORDER BY hash""".stripMargin,
    "q61_near_dup_jaccard" ->
      """WITH d AS (SELECT doc_id, list_distinct(string_split(text, ' ')) AS tk
        |           FROM documents)
        |SELECT a.doc_id AS d1, b.doc_id AS d2,
        |  CAST(len(list_intersect(a.tk, b.tk)) AS DOUBLE)
        |    / (len(a.tk) + len(b.tk) - len(list_intersect(a.tk, b.tk))) AS jac
        |FROM d a JOIN d b ON a.doc_id < b.doc_id
        |WHERE len(list_intersect(a.tk, b.tk)) * 5
        |  >= (len(a.tk) + len(b.tk) - len(list_intersect(a.tk, b.tk))) * 4
        |ORDER BY d1, d2""".stripMargin,
    "q63_tokenize_tf" ->
      """SELECT lang, CAST(rn AS INT) AS rn, word, cnt FROM (
        |  SELECT lang, word, COUNT(*) AS cnt,
        |    ROW_NUMBER() OVER (PARTITION BY lang
        |      ORDER BY COUNT(*) DESC, word ASC) AS rn
        |  FROM (SELECT lang, unnest(string_split(text, ' ')) AS word FROM documents)
        |  GROUP BY lang, word)
        |WHERE rn <= 10 ORDER BY lang, rn""".stripMargin,
    "q64_tfidf" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word
        |             FROM documents),
        |tf AS (SELECT doc_id, word, COUNT(*) AS tf FROM tok GROUP BY doc_id, word),
        |df AS (SELECT word, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY word),
        |n AS (SELECT COUNT(*) AS n FROM documents),
        |scored AS (
        |  SELECT tf.doc_id, tf.word, tf.tf, df.df,
        |    tf.tf * (ln(CAST(n.n + 1 AS DOUBLE) / (df.df + 1)) + 1) AS score_raw,
        |    ROW_NUMBER() OVER (PARTITION BY tf.doc_id
        |      ORDER BY tf.tf * (ln(CAST(n.n + 1 AS DOUBLE) / (df.df + 1)) + 1) DESC,
        |        tf.word ASC) AS rn
        |  FROM tf JOIN df USING (word) CROSS JOIN n)
        |SELECT doc_id, word, tf, df, ROUND(score_raw, 4) AS score
        |FROM scored WHERE rn = 1 ORDER BY doc_id""".stripMargin,
    "q65_text_quality" ->
      """WITH base AS (
        |  SELECT doc_id, text, n_chars,
        |    len(string_split(text, ' ')) AS wc,
        |    len(list_filter(string_split(text, ' '),
        |      x -> x IN ('data', 'table', 'row', 'query', 'the', 'a'))) AS stop_cnt,
        |    md5(substring(text, 1, 50)) AS ph
        |  FROM documents),
        |flagged AS (
        |  SELECT doc_id, wc,
        |    CAST(n_chars - (wc - 1) AS DOUBLE) / wc AS mwl,
        |    CAST(stop_cnt AS DOUBLE) / wc AS stop_ratio,
        |    CAST(n_chars BETWEEN 100 AND 450 AS INT) AS len_ok,
        |    CAST(wc BETWEEN 10 AND 100 AS INT) AS wc_ok,
        |    CAST(COUNT(*) OVER (PARTITION BY ph) > 1 AS INT) AS dup_prefix,
        |    CAST(stop_cnt AS DOUBLE) / wc AS stop_ratio_raw
        |  FROM base)
        |SELECT doc_id, CAST(wc AS INT) AS wc, mwl, stop_ratio, len_ok, wc_ok,
        |  dup_prefix,
        |  CAST(len_ok = 1 AND wc_ok = 1 AND stop_ratio_raw <= 0.3
        |    AND dup_prefix = 0 AS INT) AS pass
        |FROM flagged ORDER BY doc_id""".stripMargin)
}
