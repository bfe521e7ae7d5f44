package graft.engine

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import Tables._

/** SURVEY §2.9 (vector half): similarity search and embedding analytics.
  *
  * Embeddings are ArrayType(FloatType) dim=64; all math casts to double
  * FIRST (float×float products are exact in double) so both engines compute
  * the same values. Dot products use zip_with + aggregate — in-row lambda
  * HOFs, no positional explode shuffle on the Spark side.
  *
  * Scale path: brute-force top-k here is a broadcast (queries) × scan
  * (corpus) nested loop — linear in corpus size, embarrassingly parallel;
  * the IVF/LSH variant would bucket the corpus first (q62 shows the LSH
  * machinery). The two-stage top-k (per-partition bounded heap → global
  * merge, the REPOSE shape) is a typed Aggregator with a k-bounded buffer
  * ([[graft.functions.TopKAgg]]) so partial aggregation happens map-side.
  */
object VectorOps {

  /** embedding cast to double + L2 norm (norm via the native graft_dot
    * codegen expression — see graft.functions.DotProduct). */
  private def embD(s: SparkSession, d: String): DataFrame = {
    graft.GraftExtensions.register(s)
    embeddings(s, d)
      .withColumn("emb", expr("transform(embedding, x -> CAST(x AS DOUBLE))"))
      .withColumn("nrm", sqrt(expr("graft_dot(emb, emb)")))
  }

  /** q66: cosine top-5 neighbors for the first 100 vectors (brute force —
    * the exact baseline; algorithm in [[graft.api.GraftOps.cosineTopK]]). */
  def q66(s: SparkSession, d: String): DataFrame = {
    graft.GraftExtensions.register(s)
    graft.api.GraftOps.cosineTopK(embeddings(s, d), "vec_id", "embedding",
      queryPred = col("vec_id") < 100, k = 5)
  }

  /** q67: kNN majority-label classification over the q66 neighbors. */
  def q67(s: SparkSession, d: String): DataFrame = {
    val labels = embeddings(s, d).select(col("vec_id"), col("label"))
    val nn = q66(s, d)
      .join(labels.select(col("vec_id").as("vid"), col("label").as("nb_label")), "vid")
    val votes = nn.groupBy("qid", "nb_label").agg(count(lit(1)).as("votes"))
    val w = Window.partitionBy("qid").orderBy(col("votes").desc, col("nb_label").asc)
    votes.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("qid"), col("nb_label").as("pred_label"), col("votes"))
      .join(labels.select(col("vec_id").as("qid"), col("label").as("true_label")), "qid")
      .withColumn("correct", (col("pred_label") === col("true_label")).cast("int"))
      .select("qid", "pred_label", "true_label", "votes", "correct")
      .orderBy("qid")
  }

  /** q68: multimodal record assembly — text ⋈ embedding, struct built then
    * flattened for the output contract (§7.3.5). */
  def q68(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .join(embD(s, d), col("doc_id") === col("vec_id"))
      .withColumn("rec", struct(
        md5(col("text")).as("text_hash"), col("lang"),
        size(col("embedding")).as("dim"), r4(col("nrm")).as("l2norm"),
        col("label")))
      .select(col("doc_id"), col("rec.text_hash").as("text_hash"),
        col("rec.lang").as("lang"), col("rec.dim").as("dim"),
        col("rec.l2norm").as("l2norm"), col("rec.label").as("label"))
      .orderBy("doc_id")

  /** q69: per-label embedding analytics — centroid norm + mean vector norm. */
  def q69(s: SparkSession, d: String): DataFrame = {
    val e = embD(s, d)
    val expl = e.select(col("label"), col("vec_id"),
      posexplode(col("emb")).as(Seq("pos", "v")))
    val centroid = expl.groupBy("label", "pos").agg(avg("v").as("cv"))
      .groupBy("label").agg(r4(sqrt(sum(col("cv") * col("cv")))).as("centroid_norm"))
    val norms = e.groupBy("label")
      .agg(count(lit(1)).as("n_vecs"), r4(avg("nrm")).as("avg_vec_norm"))
    norms.join(centroid, "label")
      .select("label", "n_vecs", "centroid_norm", "avg_vec_norm")
      .orderBy("label")
  }

  /** q76: IVF-bucketed approximate top-k — the 100 TB scale path that q66
    * brute force baselines; RECALL IS A DIAL, not this row's number — a
    * deployment sets `recallTarget` (or takes the API default nProbe = 8,
    * recall@5 0.83+; the RECALL.md curve reaches 1.0 at nProbe = 16),
    * while this registry binding deliberately pins the sweep's
    * regression-sensitive ANCHOR cell nProbe = 4 (recall@5 0.626).
    * Binding of [[graft.api.GraftOps.ivfTopK]]:
    * Lloyd-trained 16-centroid coarse quantizer (6 passes), corpus assigned
    * to inverted lists by a literal-centroid argmin projection (zero
    * shuffle), queries probe their 4 nearest lists, candidates meet on a
    * broadcast(probes) equi-join and reduce through the bounded TopKAgg.
    * Oracle-omitted (approximate); the committed `RECALL.md` sweep
    * (graft.tools.RecallSweep) measures recall@5 vs q66 for every
    * (seeding, nProbe, lloydIters) combination — this binding is the
    * (lowid, 4, 6) row; the synthetic embeddings carry little cluster
    * structure, so the 4/16-probe fraction bounds much of the recall and
    * nProbe is the dial (the sweep's dial table shows recall climbing to
    * 1.0 at nProbe = nLists). nProbe = 4 here is the sweep's ANCHOR
    * point (the curve's steep region, the most regression-sensitive
    * cell — RECALL.md's operating-point note has the full rationale);
    * a deployment should start from the API default nProbe = 8
    * (recall 0.83+) or `nProbeFor(target)`, not copy this dial.
    * Tests assert the probed candidates carry exact cosines. */
  def q76(s: SparkSession, d: String): DataFrame = {
    graft.GraftExtensions.register(s)
    graft.api.GraftOps.ivfTopK(embeddings(s, d), "vec_id", "embedding",
      queryPred = col("vec_id") < 100, k = 5, nLists = 16, nProbe = 4,
      lloydIters = 6)
  }

  /** q80: embedding-cosine near-dup pairs — the vector member of the dedup
    * family (exact q60 / Jaccard q61/q81 / MinHash q62 / SimHash q79).
    * Threshold 0.35 is sized to this synthetic corpus (max pairwise cosine
    * ~0.51; real near-dup corpora use ~0.95). Algorithm + scale notes in
    * [[graft.api.GraftOps.embeddingNearDupPairs]]. */
  def q80(s: SparkSession, d: String): DataFrame = {
    graft.GraftExtensions.register(s)
    graft.api.GraftOps.embeddingNearDupPairs(embeddings(s, d),
      "vec_id", "embedding", minCosine = 0.35)
  }

  /** q86: int8 scalar-quantization error audit — per label, the relative
    * L2 distortion of [[graft.api.GraftOps.quantizeEmbeddings]] (the 4×
    * storage-compression half of the scale ANN story; coarse-score on
    * int8, exact-rerank the shortlist). Everything before the label
    * aggregation is an in-row projection — zero shuffle. */
  def q86(s: SparkSession, d: String): DataFrame = {
    graft.GraftExtensions.register(s)
    val q = graft.api.GraftOps.quantizeEmbeddings(
      embeddings(s, d), "vec_id", "embedding")
    q.join(embeddings(s, d).select("vec_id", "label"), "vec_id")
      .groupBy("label")
      .agg(count(lit(1)).as("n_vecs"),
        r4(avg("rel_err")).as("avg_rel_err"),
        r4(max("rel_err")).as("max_rel_err"))
      .orderBy("label")
  }

  /** q87: PERSISTED IVF index — [[graft.api.GraftOps.ivfBuild]] once into
    * a temp dir (centroid table + bucket-partitioned inverted-list
    * parquet), then [[graft.api.GraftOps.ivfSearch]] answers the same
    * 100-query top-5 as q76 reading ONLY the probed list partitions
    * (partition-pruned scan via the broadcast bucket join). The build-once/
    * search-many split is how the index amortizes at 100 TB. Rows-only
    * like q76; the spec asserts search ≡ the in-memory ivfTopK.
    * nProbe = 4 is the RECALL.md anchor dial, not the recommended
    * operating point (see q76's note). */
  def q87(s: SparkSession, d: String): DataFrame = {
    graft.GraftExtensions.register(s)
    val dir = Tables.scratchDir("graft_q87_")
    StageTimer.time("q87:index_build") {
      graft.api.GraftOps.ivfBuild(embeddings(s, d), "vec_id", "embedding", dir,
        nLists = 16, lloydIters = 3)
    }
    graft.api.GraftOps.ivfSearch(
      embeddings(s, d).filter(col("vec_id") < 100), "vec_id", "embedding",
      dir, k = 5, nProbe = 4)
  }

  /** q95: IVF with int8 coarse scoring + exact rerank — q76's probe
    * machinery over a 4×-smaller scan, accuracy recovered by re-scoring
    * the k×4 shortlist on full precision (the complete scale-ANN story:
    * q76 recall dial × q86 storage × this rerank). Rows-only like q76;
    * the spec pins full-coverage rerank ≡ ivfTopK. nProbe = 4 is the
    * RECALL.md anchor dial — it also pins the committed null result
    * that rerank cannot recover probe MISSES (see q76's note). */
  def q95(s: SparkSession, d: String): DataFrame = {
    graft.GraftExtensions.register(s)
    graft.api.GraftOps.ivfTopKReranked(embeddings(s, d), "vec_id", "embedding",
      queryPred = col("vec_id") < 100, k = 5, nLists = 16, nProbe = 4,
      lloydIters = 6, rerankFactor = 4)
  }

  /** q100: SRP (hyperplane) LSH near-dup pairs — the sub-quadratic
    * candidate path that q80's tiled exact compare baselines, the dense-
    * vector member of the LSH family (MinHash q62 / SimHash q79). 8×4-bit
    * bands over a 32-bit sign sketch; every emitted pair carries the EXACT
    * cosine (verified in-join), so output ⊆ q80's rows (precision 1.0 —
    * pinned in the spec, with measured recall). Oracle-omitted like q62:
    * which true pairs collide is a property of the banding, not
    * SQL-expressible. This corpus's near-dup threshold (0.35, far below
    * the ≥0.9 of a real near-dup corpus) pushes the banding hard, so the
    * binding widens the sketch to 64 bits / 16 four-bit bands — recall
    * 0.9154 at sf0.01 per the committed RECALL.md sweep
    * (graft.tools.SrpRecall); the function's 32/8 default suits real
    * thresholds. */
  def q100(s: SparkSession, d: String): DataFrame = {
    graft.GraftExtensions.register(s)
    graft.api.GraftOps.srpNearDupPairs(embeddings(s, d), "vec_id", "embedding",
      minCosine = 0.35, dim = 64, nBits = 64, bands = 16)
  }

  /** q102: two-dataset kNN JOIN — [[graft.api.GraftOps.cosineTopKJoin]]
    * retrieving, for each of the first 50 vectors, its top-3 among the
    * REST of the corpus (disjoint query/corpus frames — the cross-corpus
    * retrieval shape; q66 is the self-join special case). Broadcast
    * queries × streamed corpus, bounded map-side top-k. */
  def q102(s: SparkSession, d: String): DataFrame = {
    graft.GraftExtensions.register(s)
    val e = embeddings(s, d)
    graft.api.GraftOps.cosineTopKJoin(
      e.filter(col("vec_id") < 50), e.filter(col("vec_id") >= 50),
      "vec_id", "embedding", k = 3)
  }

  /** q115: incremental EMBEDDING near-dup dedup against history — the
    * dense-vector twin of q114, completing the against-history dedup
    * family: [[graft.api.GraftOps.srpIndexBuild]] persists the
    * vec_id % 5 != 0 corpus's SRP band index (same 64-bit/16-band sketch
    * as q100), then the arriving vec_id % 5 == 0 batch drops every
    * vector within cosine 0.35 of the corpus (history wins) or of a
    * smaller-id batch-mate
    * ([[graft.api.GraftOps.dedupEmbAgainstCorpus]]). Rows-only by design
    * (SRP band recall, like q100); the suite pins composition, precision
    * vs the exact predicate, and identical-vector guaranteed drops. */
  def q115(s: SparkSession, d: String): DataFrame = {
    graft.GraftExtensions.register(s)
    val emb = embeddings(s, d)
    val dir = Tables.scratchDir("graft_q115_")
    StageTimer.time("q115:index_build") {
      graft.api.GraftOps.srpIndexBuild(emb.filter(col("vec_id") % 5 =!= 0),
        "vec_id", "embedding", dir, dim = 64, nBits = 64, bands = 16)
    }
    graft.api.GraftOps.dedupEmbAgainstCorpus(
        emb.filter(col("vec_id") % 5 === 0), "vec_id", "embedding", dir,
        minCosine = 0.35)
      .select(col("vec_id"), col("label"))
      .orderBy("vec_id")
  }

  /** q133: SemDeDup — cluster-bounded semantic dedup
    * ([[graft.api.GraftOps.semDedup]], after the SemDeDup recipe of
    * arXiv:2303.09540): the IVF family's deterministic k-means quantizer
    * partitions the corpus, near-dup pairs (exact cos ≥ 0.35 — this
    * corpus's q80 threshold) are found in shared cells only —
    * Σ|cell|² compares, never n² — and one representative per
    * semantic group survives (the member least similar to its centroid,
    * the paper's diversity-keeping rule; ties to the smaller id).
    * RECALL IS A DIAL: the binding's nAssign = 2 multi-probe assignment
    * reads 0.6618 pair recall on RECALL.md's committed curve
    * (0.2794 / 0.6618 / 0.9669 at nAssign 1 / 2 / 4 — this
    * structure-free corpus at a ~70° "near" threshold is the
    * quantizer's adversarial bracket; real ≥ 0.9-cosine dedup corpora
    * sit near 1 at nAssign 1–2). Rows-only by design like q62/q100:
    * which true pairs share a cell is a property of the quantizer, not
    * SQL-expressible. The suite pins precision 1.0 (pairs ⊆ q80's exact
    * pairs with equal cosines), the nClusters = 1 degenerate (≡ the
    * exact baseline row-for-row), and exactly-one-survivor-per-group;
    * RECALL.md carries the measured dial curve
    * (graft.tools.RecallCheck). */
  def q133(s: SparkSession, d: String): DataFrame = {
    graft.GraftExtensions.register(s)
    graft.api.GraftOps.semDedup(embeddings(s, d), "vec_id", "embedding",
        minCosine = 0.35, nClusters = 16, lloydIters = 6, nAssign = 2,
        stageKey = Some("q133"))
      .select(col("vec_id"), col("label"), col("cluster"),
        col("cluster_size"))
      .orderBy("vec_id")
  }

  /** q136: HYBRID retrieval by reciprocal-rank fusion —
    * [[graft.api.GraftOps.rrfFuse]] (Cormack–Clarke–Büttcher RRF, the
    * standard hybrid combiner) over the two retrieval members this
    * library ships: q135's BM25 lexical top-5 (each of the first 10
    * docs querying with its own first 4 tokens) and the dense cosine
    * top-5 for the SAME queries over the aligned embeddings table
    * (doc_id = vec_id, the q68 convention; self-matches stay — both
    * rankers see the same world). A document's fused score is
    * Σ 1/(60 + rank) over the lists that retrieved it — rank-only
    * arithmetic, so the two incommensurable score scales never meet.
    * Oracle-exact: both rankings and the fusion re-derive in SQL
    * (rank arithmetic is integer-exact; the 6dp-rounded fused sum
    * crosses engines). */
  def q136(s: SparkSession, d: String): DataFrame = {
    graft.GraftExtensions.register(s)
    val docs = Tables.documents(s, d)
    val qs = docs.filter(col("doc_id") < 10)
      .select(col("doc_id"), slice(split(col("text"), " "), 1, 4).as("terms"))
    val lex = graft.api.GraftOps.bm25TopK(docs, "doc_id", "text",
        qs, "doc_id", "terms", k = 5)
      .select("qid", "rn", "doc_id")
    val emb = embeddings(s, d)
    val dense = graft.api.GraftOps.cosineTopKJoin(
        emb.filter(col("vec_id") < 10), emb, "vec_id", "embedding", k = 5)
      .select(col("qid"), col("rn"), col("vid").as("doc_id"))
    graft.api.GraftOps.rrfFuse(Seq(lex, dense), k = 5)
  }

  /** q142: hybrid retrieval over the two PERSISTED members — the q136
    * recipe with both rankers swapped from one-shot corpus scans to
    * their index substrates: lexical = [[graft.api.GraftOps
    * .bm25AgainstCorpus]] probing the q137 postings index (bucket-
    * pruned to the query terms), dense = [[graft.api.GraftOps
    * .ivfSearch]] probing the q87 IVF index (partition-pruned to the
    * probed lists), fused by the same rank-only RRF arithmetic. This is
    * the production serving path (indexes amortize across query
    * batches; the probes touch history slices, never the corpus) —
    * stage-split so the bench prices the builds apart from the
    * composed probe. Rows-only by design: the IVF member is
    * approximate (q87's class); the lexical member's probe ≡ one-shot
    * law is spec-pinned at q137 and the composed both-member fusion is
    * asserted in IndexLifecycle step 9. */
  def q142(s: SparkSession, d: String): DataFrame = {
    graft.GraftExtensions.register(s)
    val docs = Tables.documents(s, d)
    val bdir = Tables.scratchDir("graft_q142_bm_")
    val vdir = Tables.scratchDir("graft_q142_iv_")
    val emb = embeddings(s, d)
    StageTimer.time("q142:index_build") {
      // two INDEPENDENT index builds into two directories — overlapped
      // (guide §2.6): in deployment the lexical and dense members build
      // from separate pipelines; running them back-to-back in the
      // binding only serialized their fixed costs
      graft.api.GraftOps.inParallel(
        () => graft.api.GraftOps.bm25IndexBuild(docs, "doc_id", "text",
          bdir, nBuckets = 64),
        () => graft.api.GraftOps.ivfBuild(emb, "vec_id", "embedding",
          vdir, nLists = 16, lloydIters = 3))
    }
    val qs = docs.filter(col("doc_id") < 10)
      .select(col("doc_id"),
        slice(split(col("text"), " "), 1, 4).as("terms"))
    val qv = emb.filter(col("vec_id") < 10)
    StageTimer.time("q142:probe") {
      val lex = graft.api.GraftOps.bm25AgainstCorpus(qs, "doc_id",
          "terms", bdir, k = 5)
        .select("qid", "rn", "doc_id")
      val dense = graft.api.GraftOps.ivfSearch(qv, "vec_id", "embedding",
          vdir, k = 5, nProbe = 4, excludeSelf = false)
        .select(col("qid"), col("rn"), col("vid").as("doc_id"))
      graft.api.GraftOps.rrfFuse(Seq(lex, dense), k = 5)
    }
  }

  /** q146: persisted IVF-PQ ANN — [[graft.api.GraftOps.ivfPqBuild]] /
    * [[graft.api.GraftOps.ivfPqSearch]] (Jégou et al., TPAMI 2011:
    * product quantization, composed with the inverted-file layout):
    * the MEMORY-COMPRESSION half of the scale ANN story that q87's
    * IVF-Flat and q95's in-row int8 rerank open. The corpus persists
    * as ONE dual-view bucket-partitioned table — full-precision
    * columns (rerank only) next to m = 8 sub-codes + one
    * reconstruction norm (ksub = 16 Euclidean-Lloyd codebooks per
    * subspace, trained at build) — and parquet's columnar layout IS
    * the compression: at 100 TB the ADC scan projects only the code
    * columns (~8 bytes/vector instead of 512; ReadSchema hard-asserted
    * cemb-free in ExplainCheck). Probed lists prune the partitions,
    * each query's m×ksub lookup table rides its broadcast probe rows
    * (checkpoint-pinned), a candidate's approximate cosine is m
    * codegen'd LUT lookups (ADC), and only the k×rerankFactor
    * shortlist — driver-bounded ids, a static pushed filter — ever
    * touches the full-precision columns for exact 4dp cosines.
    * Rows-only by design (approximate ANN, q87's
    * class); RecallCheck measures the recall dial (rerankFactor ×
    * nProbe) against the exact q66 baseline, and the spec pins
    * append ≡ rebuild-on-union under frozen centroids + codebooks. */
  def q146(s: SparkSession, d: String): DataFrame = {
    graft.GraftExtensions.register(s)
    val dir = Tables.scratchDir("graft_q146_")
    val emb = embeddings(s, d)
    // m adapts to the embedding width (8 sub-codes on the 64-dim
    // corpus; the largest divisor ≤ 8 elsewhere — m must divide dim)
    val dim = emb.select(size(col("embedding"))).head().getInt(0)
    val m = (8 to 1 by -1).find(dim % _ == 0).get
    StageTimer.time("q146:index_build") {
      graft.api.GraftOps.ivfPqBuild(emb, "vec_id", "embedding", dir,
        nLists = 16, m = m, ksub = 16, lloydIters = 3)
    }
    StageTimer.time("q146:search") {
      graft.api.GraftOps.ivfPqSearch(
        emb.filter(col("vec_id") < 100), "vec_id", "embedding",
        dir, k = 5, nProbe = 4, rerankFactor = 4)
    }
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q66_cosine_topk" -> q66, "q67_knn_label" -> q67,
    "q68_multimodal_column" -> q68, "q69_embed_stats" -> q69,
    "q76_ivf_topk" -> q76, "q80_embed_near_dup" -> q80,
    "q86_embed_quantize" -> q86, "q87_ivf_persisted" -> q87,
    "q95_ivf_rerank" -> q95, "q100_srp_near_dup" -> q100,
    "q102_knn_join" -> q102, "q115_emb_dedup_incr" -> q115,
    "q133_semdedup" -> q133, "q136_hybrid_rrf" -> q136,
    "q142_hybrid_persisted" -> q142, "q146_ivf_pq" -> q146)

  private val explSql =
    """SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS v,
      |  unnest(range(len(embedding))) AS p FROM embeddings""".stripMargin

  val oracle: Map[String, String] = Map(
    // q136: both rankers re-derived (BM25 exactly as q135's oracle; the
    // dense side exactly as q66's minus the self-exclusion, matching
    // cosineTopKJoin's excludeSelf = false) and fused by rank-only
    // arithmetic — CAST(1.0 AS DOUBLE) keeps the division out of
    // DuckDB's decimal arithmetic, matching Spark's double literal
    "q136_hybrid_rrf" ->
      s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS ts
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
        |lex AS (SELECT qid, doc_id, rn FROM (
        |  SELECT qid, did AS doc_id, ROW_NUMBER() OVER (PARTITION BY qid
        |    ORDER BY score DESC, did ASC) AS rn FROM sc) WHERE rn <= 5),
        |e AS ($explSql),
        |norms AS (SELECT vec_id, sqrt(SUM(v * v)) AS nrm FROM e
        |          GROUP BY vec_id),
        |dots AS (
        |  SELECT a.vec_id AS qid, b.vec_id AS vid, SUM(a.v * b.v) AS dot
        |  FROM e a JOIN e b ON a.p = b.p AND a.vec_id < 10
        |  GROUP BY a.vec_id, b.vec_id),
        |cosr AS (
        |  SELECT qid, vid, ROUND(dot / (na.nrm * nb.nrm), 4) AS cos
        |  FROM dots JOIN norms na ON na.vec_id = qid
        |            JOIN norms nb ON nb.vec_id = vid),
        |dense AS (SELECT qid, doc_id, rn FROM (
        |  SELECT qid, vid AS doc_id, ROW_NUMBER() OVER (PARTITION BY qid
        |    ORDER BY cos DESC, vid ASC) AS rn FROM cosr) WHERE rn <= 5),
        |u AS (SELECT * FROM lex UNION ALL SELECT * FROM dense),
        |f AS (SELECT qid, doc_id,
        |  ROUND(SUM(CAST(1.0 AS DOUBLE) / (60 + rn)), 6) AS rrf
        |  FROM u GROUP BY qid, doc_id),
        |fr AS (SELECT qid, doc_id, rrf, ROW_NUMBER() OVER (
        |  PARTITION BY qid ORDER BY rrf DESC, doc_id ASC) AS rn FROM f)
        |SELECT qid, CAST(rn AS INT) AS rn, doc_id, rrf
        |FROM fr WHERE rn <= 5 ORDER BY qid, rn""".stripMargin,
    "q102_knn_join" ->
      s"""WITH e AS ($explSql),
        |norms AS (SELECT vec_id, sqrt(SUM(v * v)) AS nrm FROM e GROUP BY vec_id),
        |dots AS (
        |  SELECT a.vec_id AS qid, b.vec_id AS vid, SUM(a.v * b.v) AS dot
        |  FROM e a JOIN e b ON a.p = b.p AND a.vec_id < 50 AND b.vec_id >= 50
        |  GROUP BY a.vec_id, b.vec_id),
        |cos AS (
        |  SELECT qid, vid, ROUND(dot / (na.nrm * nb.nrm), 4) AS cos
        |  FROM dots JOIN norms na ON na.vec_id = qid JOIN norms nb ON nb.vec_id = vid),
        |r AS (SELECT qid, vid, cos,
        |  ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, vid ASC) AS rn
        |  FROM cos)
        |SELECT qid, CAST(rn AS INT) AS rn, vid, cos FROM r
        |WHERE rn <= 3 ORDER BY qid, rn""".stripMargin,
    "q86_embed_quantize" ->
      s"""WITH e AS ($explSql),
        |sc AS (SELECT vec_id, MAX(abs(v)) / 127 AS scale FROM e GROUP BY vec_id),
        |er AS (SELECT e.vec_id,
        |  sqrt(SUM((v - floor(v / scale + 0.5) * scale)
        |         * (v - floor(v / scale + 0.5) * scale))) AS e2,
        |  sqrt(SUM(v * v)) AS nrm
        |  FROM e JOIN sc USING (vec_id) GROUP BY e.vec_id)
        |SELECT emb.label, COUNT(*) AS n_vecs,
        |  ROUND(AVG(CASE WHEN nrm > 0 THEN e2 / nrm ELSE 0 END), 4) AS avg_rel_err,
        |  ROUND(MAX(CASE WHEN nrm > 0 THEN e2 / nrm ELSE 0 END), 4) AS max_rel_err
        |FROM er JOIN embeddings emb USING (vec_id)
        |GROUP BY emb.label ORDER BY emb.label""".stripMargin,
    "q80_embed_near_dup" ->
      s"""WITH e AS ($explSql),
        |norms AS (SELECT vec_id, sqrt(SUM(v * v)) AS nrm FROM e GROUP BY vec_id),
        |dots AS (
        |  SELECT a.vec_id AS d1, b.vec_id AS d2, SUM(a.v * b.v) AS dot
        |  FROM e a JOIN e b ON a.p = b.p AND a.vec_id < b.vec_id
        |  GROUP BY a.vec_id, b.vec_id)
        |SELECT d1, d2, ROUND(dot / (na.nrm * nb.nrm), 4) AS cos
        |FROM dots JOIN norms na ON na.vec_id = d1 JOIN norms nb ON nb.vec_id = d2
        |WHERE ROUND(dot / (na.nrm * nb.nrm), 4) >= 0.35
        |ORDER BY d1, d2""".stripMargin,
    "q66_cosine_topk" ->
      s"""WITH e AS ($explSql),
        |norms AS (SELECT vec_id, sqrt(SUM(v * v)) AS nrm FROM e GROUP BY vec_id),
        |dots AS (
        |  SELECT a.vec_id AS qid, b.vec_id AS vid, SUM(a.v * b.v) AS dot
        |  FROM e a JOIN e b ON a.p = b.p AND a.vec_id < 100 AND a.vec_id <> b.vec_id
        |  GROUP BY a.vec_id, b.vec_id),
        |cos AS (
        |  SELECT qid, vid, ROUND(dot / (na.nrm * nb.nrm), 4) AS cos
        |  FROM dots JOIN norms na ON na.vec_id = qid JOIN norms nb ON nb.vec_id = vid),
        |r AS (SELECT qid, vid, cos,
        |  ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, vid ASC) AS rn
        |  FROM cos)
        |SELECT qid, CAST(rn AS INT) AS rn, vid, cos FROM r
        |WHERE rn <= 5 ORDER BY qid, rn""".stripMargin,
    "q67_knn_label" ->
      s"""WITH e AS ($explSql),
        |norms AS (SELECT vec_id, sqrt(SUM(v * v)) AS nrm FROM e GROUP BY vec_id),
        |dots AS (
        |  SELECT a.vec_id AS qid, b.vec_id AS vid, SUM(a.v * b.v) AS dot
        |  FROM e a JOIN e b ON a.p = b.p AND a.vec_id < 100 AND a.vec_id <> b.vec_id
        |  GROUP BY a.vec_id, b.vec_id),
        |cos AS (
        |  SELECT qid, vid, ROUND(dot / (na.nrm * nb.nrm), 4) AS cos
        |  FROM dots JOIN norms na ON na.vec_id = qid JOIN norms nb ON nb.vec_id = vid),
        |r AS (SELECT qid, vid, cos,
        |  ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, vid ASC) AS rn
        |  FROM cos),
        |nn AS (SELECT qid, vid FROM r WHERE rn <= 5),
        |votes AS (
        |  SELECT nn.qid, emb.label AS nb_label, COUNT(*) AS votes
        |  FROM nn JOIN embeddings emb ON emb.vec_id = nn.vid
        |  GROUP BY nn.qid, emb.label),
        |pred AS (SELECT qid, nb_label AS pred_label, votes,
        |  ROW_NUMBER() OVER (PARTITION BY qid ORDER BY votes DESC, nb_label ASC) AS rn
        |  FROM votes)
        |SELECT p.qid, p.pred_label, t.label AS true_label, p.votes,
        |  CAST(p.pred_label = t.label AS INT) AS correct
        |FROM pred p JOIN embeddings t ON t.vec_id = p.qid
        |WHERE p.rn = 1 ORDER BY p.qid""".stripMargin,
    "q68_multimodal_column" ->
      """SELECT doc_id, md5(text) AS text_hash, lang,
        |  CAST(len(embedding) AS INT) AS dim,
        |  ROUND(sqrt(list_sum(list_transform(embedding,
        |    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 4) AS l2norm,
        |  label
        |FROM documents JOIN embeddings ON doc_id = vec_id
        |ORDER BY doc_id""".stripMargin,
    "q69_embed_stats" ->
      s"""WITH e AS ($explSql),
        |cent AS (
        |  SELECT emb.label, e.p, AVG(e.v) AS cv
        |  FROM e JOIN embeddings emb USING (vec_id) GROUP BY emb.label, e.p),
        |cnorm AS (SELECT label, ROUND(sqrt(SUM(cv * cv)), 4) AS centroid_norm
        |          FROM cent GROUP BY label),
        |vnorm AS (SELECT vec_id, sqrt(SUM(v * v)) AS nrm FROM e GROUP BY vec_id),
        |agg AS (
        |  SELECT emb.label, COUNT(*) AS n_vecs, ROUND(AVG(vn.nrm), 4) AS avg_vec_norm
        |  FROM embeddings emb JOIN vnorm vn USING (vec_id) GROUP BY emb.label)
        |SELECT agg.label, agg.n_vecs, cnorm.centroid_norm, agg.avg_vec_norm
        |FROM agg JOIN cnorm USING (label) ORDER BY agg.label""".stripMargin)
}
