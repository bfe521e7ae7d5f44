package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SimpleMode

/** Plan-inspection tool (SURVEY §4.2): prints the physical-plan lines that
  * prove the scale-critical properties — parquet filter pushdown, column
  * pruning, broadcast vs shuffle join selection, partial aggregation, and
  * the native dot-product expression staying inside codegen.
  * Run: `sbt "runMain graft.tools.ExplainCheck [sfDir]"`. */
object ExplainCheck {
  /** Queries whose plans legitimately contain a nested-loop or cartesian
    * join: declared non-equi semantics (theta/interval/cross) or an
    * intentional small-broadcast × scan pattern (cosine/IVF search). */
  private val nonEquiByDesign = Set(
    "q15_join_cross", "q16_join_theta_range", "q17_join_interval",
    "q66_cosine_topk", "q67_knn_label", // broadcast(queries) × corpus scan
    "q102_knn_join", // same broadcast(queries) × corpus shape, two frames
    "q136_hybrid_rrf", // dense leg reuses cosineTopKJoin with a 10-query
                       // broadcast side — identical bounded shape to q102
    "q45_tag_range_band", // BETWEEN join against the (tiny) band-rule table
    "q93_rfm_approx") // 1-row quintile-bounds frame crossJoin(broadcast) —
                      // the annotated pattern in PortraitOps.quintileScores

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = args.headOption.getOrElse("/root/testdata/sf0.01")
    def show(name: String, df: org.apache.spark.sql.DataFrame,
        greps: Seq[String]): Unit = {
      val plan = df.queryExecution.explainString(SimpleMode)
      println(s"=== $name ===")
      greps.foreach { g =>
        plan.linesIterator.filter(_.contains(g)).take(2)
          .foreach(l => println("  " + l.trim.take(170)))
      }
    }
    show("q02 pushdown", graft.engine.Relational.q02(spark, d),
      Seq("PushedFilters", "ReadSchema"))
    show("q01 pruning", graft.engine.Relational.q01(spark, d), Seq("ReadSchema"))
    show("q09 broadcast", graft.engine.Relational.q09(spark, d),
      Seq("BroadcastHashJoin", "BroadcastExchange"))
    show("q10 smj", graft.engine.Relational.q10(spark, d), Seq("SortMergeJoin"))
    show("q08 big join", graft.engine.Relational.q08(spark, d),
      Seq("ShuffledHashJoin", "SortMergeJoin", "BroadcastHashJoin"))
    show("q19 partial agg", graft.engine.Relational.q19(spark, d),
      Seq("HashAggregate"))
    show("q66 native dot", graft.engine.VectorOps.q66(spark, d),
      Seq("BroadcastNestedLoopJoin", "graft_dot", "ObjectHashAggregate"))
    // Hard check: q66 must broadcast the QUERY side (BuildRight of
    // corpus.join(broadcast(queries))) and two-stage its top-k through the
    // bounded typed aggregator, never broadcast the corpus or window-rank
    // the full candidate set.
    var bad = 0
    val q66Plan = graft.engine.VectorOps.q66(spark, d)
      .queryExecution.explainString(SimpleMode)
    if (!q66Plan.contains("BroadcastNestedLoopJoin BuildRight")) {
      println("  FAIL q66: query side is not the broadcast (BuildRight) operand")
      bad += 1
    }
    if (!q66Plan.contains("ObjectHashAggregate")) {
      println("  FAIL q66: bounded top-k aggregator missing from the plan")
      bad += 1
    }
    // Hard check: q76's IVF assignment must be a pure projection (argmin over
    // literal centroids) — no nested loop against a seed table, no full-corpus
    // window shuffle — and its top-k must go through the bounded aggregator.
    val q76Plan = graft.engine.VectorOps.q76(spark, d)
      .queryExecution.explainString(SimpleMode)
    if (q76Plan.contains("BroadcastNestedLoopJoin") ||
        q76Plan.contains("CartesianProduct")) {
      println("  FAIL q76: centroid assignment plans a nested-loop join")
      bad += 1
    }
    if (!q76Plan.contains("ObjectHashAggregate")) {
      println("  FAIL q76: bounded top-k aggregator missing from the plan")
      bad += 1
    }
    // Hard check: repetitionStats' zero-shuffle claim — the API function's
    // plan (the binding adds an output orderBy) must contain no Exchange.
    val q97Plan = graft.api.TextAnalysis.repetitionStats(
        spark.read.parquet(s"$d/documents.parquet"), "doc_id", "text")
      .queryExecution.executedPlan.toString
    if (q97Plan.contains("Exchange")) {
      println("  FAIL repetitionStats: zero-shuffle claim broken (Exchange in plan)")
      bad += 1
    }
    // Hard checks: q104's deletion-neighborhood self-join must REUSE one
    // exchange over the variant explode (the O(len^k) explode computes
    // once per row, not once per join side — the claim the repartition in
    // editDistancePairs exists to make true), and q100's SRP sketch
    // (nBits dot products per row) must likewise compute once behind a
    // ReusedExchange under the banded self-join. AQE defers exchange
    // reuse to runtime — the pre-execution explain shows two identical
    // exchanges — so these checks EXECUTE the frame and assert on the
    // final adaptive plan.
    def finalPlan(df: org.apache.spark.sql.DataFrame): String = {
      df.collect()
      df.queryExecution.executedPlan.toString
    }
    if (!finalPlan(graft.engine.TextOps.q104(spark, d))
        .contains("ReusedExchange")) {
      println("  FAIL q104: variant explode computed per join side (no ReusedExchange in final plan)")
      bad += 1
    }
    if (!finalPlan(graft.engine.VectorOps.q100(spark, d))
        .contains("ReusedExchange")) {
      println("  FAIL q100: sketch projection computed per join side (no ReusedExchange in final plan)")
      bad += 1
    }
    // Hard check: the selection operators' windows must stay PARTITIONED
    // (by group/stratum) — a single-partition exchange here is the global
    // sort that stops scaling first. (q110 is NOT in this list: its
    // corpus-fraction threshold rides a scalar subquery whose final
    // count aggregation is legitimately single-partition — O(partitions)
    // partial rows, not data.)
    for ((nm, q) <- Seq("q106" -> graft.engine.TextOps.q106 _,
        "q107" -> graft.engine.TextOps.q107 _)) {
      val plan = q(spark, d).queryExecution.explainString(SimpleMode)
      if (plan.contains("SinglePartition")) {
        println(s"  FAIL $nm: selection operator plans a single-partition stage")
        bad += 1
      }
    }
    // Hard check: q128's per-stratum rank-≤-k filter must rewrite to
    // WindowGroupLimit — the map-side partial top-k that keeps each task
    // forwarding at most k rows per stratum into the shuffle. Without the
    // rewrite the window sorts whole strata — the shape that stops
    // scaling first on a skewed mix. (The final orderBy is a rank-bounded
    // range exchange over ≤ k·strata rows, not corpus data.)
    val q128Plan = graft.engine.TextOps.q128(spark, d)
      .queryExecution.explainString(SimpleMode)
    if (!q128Plan.contains("WindowGroupLimit")) {
      println("  FAIL q128: rank filter did not rewrite to WindowGroupLimit")
      bad += 1
    }
    // Hard check: q113's winnowing window-min pass must read MATERIALIZED
    // gram hashes — the Tables.barrier fence under the projection. With
    // the fence gone, CollapseProject inlines the digest transform into
    // the slice lambda and the in-row pass is O(n_grams²) interpreted
    // per document (measured: 451 s for the q113 binding at sf0.1).
    val q113Plan = graft.engine.TextOps.q113(spark, d)
      .queryExecution.explainString(SimpleMode)
    if (!q113Plan.contains("MapPartitions")) {
      println("  FAIL q113: barrier fence missing under the winnowing projection")
      bad += 1
    }
    if (q113Plan.linesIterator.exists(l =>
        l.contains("array_min(slice") && l.contains("md5("))) {
      println("  FAIL q113: gram digests inlined into the window-min lambda")
      bad += 1
    }
    // Hard check: jaccardPairs' set frame has six logical consumers; the
    // lazy localCheckpoint collapses them onto ONE shared RDD leaf (scan
    // + set build run once, not six times). The leaf shows as a "Scan
    // ExistingRDD" — its absence means the checkpoint was dropped and
    // every consumer re-reads the corpus.
    val q81Plan = graft.engine.TextOps.q81(spark, d)
      .queryExecution.executedPlan.toString
    if (!q81Plan.contains("Scan ExistingRDD")) {
      println("  FAIL q81: set frame not checkpoint-shared (no RDD leaf — six corpus reads)")
      bad += 1
    }
    // Hard check: q114's arriving-batch sketch has four consumers (probe
    // bands, union bands, verify docs, union docs) — the lazy
    // localCheckpoint must collapse them onto ONE shared RDD leaf, or
    // the batch re-sketches once per consumer.
    val q114Plan = graft.engine.TextOps.q114(spark, d)
      .queryExecution.executedPlan.toString
    if (!q114Plan.contains("Scan ExistingRDD")) {
      println("  FAIL q114: batch sketch not checkpoint-shared (no RDD leaf)")
      bad += 1
    }
    // Hard check: the uncapped dedupNear candidate path must dedup pairs
    // by band OWNERSHIP (a filter over sigs-attaching joins), NOT by the
    // pair-distinct it replaced — the round-12 plan change that removed
    // the full-fan-out Exchange+HashAggregate — and the exact verify
    // must run through the native sorted-merge kernel. The capped path
    // must KEEP the distinct (ownership is unsound when a hot bucket
    // can drop a pair's owning band). Built on a throwaway index so the
    // fused (uninstrumented) plan is the one asserted.
    {
      val docs = spark.read.parquet(s"$d/documents.parquet")
        .select("doc_id", "text")
      val ndir = graft.engine.Tables.scratchDir("explain_nd_")
      graft.api.GraftOps.fingerprintBuild(
        docs.filter("doc_id % 5 != 0"), "doc_id", "text", ndir)
      def pairAgg(plan: String): Boolean = plan.linesIterator.exists(l =>
        l.contains("HashAggregate(keys=[fid#") && l.contains("oid#"))
      val fused = graft.api.GraftOps.dedupNearAgainstCorpus(
          docs.filter("doc_id % 5 = 0"), "doc_id", "text", ndir)
        .queryExecution.explainString(SimpleMode)
      if (!fused.contains("intersectsize")) {
        println("  FAIL dedupNear: native sorted-merge verify kernel missing")
        bad += 1
      }
      if (pairAgg(fused)) {
        println("  FAIL dedupNear(uncapped): pair-distinct is back — " +
          "ownership dedup lost, the band fan-out aggregates again")
        bad += 1
      }
      val capped = graft.api.GraftOps.dedupNearAgainstCorpus(
          docs.filter("doc_id % 5 = 0"), "doc_id", "text", ndir,
          maxBucketSize = Some(64))
        .queryExecution.explainString(SimpleMode)
      if (!pairAgg(capped)) {
        println("  FAIL dedupNear(capped): pair-distinct missing — " +
          "ownership under a bucket cap is unsound (owning band may be " +
          "capped away)")
        bad += 1
      }
    }
    // Hard check: the digest probe's Bloom pre-filter must ENGAGE on a
    // bloom-built index (the plan is a Union of the sure-novel split
    // and the maybe anti-join) and must NOT change the plain index's
    // single anti-join plan — the silent failure mode here is the
    // version-lock or size guard quietly disabling the sidecar forever.
    {
      val docs = spark.read.parquet(s"$d/documents.parquet")
        .select("doc_id", "text")
      val bdir = graft.engine.Tables.scratchDir("explain_blm_")
      graft.api.GraftOps.digestIndexBuild(
        docs.filter("doc_id % 5 != 0"), "text", bdir, nBuckets = 16,
        bloomFpp = Some(0.01))
      val pdir = graft.engine.Tables.scratchDir("explain_blmp_")
      graft.api.GraftOps.digestIndexBuild(
        docs.filter("doc_id % 5 != 0"), "text", pdir, nBuckets = 16)
      val bPlan = graft.api.GraftOps.dedupExactAgainstCorpus(
          docs.filter("doc_id % 5 = 0"), "doc_id", "text", "doc_id", bdir)
        .queryExecution.explainString(SimpleMode)
      val pPlan = graft.api.GraftOps.dedupExactAgainstCorpus(
          docs.filter("doc_id % 5 = 0"), "doc_id", "text", "doc_id", pdir)
        .queryExecution.explainString(SimpleMode)
      if (!bPlan.contains("Union")) {
        println("  FAIL bloom probe: pre-filter did not engage (no " +
          "sure-novel/maybe Union in the plan)")
        bad += 1
      }
      if (pPlan.contains("Union")) {
        println("  FAIL plain probe: un-bloomed index plans the split — " +
          "the historical single-scan plan was lost")
        bad += 1
      }
    }
    // Hard check: q132's incremental scrub must PRUNE its history read to
    // the batch's touched buckets (PartitionFilters on `bucket` at the
    // grams scan) — the silent failure mode is the isin filter not
    // reaching the partitioned scan and the probe degrading to a
    // full-history read.
    {
      val docs = spark.read.parquet(s"$d/documents.parquet")
        .select("doc_id", "text")
      val gdir = graft.engine.Tables.scratchDir("explain_gram_")
      graft.api.GraftOps.gramIndexBuild(
        docs.filter("doc_id % 5 != 0"), "text", gdir, k = 4, nBuckets = 16)
      val gPlan = graft.api.GraftOps.substringScrubAgainstCorpus(
          docs.filter("doc_id % 5 = 0"), "doc_id", "text", gdir)
        .queryExecution.explainString(SimpleMode)
      if ("PartitionFilters: \\[[^\\]]*bucket".r.findFirstIn(gPlan).isEmpty) {
        println("  FAIL q132 probe: no bucket PartitionFilters on the " +
          "gram-index history scan — the touched-bucket pruning was lost")
        bad += 1
      }
    }
    // Hard check: the BM25 probe (q137) must prune its postings read to
    // the query terms' buckets, and the DSIR probe (q140) its count
    // reads to the batch's feature buckets — same PartitionFilters
    // contract as the gram probe above.
    {
      val docs = spark.read.parquet(s"$d/documents.parquet")
        .select("doc_id", "text")
      val bdir = graft.engine.Tables.scratchDir("explain_bm25_")
      graft.api.GraftOps.bm25IndexBuild(
        docs.filter("doc_id % 5 != 0"), "doc_id", "text", bdir,
        nBuckets = 16)
      val qs = docs.filter("doc_id < 10").selectExpr("doc_id",
        "slice(split(text, ' '), 1, 4) AS terms")
      val bPlan = graft.api.GraftOps.bm25AgainstCorpus(
          qs, "doc_id", "terms", bdir, k = 5)
        .queryExecution.explainString(SimpleMode)
      if ("PartitionFilters: \\[[^\\]]*bucket".r.findFirstIn(bPlan).isEmpty) {
        println("  FAIL q137 probe: no bucket PartitionFilters on the " +
          "postings scan — the query-term bucket pruning was lost")
        bad += 1
      }
      val ddir = graft.engine.Tables.scratchDir("explain_dsir_")
      graft.api.GraftOps.dsirStatsBuild(
        docs.filter("doc_id % 5 != 0"), "doc_id", "text",
        docs.filter("doc_id % 7 = 0").select("text"), "text", ddir,
        nBuckets = 16)
      val dPlan = graft.api.GraftOps.dsirScoreAgainstStats(
          docs.filter("doc_id % 5 = 0"), "doc_id", "text", ddir)
        .queryExecution.explainString(SimpleMode)
      if ("PartitionFilters: \\[[^\\]]*bucket".r.findFirstIn(dPlan).isEmpty) {
        println("  FAIL q140 probe: no bucket PartitionFilters on the " +
          "count-table scans — the touched-bucket pruning was lost")
        bad += 1
      }
      // the LM probe (q143) joins the batch's events against TWO count
      // tables (bigrams + prev-unigrams) — both reads must prune to the
      // events' buckets
      val ldir = graft.engine.Tables.scratchDir("explain_lm_")
      graft.api.GraftOps.lmStatsBuild(
        docs.filter("doc_id % 5 != 0"), "text", ldir, nBuckets = 16)
      val lPlan = graft.api.GraftOps.lmPerplexityAgainstStats(
          docs.filter("doc_id % 5 = 0"), "doc_id", "text", ldir)
        .queryExecution.explainString(SimpleMode)
      val lPruned = "PartitionFilters: \\[[^\\]]*bucket".r
        .findAllMatchIn(lPlan).size
      if (lPruned < 2) {
        println(s"  FAIL q143 probe: $lPruned pruned count-table scans, " +
          "want 2 (bigram + prev-unigram) — the event-bucket pruning " +
          "was lost")
        bad += 1
      }
    }
    // Hard check: the composed hybrid probe (q142) must keep BOTH
    // members' pruning in one plan — non-empty bucket PartitionFilters
    // on the postings scan AND on the IVF corpus scan (both stores
    // partition by `bucket`); fewer than two pruned scans means one
    // member silently degraded to a full history read.
    {
      val q142Plan = graft.engine.VectorOps.q142(spark, d)
        .queryExecution.explainString(SimpleMode)
      val pruned = "PartitionFilters: \\[[^\\]]*bucket".r
        .findAllMatchIn(q142Plan).size
      if (pruned < 2) {
        println(s"  FAIL q142 probe: $pruned pruned scans, want 2 — a " +
          "member (postings or IVF corpus) lost its bucket pruning")
        bad += 1
      }
    }
    // Hard check: the IVF-PQ probe (q146) must keep BOTH of its reads
    // bounded — the ADC scan prunes the CODES partitions to the probed
    // lists and the exact rerank prunes the full-precision corpus to
    // the probed lists AND pushes the shortlist ids into the scan
    // (PushedFilters on vid). Losing either turns the probe into a
    // full-corpus read — exactly what PQ exists to avoid.
    {
      // the final (rerank) plan: the full-precision corpus read must be
      // list-pruned AND carry the shortlist ids as a pushed filter (the
      // ADC pass is checkpointed out of this plan — asserted next)
      val q146Plan = graft.engine.VectorOps.q146(spark, d)
        .queryExecution.explainString(SimpleMode)
      if ("PartitionFilters: \\[[^\\]]*bucket".r
          .findFirstIn(q146Plan).isEmpty) {
        println("  FAIL q146 rerank: the full-precision corpus scan " +
          "lost its probed-list pruning")
        bad += 1
      }
      if ("PushedFilters: \\[[^\\]]*vid".r.findFirstIn(q146Plan).isEmpty) {
        println("  FAIL q146 rerank: the shortlist ids are not pushed " +
          "into the full-precision scan — the rerank reads whole lists")
        bad += 1
      }
      // the ADC pass's own plan (the exact frame the search
      // checkpoints): the compressed-view scan must prune to the
      // probed lists AND its ReadSchema must exclude the
      // full-precision column — this is the read that replaces the
      // flat corpus scan, so losing either defeats PQ entirely
      val pqDir = graft.engine.Tables.scratchDir("explain_pq_")
      val embP = graft.engine.Tables.embeddings(spark, d)
      graft.api.GraftOps.ivfPqBuild(embP, "vec_id", "embedding", pqDir,
        nLists = 8, m = 8, ksub = 16, lloydIters = 1)
      val adcPlan = graft.api.GraftOps.ivfPqShortlist(
          embP.filter("vec_id < 10"), "vec_id", "embedding", pqDir,
          k = 5, nProbe = 2)
        ._2.queryExecution.explainString(SimpleMode)
      if ("PartitionFilters: \\[[^\\]]*bucket".r
          .findFirstIn(adcPlan).isEmpty) {
        println("  FAIL q146 ADC: the codes scan lost its probed-list " +
          "pruning — the coarse pass reads every inverted list")
        bad += 1
      }
      if (adcPlan.contains("cemb")) {
        println("  FAIL q146 ADC: the coarse scan reads the " +
          "full-precision cemb column — parquet column pruning lost, " +
          "the compression story is gone")
        bad += 1
      }
    }
    // Hard check: q145's id mapping must BROADCAST the bounded
    // vocabulary to the exploded corpus tokens — a SortMergeJoin there
    // means the whole corpus's tokens shuffled for a lookup table
    // thousands of times smaller (the seam's one scale rule).
    {
      val q145Plan = graft.engine.TextOps.q145(spark, d)
        .queryExecution.executedPlan.toString
      if (!q145Plan.contains("BroadcastHashJoin")) {
        println("  FAIL q145: the token-id vocab join is not broadcast " +
          "— the corpus side would shuffle on token strings")
        bad += 1
      }
    }
    // q115's batch sketch shares the same lazy-localCheckpoint leaf
    // contract as q114 (probe bands, union bands, union docs — one
    // sketch, not three).
    val q115Plan = graft.engine.VectorOps.q115(spark, d)
      .queryExecution.executedPlan.toString
    if (!q115Plan.contains("Scan ExistingRDD")) {
      println("  FAIL q115: batch sketch not checkpoint-shared (no RDD leaf)")
      bad += 1
    }
    // q87: the persisted-index search must scan with partition filters on
    // the list id (the probed-lists-only read) — shown for inspection.
    show("q87 pruned search", graft.engine.VectorOps.q87(spark, d),
      Seq("PartitionFilters", "dynamicpruning"))
    // dedup family: band joins must be equi-joins (no nested loop), and the
    // self-join sides must share one ReusedExchange over the fingerprint
    // pipeline rather than computing it twice.
    show("q79 simhash bands", graft.engine.TextOps.q79(spark, d),
      Seq("ReusedExchange", "BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin"))
    show("q81 shingle buckets", graft.engine.TextOps.q81(spark, d),
      Seq("ReusedExchange", "BroadcastHashJoin", "SortMergeJoin"))
    // q80 is the tiled exact all-pairs: candidates must meet on an equi-join
    // over tile pairs, never a corpus broadcast.
    show("q80 cosine pairs", graft.engine.VectorOps.q80(spark, d),
      Seq("SortMergeJoin", "ShuffledHashJoin", "graft_dot"))
    // Full-surface audit: no query outside the non-equi allowlist may plan
    // a cartesian product or nested-loop join — the first thing that stops
    // scaling when data grows 100×.
    println("=== full-surface nested-loop/cartesian audit ===")
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val plan = fn(spark, d).queryExecution.explainString(SimpleMode)
        val hits = Seq("CartesianProduct", "BroadcastNestedLoopJoin")
          .filter(plan.contains)
        if (hits.nonEmpty && !nonEquiByDesign(name)) {
          println(s"  UNEXPECTED $name: ${hits.mkString(", ")}")
          bad += 1
        }
      } catch { case e: Throwable =>
        println(s"  PLAN-ERROR $name: ${e.getMessage.take(100)}"); bad += 1
      }
    }
    println(s"=== audit: $bad unexpected (allowlisted: ${nonEquiByDesign.size}) ===")
    spark.stop()
    if (bad > 0) sys.exit(1)
  }
}
