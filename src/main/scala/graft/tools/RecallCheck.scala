package graft.tools
import org.apache.spark.sql.SparkSession
object RecallCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    val exact = graft.engine.TextOps.q61(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val t0 = System.nanoTime()
    val lsh = graft.engine.TextOps.q62(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val dt = (System.nanoTime() - t0) / 1e9
    val recall = if (exact.isEmpty) 1.0 else lsh.intersect(exact).size.toDouble / exact.size
    println(f"RESULT exact=${exact.size} lsh=${lsh.size} recall=$recall%.4f q62_time=$dt%.1fs")
    // IVF@5 recall vs brute-force cosine top-5 (sf0.01: 500 vecs, 8 buckets)
    val d2 = "/root/testdata/sf0.01"
    val knnExact = graft.engine.VectorOps.q66(spark, d2).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val knnIvf = graft.engine.VectorOps.q76(spark, d2).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val ivfRecall = knnIvf.intersect(knnExact).size.toDouble / knnExact.size
    println(f"IVF_RESULT exact=${knnExact.size} ivf=${knnIvf.size} recall=$ivfRecall%.4f")
    // q114 drop recall vs the exact predicate (sf0.01, where complete
    // all-pairs Jaccard is feasible): a batch doc is EXACT-dropped iff it
    // pairs at J≥0.8 with any corpus doc (history wins, any id) or a
    // smaller-id batch-mate; q114's LSH drops must be a subset
    // (precision 1.0 — hard assert) and recall is the reported dial.
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(s"$d2/documents.parquet")
    val pairs = graft.api.GraftOps.jaccardPairs(
        docs.select(col("doc_id"),
          array_distinct(split(col("text"), " ")).as("tk")),
        "doc_id", "tk", minPct = 80)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val batch = docs.filter(col("doc_id") % 5 === 0)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val exactDropped = batch.filter(b => pairs.exists { case (x, y) =>
      y == b || (x == b && !batch(y)) })
    val survivors = graft.engine.TextOps.q114(spark, d2).collect()
      .map(_.getLong(0)).toSet
    val lshDropped = batch -- survivors
    require(lshDropped.subsetOf(exactDropped),
      s"q114 precision violated: ${(lshDropped -- exactDropped).toSeq.sorted}")
    val ndRecall =
      if (exactDropped.isEmpty) 1.0
      else lshDropped.intersect(exactDropped).size.toDouble / exactDropped.size
    println(f"NEARDUP_RESULT batch=${batch.size} exact_dropped=" +
      f"${exactDropped.size} lsh_dropped=${lshDropped.size} " +
      f"recall=$ndRecall%.4f precision=1.0000 (hard-asserted)")
    // q115 drop recall vs the exact cosine predicate (sf0.01): exact
    // baseline = the complete tiled all-pairs embeddingNearDupPairs at
    // the binding's cos ≥ 0.35; history wins / smaller-id in-batch.
    graft.GraftExtensions.register(spark)
    val emb = spark.read.parquet(s"$d2/embeddings.parquet")
    val ePairs = graft.api.GraftOps.embeddingNearDupPairs(emb, "vec_id",
        "embedding", minCosine = 0.35)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val eBatch = emb.filter(col("vec_id") % 5 === 0)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val eExactDropped = eBatch.filter(b => ePairs.exists { case (x, y) =>
      y == b || (x == b && !eBatch(y)) })
    val eSurvivors = graft.engine.VectorOps.q115(spark, d2).collect()
      .map(_.getLong(0)).toSet
    val eDropped = eBatch -- eSurvivors
    require(eDropped.subsetOf(eExactDropped),
      s"q115 precision violated: ${(eDropped -- eExactDropped).toSeq.sorted}")
    val eRecall =
      if (eExactDropped.isEmpty) 1.0
      else eDropped.intersect(eExactDropped).size.toDouble / eExactDropped.size
    println(f"EMBDUP_RESULT batch=${eBatch.size} exact_dropped=" +
      f"${eExactDropped.size} srp_dropped=${eDropped.size} " +
      f"recall=$eRecall%.4f precision=1.0000 (hard-asserted)")
    // q133 semDedupPairs recall vs the same exact all-pairs truth
    // (sf0.01, cos ≥ 0.35, the registry binding's nClusters = 16 /
    // lloydIters = 6) across the nAssign multi-probe dial: pairs must be
    // a SUBSET of the exact pairs at every dial point (precision 1.0 —
    // hard assert; every candidate is verified with the exact cosine
    // in-join), recall = the shared-cell rate. nAssign = 2 is the
    // registry binding.
    val ePairSet = ePairs.toSet
    for (nAssign <- Seq(1, 2, 4)) {
      val semPairs = graft.api.GraftOps.semDedupPairs(emb, "vec_id",
          "embedding", minCosine = 0.35, nClusters = 16, lloydIters = 6,
          nAssign = nAssign)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      require(semPairs.subsetOf(ePairSet),
        s"q133 precision violated at nAssign=$nAssign: " +
          s"${(semPairs -- ePairSet).toSeq.sorted.take(5)}")
      val semRecall =
        if (ePairSet.isEmpty) 1.0
        else semPairs.intersect(ePairSet).size.toDouble / ePairSet.size
      println(f"SEMDEDUP_RESULT nAssign=$nAssign exact=${ePairSet.size} " +
        f"sem=${semPairs.size} recall=$semRecall%.4f precision=1.0000 " +
        "(hard-asserted)")
    }
    // q146 IVF-PQ recall@5 vs the exact q66 truth at the registry dials
    // (sf0.01, nLists = 16, m = 8, ksub = 16, nProbe = 4), across the
    // rerankFactor dial — PLUS the flat ivfSearch at the same centroids
    // and nProbe, which is the dial's ceiling (the coarse probe decides
    // what CAN be found; PQ distortion decides what the ADC shortlist
    // keeps; the rerank is exact). Approaching the flat line as
    // rerankFactor grows is the PQ contract.
    {
      val embQ = graft.engine.Tables.embeddings(spark, d2)
      val pqDir = graft.engine.Tables.scratchDir("recall_pq_")
      val flatDir = graft.engine.Tables.scratchDir("recall_pqflat_")
      graft.api.GraftOps.ivfPqBuild(embQ, "vec_id", "embedding", pqDir,
        nLists = 16, m = 8, ksub = 16, lloydIters = 3)
      graft.api.GraftOps.ivfBuild(embQ, "vec_id", "embedding", flatDir,
        centroidsFrom = Some(pqDir))
      val qs = embQ.filter("vec_id < 100")
      val flat = graft.api.GraftOps.ivfSearch(qs, "vec_id", "embedding",
          flatDir, k = 5, nProbe = 4)
        .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
      val flatRecall = flat.intersect(knnExact).size.toDouble / knnExact.size
      println(f"PQ_RESULT flat_ivf nProbe=4 recall=$flatRecall%.4f " +
        "(the coarse ceiling)")
      for (rf <- Seq(1, 4, 16)) {
        val pq = graft.api.GraftOps.ivfPqSearch(qs, "vec_id", "embedding",
            pqDir, k = 5, nProbe = 4, rerankFactor = rf)
          .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
        val pqRecall = pq.intersect(knnExact).size.toDouble / knnExact.size
        val vsFlat = if (flat.isEmpty) 1.0
          else pq.intersect(flat).size.toDouble / flat.size
        println(f"PQ_RESULT rerankFactor=$rf recall=$pqRecall%.4f " +
          f"vs_flat=$vsFlat%.4f")
      }
      // the dial's pinned endpoint: a shortlist that covers every
      // probed candidate (k×64 = 320 ≥ any 4-list candidate count at
      // sf0.01) makes the exact rerank see everything the flat scan
      // sees — ivfPqSearch ≡ ivfSearch row set, ADC distortion priced
      // OUT (the ivfTopKReranked full-coverage law, against the
      // persisted substrate)
      val pqFull = graft.api.GraftOps.ivfPqSearch(qs, "vec_id",
          "embedding", pqDir, k = 5, nProbe = 4, rerankFactor = 64)
        .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
      require(pqFull == flat,
        s"PQ full-coverage shortlist must equal the flat search " +
          s"(pq-only=${(pqFull -- flat).size} flat-only=${(flat -- pqFull).size})")
      println("PQ_RESULT rerankFactor=64 == flat_ivf (hard-asserted: " +
        "full shortlist coverage prices ADC distortion out)")
    }
    spark.stop()
  }
}
