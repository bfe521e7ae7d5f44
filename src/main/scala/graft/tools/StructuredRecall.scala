package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Recall sweep on a STRUCTURED (clustered) embedding corpus — the
  * measurement VERDICT r16 task 2 asked for: RECALL.md's committed
  * IVF / IVF-PQ / SemDeDup / SRP curves were all measured on the
  * driver testdata's i.i.d. hash-gaussian vectors, which is the
  * ADVERSARIAL floor for every quantization method (no cluster
  * structure for coarse centroids to find, near-flat residual
  * covariance for PQ to exploit, thin planted-duplicate mass for the
  * dedup families). Real embedding corpora are the opposite — heavy
  * cluster structure, duplicates at cos ≥ 0.95 — so this tool plants
  * that structure deterministically and re-measures the same dials.
  *
  * The corpus (hash-derived like ScaleProbe's zipf family — same
  * bytes every run, no RNG state):
  *  - K planted Gaussian clusters: center c = 64 i.i.d. hash-gaussians
  *    (Box–Muller over two xxhash64 uniforms, ScaleProbe's generator);
  *    member i of cluster (i mod K) = center + σ·noise(i), σ = 0.35 —
  *    intra-cluster cosine ≈ 1/(1+σ²) ≈ 0.89, inter-cluster ≈ 0.
  *  - The intra-cluster noise is LOW-RANK (an R = 8-dim latent mixed
  *    through a per-cluster 8×64 hash-gaussian basis, scaled 1/√R to
  *    unit per-component variance) — the property that makes this
  *    corpus the OPPOSITE of the isotropic bracket: coarse residuals
  *    concentrate in an 8-dim subspace per cluster, so their per-PQ-
  *    subspace covariance is genuinely ANISOTROPIC — the structure PQ
  *    codebooks can exploit and an OPQ rotation has something to
  *    align (on the isotropic corpus OPQ measured NEGATIVE because
  *    there was nothing to align — RECALL.md r16).
  *  - PLANTED NEAR-DUP PAIRS: every i with i mod 13 = 1 re-uses
  *    source (i−1)'s raw vector plus 0.12·i.i.d. noise — pair cosine
  *    ≈ 0.994, well above the 0.95 dedup threshold and separated from
  *    the ≈ 0.89 same-cluster background. The source is never itself
  *    a dup ((i−1) mod 13 = 0), so every planted pair is real.
  *
  * Measures, at the SAME dials as the committed isotropic tables so
  * the two brackets read side by side: IVF nProbe dial (nLists = 16,
  * k = 5), IVF-PQ rerankFactor dial (m = 8, ksub = 16, nProbe = 4,
  * rf = 64 ≡ flat hard-asserted), SemDeDup nAssign dial and SRP pair
  * recall against the exact tiled all-pairs truth at cos ≥ 0.95.
  * Also writes the corpus to `outDir/embeddings.parquet` (same schema
  * as the testdata) so `scripts/pq_bracket_replication.py outDir`
  * re-runs the numpy OPQ/estimator sweep on the structured bracket.
  *
  * Run: `sbt "runMain graft.tools.StructuredRecall"` and splice the
  * printed section into RECALL.md. */
object StructuredRecall {

  /** One hash-gaussian: Box–Müller over two xxhash64-derived uniforms,
    * tagged so every (tag, key, index) is an independent draw. `idx`
    * is any SQL expression naming the component (a lambda variable or
    * a concat of several). */
  private def gauss(tag: String, keyExpr: String, idx: String): String =
    s"""sqrt(-2.0 * ln((pmod(xxhash64($keyExpr, '${tag}u1',
       |  cast($idx as string)), 1000000000) + 0.5) / 1e9)) *
       |cos(2.0 * pi() * (pmod(xxhash64($keyExpr, '${tag}u2',
       |  cast($idx as string)), 1000000000) + 0.5) / 1e9)""".stripMargin

  /** The structured corpus: (vec_id, embedding float[64]). The
    * intra-cluster noise is an R-dim latent z(did) mixed through the
    * cluster's R×64 basis B, scaled 1/√R so each component keeps unit
    * variance — coarse residuals then live in an R-dim subspace per
    * cluster (anisotropic per-PQ-subspace covariance), which is the
    * whole point of the bracket. */
  def corpus(spark: SparkSession, n: Long, k: Int = 16,
      sigma: Double = 0.35, rank: Int = 8, dupMod: Int = 13,
      dupNoise: Double = 0.12): DataFrame = {
    val cl = s"cast(pmod(did, $k) as string)"
    // Σ_r z_r(did) · B(cluster, r)[j] / √R — z keyed by (did, r), B by
    // (cluster:r, j); both independent hash-gaussian streams
    val lowrank =
      s"""(aggregate(sequence(0, ${rank - 1}), cast(0.0 as double),
         |  (acc, r) -> acc +
         |    (${gauss("z", "cast(did as string)", "r")}) *
         |    (${gauss("b", s"concat($cl, ':', cast(r as string))", "j")}))
         |  / sqrt(cast($rank as double)))""".stripMargin
    spark.range(n).select(col("id").as("vec_id"))
      // did = the generator id: a planted dup re-uses its SOURCE's
      // draw. Source = vec_id − 1, whose own (vec_id−1) % dupMod = 0 ≠
      // 1 — a source is never itself a dup, so every planted pair is
      // a true near-duplicate (the first cut of this tool chained
      // dups 13 apart, and every source in the chain was a dup of a
      // DIFFERENT generator id — almost no pair survived; found by
      // the planted-count assert below)
      .withColumn("did", when(col("vec_id") % dupMod === 1,
          col("vec_id") - 1)
        .otherwise(col("vec_id")))
      .withColumn("dn", when(col("did") =!= col("vec_id"),
        lit(dupNoise)).otherwise(lit(0.0)))
      .withColumn("raw", expr(
        s"""transform(sequence(0, 63), j ->
           |  ${gauss("c", cl, "j")} +
           |  $sigma * $lowrank +
           |  dn * (${gauss("d", "cast(vec_id as string)", "j")}))"""
          .stripMargin))
      .withColumn("nrm", sqrt(expr(
        "aggregate(raw, cast(0.0 as double), (a, x) -> a + x * x)")))
      .withColumn("embedding", expr(
        "transform(raw, x -> cast(x / nrm as float))"))
      .select("vec_id", "embedding")
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.GraftExtensions.register(spark)
    import graft.api.GraftOps

    val n = args.headOption.map(_.toLong).getOrElse(2000L)
    val outDir = args.lift(1).getOrElse("/tmp/graft_structured")
    val emb = corpus(spark, n).localCheckpoint(true)
    emb.write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")
    println(s"[structured] corpus n=$n written to $outDir (K=16 planted " +
      "clusters, sigma=0.35, dups every 13th at ~cos 0.994)")

    // ---- exact truths (brute force — the same math as q61/q66) ----
    val exactTopK = GraftOps.cosineTopK(emb, "vec_id", "embedding",
        queryPred = col("vec_id") < 100, k = 5)
      .select("qid", "vid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exactPairs = GraftOps.embeddingNearDupPairs(emb, "vec_id",
        "embedding", minCosine = 0.95)
      .select("d1", "d2").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // planted pairs are (i−1, i) for i ≡ 1 (mod 13), i ≥ 1
    val plantedPairs = (1L until n by 13L).filter(_ >= 1L)
      .map(i => (i - 1, i)).filter(p => p._1 >= 0 && p._2 < n).toSet
    val found = plantedPairs.intersect(exactPairs).size
    require(found >= (plantedPairs.size * 9) / 10,
      s"planting failed: only $found of ${plantedPairs.size} planted " +
        "pairs exceed the 0.95 exact threshold — the generator's dup " +
        "noise or chaining is wrong")
    println(s"[structured] exact truth: ${exactTopK.size} top-5 pairs, " +
      s"${exactPairs.size} dedup pairs at cos>=0.95 " +
      s"(${plantedPairs.size} planted, $found of them found exactly)")

    val sb = new StringBuilder
    sb ++= s"\n## Structured bracket (StructuredRecall, $n vectors, " +
      "16 planted clusters)\n\n"
    sb ++= s"Exact truth: ${exactTopK.size} top-5 pairs; " +
      s"${exactPairs.size} near-dup pairs at cos ≥ 0.95 " +
      s"(planted: ${plantedPairs.size}, $found found exactly).\n"

    // ---- IVF nProbe dial (nLists=16, k=5 — the committed dials) ----
    sb ++= "\nIVF nProbe dial (seeding=lowid, lloydIters=6, nLists=16):\n\n"
    sb ++= "| nProbe | recall@5 |\n|---|---|\n"
    for (np <- Seq(1, 2, 4, 8, 12, 16)) {
      val got = GraftOps.ivfTopK(emb, "vec_id", "embedding",
          queryPred = col("vec_id") < 100, k = 5, nLists = 16,
          nProbe = np, lloydIters = 6)
        .select("qid", "vid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val rec = got.intersect(exactTopK).size.toDouble / exactTopK.size
      val line = f"| $np | $rec%.4f |"
      println(s"[structured] ivf $line")
      sb ++= line + "\n"
    }

    // ---- IVF-PQ rerankFactor dial (the q146 registry dials) ----
    val dir = graft.engine.Tables.scratchDir("graft_structpq_")
    GraftOps.ivfPqBuild(emb, "vec_id", "embedding", dir, nLists = 16,
      m = 8, ksub = 16, lloydIters = 3)
    val queries = emb.filter(col("vec_id") < 100)
    val flat = {
      val fdir = graft.engine.Tables.scratchDir("graft_structivf_")
      GraftOps.ivfBuild(emb, "vec_id", "embedding", fdir, nLists = 16,
        lloydIters = 3, centroidsFrom = Some(dir))
      GraftOps.ivfSearch(queries, "vec_id", "embedding", fdir, k = 5,
          nProbe = 4)
        .select("qid", "vid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    sb ++= "\nIVF-PQ rerankFactor dial (nLists=16, m=8, ksub=16, " +
      "nProbe=4, k=5; residual codes):\n\n"
    sb ++= "| rerankFactor | recall@5 | vs_flat |\n|---|---|---|\n"
    sb ++= f"| flat ivfSearch (ceiling) | ${flat.intersect(exactTopK)
      .size.toDouble / exactTopK.size}%.4f | 1.0000 |\n"
    for (rf <- Seq(1, 4, 16, 64)) {
      val got = GraftOps.ivfPqSearch(queries, "vec_id", "embedding", dir,
          k = 5, nProbe = 4, rerankFactor = rf)
        .select("qid", "vid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val rec = got.intersect(exactTopK).size.toDouble / exactTopK.size
      val vsFlat = got.intersect(flat).size.toDouble / flat.size
      if (rf == 64) require(got == flat,
        "rf=64 must reproduce the flat search row set (the committed " +
          "hard assert) — it did not on the structured corpus")
      val line = f"| $rf | $rec%.4f | $vsFlat%.4f |"
      println(s"[structured] ivfpq $line")
      sb ++= line + "\n"
    }

    // ---- SemDeDup nAssign dial at cos >= 0.95 ----
    sb ++= "\nSemDeDup pair recall at cos ≥ 0.95 (nClusters=16, " +
      "lloydIters=6; precision 1.0 hard-asserted):\n\n"
    sb ++= "| nAssign | pair recall |\n|---|---|\n"
    for (na <- Seq(1, 2, 4)) {
      val got = GraftOps.semDedupPairs(emb, "vec_id", "embedding",
          minCosine = 0.95, nClusters = 16, lloydIters = 6, nAssign = na)
        .select("d1", "d2").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      require(got.subsetOf(exactPairs),
        s"semDedup precision violated: ${(got -- exactPairs).take(3)}")
      val rec = if (exactPairs.isEmpty) 1.0
        else got.intersect(exactPairs).size.toDouble / exactPairs.size
      val line = f"| $na | $rec%.4f |"
      println(s"[structured] semdedup $line")
      sb ++= line + "\n"
    }

    // ---- SRP-LSH pair recall at cos >= 0.95 (default dials) ----
    val srp = GraftOps.srpNearDupPairs(emb, "vec_id", "embedding",
        minCosine = 0.95, dim = 64)
      .select("d1", "d2").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    require(srp.subsetOf(exactPairs),
      s"srp precision violated: ${(srp -- exactPairs).take(3)}")
    val srpRec = if (exactPairs.isEmpty) 1.0
      else srp.intersect(exactPairs).size.toDouble / exactPairs.size
    println(f"[structured] srp recall=$srpRec%.4f")
    sb ++= f"\nSRP-LSH (nBits=32, bands=8) pair recall at cos ≥ 0.95: " +
      f"$srpRec%.4f (precision 1.0 hard-asserted)\n"

    println(sb.toString)
    spark.stop()
  }
}
