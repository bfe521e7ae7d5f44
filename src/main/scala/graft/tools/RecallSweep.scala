package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** IVF recall sweep — the measurement behind `RECALL.md` and behind
  * [[graft.api.GraftOps.IvfSeedDefault]].
  *
  * For each (seeding, nProbe, lloydIters) combination it runs
  * [[graft.api.GraftOps.ivfTopK]] with nLists=16 / k=5 over the sf0.01 and
  * sf0.1 embeddings tables and reports recall@5 against the brute-force
  * exact top-5 (same math as q66). Deterministic end to end — same inputs,
  * same table. Re-run after ANY change to the IVF training path and commit
  * the refreshed RECALL.md — NOTE RECALL.md also carries the SRP section
  * (graft.tools.SrpRecall); splice, don't clobber:
  *
  *   sbt "runMain graft.tools.RecallSweep"
  *   (cat RECALL_new.md; echo; sed -n '/# SRP/,$p' RECALL.md) > RECALL.md.tmp
  *   mv RECALL.md.tmp RECALL.md && rm RECALL_new.md
  */
object RecallSweep {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.GraftExtensions.register(spark)

    val sfs = Seq("sf0.01", "sf0.1")
    val seedings = Seq("lowid", "hash", "farthest", "kmeanspar")
    val probes = Seq(4, 8)
    val iters = Seq(3, 6)

    val sb = new StringBuilder
    sb ++= "# IVF recall sweep (graft.tools.RecallSweep)\n\n"
    sb ++= "recall@5 of `GraftOps.ivfTopK` (nLists=16, k=5, queries = vec_id < 100)\n"
    sb ++= "vs brute-force exact cosine top-5, on the driver-generated embeddings\n"
    sb ++= "tables. Deterministic; re-run `sbt \"runMain graft.tools.RecallSweep\"`\n"
    sb ++= "after any IVF training change and commit the refreshed table.\n"

    for (sf <- sfs) {
      val d = s"/root/testdata/$sf"
      val emb = graft.engine.Tables.embeddings(spark, d)
      val exact = graft.api.GraftOps.cosineTopK(emb, "vec_id", "embedding",
          queryPred = col("vec_id") < 100, k = 5)
        .select("qid", "vid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      sb ++= s"\n## $sf (${emb.count()} vectors, ${exact.size} exact query-neighbor pairs)\n\n"
      sb ++= "| seeding | nProbe | lloydIters | recall@5 |\n"
      sb ++= "|---|---|---|---|\n"
      def recallAt(seeding: String, np: Int, li: Int): Double = {
        val ivf = graft.api.GraftOps.ivfTopK(emb, "vec_id", "embedding",
            queryPred = col("vec_id") < 100, k = 5, nLists = 16, nProbe = np,
            lloydIters = li, seeding = seeding)
          .select("qid", "vid").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        ivf.intersect(exact).size.toDouble / exact.size
      }
      for (seeding <- seedings; np <- probes; li <- iters) {
        val line = f"| $seeding | $np | $li | ${recallAt(seeding, np, li)}%.4f |"
        println(s"$sf $line")
        sb ++= line + "\n"
      }
      // the nProbe dial curve for the winning seeding: recall must climb
      // to 1.0 at nProbe = nLists (exhaustive probe ≡ brute force)
      sb ++= "\nnProbe dial (seeding=lowid, lloydIters=6):\n\n"
      sb ++= "| nProbe | recall@5 |\n|---|---|\n"
      for (np <- Seq(1, 2, 4, 8, 12, 16)) {
        val line = f"| $np | ${recallAt("lowid", np, 6)}%.4f |"
        println(s"$sf dial $line")
        sb ++= line + "\n"
      }
      // int8 rerank dial at the q95 binding's settings: how much recall
      // the quantized shortlist gives back as the factor grows (vs the
      // same exact set; plain ivfTopK at these settings is the ceiling)
      sb ++= "\nint8 rerank dial (seeding=lowid, nProbe=4, lloydIters=6, k=5):\n\n"
      sb ++= "| rerankFactor | recall@5 |\n|---|---|\n"
      for (rf <- Seq(1, 2, 4, 8)) {
        val rr = graft.api.GraftOps.ivfTopKReranked(emb, "vec_id", "embedding",
            queryPred = col("vec_id") < 100, k = 5, nLists = 16, nProbe = 4,
            lloydIters = 6, seeding = "lowid", rerankFactor = rf)
          .select("qid", "vid").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        val rec = rr.intersect(exact).size.toDouble / exact.size
        val line = f"| $rf | $rec%.4f |"
        println(s"$sf rerank $line")
        sb ++= line + "\n"
      }
    }
    sb ++= s"\ncurrent defaults: seeding=${graft.api.GraftOps.IvfSeedDefault}, " +
      "nProbe=8 (recall 0.83-0.86 above — the first-call dial; " +
      "`recallTarget` picks nProbe from this table via GraftOps.nProbeFor). " +
      "Registry bindings q76/q87/q95 pin nProbe=4 — the sweep's measured " +
      "low point, kept as the artifact anchor.\n"
    java.nio.file.Files.write(java.nio.file.Paths.get("RECALL_new.md"),
      sb.toString.getBytes("UTF-8"))
    println("wrote RECALL_new.md")
    spark.stop()
  }
}
