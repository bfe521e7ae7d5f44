package graft.tools
import org.apache.spark.sql.SparkSession

/** Measures q100 (SRP/hyperplane LSH near-dup) recall against the exact
  * q80 pair list, per band-width dial, on the driver testdata — the
  * committed numbers live in RECALL.md (re-run and refresh after any SRP
  * change): `sbt "runMain graft.tools.SrpRecall [sfDir]"`. Precision is
  * structurally 1.0 (exact in-join verify; the spec pins it), so recall is
  * the only dial worth a table. */
object SrpRecall {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.GraftExtensions.register(spark)
    val d = args.headOption.getOrElse("/root/testdata/sf0.01")
    val emb = graft.engine.Tables.embeddings(spark, d)
    val exact = graft.api.GraftOps.embeddingNearDupPairs(
        emb, "vec_id", "embedding", minCosine = 0.35)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    println(s"sfDir=$d exact_pairs=${exact.size}")
    for ((nBits, bands) <- Seq((32, 8), (32, 4), (64, 16), (64, 8))) {
      val srp = graft.api.GraftOps.srpNearDupPairs(emb, "vec_id", "embedding",
          minCosine = 0.35, dim = 64, nBits = nBits, bands = bands)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      require(srp.subsetOf(exact), "SRP emitted a non-exact pair")
      val recall =
        if (exact.isEmpty) 1.0 else srp.intersect(exact).size.toDouble / exact.size
      val bb = nBits / bands
      println(f"nBits=$nBits%3d bands=$bands%3d bandBits=$bb%2d " +
        f"pairs=${srp.size}%6d recall=$recall%.4f")
    }
    spark.stop()
  }
}
