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
    spark.stop()
  }
}
