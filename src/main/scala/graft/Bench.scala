package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JIT/codegen warm-up outside the timed loop: one shuffle + one parquet
    // scan so the first measured query doesn't absorb ~5s of one-time
    // compilation cost (standard steady-state benchmarking practice).
    spark.range(1000000).selectExpr("id % 7 AS k", "id AS v")
      .groupBy("k").count().count()
    spark.read.parquet(s"$sfDir/region.parquet").count()
    // Timed passes per query, report the min: steady-state latency.
    // Pass 1 absorbs per-query codegen/JIT compilation. A position-dependent
    // external stall (~4-10 s, lands on whichever query happens to be running;
    // GC logs ruled out the JVM) has twice corrupted a min-of-two window, so
    // the loop is adaptive: start with 2 passes, and while the two fastest
    // passes still disagree by >3x (with a >0.5 s absolute gap) take another,
    // up to 5 total. All per-pass times are emitted so a stall is visible as
    // a stall instead of masquerading as a regression.
    def timeOnce(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      (System.nanoTime() - t0) / 1e9
    }
    def disagree(ts: Seq[Double]): Boolean = {
      val sorted = ts.sorted
      val (lo, hi) = (sorted(0), sorted(1))
      hi - lo > 0.5 && lo > 0 && hi / lo > 3.0
    }
    val results = SparkEntry.queries.map { case (name, fn) =>
      var times = Vector(timeOnce(fn), timeOnce(fn))
      while (times.size < 5 && disagree(times)) times :+= timeOnce(fn)
      name -> times
    }
    def fmtQs(sel: Vector[Double] => String) = results
      .map { case (k, ts) => "\"" + k + "\":" + sel(ts) }.mkString("{", ",", "}")
    val qs = fmtQs(ts => ts.min.toString)
    val passes = fmtQs(ts => ts.mkString("[", ",", "]"))
    val total = if (results.nonEmpty) results.map(_._2.min).sum else 0.0
    // §2-vs-extension subtotals ride the artifact so round-over-round
    // comparison never needs per-query tail archaeology: §2 surface =
    // q01–q69 keys (SURVEY §2 inventory), extensions = q70+ (§2.10).
    def keyNum(k: String) = k.drop(1).takeWhile(_.isDigit).toInt
    val s2 = results.collect { case (k, ts) if keyNum(k) <= 69 => ts.min }
    val ext = results.collect { case (k, ts) if keyNum(k) > 69 => ts.min }
    val subtotals = s"""{"s2":${s2.sum},"s2_keys":${s2.size},""" +
      s""""ext":${ext.sum},"ext_keys":${ext.size}}"""
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"passes":$passes,"subtotals":$subtotals,"sf":"$sfDir"}"""
    println(json)
    // Self-owned artifact: the driver captures stdout's tail, which has
    // twice truncated the JSON line — the file is the auditable copy.
    java.nio.file.Files.write(java.nio.file.Paths.get("bench_out.json"),
      (json + "\n").getBytes("UTF-8"))
    spark.stop()
  }
}
