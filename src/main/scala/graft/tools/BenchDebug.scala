package graft.tools

import org.apache.spark.sql.SparkSession

/** Diagnostic twin of Bench: prints both pass times per query, optionally
  * filtered by substring args, or (`--pre N`) replays the first N queries
  * and then times q03 — used to chase a position-dependent ~1–7 s stall
  * that turned out to be async in-JVM background work, not any query's
  * plan (q03 alone: 0.5 s; same q03 mid-run: up to 7 s, recovering on the
  * next pass). Bench's min-of-two-passes reporting absorbs it. */
object BenchDebug {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // match Bench's codegen-cache sizing: without it every pass
      // re-compiles generated classes and an A/B against Bench numbers
      // reads inflated
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("id % 7 AS k", "id AS v")
      .groupBy("k").count().count()
    spark.read.parquet(s"$sfDir/region.parquet").count()
    // "--pre N": run the first N queries (map order) once, then time q03.
    if (args.headOption.contains("--pre")) {
      val n = args(1).toInt
      val qs = graft.SparkEntry.queries
      qs.take(n).foreach { case (_, fn) => fn(spark, sfDir).count() }
      (1 to 2).foreach { p =>
        val t0 = System.nanoTime()
        qs("q03_json_source")(spark, sfDir).count()
        println(f"BDBG q03 after pre=$n pass$p: ${(System.nanoTime() - t0) / 1e9}%7.2f")
      }
      spark.stop(); return
    }
    val passes = sys.env.getOrElse("BDBG_PASSES", "2").toInt
    val wanted = graft.SparkEntry.queries
      .filter { case (name, _) => args.isEmpty || args.exists(name.contains) }
    wanted.foreach { case (name, fn) =>
      val times = (1 to passes).map { p =>
        graft.engine.StageTimer.reset()
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
        val sec = (System.nanoTime() - t0) / 1e9
        // per-pass stage split (Bench reports only the min pass's):
        // localizes which stage a pass-to-pass delta lands in
        val st = graft.engine.StageTimer.snapshot().toSeq.sorted
          .map { case (k, v) => f"$k=$v%.2f" }.mkString(" ")
        if (st.nonEmpty) println(f"BDBG $name pass$p stages: $st")
        sec
      }
      println(s"BDBG $name " + times.zipWithIndex
        .map { case (t, i) => f"p${i + 1}=$t%7.2f" }.mkString(" "))
    }
    spark.stop()
  }
}
