package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // The dominant measured noise source (BASELINE.md r8) was ~230 s/run
      // of JIT compilation: the registry's 100+ queries × several codegen
      // units far exceed the DEFAULT 100-entry generated-class cache, so
      // every pass RE-generated and RE-compiled classes the previous pass
      // had already built. Sizing the cache to hold the whole registry's
      // classes makes pass 2+ reuse pass 1's compiled classes (identical
      // plan → identical source → cache hit), so the min-of-passes is a
      // genuinely warm measurement. Static conf: must be set here, not
      // after the session exists.
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JIT/codegen warm-up outside the timed loop: one shuffle + one parquet
    // scan so the first measured query doesn't absorb ~5s of one-time
    // compilation cost (standard steady-state benchmarking practice).
    spark.range(1000000).selectExpr("id % 7 AS k", "id AS v")
      .groupBy("k").count().count()
    spark.read.parquet(s"$sfDir/region.parquet").count()
    // Timed passes per query, report the min: steady-state latency.
    // Pass 1 absorbs per-query codegen/JIT compilation. The r1-era
    // "position-dependent external stall" is now ROOT-CAUSED: /proc/stat
    // shows nonzero CPU STEAL on this host — a co-tenant periodically takes
    // the cores for seconds-to-minutes at a time, which is why the same
    // binary has measured 69-95 s across same-day runs with the deltas
    // landing on whichever rows were executing. Bench cannot make a stolen
    // CPU fast, so it makes theft VISIBLE and retries around it:
    //  - every pass records its /proc/stat steal delta (seconds, all cores);
    //  - the adaptive loop takes another pass (up to 5) while the two
    //    fastest passes disagree by >1.5x (with a >0.5 s absolute gap), OR
    //    while the fastest pass itself was stolen from (>0.3 s steal) —
    //    a clean-host pass beats any number of stolen ones;
    //  - the artifact carries per-query min-pass steal ("steal") and the
    //    run total ("noise"), so a slow driver run is attributable to the
    //    host in one glance instead of round-over-round archaeology.
    // Each pass also collects StageTimer sub-stage seconds (q114/q115/q87
    // wrap their rebuild-by-design index builds), reported for the fastest
    // pass, so a heavy-row delta decomposes into build vs probe.
    def stealSec(): Double = try {
      val l = scala.io.Source.fromFile("/proc/stat").getLines().next()
      l.trim.split("\\s+").drop(1).lift(7).map(_.toDouble / 100.0)
        .getOrElse(0.0) // field 8 = steal, USER_HZ ticks
    } catch { case _: Throwable => 0.0 }
    // The JVM's own two sustained-slowness sources, recorded per pass so
    // the artifact attributes them: GC time and JIT compilation time
    // (100+ codegen-heavy queries share one code cache; compilation
    // storms compete with the executor threads). Retry covers steal and
    // GC-dominated passes; JIT is attribution-only — compilation of a
    // query's fresh codegen classes recurs on every pass, so a retry
    // cannot dodge it.
    import java.lang.management.ManagementFactory
    import scala.jdk.CollectionConverters._
    def gcSec(): Double = ManagementFactory.getGarbageCollectorMXBeans
      .asScala.map(_.getCollectionTime.max(0L)).sum / 1000.0
    val jitBean = ManagementFactory.getCompilationMXBean
    def jitSec(): Double =
      if (jitBean != null && jitBean.isCompilationTimeMonitoringSupported)
        jitBean.getTotalCompilationTime / 1000.0 else 0.0
    final case class Pass(sec: Double, steal: Double, gc: Double,
      jit: Double, stages: Map[String, Double])
    def timeOnce(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame)
        : Pass = {
      graft.engine.StageTimer.reset()
      val (s0, g0, j0) = (stealSec(), gcSec(), jitSec())
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      Pass((System.nanoTime() - t0) / 1e9, stealSec() - s0, gcSec() - g0,
        jitSec() - j0, graft.engine.StageTimer.snapshot())
    }
    val (stealStart, gcStart, jitStart) = (stealSec(), gcSec(), jitSec())
    def retry(ps: Seq[Pass]): Boolean = {
      val sorted = ps.map(_.sec).sorted
      val (lo, hi) = (sorted(0), sorted(1))
      val best = ps.minBy(_.sec)
      // GC gates on the RELATIVE share too: young-gen time scales with a
      // query's own allocation, and a heavy row paying ~1 s of routine
      // nursery GC every pass must not burn all 5 passes retrying it.
      // Steal alone (passes agreeing) buys at most ONE extra pass: on a
      // host with chronic low-level steal every best pass carries a
      // nonzero steal delta, and unconditional steal-retry was measured
      // burning all 5 passes per query — doubling bench wall-clock
      // without improving an already-agreeing min.
      (hi - lo > 0.5 && lo > 0 && hi / lo > 1.5) ||
        (best.steal > 0.3 && ps.size < 3) ||
        (best.gc > 1.0 && best.gc > 0.25 * best.sec)
    }
    // GLOBAL WALL BUDGET (VERDICT r15 §wrong 1): the adaptive loop's worst
    // case is 5 passes × 145 keys, and under a co-tenant steal storm
    // (run_steal 757–2341 s measured in r15) the wall blew past the
    // driver's window → rc=124, parsed:null — an EMPTY gate signal. The
    // budget degrades measurement quality instead of losing the artifact:
    //  - under 60% of budget: full adaptive behavior (2–5 passes);
    //  - 60–90%: 2 passes, no retries (pass 1 still absorbs codegen);
    //  - past 90%: 1 pass per remaining query (attributed in the artifact
    //    via "budget_degraded" so a hot-window run is legible).
    // Default 1500 s sits well inside the driver window (r14 completed at
    // 670 s wall, rc=0) while leaving ~9× the quiet-anchor compute (168 s).
    val wallBudgetSec =
      sys.env.getOrElse("SPARK_GRAFT_BENCH_WALL_SEC", "1500").toDouble
    val wallStart = System.nanoTime()
    def elapsedSec(): Double = (System.nanoTime() - wallStart) / 1e9
    var degradedKeys = Vector.empty[String]
    // Incremental artifact flush: overwrite bench_out.json after EVERY
    // query so a killed run (rc=124/137) still leaves a parseable artifact
    // with everything measured so far, marked "partial":true.
    def writeArtifact(res: Seq[(String, Vector[Pass])], partial: Boolean)
        : Unit = {
      def fmt(sel: Vector[Pass] => String) = res
        .map { case (k, ps) => "\"" + k + "\":" + sel(ps) }
        .mkString("{", ",", "}")
      val qs = fmt(ps => ps.map(_.sec).min.toString)
      val passes = fmt(ps => ps.map(_.sec).mkString("[", ",", "]"))
      val steal = fmt(ps => ps.minBy(_.sec).steal.max(0.0).toString)
      val gc = fmt(ps => ps.minBy(_.sec).gc.max(0.0).toString)
      val jit = fmt(ps => ps.minBy(_.sec).jit.max(0.0).toString)
      val stages = res.flatMap(_._2.minBy(_.sec).stages).sorted
        .map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
      val runSteal = (stealSec() - stealStart).max(0.0)
      val total = if (res.nonEmpty) res.map(_._2.map(_.sec).min).sum else 0.0
      def keyNum(k: String) = k.drop(1).takeWhile(_.isDigit).toInt
      val s2 = res.collect {
        case (k, ps) if keyNum(k) <= 69 => ps.map(_.sec).min }
      val ext = res.collect {
        case (k, ps) if keyNum(k) > 69 => ps.map(_.sec).min }
      // steal-normalized quiet estimates (VERDICT r16 task 1): per-cell
      // min-pass wall MINUS that pass's recorded core-steal — what the
      // cell would plausibly have cost on a quiet host. A storm-window
      // driver artifact then self-defends the 2× gate numerically (r16's
      // §2 read 84.8 s under 3,016 core-sec of steal and needed five
      // corroborating runs to adjudicate back to 27.7 s). The estimate is
      // conservative in BOTH directions by construction — steal recorded
      // against a 32-thread pass can exceed the critical-path delay it
      // caused (over-subtraction) while queueing/cache effects it caused
      // aren't counted (under-subtraction) — so it's an ESTIMATE field
      // beside the raw numbers, never a replacement for them.
      def quiet(ps: Vector[Pass]): Double = {
        val best = ps.minBy(_.sec)
        (best.sec - best.steal.max(0.0)).max(0.0)
      }
      val s2q = res.collect { case (k, ps) if keyNum(k) <= 69 => quiet(ps) }
      val extq = res.collect { case (k, ps) if keyNum(k) > 69 => quiet(ps) }
      val subtotals = s"""{"s2":${s2.sum},"s2_keys":${s2.size},""" +
        s""""s2_quiet_estimate":${s2q.sum},""" +
        s""""ext":${ext.sum},"ext_keys":${ext.size},""" +
        s""""ext_quiet_estimate":${extq.sum}}"""
      val noise = s"""{"run_steal_sec":$runSteal,""" +
        s""""run_gc_sec":${(gcSec() - gcStart).max(0.0)},""" +
        s""""run_jit_sec":${(jitSec() - jitStart).max(0.0)},""" +
        s""""wall_sec":${elapsedSec()},""" +
        s""""wall_budget_sec":$wallBudgetSec,""" +
        degradedKeys.map("\"" + _ + "\"")
          .mkString("\"budget_degraded\":[", ",", "]}")
      val json =
        s"""{"metric":"total","value":$total,"unit":"sec","partial":$partial,"queries":$qs,"passes":$passes,"stages":$stages,"steal":$steal,"gc":$gc,"jit":$jit,"noise":$noise,"subtotals":$subtotals,"sf":"$sfDir"}"""
      // write-then-ATOMIC_MOVE: a kill landing mid-flush must not leave
      // a truncated file — the exact parsed:null loss the incremental
      // flush exists to prevent
      val tmp = java.nio.file.Paths.get("bench_out.json.tmp")
      java.nio.file.Files.write(tmp, (json + "\n").getBytes("UTF-8"))
      java.nio.file.Files.move(tmp,
        java.nio.file.Paths.get("bench_out.json"),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      if (!partial) println(json)
    }
    val done = scala.collection.mutable.ArrayBuffer
      .empty[(String, Vector[Pass])]
    SparkEntry.queries.foreach { case (name, fn) =>
      var passes = Vector(timeOnce(fn))
      if (elapsedSec() < 0.9 * wallBudgetSec) passes :+= timeOnce(fn)
      else degradedKeys :+= name
      while (passes.size >= 2 && passes.size < 5 && retry(passes) &&
        elapsedSec() < 0.6 * wallBudgetSec) passes :+= timeOnce(fn)
      done += (name -> passes)
      writeArtifact(done.toSeq, partial = true)
    }
    // Final artifact: same shape as the incremental flushes, partial=false,
    // and ONE stdout JSON line (the file is the auditable copy — the
    // driver's stdout tail has twice truncated it).
    writeArtifact(done.toSeq, partial = false)
    spark.stop()
  }
}
