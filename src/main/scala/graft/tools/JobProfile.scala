package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Per-JOB decomposition of a bench cell (guide §1: measure first).
  *
  * Bench/StageTimer answer "which STAGE of the operator is slow";
  * this answers the next question — "is that stage a few big jobs or
  * many fixed-cost ones?" — by recording every Spark job's wall time
  * and first-stage name while one registry query runs. Usage:
  *
  *   sbt "runMain graft.tools.JobProfile q126"        # pass 2 job table
  *   JPROF_PASSES=3 sbt "runMain graft.tools.JobProfile q126 q127"
  *
  * Prints, for the LAST pass (codegen/JIT-warm, like Bench's min):
  * one line per job (ms, #tasks, callsite) plus the pass total and
  * job count — the fixed-cost-per-action number the optimization
  * round's lifecycle cells are priced by. */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    final case class Job(id: Int, desc: String, nTasks: Int,
      start: Long, var end: Long = 0L)
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, Job]()
    @volatile var record = false
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit =
        if (record) {
          val site = e.stageInfos.lastOption.map(_.name).getOrElse("?")
          val n = e.stageInfos.map(_.numTasks).sum
          jobs.put(e.jobId, Job(e.jobId, site, n, System.nanoTime()))
        }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        val j = jobs.get(e.jobId)
        if (j != null) j.end = System.nanoTime()
      }
    })
    spark.range(1000000).selectExpr("id % 7 AS k", "id AS v")
      .groupBy("k").count().count()
    spark.read.parquet(s"$sfDir/region.parquet").count()
    val passes = sys.env.getOrElse("JPROF_PASSES", "2").toInt
    val wanted = graft.SparkEntry.queries
      .filter { case (name, _) => args.isEmpty || args.exists(name.contains) }
    wanted.foreach { case (name, fn) =>
      var lastSec = 0.0
      (1 to passes).foreach { p =>
        jobs.clear()
        graft.engine.StageTimer.reset()
        record = true
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch { case e: Throwable =>
          println(s"JPROF $name FAILED: ${e.getMessage}") }
        lastSec = (System.nanoTime() - t0) / 1e9
        record = false
        if (p == passes) {
          import scala.jdk.CollectionConverters._
          val js = jobs.values.asScala.toSeq.sortBy(_.id)
          println(f"JPROF $name pass$p total=$lastSec%.2f s jobs=${js.size}")
          js.foreach { j =>
            val ms = if (j.end > 0) (j.end - j.start) / 1e6 else -1.0
            println(f"JPROF   job${j.id}%4d ${ms}%8.1f ms tasks=${j.nTasks}%4d  ${j.desc.take(110)}")
          }
          val st = graft.engine.StageTimer.snapshot().toSeq.sorted
            .map { case (k, v) => f"$k=$v%.2f" }.mkString(" ")
          if (st.nonEmpty) println(s"JPROF $name stages: $st")
        }
      }
    }
    spark.stop()
  }
}
