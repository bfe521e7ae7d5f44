package graft.tools

import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` of registry queries to files — the
  * optimization round's before/after plan evidence
  * (`plans/rNN/<query>_{before,after}.txt`).
  *
  *   sbt "runMain graft.tools.PlanDump plans/r17 before q126 q127"
  *
  * First arg = output dir, second = suffix, rest = substring filters
  * (empty = every registry key). Plans are the PRE-EXECUTION formatted
  * physical plans (AQE initial plan) — the same surface ExplainCheck
  * asserts against. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val filters = args.drop(2)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    graft.SparkEntry.queries
      .filter { case (n, _) => filters.isEmpty || filters.exists(n.contains) }
      .foreach { case (name, fn) =>
        try {
          val df = fn(spark, sfDir)
          val plan = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          java.nio.file.Files.write(
            java.nio.file.Paths.get(s"$outDir/${name}_$suffix.txt"),
            plan.getBytes("UTF-8"))
          println(s"[plandump] wrote $outDir/${name}_$suffix.txt")
        } catch { case e: Throwable =>
          System.err.println(s"[plandump] $name failed: ${e.getMessage}")
        }
      }
    spark.stop()
  }
}
