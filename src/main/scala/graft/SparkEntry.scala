package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.engine.{Multimodal, Portrait, Relational, Scalars, TextOps, VectorOps, Windows}
import graft.streaming.EventWindows

/** Driver contract — see /root/repo/SURVEY.md §2 (the declared operator
  * inventory) and §7 (output contract). Each entry is a pure function of
  * (SparkSession, sfDir); oracle SQL lives next to each implementation.
  *
  * WORKFLOW: any change to `queries` (new/renamed/removed key) MUST
  * regenerate OPERATORS.md in the SAME commit —
  * `sbt "runMain graft.tools.OperatorsDoc"` — or OperatorsDocSpec's
  * drift gate goes red at HEAD. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * RFM customer-value model (SURVEY §2.7 q48). */
  def entry(spark: SparkSession): DataFrame =
    Portrait.q48(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ Windows.queries ++ Scalars.queries ++
      Portrait.queries ++ EventWindows.queries ++ TextOps.queries ++
      VectorOps.queries ++ Multimodal.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops
    * (q21 approx-distinct, q52 K-Means, q53 decision tree, q62 LSH,
    * q76/q87/q95 approximate IVF — driver records rows-only). */
  def oracleSql: Map[String, String] =
    Relational.oracle ++ Windows.oracle ++ Scalars.oracle ++
      Portrait.oracle ++ EventWindows.oracle ++ TextOps.oracle ++
      VectorOps.oracle ++ Multimodal.oracle
}
