package graft.engine

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Centralized table loaders + output-contract helpers (SURVEY §7.3–§7.5).
  *
  * Every query builder in this engine is a pure function
  * `(SparkSession, sfDir) => DataFrame`; all session conf it needs is set
  * idempotently inside the builder (the harness may run any subset in any
  * order). The helpers here encode the Spark↔DuckDB hash-parity contract:
  *
  *  - money aggregation goes through DECIMAL(18,2) so partial-aggregation
  *    order can never produce float noise (exact on both engines);
  *  - `events.ts` is parquet TIMESTAMP(MICROS, NTZ); we derive the
  *    engine contract from it — `ts` as an epoch-nanosecond Long (exact
  *    arithmetic) plus a µs timestamp `ts2` for window functions;
  *  - timestamps are only ever emitted as formatted strings or epoch longs.
  */
object Tables {

  /** Fixed anchor dates (SURVEY §7.3.4) — never current_date/now(). */
  val OrdersAnchor = "2001-09-01"   // max o_orderdate is 2001-08-01
  val EventsAnchor = "2024-02-01"   // events span 2024-01-01..2024-01-30

  private val scratchDirs =
    new java.util.concurrent.ConcurrentLinkedQueue[java.nio.file.Path]()
  private lazy val scratchHook: Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      scratchDirs.forEach { root =>
        try {
          val it = java.nio.file.Files.walk(root)
          try it.sorted(java.util.Comparator.reverseOrder())
            .forEach(p => java.nio.file.Files.deleteIfExists(p): Unit)
          finally it.close()
        } catch { case _: Throwable => () } // best-effort exit cleanup
      }))

  /** Temp directory for a binding's scratch data (persisted indexes,
    * snapshots, bucketed tables), deleted RECURSIVELY on JVM exit: nine
    * bindings write corpus-sized scratch and the bench invokes each up
    * to five times per run — without cleanup a sweep leaks tens of
    * corpus-sized directories into the temp filesystem. */
  def scratchDir(prefix: String): String = {
    scratchHook
    val p = java.nio.file.Files.createTempDirectory(prefix)
    scratchDirs.add(p)
    p.toString
  }

  // NOTE on session timezone: date_format/to_date emit session-timezone-
  // dependent values, so oracle parity REQUIRES UTC — but a reader must
  // not mutate shared session state as a side effect (it would silently
  // clobber a timezone the caller set mid-workload). Every harness entry
  // point (Verify, Bench, the tools mains, the test base) pins
  // spark.sql.session.timeZone=UTC in its own session builder instead; a
  // caller driving these bindings from a non-UTC session owns that
  // divergence knowingly.
  def t(s: SparkSession, sfDir: String, name: String): DataFrame =
    s.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame   = t(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = t(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = t(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = t(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = t(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = t(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = t(s, d, "lineitem")
  def documents(s: SparkSession, d: String): DataFrame = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = t(s, d, "embeddings")

  /** events with the engine's timestamp contract applied. The driver
    * testdata stores `ts` as parquet TIMESTAMP(MICROS,
    * isAdjustedToUTC=false) — Spark reads it natively as TIMESTAMP_NTZ
    * (earlier testdata generations used INT64 TIMESTAMP(NANOS), which
    * needed the `nanosAsLong` legacy flag; that path is gone). The
    * downstream contract stays exactly what every binding and oracle
    * was written against: `ts` = epoch-NANOSECOND Long (exact integer
    * arithmetic for gaps/asof joins; DuckDB's `epoch_ns(ts)` twin),
    * `ts2` = µs-precision TimestampType for window()/session logic.
    * The NTZ→LTZ cast reads the wall time in the session timezone —
    * the harness pins UTC, matching DuckDB's UTC-naive epoch_ns. */
  def events(s: SparkSession, d: String): DataFrame =
    t(s, d, "events")
      .withColumn("ts2", col("ts").cast("timestamp"))
      .withColumn("ts", unix_micros(col("ts").cast("timestamp")) * 1000)

  /** Exact money sum: DECIMAL(18,2)-cast → SUM → DOUBLE. The double→decimal
    * cast can never hit a rounding tie (x.xx5 is not a dyadic rational, so no
    * double equals it exactly), making it portable across Spark (HALF_UP) and
    * DuckDB (HALF_EVEN); the decimal sum is exact regardless of partial-agg
    * order, and the final double is bit-identical on both engines. Oracle
    * twin: `CAST(SUM(CAST(x AS DECIMAL(18,2))) AS DOUBLE)`.
    *
    * NOTE the engine-wide parity rule this encodes: never ROUND a value that
    * may sit exactly on a rounding tie (products of 2dp decimals constantly
    * do) — Spark rounds half-up, DuckDB half-even, and they diverge. Compute
    * exactly in DECIMAL, emit raw doubles; reserve round() for genuinely
    * noisy floats (stddev, cosine, logs) where ties have measure zero. */
  def decSum(c: Column): Column =
    sum(c.cast("decimal(18,2)")).cast("double")

  /** Exact revenue sum Σ price·(1−discount): all-decimal product (scale 4,
    * exact) summed exactly, emitted as an exactly-representable double. */
  def revenueSum(price: Column, disc: Column): Column =
    sum(price.cast("decimal(12,2)") *
      (lit(1).cast("decimal(3,2)") - disc.cast("decimal(3,2)"))).cast("double")

  /** Exact charge sum Σ price·(1−discount)·(1+tax) (scale 6, exact). */
  def chargeSum(price: Column, disc: Column, tax: Column): Column =
    sum(price.cast("decimal(12,2)") *
      (lit(1).cast("decimal(3,2)") - disc.cast("decimal(3,2)")) *
      (lit(1).cast("decimal(3,2)") + tax.cast("decimal(3,2)"))).cast("double")

  def r2(c: Column): Column = round(c, 2)
  def r4(c: Column): Column = round(c, 4)
  def r6(c: Column): Column = round(c, 6)

  /** Tokenize document text (space-separated lowercase words). */
  def toks(textCol: Column): Column = split(textCol, " ")

  /** Optimizer fence: materializes the frame's columns exactly once per row.
    *
    * Catalyst's CollapseProject + predicate pushdown will happily duplicate a
    * projected expression into every consumer — including both sides of a
    * self-join and the scan's pushed `isnotnull(key)` filter. For cheap
    * codegen'd expressions that is free; for interpreted higher-order-function
    * lambdas (e.g. a per-doc md5-shingle transform) it multiplies the
    * dominant cost 4–6×. Measured on q81 at sf0.1: 10.2 s → 1.6 s.
    *
    * The identity mapPartitions inserts a Deserialize/Serialize pair the
    * optimizer cannot see through, so expressions below it evaluate once and
    * consumers above read materialized values. Row-encode cost is linear and
    * tiny next to what it saves; use ONLY under expensive non-codegen
    * projections feeding multiple consumers. */
  def barrier(df: DataFrame): DataFrame =
    df.mapPartitions(it => it)(org.apache.spark.sql.Encoders.row(df.schema))

  /** SQL for the distinct word-`n`-gram digest array of `textCol`, with the
    * token split LET-BOUND so it evaluates exactly once per row.
    *
    * The naive form — a `tk = split(...)` column indexed as `tk[i+j]`
    * inside the digest lambda — invites Catalyst to inline the split into
    * every element access: higher-order-function lambdas are interpreted
    * (no codegen, no subexpression elimination), so each of the O(n_tokens)
    * lambda iterations re-runs the full O(n_tokens) split — quadratic in
    * document length (the q113 winnowing pipeline measured 451 s → 1.3 s
    * at sf0.1 from this class of fix). Binding the split as a
    * single-element `transform`'s lambda argument makes it a local the
    * optimizer cannot duplicate. Documents shorter than `n` tokens get an
    * empty array. `hash` is "xxhash64" (8-byte digests, the scale default)
    * or "md5" (hex strings, cross-engine-reproducible ordering). */
  def ngramDigestsSql(textCol: String, n: Int,
      hash: String = "xxhash64"): String = {
    val gram = (0 until n).map(j => s"tk[i+$j]").mkString(", ")
    val elem = if (hash == "xxhash64") "bigint" else "string"
    s"""element_at(transform(array(split(`$textCol`, ' ')), tk ->
       |  CASE WHEN size(tk) >= $n THEN
       |    array_distinct(transform(sequence(0, size(tk) - $n),
       |      i -> $hash(concat_ws(' ', $gram))))
       |  ELSE CAST(array() AS array<$elem>) END), 1)""".stripMargin
  }
}
