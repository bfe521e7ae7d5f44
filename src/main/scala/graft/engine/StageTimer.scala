package graft.engine

/** Wall-clock sub-stage attribution for the bench: bindings that
  * REBUILD a persisted index every pass by design (q114/q115/q87 —
  * their registry row IS build + probe) wrap the build call in
  * `time(key) { ... }`. [[graft.Bench]] resets the accumulator per
  * timed pass and reports each query's fastest-pass stage seconds in
  * the artifact's `stages` map, so a driver-bench delta on a heavy
  * row is attributable to index-build vs dedup/search without a
  * rerun — the rebuild-by-design cost stops masquerading as a probe
  * regression. Accumulates (merge-add) so a stage hit twice in one
  * pass sums; harmless outside the bench (a map entry per call). */
object StageTimer {
  private val acc =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Double]()

  def time[A](key: String)(f: => A): A = {
    val t0 = System.nanoTime()
    try f
    finally acc.merge(key, (System.nanoTime() - t0) / 1e9,
      (a, b) => a + b)
  }

  def reset(): Unit = acc.clear()

  def snapshot(): Map[String, Double] = {
    import scala.jdk.CollectionConverters._
    acc.asScala.map { case (k, v) => k -> v.doubleValue }.toMap
  }
}
