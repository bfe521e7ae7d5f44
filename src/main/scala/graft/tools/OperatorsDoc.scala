package graft.tools

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Generates `OPERATORS.md` — the one-page library surface: every registry
  * key with its binding location, one-line description (lifted from the
  * binding's own scaladoc, so it cannot drift from the source), oracle
  * class, and latest committed bench time. Run from the repo root:
  * `sbt "runMain graft.tools.OperatorsDoc"`. The test suite asserts the
  * committed file stays structurally in sync with the registry (a row per
  * key, no stale rows). */
object OperatorsDoc {

  private val srcDirs = Seq(
    "src/main/scala/graft/engine", "src/main/scala/graft/streaming")

  /** The LEAD SENTENCE of a scaladoc opening at `lines(j)` — through the
    * first sentence-terminating period, not the first physical line (a
    * first-line lift truncates mid-clause: "date-partitioned layout
    * is"). Accumulates continuation lines until a boundary or the
    * comment closer; decimals (0.85), section numbers (§2.10), and the
    * common abbreviations (e.g. / i.e. / vs. / cf.) do not terminate. */
  private def leadSentence(lines: Vector[String], j: Int): String = {
    def boundary(s: String): Option[Int] =
      """\.(?=\s|$)""".r.findAllMatchIn(s).map(_.start).find { i =>
        // word-boundary-anchored: 'vs.' is an abbreviation, 'revs.' is
        // a sentence end
        !s.substring(0, i).matches("""(?s).*(\be\.g|\bi\.e|\bvs|\bcf)""")
      }
    val sb = new StringBuilder
    var k = j
    var open = true
    while (open && k < lines.length) {
      val t = (if (k == j) lines(k).trim.stripPrefix("/**")
               else lines(k).trim.stripPrefix("*"))
        .stripSuffix("*/").trim
      if (sb.nonEmpty && t.nonEmpty) sb.append(' ')
      sb.append(t)
      if (lines(k).contains("*/") || boundary(sb.toString).isDefined)
        open = false
      k += 1
    }
    val s = sb.toString
    boundary(s).map(i => s.substring(0, i + 1)).getOrElse(s)
  }

  /** Binding name → (file:line, scaladoc lead sentence). Scans the query
    * modules for `def qNN...(` and lifts the sentence that documents it —
    * the source of truth, not a hand-maintained copy. */
  private def bindingDocs(): Map[String, (String, String)] = {
    val defRe = """^\s*def (q\d+[a-z]?)\(""".r
    srcDirs.flatMap { dir =>
      Files.list(Paths.get(dir)).iterator().asScala
        .filter(_.toString.endsWith(".scala")).flatMap { p =>
          val lines = Files.readAllLines(p).asScala.toVector
          lines.zipWithIndex.flatMap { case (l, i) =>
            defRe.findFirstMatchIn(l).map { m =>
              // walk up to the scaladoc opener; its first line carries the
              // "qNN: summary" sentence. The scan skips comment interiors,
              // annotations, and blank lines, then STOPS at the first real
              // line: an undocumented def must yield no doc, never lift an
              // unrelated scaladoc from farther up the file
              val start = (i - 1 to 0 by -1).find { j =>
                  val t = lines(j).trim
                  t.nonEmpty && !t.startsWith("*") && !t.startsWith("//") &&
                    !t.startsWith("@")
                }.filter(j => lines(j).trim.startsWith("/**"))
              val doc = start.map { j =>
                leadSentence(lines, j)
                  .replaceAll("""\[\[([^\]]+)\]\]""", "$1")
                  .replaceAll("""^q\d+[a-z]?:\s*""", "").trim
              }.getOrElse("")
              m.group(1) -> (s"${p.getFileName}:${i + 1}", doc)
            }
          }
        }
    }.toMap
  }

  /** Public API defs of the library modules (the graft.api sources):
    * name → (file:line, scaladoc lead line). The non-registry lifecycle
    * surface — index builds/appends/compactions, pipelines, dials. */
  private def apiDocs(): Seq[(String, String, String)] = {
    val defRe = """^  (?:def|val) ([a-zA-Z]\w*)[\(\[: ]""".r
    Files.list(Paths.get("src/main/scala/graft/api")).iterator().asScala
      .filter(_.toString.endsWith(".scala")).toSeq.sortBy(_.toString)
      .flatMap { p =>
        val lines = Files.readAllLines(p).asScala.toVector
        val module = p.getFileName.toString.stripSuffix(".scala")
        lines.zipWithIndex.flatMap { case (l, i) =>
          defRe.findFirstMatchIn(l)
            .filterNot(_ => l.contains("private"))
            .flatMap { m =>
              (i - 1 to 0 by -1).find(j => {
                val t = lines(j).trim
                t.nonEmpty && !t.startsWith("*") && !t.startsWith("//") &&
                  !t.startsWith("@")
              }).filter(j => lines(j).trim.startsWith("/**")).map { j =>
                val doc = leadSentence(lines, j)
                  .replaceAll("""\[\[([^\]]+)\]\]""", "$1").trim
                (s"$module.${m.group(1)}",
                  s"${p.getFileName}:${i + 1}", doc)
              }
            }
        }
      }
  }

  /** Latest committed per-query bench minima, if a bench artifact exists.
    * Reads ONLY the artifact's `"queries":{...}` object — the artifact also
    * carries per-query `steal`/`gc`/`jit` maps with the same keys, and a
    * whole-file scan with last-match-wins used to publish the `jit` map as
    * the wall-time column (r13 verdict: q137 shown 0.97 s vs actual 5.20).
    * The queries object is flat, so slicing text between its opening and
    * closing brace is exact. [[OperatorsDocSpec]] pins a sampled key's
    * rendered cell against the artifact's queries value. */
  private[tools] def benchTimes(): Map[String, Double] = {
    val p = Paths.get("bench_out.json")
    if (!Files.exists(p)) return Map.empty
    val txt = new String(Files.readAllBytes(p), "UTF-8")
    val start = txt.indexOf("\"queries\":{")
    if (start < 0) return Map.empty
    val open = start + "\"queries\":".length
    val close = txt.indexOf('}', open)
    if (close < 0) return Map.empty
    val slice = txt.substring(open, close + 1)
    """"(q[0-9][0-9a-z_]+)":([0-9.]+)""".r.findAllMatchIn(slice)
      .map(m => m.group(1) -> m.group(2).toDouble).toMap
  }

  def render(): String = {
    val docs = bindingDocs()
    val bench = benchTimes()
    val apiRows = apiDocs()
    val oracles = graft.SparkEntry.oracleSql.keySet
    val rows = graft.SparkEntry.queries.keys.toSeq.sorted.map { key =>
      val binding = key.takeWhile(_ != '_')
      val (loc, doc) = docs.getOrElse(binding, ("?", ""))
      val cls = if (oracles(key)) "oracle-exact" else "rows-only (by design)"
      val t = bench.get(key).map(v => f"$v%.2f").getOrElse("—")
      s"| `$key` | $loc | $cls | $t | $doc |"
    }
    "# OPERATORS — the graft library surface\n\n" +
      "Generated by `sbt \"runMain graft.tools.OperatorsDoc\"` — do not " +
      "edit by hand. One row per registry key (`SparkEntry.queries`); the " +
      "description is the binding's own scaladoc lead sentence; bench " +
      "seconds are the latest committed `bench_out.json` minima (sf0.1, " +
      "local[32]). Streaming rows q57/q58/q96 are test-only per SURVEY §2 " +
      "and live in the suite, not the registry.\n\n" +
      "| key | binding | oracle | bench s | description |\n" +
      "|---|---|---|---|---|\n" +
      rows.mkString("\n") + "\n\n" +
      s"${rows.size} registry keys (${oracles.size} oracle-exact).\n\n" +
      "## Library API index (graft.api — the non-registry surface)\n\n" +
      "Every public, scaladoc'd member of the api modules: index " +
      "builds/appends/compactions, pipelines, joins, dials. Same " +
      "source-lifted descriptions.\n\n" +
      "| member | at | description |\n|---|---|---|\n" +
      apiRows.map { case (n, loc, doc) => s"| `$n` | $loc | $doc |" }
        .mkString("\n") +
      s"\n\n${apiRows.size} public api members.\n" +
      lifecycleNotes
  }

  /** The cross-member contracts a table of one-liners cannot carry:
    * the persistent-index lifecycle rules an operator of the store must
    * know. Kept here (not hand-edited into the output) so the generated
    * file stays the single artifact. */
  private val lifecycleNotes: String = """
## Index lifecycle contracts (fingerprint / SRP / IVF via IndexStore)

- **Reader horizon.** A reader resolves ONE snapshot per operation and
  reads it consistently to the end of its job. `indexVacuum(dir,
  keepVersions = N)` retains the newest N manifests and their segments,
  so a reader that resolved up to N−1 publishes ago survives any
  vacuum; an older reader fails loudly at read time (missing segment
  path). Default N = 1 assumes readers resolve-then-read promptly;
  size N to the longest reader you allow to overlap mutations.
- **Crash-replay retention.** The manifest named by the latest
  snapshot's `last_batch_base` watermark (and its segments) survives
  EVERY vacuum regardless of `keepVersions` — a cron'd vacuum can
  never strand a foreachBatch replay. The next committed batch
  re-points the watermark and releases the old base.
- **Writers.** Concurrent writers fail loudly at the version claim,
  before any Spark job. The append family (fingerprintAppend /
  srpIndexAppend / ivfAppend and the curateIncremental /
  dedupEmbAndAppend steps) retries internally via
  `IndexStore.commitWithRetry` — bounded attempts, full-jitter
  backoff, each recommit derived from the winner's fresh snapshot —
  so append-vs-compact races resolve without caller code. Build /
  compact / rebuild stay single-attempt by design (run them from an
  owning slot). Crashed-writer CLAIM residue still surfaces as the
  loud file-naming error after retries exhaust.
- **Empty batches.** Appends of an empty batch are a no-op for every
  index family: no version churn, no empty segments, watermark
  unchanged (replaying an empty batch is naturally idempotent).
"""

  def main(args: Array[String]): Unit = {
    Files.write(Paths.get("OPERATORS.md"), render().getBytes("UTF-8"))
    println(s"wrote OPERATORS.md (${graft.SparkEntry.queries.size} keys)")
  }
}
