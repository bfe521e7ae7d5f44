package graft.tools

import org.scalatest.funsuite.AnyFunSuite

/** Drift check for the generated operator inventory: the committed
  * OPERATORS.md must carry exactly the registry's keys, each resolved to
  * a real binding with a lifted description. */
class OperatorsDocSpec extends AnyFunSuite {

  test("OPERATORS.md stays in sync with the registry") {
    val p = java.nio.file.Paths.get("OPERATORS.md")
    assert(java.nio.file.Files.exists(p),
      "OPERATORS.md missing — run sbt \"runMain graft.tools.OperatorsDoc\"")
    val txt = new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
    val rowRe = """\| `(q[0-9][0-9a-z_]+)` \| ([^|]+) \|""".r
    val rows = rowRe.findAllMatchIn(txt)
      .map(m => m.group(1) -> m.group(2).trim).toMap
    assert(rows.keySet === graft.SparkEntry.queries.keySet,
      "stale OPERATORS.md — regenerate with sbt \"runMain graft.tools.OperatorsDoc\"")
    // every row resolved its binding (file:line) when generated
    assert(rows.values.forall(loc => loc.matches(""".+\.scala:\d+""")),
      "every key must resolve to a binding file:line")
    // the api index section is present and carries the lifecycle surface
    for (m <- Seq("GraftOps.fingerprintBuild", "GraftOps.dedupNearAgainstCorpus",
        "GraftOps.ivfAppend", "GraftOps.fingerprintCompact",
        "CurationPipeline.curateIncremental", "PortraitOps.profileUpsert",
        "GraftOps.bm25IndexBuild", "GraftOps.dsirStatsBuild",
        "GraftOps.lmStatsBuild", "GraftOps.lmPerplexityAgainstStats",
        "TextAnalysis.trainQualityClassifier", "TextAnalysis.bpeTrain"))
      assert(txt.contains(s"`$m`"), s"api index must list $m")
  }

  test("IndexLifecycle: the README-referenced worked example runs with " +
    "every step's assertion green, and README actually references it") {
    val readme = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("README.md")), "UTF-8")
    assert(readme.contains("graft.tools.IndexLifecycle"),
      "README must reference the runnable lifecycle example")
    IndexLifecycle.run(graft.engine.SparkTestBase.spark)
  }

  test("CorpusBuild: the README-referenced training-corpus walkthrough " +
    "runs with every step's assertion green, and README references it") {
    val readme = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("README.md")), "UTF-8")
    assert(readme.contains("graft.tools.CorpusBuild"),
      "README must reference the runnable corpus-build example")
    CorpusBuild.run(graft.engine.SparkTestBase.spark)
  }

  test("benchTimes reads the artifact's queries map, not a later per-query " +
    "map (steal/gc/jit share the same keys — last-match-wins published jit " +
    "as wall time in r13)") {
    val p = java.nio.file.Paths.get("bench_out.json")
    assume(java.nio.file.Files.exists(p), "no committed bench artifact")
    val txt = new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
    // ground truth via the same flat-object slice, but anchored on a key
    // KNOWN to differ between queries and jit in any real artifact: pick
    // the max-wall key and assert benchTimes returns its queries value
    val qStart = txt.indexOf("\"queries\":{")
    assume(qStart >= 0, "artifact has no queries object")
    val qSlice = txt.substring(qStart, txt.indexOf('}', qStart) + 1)
    val truth = """"(q[0-9][0-9a-z_]+)":([0-9.]+)""".r.findAllMatchIn(qSlice)
      .map(m => m.group(1) -> m.group(2).toDouble).toMap
    val got = OperatorsDoc.benchTimes()
    assert(got === truth, "benchTimes must equal the queries object exactly")
    // and the rendered doc's bench cell for the slowest key carries it
    val (slowKey, slowVal) = truth.maxBy(_._2)
    val cell = f"$slowVal%.2f"
    val row = OperatorsDoc.render().linesIterator
      .find(_.contains(s"`$slowKey`")).getOrElse("")
    assert(row.contains(s"| $cell |"),
      s"rendered bench cell for $slowKey must be $cell (queries map), row: $row")
  }

  test("the generator resolves every registry key live (no '?' bindings, " +
    "descriptions lifted)") {
    val out = OperatorsDoc.render()
    assert(!out.contains("| ? |"), "a registry key has no binding def")
    val rowRe = """\| `(q[0-9][0-9a-z_]+)` \| [^|]+ \| [^|]+ \| [^|]+ \| ([^|]*)\|""".r
    val descs = rowRe.findAllMatchIn(out)
      .map(m => m.group(1) -> m.group(2).trim).toMap
    assert(descs.size === graft.SparkEntry.queries.size)
    val empty = descs.filter(_._2.isEmpty).keys.toSeq.sorted
    assert(empty.isEmpty, s"bindings without a scaladoc lead line: $empty")
  }
}
