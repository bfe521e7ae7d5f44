package graft.api

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The end-to-end corpus-curation capstone: the composition every
  * training-data pipeline writes by hand, as one call —
  *
  *  1. QUALITY GATE: [[TextAnalysis.repetitionStats]] keep bit (Gopher-style
  *     repetition dials) — an in-row projection, so the corpus shrinks
  *     BEFORE anything that shuffles;
  *  2. EXACT DEDUP: [[GraftOps.exactDedupKeepBest]] — the best-`scoreCol`
  *     row per byte-identical group survives;
  *  3. NEAR-DUP REDUCTION: [[GraftOps.ngramJaccardPairs]] (exact,
  *     prefix-filtered) → [[GraftOps.connectedComponents]] →
  *     [[GraftOps.dedupApply]] — one best-scored survivor per near-dup
  *     cluster, singletons pass through;
  *  4. SPLIT: [[GraftOps.hashSplit]] — deterministic, append-stable
  *     train/val/test assignment.
  *
  * Stage order is the scale argument: the zero-shuffle quality gate runs
  * first so the quadratic-adjacent near-dup stage sees only survivors; the
  * pair generator stays an equi-join (recall 1.0) and the cluster
  * reduction is an aggregate, not a window. Every stage is the already-
  * oracle-checked operator, so the composition's oracle is mechanical CTE
  * chaining. Returns the surviving rows with all of `docs`' columns plus
  * `cluster`, `cluster_size`, and `split`. */
object CurationPipeline {

  def curate(docs: DataFrame, idCol: String, textCol: String,
      scoreCol: String,
      maxDupWordFrac: Double = 0.6, maxTopWordRatio: Double = 0.2,
      maxDupBigramFrac: Double = 0.4,
      n: Int = 3, minPct: Int = 60,
      weights: Seq[(String, Int)] = Seq("train" -> 80, "val" -> 10, "test" -> 10)): DataFrame = {
    val quality = TextAnalysis.repetitionStats(docs, idCol, textCol,
        maxDupWordFrac, maxTopWordRatio, maxDupBigramFrac)
      .filter(col("keep") === 1)
      .select(col("doc_id").as(idCol))
    val kept = docs.join(quality, Seq(idCol), "left_semi")
    val keepers = GraftOps.exactDedupKeepBest(kept, idCol, textCol, scoreCol)
      .select(col("keeper").as(idCol))
    // the filtered corpus fans out to TWO consumers — the near-dup pair
    // pipeline (consumed eagerly by connectedComponents' propagation) and
    // the final dedupApply output — so materialize it once instead of
    // re-running the quality gate's per-row HOF metrics for each. An eager
    // localCheckpoint (same move as connectedComponents) rather than
    // persist(): checkpoint blocks release when the returned frame is
    // garbage-collected, so a long-lived session calling curate() per
    // corpus shard does not accumulate pinned cache entries — persist()
    // would leak (nothing could ever unpersist the escaped frame). Blocks
    // spill to disk when the filtered corpus outgrows executor memory.
    // (curate was already eager here: connectedComponents' propagation
    // loop runs jobs at call time regardless.)
    val deduped = kept.join(keepers, Seq(idCol), "left_semi")
      .localCheckpoint(true)
    val pairs = GraftOps.ngramJaccardPairs(deduped, idCol, textCol, n, minPct)
    val comp = GraftOps.connectedComponents(pairs, "d1", "d2")
    GraftOps.hashSplit(
      GraftOps.dedupApply(deduped, idCol, comp, Some(scoreCol)), idCol, weights)
  }
}
