package graft.api

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Versioned-snapshot store shared by the persistent index families
  * (fingerprint / SRP / IVF) — [[PortraitOps.profileUpsert]]'s
  * manifest-flip protocol generalized from bucket→version maps to
  * table→segment-list maps, so that APPEND stays cheap (a new version
  * adds segment directories; nothing old is rewritten) while COMPACT
  * and REBUILD swap whole tables atomically.
  *
  * DELIBERATELY a sibling of the profile store, not its replacement:
  * the two protocols share the claim/TOCTOU/publish shape but differ in
  * their unit of ownership — a profile BUCKET lives in exactly one
  * version (an upsert re-points untouched buckets; reads never union)
  * and the manifest carries the nBuckets layout gate, while an index
  * TABLE is a list of append-only segments. Folding one into the other
  * would force the weaker model on both, and the profile manifest
  * format is already persisted on disk by earlier releases — any
  * protocol fix must be considered for BOTH files
  * (PortraitOps.profileUpsert region and here). Self-contained on any
  * Hadoop filesystem with atomic exclusive-create and `rename` (HDFS,
  * ABFS; on `file:` the claim goes through NIO O_EXCL because Hadoop's
  * LocalFileSystem fakes exclusive create as check-then-act — see
  * [[exclusiveCreate]]); a plain object store without atomic
  * exclusive-create needs an external writer lock, exactly
  * profileUpsert's caveat.
  *
  * Layout under an index directory:
  *  - `vNNNNN/<table>/...parquet` — immutable segment directories;
  *    version N's dir holds only the tables (or table deltas) commit
  *    N wrote.
  *  - `_manifests/vNNNNN.manifest` — the commit record: a `version`
  *    header, optional `prop <key> <value>` lines (the replay
  *    watermark lives here), and one `table <name> <vdir...>` line
  *    per table listing the segment dirs that compose it, oldest
  *    first. The LATEST manifest IS the index.
  *  - `_manifests/vNNNNN.CLAIM` — a writer's exclusive version claim.
  *
  * A commit: (1) resolves the latest manifest, (2) CLAIMS version
  * N+1 by exclusive create — a second concurrent writer fails LOUDLY
  * here ([[ConcurrentIndexWriteException]]), before any Spark job
  * runs — (3) re-verifies the chain still ends at N (the
  * profileUpsert TOCTOU re-check: a racer can claim, commit AND
  * release between our resolve and our claim), (4) runs the writer's
  * data jobs into the immutable `vNNNNN/` dir, and (5) PUBLISHES by
  * renaming the manifest into place — one atomic metadata operation.
  * A reader resolving concurrently sees the old snapshot or the new
  * one, never a mix: segment dirs land fully before the manifest
  * appears and stay immutable until [[vacuum]]. A search that
  * resolved its snapshot before an append/compact published keeps
  * reading complete, consistent tables to the end of its job.
  *
  * Failure story, inherited from profileUpsert: a writer that FAILS
  * before publishing deletes its partial data dir and releases its
  * claim on the way out; a writer that CRASHES leaves `vNNNNN.CLAIM`
  * residue, and the next writer fails loudly naming the file (delete
  * it once the writer is confirmed dead — its unreferenced data dir,
  * if any, is cleared automatically by the next successful claim of
  * that version). Version numbers form an unbroken chain; every
  * commit derives from its immediate predecessor — no lost updates by
  * construction. */
private[graft] object IndexStore {

  /** One committed snapshot: manifest version, commit properties
    * (free-form whitespace-free key/values — the curateIncremental
    * replay watermark rides here), and table → owning segment
    * version-dirs, oldest first. */
  final case class Snapshot(version: Int, props: Map[String, String],
      tables: Map[String, Seq[String]])

  /** The latest committed snapshot, or None when `indexDir` holds no
    * published manifest (no index). */
  def resolve(spark: SparkSession, indexDir: String): Option[Snapshot] = {
    val dir = new org.apache.hadoop.fs.Path(manifestDir(indexDir))
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(dir)) return None
    val manifests = fs.listStatus(dir).map(_.getPath)
      .filter(_.getName.matches("v\\d{5,}\\.manifest"))
    if (manifests.isEmpty) None
    else Some(readManifest(fs, manifests.maxBy(p => versionOf(p.getName))))
  }

  /** The snapshot a SPECIFIC manifest version committed — the replay
    * path's time travel (resolve the pre-append snapshot a recorded
    * `last_batch_base` names). None when that manifest no longer
    * exists (vacuumed, or never published). */
  def resolveAt(spark: SparkSession, indexDir: String,
      version: Int): Option[Snapshot] = {
    val p = new org.apache.hadoop.fs.Path(
      f"${manifestDir(indexDir)}/v$version%05d.manifest")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) Some(readManifest(fs, p)) else None
  }

  /** Read one logical table of a snapshot: the union of its segment
    * reads (a single-segment table reads plain — the common built-once
    * case keeps its unchanged scan plan). Filters a caller applies on
    * top push through the union into every segment scan, so partition
    * pruning (IVF's `bucket IN (probed)`) holds per segment. */
  def readTable(spark: SparkSession, indexDir: String, snap: Snapshot,
      table: String): DataFrame = {
    val segs = snap.tables.getOrElse(table, throw new IllegalStateException(
      s"index at $indexDir: manifest v${snap.version} records no table " +
        s"'$table' — the directory does not hold this kind of index"))
    segs.map(v => spark.read.parquet(s"$indexDir/$v/$table"))
      .reduce(_.unionByName(_))
  }

  /** [[readTable]] with every row tagged (`segCol`, int) by the
    * manifest version of the segment it lives in — the SEQUENCE NUMBER
    * the retraction family's merge-on-read subtraction compares: a
    * tombstone written at version T kills equal-keyed rows from
    * segments ≤ T only, so a row RE-appended after the retraction
    * (segment > T) is live again (Iceberg's equality-delete sequencing,
    * on this store's version chain). The tag is a per-segment literal —
    * caller filters on data columns still push into every segment scan
    * unchanged. */
  def readTableTagged(spark: SparkSession, indexDir: String, snap: Snapshot,
      table: String, segCol: String): DataFrame = {
    val segs = snap.tables.getOrElse(table, throw new IllegalStateException(
      s"index at $indexDir: manifest v${snap.version} records no table " +
        s"'$table' — the directory does not hold this kind of index"))
    segs.map(v => spark.read.parquet(s"$indexDir/$v/$table")
        .withColumn(segCol, org.apache.spark.sql.functions.lit(versionOf(v))))
      .reduce(_.unionByName(_))
  }

  /** Commit one new version. `write` receives the base snapshot (None
    * on a fresh dir) and the claimed version-dir name; it runs the
    * data jobs into `indexDir/<vname>/<table>` and returns the NEW
    * complete (tables, props) to record. Claim precedes all data
    * work; publish is one manifest rename. */
  def commit(spark: SparkSession, indexDir: String, op: String)(
      write: (Option[Snapshot], String) =>
        (Map[String, Seq[String]], Map[String, String])): Snapshot = {
    val fs = new org.apache.hadoop.fs.Path(indexDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new org.apache.hadoop.fs.Path(manifestDir(indexDir)))
    val base = resolve(spark, indexDir)
    val next = base.map(_.version).getOrElse(0) + 1
    val vname = f"v$next%05d"
    val claim = new org.apache.hadoop.fs.Path(
      s"${manifestDir(indexDir)}/$vname.CLAIM")
    try exclusiveCreate(fs, claim)
    catch { case e: java.io.IOException =>
      throw new ConcurrentIndexWriteException(
        s"$op: version $vname of index $indexDir is already claimed " +
          s"($claim exists) — another writer is in flight, or a crashed " +
          "writer left residue (delete the CLAIM file once you have " +
          s"confirmed it is dead). Underlying: ${e.getMessage}")
    }
    var published = false
    var wroteData = false
    try {
      // TOCTOU re-check (profileUpsert's): a racer may have claimed,
      // COMMITTED and released this very version between our resolve
      // and our claim create — verify the chain still ends at next-1.
      if (resolve(spark, indexDir).map(_.version).getOrElse(0) != next - 1)
        throw new ConcurrentIndexWriteException(
          s"$op: version $vname of index $indexDir was published by a " +
            "concurrent writer between manifest resolve and claim — " +
            "rerun against the new snapshot")
      // a data dir at OUR claimed version with no manifest is a crashed
      // writer's residue (vacuum cannot reach above the latest manifest):
      // clear it now, or the fresh write would die on 'path already
      // exists' — we hold the claim, so the dir can belong to no one else
      fs.delete(new org.apache.hadoop.fs.Path(s"$indexDir/$vname"), true)
      wroteData = true
      val (tables, props) = write(base, vname)
      require(tables.nonEmpty, s"$op: commit records no tables")
      props.foreach { case (k, v) =>
        require(k.nonEmpty && v.nonEmpty && !s"$k$v".exists(_.isWhitespace),
          s"$op: manifest props must be non-empty and whitespace-free " +
            s"(got '$k' -> '$v')")
      }
      val body = s"version $next\n" +
        props.toSeq.sorted.map { case (k, v) => s"prop $k $v" }
          .map(_ + "\n").mkString +
        tables.toSeq.sortBy(_._1)
          .map { case (t, segs) => s"table $t ${segs.mkString(" ")}\n" }
          .mkString
      val tmp = new org.apache.hadoop.fs.Path(
        s"${manifestDir(indexDir)}/.$vname.manifest.tmp")
      val out = fs.create(tmp, true)
      out.write(body.getBytes("UTF-8"))
      out.close()
      val fin = new org.apache.hadoop.fs.Path(
        s"${manifestDir(indexDir)}/$vname.manifest")
      if (!fs.rename(tmp, fin))
        throw new ConcurrentIndexWriteException(s"$op: failed to publish $fin")
      published = true
      fs.delete(claim, false)
      Snapshot(next, props, tables)
    } finally if (!published) {
      // failed before publish: nothing WE wrote is referenced — drop our
      // partial data dir (never a racer's: wroteData guards the TOCTOU
      // path, where $vname's data belongs to the committed winner) and
      // release the claim so the chain stays writable
      if (wroteData)
        fs.delete(new org.apache.hadoop.fs.Path(s"$indexDir/$vname"), true)
      fs.delete(claim, false)
    }
  }

  /** Drop everything the RETAINED snapshots no longer reference.
    * Retained, by construction:
    *  - the newest `keepVersions` published manifests (the latest
    *    always; `keepVersions = 3` lets a reader still holding a
    *    snapshot up to two versions old survive the vacuum — the
    *    reader-horizon knob, convention upgraded to mechanism);
    *  - UNCONDITIONALLY, the manifest the latest snapshot's
    *    `last_batch_base` watermark names, plus every segment it
    *    references — so a cron'd vacuum can never strand a
    *    foreachBatch crash-replay: the replay path's time-travel
    *    record ([[GraftOps.replayBase]]) survives ANY vacuum timing
    *    by construction, not by the operator keeping vacuums out of
    *    the replay window. (A later batch's append re-points the
    *    watermark, releasing the old base to the next vacuum — a
    *    foreachBatch engine only ever replays the LAST committed
    *    batch.)
    * Deleted: version dirs at-or-below the latest version owning no
    * segment of a retained snapshot, manifests below the latest that
    * are not retained, and CLAIM residue at-or-below the latest.
    * Versions ABOVE the latest belong to an in-flight (or crashed)
    * writer and are untouched. Readers holding snapshots older than
    * the retention horizon fail loudly at read time (missing segment
    * path) — size `keepVersions` to the longest reader you allow.
    * Returns what it deleted. */
  def vacuum(spark: SparkSession, indexDir: String,
      keepVersions: Int = 1): Seq[String] = {
    require(keepVersions >= 1, s"keepVersions must be >= 1 (got $keepVersions)")
    val snap = resolve(spark, indexDir).getOrElse(return Nil)
    val fs = new org.apache.hadoop.fs.Path(indexDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val published = fs.listStatus(
        new org.apache.hadoop.fs.Path(manifestDir(indexDir)))
      .map(_.getPath.getName).filter(_.matches("v\\d{5,}\\.manifest"))
      .map(versionOf).sorted.reverse.toSeq
    val kept = published.take(keepVersions).toSet ++
      snap.props.get("last_batch_base").map(_.toInt)
    val live = kept.toSeq.flatMap(v => resolveAt(spark, indexDir, v))
      .flatMap(_.tables.values.flatten).toSet
    val gone = scala.collection.mutable.ArrayBuffer.empty[String]
    fs.listStatus(new org.apache.hadoop.fs.Path(indexDir)).foreach { st =>
      val n = st.getPath.getName
      if (st.isDirectory && n.matches("v\\d{5,}") && !live(n) &&
          versionOf(n) <= snap.version) {
        fs.delete(st.getPath, true); gone += n
      }
    }
    fs.listStatus(new org.apache.hadoop.fs.Path(manifestDir(indexDir)))
      .foreach { st =>
        val n = st.getPath.getName
        val stale =
          (n.endsWith(".manifest") && versionOf(n) < snap.version &&
            !kept(versionOf(n))) ||
            (n.endsWith(".CLAIM") && versionOf(n) <= snap.version)
        if (stale) { fs.delete(st.getPath, false); gone += n }
      }
    gone.toSeq
  }

  /** [[commit]] wrapped in the bounded resolve→recompute→recommit loop
    * a LOSING concurrent writer needs — the turn-key multi-writer entry
    * point. Each attempt is a FULL fresh commit: `write` receives the
    * NEW base snapshot the winner published, so the caller's data jobs
    * recompute against it (the callback must therefore derive
    * everything from its `(base, vname)` arguments — the append
    * family's callbacks already do). Backoff between attempts is
    * exponential with full jitter, so two symmetric losers don't
    * re-collide in lockstep. After `maxAttempts` losses the last
    * [[ConcurrentIndexWriteException]] rethrows — which is also the
    * crashed-writer story: CLAIM residue never clears itself, so retry
    * spins through its attempts and then surfaces the residue's loud,
    * file-naming error unchanged. Defaults size the total backoff
    * (~5 s across 6 attempts) to outlast a small-batch commit's claim
    * hold — the claim is held for the DURATION of the winner's data
    * jobs, so callers whose commits run minutes should raise
    * `baseBackoffMs`/`maxAttempts` to match. */
  def commitWithRetry(spark: SparkSession, indexDir: String, op: String,
      maxAttempts: Int = 6, baseBackoffMs: Long = 200L)(
      write: (Option[Snapshot], String) =>
        (Map[String, Seq[String]], Map[String, String])): Snapshot = {
    require(maxAttempts >= 1, s"maxAttempts must be >= 1 (got $maxAttempts)")
    var attempt = 1
    while (attempt < maxAttempts) {
      try return commit(spark, indexDir, op)(write)
      catch { case _: ConcurrentIndexWriteException =>
        val cap = baseBackoffMs << math.min(attempt - 1, 6)
        Thread.sleep(java.util.concurrent.ThreadLocalRandom.current()
          .nextLong(cap / 2 + 1, cap + 1))
        attempt += 1
      }
    }
    commit(spark, indexDir, op)(write) // last attempt: losses rethrow
  }

  /** Atomic exclusive create of the claim file. Hadoop's
    * LocalFileSystem implements `create(path, overwrite = false)` as
    * CHECK-THEN-ACT (exists() then create) — two same-JVM writers racing
    * a claim can BOTH pass the check, collide in one `_temporary` dir,
    * and corrupt each other's write (caught by the suite's two-thread
    * race test). On `file:` filesystems the claim therefore goes through
    * NIO's `Files.createFile` — true O_EXCL, throws
    * FileAlreadyExistsException (an IOException, so the caller's loud
    * claim-failure path is unchanged). HDFS/ABFS create IS atomic at the
    * namenode and keeps the plain Hadoop call. Shared with
    * [[PortraitOps.profileUpsert]], whose claim gate had the same
    * local-fs hole. */
  private[api] def exclusiveCreate(fs: org.apache.hadoop.fs.FileSystem,
      p: org.apache.hadoop.fs.Path): Unit =
    if (fs.getScheme == "file") {
      val local = java.nio.file.Paths.get(p.toUri.getPath)
      java.nio.file.Files.createDirectories(local.getParent)
      java.nio.file.Files.createFile(local)
      ()
    } else fs.create(p, false).close()

  private def manifestDir(indexDir: String): String = s"$indexDir/_manifests"

  private[api] def versionOf(name: String): Int =
    name.stripPrefix("v").takeWhile(_.isDigit).toInt

  private def readManifest(fs: org.apache.hadoop.fs.FileSystem,
      path: org.apache.hadoop.fs.Path): Snapshot = {
    val in = fs.open(path)
    val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
    val lines = text.linesIterator.filter(_.nonEmpty).toSeq
    val ver = lines.head.split(" ")(1).toInt
    val props = lines.tail.filter(_.startsWith("prop ")).map { l =>
      val Array(_, k, v) = l.split(" ", 3); k -> v
    }.toMap
    val tables = lines.tail.filter(_.startsWith("table ")).map { l =>
      val parts = l.split(" ").toSeq
      parts(1) -> parts.drop(2)
    }.toMap
    Snapshot(ver, props, tables)
  }
}

/** An [[IndexStore.commit]] lost the exclusive version claim: a
  * concurrent writer is in flight (or a crashed one left CLAIM
  * residue). The losing commit has run no data job — rerun it after
  * the winner publishes. */
final class ConcurrentIndexWriteException(msg: String)
  extends RuntimeException(msg)
