package graft.operators

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Snapshot-versioned tables — time travel for the serving-table refresh
  * pattern: each refresh WRITES A NEW IMMUTABLE VERSION directory
  * (`<root>/v=<N>/`) instead of truncate-and-reload in place (the
  * reference's refresh, `nl_targeting_save.py:52-66`, destroys the
  * previous state mid-rebuild; readers see a half-built table).
  *
  * Commit protocol: [[write]] stages the parquet under
  * `<root>/_staging_v=<N>/` and RENAMES the finished directory to
  * `v=<N>` — one metadata operation, atomic on HDFS and POSIX
  * filesystems — so [[versions]]/[[read]] can never resolve a
  * half-written version (the half-built-table hazard lives entirely
  * inside the `_staging_` prefix, which the listing ignores). On
  * object stores without atomic directory rename (raw S3), swap the
  * rename for a manifest-pointer commit (an Iceberg/Delta-style
  * pointer file written last); the staging/visibility split here is
  * the same contract.
  *
  * All filesystem access goes through the Hadoop FileSystem API bound
  * to the active session's configuration, so roots on HDFS/S3A resolve
  * the same way the parquet reader/writer resolves them — not through
  * java.nio, which silently only works on the local disk.
  *
  * Scale note: full-snapshot versions fit dimension/serving tables (the
  * reference's shape — small relative to the lake). For the 100 TB fact
  * side, versions are CDC deltas folded by [[Cdc.foldChanges]] /
  * [[graft.streaming.EventStream.streamFoldExact]]; this module is the
  * snapshot face of the same contract, and q49 gates both faces against
  * one oracle. */
object Versioned {

  private def vdir(root: String, v: Long) = s"$root/v=$v"

  /** Hadoop conf of the running session (falls back to a bare default
    * outside one — local FS, same as Spark's own fallback). */
  private def hconf: Configuration =
    SparkSession.getActiveSession
      .orElse(SparkSession.getDefaultSession)
      .map(_.sparkContext.hadoopConfiguration)
      .getOrElse(new Configuration())

  private def fsOf(path: String): FileSystem =
    new Path(path).getFileSystem(hconf)

  /** Write `df` as immutable version `v` (refusing to overwrite — a
    * version, once written, never changes). Stages under a PER-ATTEMPT
    * unique path `_staging_v=<v>.<uuid>` and renames on completion, so
    * a concurrent [[versions]]/[[read]] never observes a partial
    * version AND two concurrent writers of the same version never share
    * a staging dir (a shared path would let writer B's torn-write
    * reclaim delete writer A's in-flight parquet). Commit is
    * first-rename-wins: the loser detects the destination (re-checked
    * after a failed rename — HDFS renames INTO an existing destination
    * directory rather than failing), deletes its own staging dir, and
    * raises the same immutability error a late [[write]] call would.
    * Torn staging dirs from crashed attempts are unreferenced garbage
    * swept by [[vacuum]]. */
  def write(df: DataFrame, root: String, v: Long): Unit = {
    require(v >= 0, s"negative version $v")
    val fs = fsOf(root)
    val fin = new Path(vdir(root, v))
    require(!fs.exists(fin),
      s"version $v already exists under $root — versions are immutable")
    val staging = new Path(
      s"$root/_staging_v=$v.${java.util.UUID.randomUUID()}")
    df.write.parquet(staging.toString)
    def lostRace(garbage: Path): Nothing = {
      fs.delete(garbage, true)
      throw new IllegalStateException(
        s"version $v committed concurrently under $root — versions are " +
          "immutable; this attempt's staging was discarded")
    }
    // Loss modes differ by FS when fin already exists: local/posix
    // rename returns false; HDFS renames staging INSIDE fin (nesting)
    // and returns true — detect both and clean up the loser's files.
    if (!fs.rename(staging, fin)) lostRace(staging)
    val nested = new Path(fin, staging.getName)
    if (fs.exists(nested)) lostRace(nested)
  }

  /** Committed versions under `root`, ascending (driver-side listing of
    * one directory level — bounded metadata). Only fully-committed
    * `v=<digits>` directories count: staging dirs and junk entries are
    * ignored, not errors. */
  def versions(root: String): Seq[Long] = {
    val fs = fsOf(root)
    val d = new Path(root)
    if (!fs.exists(d)) Seq.empty
    else fs.listStatus(d).toSeq
      .filter(_.isDirectory)
      .map(_.getPath.getName)
      .collect { case s if s.startsWith("v=") &&
        s.length > 2 && s.drop(2).forall(_.isDigit) => s.drop(2).toLong }
      .sorted
  }

  /** Read the table as of version `asOf` (the greatest committed
    * version ≤ it), or the latest when `None`. */
  def read(spark: SparkSession, root: String,
      asOf: Option[Long] = None): DataFrame = {
    val vs = versions(root)
    require(vs.nonEmpty, s"no versions under $root")
    val pick = asOf match {
      case None => vs.last
      case Some(v) =>
        val ok = vs.filter(_ <= v)
        require(ok.nonEmpty, s"no version <= $v under $root (have $vs)")
        ok.last
    }
    spark.read.parquet(vdir(root, pick))
  }

  /** Drop all but the newest `keepLast` versions (plus orphaned
    * `_staging_v=*` dirs left by crashed write attempts); returns the
    * removed version numbers.
    *
    * Staging sweeps are AGE-GATED (r12 advice): a staging dir is only
    * garbage if its writer is dead, and the directory's name alone
    * cannot distinguish a crashed attempt from a write that is
    * in-flight RIGHT NOW — an unconditional sweep would delete the
    * live writer's files mid-write and kill a healthy commit (no
    * committed data corrupted, but routine maintenance must not abort
    * concurrent work). Only dirs whose NEWEST tree entry is older than
    * `staleMs` (default 6 h — generously past any sane write duration)
    * are swept; fresher ones are left for the next vacuum. The gate
    * walks the staging TREE, not the top directory alone (r13 advice):
    * on HDFS-like filesystems a directory's mtime only updates when
    * its DIRECT children change, so a writer still streaming files
    * into nested task/temporary subdirs past staleMs would look
    * stale at the top while its leaves are seconds old. */
  def vacuum(root: String, keepLast: Int,
      staleMs: Long = 6L * 3600 * 1000): Seq[Long] = {
    require(keepLast >= 1, "vacuum must keep at least one version")
    val fs = fsOf(root)
    val doomed = versions(root).dropRight(keepLast)
    doomed.foreach(v => fs.delete(new Path(vdir(root, v)), true))
    val cutoff = System.currentTimeMillis() - staleMs
    // newest mtime anywhere under p — the writer-liveness signal. The
    // walk is metadata-only over ONE crashed/in-flight attempt's file
    // count (bounded by a single write's task files), not the table.
    // A LIVE writer renames/removes task files between our listing and
    // the recursion — a vanished path is proof the writer is active
    // this instant, so it reports as maximally fresh rather than
    // aborting the whole sweep (routine maintenance must not crash on
    // concurrent work).
    def newestMtime(p: Path): Long =
      try {
        val entries = fs.listStatus(p).toSeq
        (fs.getFileStatus(p).getModificationTime +:
          entries.map(e =>
            if (e.isDirectory) newestMtime(e.getPath)
            else e.getModificationTime)).max
      } catch { case _: java.io.FileNotFoundException => Long.MaxValue }
    fs.listStatus(new Path(root)).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("_staging_v="))
      .filter(s => newestMtime(s.getPath) < cutoff)
      .foreach(s =>
        // same race on the delete itself: another vacuum (or the
        // writer's own cleanup) may have removed the dir already
        try fs.delete(s.getPath, true)
        catch { case _: java.io.FileNotFoundException => () })
    doomed
  }
}
