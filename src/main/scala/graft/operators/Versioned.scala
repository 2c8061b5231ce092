package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Snapshot-versioned tables — time travel for the serving-table refresh
  * pattern: each refresh WRITES A NEW IMMUTABLE VERSION directory
  * (`<root>/v=<N>/`) instead of truncate-and-reload in place (the
  * reference's refresh, `nl_targeting_save.py:52-66`, destroys the
  * previous state mid-rebuild; readers see a half-built table). Readers
  * resolve a version pin (`asOf`) or the latest committed version from
  * the directory listing — a bounded METADATA operation — so a rebuild
  * is atomic-by-rename-visibility and old versions stay queryable until
  * [[vacuum]] reclaims them.
  *
  * Scale note: full-snapshot versions fit dimension/serving tables (the
  * reference's shape — small relative to the lake). For the 100 TB fact
  * side, versions are CDC deltas folded by [[Cdc.foldChanges]] /
  * [[graft.streaming.EventStream.streamFoldExact]]; this module is the
  * snapshot face of the same contract, and q49 gates both faces against
  * one oracle. */
object Versioned {

  private def vdir(root: String, v: Long) = s"$root/v=$v"

  /** Write `df` as immutable version `v` (refusing to overwrite — a
    * version, once written, never changes). */
  def write(df: DataFrame, root: String, v: Long): Unit = {
    require(v >= 0, s"negative version $v")
    require(!java.nio.file.Files.exists(java.nio.file.Paths.get(vdir(root, v))),
      s"version $v already exists under $root — versions are immutable")
    df.write.parquet(vdir(root, v))
  }

  /** Committed versions under `root`, ascending (driver-side listing of
    * one directory level — bounded metadata). */
  def versions(root: String): Seq[Long] = {
    val d = java.nio.file.Paths.get(root)
    if (!java.nio.file.Files.isDirectory(d)) Seq.empty
    else {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.list(d).iterator().asScala
        .map(_.getFileName.toString)
        .collect { case s if s.startsWith("v=") => s.drop(2).toLong }
        .toSeq.sorted
    }
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

  /** Drop all but the newest `keepLast` versions; returns the removed
    * version numbers. */
  def vacuum(root: String, keepLast: Int): Seq[Long] = {
    require(keepLast >= 1, "vacuum must keep at least one version")
    val doomed = versions(root).dropRight(keepLast)
    doomed.foreach(v => graft.streaming.EventStream.deleteDir(vdir(root, v)))
    doomed
  }
}
