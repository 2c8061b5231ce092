package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Versioned

/** Snapshot versioning: immutability, as-of resolution, latest pointer,
  * and vacuum retention. */
class VersionedSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def df(tag: String) =
    Seq((1L, tag), (2L, tag)).toDF("k", "tag")

  test("write/read round trip: as-of pins the greatest version <= the " +
      "ask, None reads latest, history stays readable after new writes") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_versioned_spec").toString + "/t"
    try {
      Versioned.write(df("v1"), root, 1L)
      Versioned.write(df("v3"), root, 3L) // versions need not be dense
      assert(Versioned.versions(root) == Seq(1L, 3L))
      def tagOf(asOf: Option[Long]) =
        Versioned.read(spark, root, asOf).select("tag").head().getString(0)
      assert(tagOf(Some(1L)) == "v1")
      assert(tagOf(Some(2L)) == "v1") // greatest <= 2 is 1
      assert(tagOf(Some(3L)) == "v3")
      assert(tagOf(None) == "v3")
      // pre-history ask fails loudly
      intercept[IllegalArgumentException] {
        Versioned.read(spark, root, Some(0L))
      }
      // immutability: rewriting an existing version is refused
      intercept[IllegalArgumentException] {
        Versioned.write(df("evil"), root, 1L)
      }
      assert(tagOf(Some(1L)) == "v1")
    } finally graft.streaming.EventStream.deleteDir(
      root.stripSuffix("/t"))
  }

  test("vacuum drops the oldest versions, keeps the newest N, and " +
      "refuses to keep zero") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_vacuum_spec").toString + "/t"
    try {
      Seq(1L, 2L, 5L, 9L).foreach(v => Versioned.write(df(s"v$v"), root, v))
      val removed = Versioned.vacuum(root, keepLast = 2)
      assert(removed == Seq(1L, 2L))
      assert(Versioned.versions(root) == Seq(5L, 9L))
      assert(Versioned.read(spark, root, None).select("tag")
        .head().getString(0) == "v9")
      intercept[IllegalArgumentException] { Versioned.vacuum(root, 0) }
    } finally graft.streaming.EventStream.deleteDir(
      root.stripSuffix("/t"))
  }

  test("commit is atomic-by-rename: staging dirs and junk entries are " +
      "invisible to versions(), and a torn staging dir is reclaimed") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_stage_spec").toString + "/t"
    try {
      Versioned.write(df("v1"), root, 1L)
      // a concurrent half-written version = a staging dir that exists
      // but was never renamed; readers must not resolve it
      val torn = java.nio.file.Paths.get(root, "_staging_v=2")
      java.nio.file.Files.createDirectories(torn)
      java.nio.file.Files.write(torn.resolve("part-0.parquet"),
        Array[Byte](1, 2, 3)) // garbage — must never be read
      // junk directory names must be skipped, not crash toLong
      java.nio.file.Files.createDirectories(
        java.nio.file.Paths.get(root, "v=notanumber"))
      assert(Versioned.versions(root) == Seq(1L))
      assert(Versioned.read(spark, root, None)
        .select("tag").head().getString(0) == "v1")
      // a new writer stages under its OWN unique path — it neither
      // touches nor is blocked by the torn dir, and commits cleanly
      Versioned.write(df("v2"), root, 2L)
      assert(Versioned.versions(root) == Seq(1L, 2L))
      assert(Versioned.read(spark, root, Some(2L))
        .select("tag").head().getString(0) == "v2")
      // the torn dir is unreferenced garbage until vacuum sweeps it —
      // but ONLY once it looks dead: the default 6 h age gate must
      // leave a fresh staging dir (indistinguishable from a write in
      // flight right now) alone, or vacuum would race live writers
      assert(java.nio.file.Files.exists(torn))
      Versioned.vacuum(root, keepLast = 2)
      assert(java.nio.file.Files.exists(torn),
        "age-gated vacuum must not sweep a fresh staging dir")
      // backdate the TOP dir only, leaving the nested file fresh — the
      // HDFS hazard (r13 advice): a directory mtime only tracks direct
      // children, so a writer streaming into nested subdirs looks stale
      // at the top while its leaves are seconds old. The tree-walking
      // gate must keep it.
      val old = java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - 7L * 3600 * 1000)
      java.nio.file.Files.setLastModifiedTime(torn, old)
      Versioned.vacuum(root, keepLast = 2)
      assert(java.nio.file.Files.exists(torn),
        "vacuum swept a staging dir whose TREE held fresh writes")
      // backdate the whole tree past the gate — now it is provably a
      // dead attempt and the sweep fires
      java.nio.file.Files.setLastModifiedTime(
        torn.resolve("part-0.parquet"), old)
      java.nio.file.Files.setLastModifiedTime(torn, old)
      Versioned.vacuum(root, keepLast = 2)
      assert(!java.nio.file.Files.exists(torn))
      assert(Versioned.versions(root) == Seq(1L, 2L))
    } finally graft.streaming.EventStream.deleteDir(
      root.stripSuffix("/t"))
  }

  test("concurrent same-version writers: exactly one commits, the " +
      "loser raises, the winner's data is intact, no staging residue") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_race_spec").toString + "/t"
    try {
      Versioned.write(df("base"), root, 1L)
      import java.util.concurrent.{CountDownLatch, Executors}
      val pool = Executors.newFixedThreadPool(2)
      val gate = new CountDownLatch(1)
      val outcomes = (0 until 2).map { i =>
        pool.submit(new java.util.concurrent.Callable[Option[Throwable]] {
          def call(): Option[Throwable] = {
            gate.await()
            try { Versioned.write(df(s"w$i"), root, 2L); None }
            catch { case t: Throwable => Some(t) }
          }
        })
      }
      gate.countDown()
      val results = outcomes.map(_.get())
      pool.shutdown()
      val failures = results.flatten
      assert(failures.length == 1,
        s"expected exactly one loser, got ${failures.length}: $failures")
      assert(failures.head.isInstanceOf[IllegalStateException] ||
        failures.head.isInstanceOf[IllegalArgumentException],
        s"unexpected loser error: ${failures.head}")
      // winner's version is complete and readable
      val tag = Versioned.read(spark, root, Some(2L))
        .select("tag").head().getString(0)
      assert(tag == "w0" || tag == "w1", s"committed tag $tag")
      assert(Versioned.read(spark, root, Some(2L)).count() == 2)
      // loser's staging was cleaned up: nothing but v= dirs remain
      val residue = new java.io.File(root).listFiles().toSeq
        .map(_.getName).filterNot(_.startsWith("v="))
      assert(residue.isEmpty, s"staging residue: $residue")
    } finally graft.streaming.EventStream.deleteDir(
      root.stripSuffix("/t"))
  }
}
