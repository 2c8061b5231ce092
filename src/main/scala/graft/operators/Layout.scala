package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** File-layout control for parquet data skipping — the write-side half of
  * scan performance. Parquet readers prune whole files/row-groups from
  * footer min/max stats, but stats only prune if the writer CLUSTERED the
  * data so each file covers a narrow value range. A single-column sort
  * gives that for one column and destroys it for every other;
  * [[zorderBy]] interleaves several columns' range-bits into one Morton
  * key (the Z-ORDER layout public lakehouse engines ship) so every
  * participating column's per-file range stays narrow at once.
  *
  * At 100 TB this is the difference between a predicate on a secondary
  * column scanning every file and scanning ~`1/2^bits` of them; the
  * cluster pass itself is one range-shuffle over the data — the same cost
  * as the single-column sort it replaces.
  */
object Layout {

  /** Morton (Z-order) clustering key over `cols`, each reduced to a
    * `bits`-bit equi-width bin between its own min and max (one bounded
    * stats pass over the FINITE values only, broadcast as literals), bits
    * interleaved least-significant-first. Null and non-finite row values
    * bin to 0 explicitly (r9 advisory: +Inf used to land in the max bin
    * via the Long cast, and one NaN poisoned the min/max stats into
    * degenerating EVERY row's bin to 0); the degenerate min==max column
    * contributes a constant 0 — all of which keeps the key total-ordered
    * and the write deterministic. */
  def zorderKey(df: DataFrame, cols: Seq[String], bits: Int = 8): Column = {
    require(cols.nonEmpty, "zorderKey needs at least one column")
    require(bits >= 1 && bits * cols.size <= 62,
      s"bits*cols must fit a long, got $bits x ${cols.size}")
    def finite(c: Column): Column =
      !isnan(c) && c > Double.NegativeInfinity && c < Double.PositiveInfinity
    // bounded driver collect: 2 doubles per column, the zorder analog of
    // a broadcast-join build side
    val stats = df.select(
      cols.flatMap { c =>
        val d = col(c).cast("double")
        Seq(min(when(finite(d), d)).as(s"mn_$c"),
          max(when(finite(d), d)).as(s"mx_$c"))
      }: _*).head()
    val nBins = (1L << bits) - 1L
    val binCols = cols.zipWithIndex.map { case (c, j) =>
      val mn = Option(stats.getAs[Any](s"mn_$c"))
        .map(_.asInstanceOf[Double]).getOrElse(0.0)
      val mx = Option(stats.getAs[Any](s"mx_$c"))
        .map(_.asInstanceOf[Double]).getOrElse(0.0)
      val d = col(c).cast("double")
      val bin =
        if (mx <= mn) lit(0L)
        else when(finite(d),
          least(lit(nBins), greatest(lit(0L),
            floor((d - lit(mn)) / lit(mx - mn) * nBins).cast("long"))))
          .otherwise(lit(0L))
      coalesce(bin, lit(0L))
    }
    // interleave: output bit (i*ncols + j) = bit i of column j's bin
    val terms = for {
      i <- 0 until bits
      (bin, j) <- binCols.zipWithIndex
    } yield shiftleft(
      shiftright(bin, i).bitwiseAND(lit(1L)), i * cols.size + j)
    terms.reduce((a, b) => a.bitwiseOR(b))
  }

  /** Re-layout `df` into `numFiles` range-clustered output partitions on
    * the Z-order key of `cols`: `repartitionByRange` gives each output
    * file a disjoint key range (so parquet footer stats prune files for
    * predicates on ANY participating column), `sortWithinPartitions`
    * clusters row-groups inside each file the same way. Write the result
    * with `.write.parquet(...)` — the layout survives because Spark
    * writes partitions in iterator order. */
  def zorderBy(df: DataFrame, cols: Seq[String], numFiles: Int,
      bits: Int = 8): DataFrame = {
    val key = zorderKey(df, cols, bits)
    df.withColumn("__z", key)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
  }

  /** Per-file min/max spread of `valueCol` relative to its global range —
    * the quantity parquet data skipping actually prunes on. Returns one
    * row per file: `(file, lo, hi, spread)` with spread in [0, 1]; the
    * mean spread is what a predicate's expected scan fraction tracks.
    * Diagnostic for specs/audits of a written layout. */
  def fileSpread(written: DataFrame, valueCol: String): DataFrame = {
    val g = written.agg(
      min(col(valueCol).cast("double")).as("gmn"),
      max(col(valueCol).cast("double")).as("gmx")).head()
    val (gmn, gmx) = (g.getDouble(0), g.getDouble(1))
    val range = math.max(gmx - gmn, Double.MinPositiveValue)
    written
      .groupBy(input_file_name().as("file"))
      .agg(min(col(valueCol).cast("double")).as("lo"),
        max(col(valueCol).cast("double")).as("hi"))
      .select(col("file"), col("lo"), col("hi"),
        ((col("hi") - col("lo")) / lit(range)).as("spread"))
  }

  /** Write `df` as a bucketed+sorted table (hash-bucketed on `key` into
    * `buckets` files per partition, sorted within) at `path`, and read
    * it back through the catalog. Two tables bucketed on their join key
    * with the SAME bucket count join with NO shuffle on either side —
    * the bucket layout IS the exchange, paid once at write time and
    * amortized over every subsequent join/aggregation on that key (the
    * co-located-join layout; at 100 TB repeated fact⋈fact joins are
    * won or lost here). Catalog-backed because bucket metadata lives in
    * the table definition, not the parquet footers; caller drops the
    * table when done ([[dropTable]]). */
  def writeBucketed(df: DataFrame, name: String, path: String,
      key: String, buckets: Int): DataFrame = {
    val s = df.sparkSession
    s.sql(s"DROP TABLE IF EXISTS `$name`")
    // BUCKET-ALIGNED shuffle before the write (r20, guide §6 file
    // layout): a bucketed write emits one file per (task × non-empty
    // bucket) — from a single-split source ONE task wrote (and sorted)
    // every bucket serially, and a many-split source writes
    // tasks×buckets fragment files. `repartition(buckets, key)` uses
    // the same murmur3-pmod placement as the bucket spec, so each
    // write task holds exactly its own bucket: the write parallelizes
    // across buckets and the layout comes out one file per bucket —
    // the file-sizing contract a bucketed table wants at any scale
    // (bucket count is the caller's data-sized knob).
    df.repartition(buckets, col(key))
      .write.bucketBy(buckets, key).sortBy(key)
      .option("path", path).mode("overwrite").format("parquet")
      .saveAsTable(name)
    s.table(name)
  }

  /** Drop a [[writeBucketed]] table definition (files are the caller's). */
  def dropTable(df: DataFrame, name: String): Unit =
    df.sparkSession.sql(s"DROP TABLE IF EXISTS `$name`")

  /** File-level min/max manifest over a written dataset: one row per
    * file, `(file, mn_<c>, mx_<c>…)` — the Iceberg/Delta-style manifest
    * that lets a reader prune WHOLE FILES before the scan is even
    * planned (parquet footer stats prune after each file is opened; the
    * manifest prunes the file listing itself — at 100 TB that is the
    * difference between touching 100k footers and touching none). Built
    * in one pass at write time and persisted beside the data; manifest
    * size ∝ file count, not data. */
  def fileManifest(written: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "manifest of zero columns")
    val aggs = cols.flatMap(c =>
      Seq(min(col(c)).as(s"mn_$c"), max(col(c)).as(s"mx_$c")))
    written.groupBy(input_file_name().as("file"))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Manifest-pruned range read: keep only files whose `[mn_c, mx_c]`
    * intersects `[lo, hi]`, read those paths, and re-apply the
    * predicate (the manifest prunes files; rows inside a kept file
    * still need the filter — same contract as any zone-map skip).
    * Returns the pruned frame plus (kept, total) file counts for
    * audit/spec use. The manifest collect is bounded METADATA (one row
    * per file — the same driver-side scale class as a broadcast-join
    * build side or the IVF centroid table). */
  def prunedRead(spark: org.apache.spark.sql.SparkSession,
      manifest: DataFrame, c: String, lo: Long, hi: Long): (DataFrame, Int, Int) = {
    val files = manifest
      .select(col("file"), col(s"mn_$c").cast("long"),
        col(s"mx_$c").cast("long"))
      .collect()
    require(files.nonEmpty,
      "prunedRead over an empty manifest — nothing was written")
    val kept = files.collect {
      case r if !r.isNullAt(1) && !r.isNullAt(2) &&
        r.getLong(2) >= lo && r.getLong(1) <= hi => r.getString(0)
    }
    val df =
      if (kept.isEmpty)
        spark.read.parquet(files.map(_.getString(0)): _*).limit(0)
      else spark.read.parquet(kept.toIndexedSeq: _*)
    (df.filter(col(c).between(lo, hi)), kept.length, files.length)
  }

  /** Per-file BLOOM manifest over a long key column — the
    * equality-lookup complement of [[fileManifest]]'s range zone maps:
    * a point lookup on a column the file layout is NOT clustered by
    * prunes nothing from min/max (every file's range covers it) but
    * prunes almost everything from a bloom at ~1.2 bytes/key. Built in
    * one pass at write time; manifest size ∝ files · bits. */
  def bloomManifest(written: DataFrame, c: String,
      itemsPerFile: Long = 100000L, fpp: Double = 0.01): DataFrame = {
    val agg = udaf(new graft.functions.BloomFilterAggregator(
      itemsPerFile, fpp))
    written.groupBy(input_file_name().as("file"))
      .agg(agg(col(c).cast("long")).as("bloom"))
  }

  /** Point-lookup read through a [[bloomManifest]]: keep only files
    * whose bloom MIGHT contain one of `keys`, read those, re-apply the
    * exact IN filter. False positives cost an extra file read, never a
    * wrong row.
    *
    * Membership tests run DISTRIBUTEDLY — the lookup keys broadcast to
    * the manifest relation and each bloom deserializes in the executor
    * that holds its row — so the driver collects only SURVIVING FILE
    * PATHS (strings, the same bounded class as [[prunedRead]]'s
    * min/max rows). Bloom payloads never land on the driver: at
    * ~120 KB per filter a 100k-file table would otherwise ship ~12 GB
    * of sketch bytes before the first membership test (the r10 `weak`).
    * Returns (rows, kept, total) like [[prunedRead]]. */
  def bloomPrunedRead(spark: org.apache.spark.sql.SparkSession,
      manifest: DataFrame, c: String,
      keys: Seq[Long]): (DataFrame, Int, Int) = {
    require(keys.nonEmpty, "bloom lookup with no keys")
    val keysB = spark.sparkContext.broadcast(keys.toArray)
    val mightContainAny = udf { (bytes: Array[Byte]) =>
      val bf = graft.functions.BloomFilterAggregator.fromBytes(bytes)
      keysB.value.exists(bf.mightContainLong)
    }
    val kept = manifest.filter(mightContainAny(col("bloom")))
      .select(col("file")).collect().map(_.getString(0))
    val allPaths = manifest.select(col("file")).collect()
      .map(_.getString(0)) // paths only — never the bloom column
    require(allPaths.nonEmpty,
      "bloomPrunedRead over an empty manifest — nothing was written")
    val df =
      if (kept.isEmpty) spark.read.parquet(allPaths.head).limit(0)
      else spark.read.parquet(kept.toIndexedSeq: _*)
    (df.filter(col(c).isin(keys: _*)), kept.length, allPaths.length)
  }

  /** Small-file compaction: bin-pack a directory of files into
    * `ceil(totalBytes / targetBytes)` outputs via one round-robin
    * shuffle, rewriting to `outDir`. Returns the output file count.
    * Small files are the silent scan killer at 100 TB (per-file open +
    * footer + scheduling cost dominates once files ≪ row-group size);
    * compaction runs per partition-directory in production so the
    * shuffle is bounded by the partition, not the table. */
  def compact(spark: org.apache.spark.sql.SparkSession, inDir: String,
      outDir: String, targetBytes: Long): Int = {
    val n = targetFileCount(inDir, targetBytes)
    spark.read.parquet(inDir).repartition(n)
      .write.mode("overwrite").parquet(outDir)
    n
  }

  /** Cluster-PRESERVING compaction: [[compact]]'s round-robin shuffle
    * destroys any Z-order/sort layout the input files had (and with it
    * every downstream manifest/footer prune) — this variant re-clusters
    * on the Z-order key while packing, for the same single-shuffle
    * cost. Use whenever the table carries a layout worth keeping. */
  def compactClustered(spark: org.apache.spark.sql.SparkSession,
      inDir: String, outDir: String, targetBytes: Long,
      zorderCols: Seq[String], bits: Int = 8): Int = {
    val n = targetFileCount(inDir, targetBytes)
    zorderBy(spark.read.parquet(inDir), zorderCols, n, bits)
      .write.mode("overwrite").parquet(outDir)
    n
  }

  /** `ceil(total parquet bytes / target)` for a directory — the bin
    * count both compaction forms pack into. Sizes come from the Hadoop
    * FileSystem bound to the active session's configuration (recursive
    * listing, one RPC stream), so compaction targets resolve on
    * HDFS/S3A exactly like the scan that follows — not via java.nio,
    * which only sees the local disk. */
  private def targetFileCount(inDir: String, targetBytes: Long): Int = {
    require(targetBytes > 0, "targetBytes must be positive")
    val conf = org.apache.spark.sql.SparkSession.getActiveSession
      .orElse(org.apache.spark.sql.SparkSession.getDefaultSession)
      .map(_.sparkContext.hadoopConfiguration)
      .getOrElse(new org.apache.hadoop.conf.Configuration())
    val dir = new org.apache.hadoop.fs.Path(inDir)
    val fs = dir.getFileSystem(conf)
    var totalBytes = 0L
    val it = fs.listFiles(dir, true)
    while (it.hasNext) {
      val f = it.next()
      if (f.isFile && f.getPath.getName.endsWith(".parquet"))
        totalBytes += f.getLen
    }
    math.max(1L, (totalBytes + targetBytes - 1) / targetBytes).toInt
  }
}
