package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Table-maintenance operators: CDC upsert/delete apply (the lakehouse
  * MERGE shape) and SCD-2 dimension-history interval building.
  *
  * The reference keeps its serving tables fresh by re-running full INSERT
  * pipelines (`/root/reference/nl_targeting_save.py:52-66` truncates and
  * reloads); at 100 TB a snapshot is maintained incrementally — a small
  * change batch is merged into the big table, and attribute history is
  * tracked as validity intervals. Both shapes below are pure column
  * plans the driver's DuckDB oracle re-derives row for row.
  */
object Cdc {

  /** Apply a CDC change batch to a snapshot, latest-wins per key.
    *
    * `changes` carries the snapshot's columns plus `opCol` (`"U"` upsert
    * / `"D"` delete) and `seqCol` (a per-key strictly-increasing change
    * sequence — the resolution order; ties are contract-violating).
    * Result = snapshot rows whose key is untouched, plus the
    * latest-by-seq image of every touched key that isn't a delete.
    *
    * Scale design: the big snapshot NEVER shuffles — with
    * `broadcastChanges` (the normal regime: a change batch is tiny
    * relative to a 100 TB snapshot) the touched-key set is broadcast and
    * the snapshot streams through a map-side `BroadcastHashJoin
    * LeftAnti`; the per-key latest-wins resolution aggregates only the
    * change batch (partial-aggregable `max_by`). For a change batch too
    * big to broadcast, pass `broadcastChanges = false` and the anti-join
    * falls back to a key shuffle. A copy-on-write writer would pair this
    * with a key-clustered layout ([[Layout.zorderBy]]) so only files
    * containing touched keys rewrite. */
  def applyBatch(snapshot: DataFrame, changes: DataFrame, keyCol: String,
      seqCol: String = "seq", opCol: String = "op",
      broadcastChanges: Boolean = true): DataFrame = {
    val dataCols = snapshot.columns.toSeq
    val payload = dataCols.filterNot(_ == keyCol)
    val latest = changes
      .groupBy(col(keyCol))
      .agg(max_by(struct((payload :+ opCol).map(col): _*), col(seqCol))
        .as("_w"))
      .select(col(keyCol) +:
        (payload :+ opCol).map(c => col(s"_w.$c").as(c)): _*)
    val keys0 = latest.select(col(keyCol))
    val keys = if (broadcastChanges) broadcast(keys0) else keys0
    snapshot.join(keys, Seq(keyCol), "left_anti")
      .unionByName(latest.filter(col(opCol) =!= lit("D"))
        .select(dataCols.map(col): _*))
  }

  /** Fold a change batch into a VERSIONED snapshot — the streaming-CDC
    * state step. Unlike [[applyBatch]] (which resolves within the batch
    * and assumes the snapshot is older than every change), the state
    * here carries `seqCol`/`opCol` itself (`seq = 0`, `op = "U"` for
    * never-touched rows; deletes persist as tombstones until
    * [[materialize]]), and each fold keeps the max-seq image per key
    * across state ∪ batch. That makes the fold per-key idempotent
    * (an at-least-once redelivered batch resolves to the same images)
    * and merge-order independent — latest-by-seq over a union is an
    * associative+commutative reduction — so folding ANY split of a
    * change set in ANY batch order reaches exactly the one-shot
    * snapshot (the contract a foreachBatch ingestion loop needs under
    * out-of-order delivery).
    *
    * Scale design: untouched state NEVER shuffles — the batch's key set
    * is broadcast, state splits into a map-side anti join (pass-through)
    * and a semi join (rows to re-resolve, batch-sized), and only that
    * sliver unions with the batch for the per-key `max_by`. Work ∝
    * batch, state size ∝ live keys + tombstones (compact tombstones by
    * age out-of-band). */
  def foldChanges(state: DataFrame, batch: DataFrame, keyCol: String,
      seqCol: String = "seq", opCol: String = "op",
      broadcastBatch: Boolean = true): DataFrame = {
    val resolveCols = state.columns.toSeq.filterNot(_ == keyCol)
    def latest(df: DataFrame) = df.groupBy(col(keyCol))
      .agg(max_by(struct(resolveCols.map(col): _*), col(seqCol)).as("_w"))
      .select(col(keyCol) +: resolveCols.map(c => col(s"_w.$c").as(c)): _*)
    val keys0 = batch.select(col(keyCol)).distinct()
    val keys = if (broadcastBatch) broadcast(keys0) else keys0
    state.join(keys, Seq(keyCol), "left_anti")
      .unionByName(latest(
        state.join(keys, Seq(keyCol), "left_semi")
          .unionByName(batch.select(state.columns.map(col): _*))))
  }

  /** The live view of a [[foldChanges]] state: drop tombstones and the
    * version bookkeeping. */
  def materialize(state: DataFrame, seqCol: String = "seq",
      opCol: String = "op"): DataFrame =
    state.filter(col(opCol) =!= lit("D")).drop(opCol, seqCol)

  /** Collapse a keyed, timestamped attribute track into SCD-2 validity
    * intervals: one row per run of consecutive equal `attrCol` values,
    * `[valid_from, valid_to)` half-open, `valid_to` NULL (and
    * `is_current` true) on each key's last run.
    *
    * Row order within a key is `(tsCol, tieCol)` — `tieCol` must make
    * the order total (a unique event id); `attrCol` must be non-null.
    *
    * Scale design: one window pass partitioned by key (the
    * change-marker lag and the running island sum share a single
    * ordered window), a hash aggregate per island, and a second
    * (island-count-sized) window for the interval chaining — no
    * self-joins, no driver state. Skewed keys are bounded by per-key
    * history length, not table size. */
  def scd2Intervals(rows: DataFrame, keyCol: String, attrCol: String,
      tsCol: String, tieCol: String): DataFrame = {
    val wOrd = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col(tieCol))
    val marked = rows.withColumn("_chg",
      when(lag(col(attrCol), 1).over(wOrd).isNull ||
        lag(col(attrCol), 1).over(wOrd) =!= col(attrCol), lit(1L))
        .otherwise(lit(0L)))
    val islands = marked.withColumn("_island",
      sum(col("_chg")).over(
        wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val runs = islands.groupBy(col(keyCol), col("_island"))
      .agg(min(col(attrCol)).as(attrCol), // constant within a run
        min(col(tsCol)).as("valid_from"))
    val wRun = Window.partitionBy(col(keyCol)).orderBy(col("_island"))
    runs
      .withColumn("valid_to", lead(col("valid_from"), 1).over(wRun))
      .withColumn("is_current", col("valid_to").isNull)
      .drop("_island")
  }

  /** Apply a change batch to an EXISTING SCD-2 interval table — the
    * incremental form of [[scd2Intervals]] (r10 missing item #3): close
    * each touched key's open run where the batch changes its attribute,
    * append the new runs, and leave every untouched key's history
    * UNREAD (it passes through a broadcast anti-join — work ∝ batch,
    * the same contract [[applyBatch]]/`appendIvf` honor, vs. the
    * truncate-and-reload the reference's refresh does,
    * `nl_targeting_save.py:52-66`).
    *
    * Mechanism: each touched key's existing intervals are re-expressed
    * as their HEAD rows (`ts = valid_from`, tie = a head-marker struct
    * that sorts before every batch tie of any type — within
    * a run every source row shares the attribute, so the head row alone
    * re-derives the same interval), unioned with the key's change rows,
    * and re-run through [[scd2Intervals]]. Touched-key work is bounded
    * by that key's RUN COUNT plus its batch rows — never the table.
    *
    * CONTRACT (spec-pinned): change rows must be at-or-after their
    * key's latest recorded change point (`tsCol` ≥ the key's max
    * `valid_from`; ties broken by `tieCol` > the sentinel) — the
    * append-only CDC regime. Under it, `scd2Apply(existing, batch)`
    * equals the full [[scd2Intervals]] rebuild over (original rows ∪
    * batch) exactly, and re-applying the same batch is a no-op
    * (idempotent — at-least-once delivery safe). A change that rewrites
    * PAST history needs the full rebuild: closed runs have collapsed
    * their source rows, so an out-of-order insert cannot re-split them.
    * `existing` must also have strictly increasing `valid_from` per key
    * (automatic when source timestamps are unique per key) — head rows
    * inherit their interval's `valid_from` as the sort key, so two
    * same-instant runs would lose their relative order.
    *
    * @param existing [[scd2Intervals]]-shaped table:
    *                 (key, attr, valid_from, valid_to, is_current)
    * @param changes  change rows: (key, attr, ts, tie) */
  def scd2Apply(existing: DataFrame, changes: DataFrame, keyCol: String,
      attrCol: String, tsCol: String, tieCol: String,
      broadcastBatch: Boolean = true): DataFrame = {
    val keys0 = changes.select(col(keyCol)).distinct()
    val keys = if (broadcastBatch) broadcast(keys0) else keys0
    val untouched = existing.join(keys, Seq(keyCol), "left_anti")
    val tieType = changes.schema(changes.schema.fieldIndex(tieCol)).dataType
    // Head rows must sort strictly BEFORE any batch change sharing their
    // valid_from, for ANY tie type — a typed "minimum value" sentinel
    // only exists for LongType (an IntegerType cast wraps, a StringType
    // render is not lexicographically minimal). The rebuild therefore
    // orders on a (head-marker, tie) struct: 0 for head rows, 1 for
    // batch rows; struct ordering resolves on the marker first, so the
    // original tie only breaks ties AMONG batch rows, where it is valid.
    val touchedHeads = existing.join(keys, Seq(keyCol), "left_semi")
      .select(col(keyCol), col(attrCol),
        col("valid_from").as(tsCol),
        struct(lit(0).as("_head"),
          lit(null).cast(tieType).as("_tie")).as(tieCol))
    val batchRows = changes.select(col(keyCol), col(attrCol), col(tsCol),
      struct(lit(1).as("_head"), col(tieCol).as("_tie")).as(tieCol))
    val rebuilt = scd2Intervals(touchedHeads.unionByName(batchRows),
      keyCol, attrCol, tsCol, tieCol)
    untouched.unionByName(rebuilt)
  }
}
