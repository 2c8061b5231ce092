package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance — the materialized-view refresh
  * contract: a grouped statistics table is kept fresh by merging the
  * aggregate of ONLY the new batch into the stored state, never
  * re-reading the corpus (the lexical/ANN ingestion-append contract,
  * aggregation edition).
  *
  * Works for any commutative-monoid statistics (counts, sums): merge =
  * union + re-sum, so `merge(stats(A), stats(B)) == stats(A ∪ B)`
  * exactly, and merging is associative — batches can land in any
  * grouping. At 100 TB the stored state is keyed-small (groups, not
  * rows); each refresh costs one pass over the batch plus a
  * state-size shuffle. */
object IncrementalAgg {

  /** Per-(lang, source) corpus statistics: document count and exact
    * whitespace-token count — the unit of a training-mix budget
    * ([[TextAnalysis]] mixing recipes consume per-source totals). */
  def corpusStats(docs: DataFrame): DataFrame =
    docs.groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(TextAnalysis.tokens(col("text"))).cast("long"))
          .as("n_tokens"))

  /** Merge two stats relations (state + batch): union + re-sum. */
  def mergeStats(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b)
      .groupBy(col("lang"), col("source"))
      .agg(sum(col("n_docs")).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"))

  /** Generic monoid merge: union + re-sum `sumCols` keyed by `keys` —
    * [[mergeStats]] for any maintained aggregate. Decimal sum columns
    * stay decimal through the merge (exact, associative); cast to
    * double only at the final read. */
  def merge(a: DataFrame, b: DataFrame, keys: Seq[String],
      sumCols: Seq[String]): DataFrame =
    a.unionByName(b)
      .groupBy(keys.map(col): _*)
      .agg(sum(col(sumCols.head)).as(sumCols.head),
        sumCols.tail.map(c => sum(col(c)).as(c)): _*)

  /** Aggregate-over-JOIN view: per-nation item count and decimal revenue
    * from lineitem ⋈ supplier ⋈ nation — the materialized join-view
    * whose incremental refresh is `merge(view(base), view(Δlineitem))`.
    * The fact-side delta never re-reads the base corpus: the dimensions
    * BROADCAST (they are catalog-small at any scale), so the delta
    * refresh is one pass over the batch with map-side partial
    * aggregation — `Δview = γ(Δfact ⋈ dims)`, the classic
    * delta-propagation rule for an SPJ+γ view where only the fact side
    * changes. Revenue is kept as an exact decimal so the merge is
    * associative bit-for-bit (a double partial would re-associate). */
  def revenueView(lineitem: DataFrame, supplier: DataFrame,
      nation: DataFrame): DataFrame =
    lineitem
      .join(broadcast(supplier.select(col("s_suppkey"), col("s_nationkey"))),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nation.select(col("n_nationkey"), col("n_name"))),
        col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n_items"),
        sum(col("l_extendedprice").cast("decimal(18,2)") *
          (lit(1.0) - col("l_discount")).cast("decimal(4,2)"))
          .as("revenue"))
}
