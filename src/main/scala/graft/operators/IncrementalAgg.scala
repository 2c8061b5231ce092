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
}
