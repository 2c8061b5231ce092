package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Catalog utilities — the re-implementation of the reference's absent
  * `seg_rcmn_utils` metadata helpers (SURVEY §2.11): `table_search`
  * (which table does each column referenced by a SQL template live in),
  * `column_search` (physical columns matching a logical name), and
  * `refine_query` (make stored SQL text runnable). All driven from the
  * registered table schemas — no external metadata store. */
object Catalog {

  /** (table, column) inventory of the fixture tables. */
  def columnInventory(spark: SparkSession, sfDir: String): Seq[(String, String)] =
    Tables.all.flatMap { t =>
      Tables.load(spark, sfDir, t).schema.fieldNames.map(c => (t, c))
    }

  /** `table_search(qry_meta)` (`/root/reference/nl_targeting_save.py:45,59`):
    * map every known column mentioned in the SQL text to its table. */
  def tableSearch(spark: SparkSession, sfDir: String,
      sqlText: String): Map[String, String] = {
    val tokens = sqlText.split("[^A-Za-z0-9_]+").toSet
    columnInventory(spark, sfDir)
      .filter { case (_, c) => tokens.contains(c) }
      .map { case (t, c) => c -> t }
      .toMap // later tables win on ambiguity, like a dict build would
  }

  /** `column_search(name)` (`/root/reference/nl_targeting_save.py:58`):
    * physical columns whose name contains the logical fragment. */
  def columnSearch(spark: SparkSession, sfDir: String,
      fragment: String): Seq[(String, String)] =
    columnInventory(spark, sfDir)
      .filter(_._2.toLowerCase.contains(fragment.toLowerCase))

  /** F15 as a column expression, the reference's driver-side loop form
    * (`/root/reference/nl_targeting_save.py:41,52-56`): split PRMP_STRING
    * on spaces, find the FIRST token in {=, BETWEEN, IN, ::op::}, column
    * name = the tokens strictly between the leading keyword and that
    * operator (`' '.join(tokens[1:j])`). With no operator present the
    * whole PRMP_STRING is returned unchanged — exactly what the
    * reference's loop leaves in `column_name_base` when nothing matches.
    *
    * Deliberate divergence, documented: the reference's loop does not
    * `break`, so the LAST matching token wins — on the common shape
    * `"AND col = ::op::"` (two operator tokens) that yields the nonsense
    * name `"col ="`, which then fails every inventory lookup. First-match
    * is the evident intent and what the stored prompts assume; the
    * divergence is pinned in CatalogSpec. */
  def columnFromPrmp(prmp: Column): Column = {
    val toks = split(prmp, " ")
    def posOf(op: String) =
      when(array_position(toks, op) === 0, lit(Long.MaxValue))
        .otherwise(array_position(toks, op))
    // Clamp BEFORE the arithmetic: with no operator present, the raw
    // Long.MaxValue position would wrap to a negative slice length (or
    // overflow-throw under ANSI). Clamped to size+1, the no-operator case
    // is detectable as j > size (→ full string); an operator in position 1
    // degrades to an empty name (length clamped ≥ 0).
    val j = least(
      least(posOf("="), posOf("BETWEEN"), posOf("IN"), posOf("::op::")),
      size(toks).cast("long") + 1)
    when(j > size(toks), prmp).otherwise(
      concat_ws(" ", slice(toks, lit(2), greatest((j - 2).cast("int"), lit(0)))))
  }

  /** `refine_query(sql)` (`/root/reference/nl_targeting_save.py:75`): make
    * stored dimension SQL executable — strip comments, trailing
    * semicolons, collapse whitespace. */
  def refineQuery(sql: String): String =
    "(?s)/\\*.*?\\*/".r.replaceAllIn(sql, " ")
      .replaceAll("--[^\n]*", " ")
      .replaceAll("\\s+", " ")
      .trim.stripSuffix(";").trim
}
