package graft

/** Meta-query template compiler (F5,
  * `/root/reference/camp_vec_rcmn.py:240-283`).
  *
  * The reference stores parameterized SQL templates in a metadata table and
  * re-instantiates them per campaign: strip block comments, replace the
  * `@@SELECT_STRING@@` placeholder with the audience key, rewrite each
  * `[ column ::op:: keyword ]` parameter block using the harvested
  * condition (operator token → `IN` / `=` / `BETWEEN` / comparison), drop
  * unused blocks and leftover `@@…@@` placeholders.
  *
  * Driver-side string work, deliberately NOT a relational operator (SURVEY
  * §2.8 F5): templates are few and tiny; the *result* runs distributed via
  * `spark.sql`.
  */
object TemplateSql {

  sealed trait CondValue
  final case class InList(values: Seq[String]) extends CondValue
  final case class Equal(value: String) extends CondValue
  final case class Between(lo: String, hi: String) extends CondValue
  final case class Compare(op: String, value: String) extends CondValue // >, >=, <, <=

  private val CommentRe = "(?s)/\\*.*?\\*/".r
  private val BlockRe = "\\[([^\\]]*)\\]".r
  private val PlaceholderRe = "@@[A-Za-z0-9_]+@@".r

  private def sq(s: String): String = "'" + s.replace("'", "''") + "'"

  private def renderCond(column: String, v: CondValue): String = v match {
    case InList(vs) => s"$column IN (${vs.map(sq).mkString(", ")})"
    case Equal(value) => s"$column = ${sq(value)}"
    case Between(lo, hi) => s"$column BETWEEN $lo AND $hi"
    case Compare(op, value) => s"$column $op $value"
  }

  /** Compile one template against the harvested conditions.
    *
    * @param template   SQL text with `/*…*/` comments, `@@SELECT_STRING@@`,
    *                   and `[ column ::op:: keyword ]` parameter blocks
    * @param selectExpr what `@@SELECT_STRING@@` becomes (e.g. "cust_id")
    * @param conds      keyword → condition; blocks whose keyword is absent
    *                   collapse to `1=1` (the reference drops the block,
    *                   camp_vec_rcmn.py:258-261)
    */
  def compile(template: String, selectExpr: String,
      conds: Map[String, CondValue]): String = {
    val noComments = CommentRe.replaceAllIn(template, " ")
    val withBlocks = BlockRe.replaceAllIn(noComments, m => {
      val inner = m.group(1).trim
      inner.split("::op::").map(_.trim) match {
        case Array(column, keyword) =>
          conds.get(keyword) match {
            case Some(v) => java.util.regex.Matcher.quoteReplacement(renderCond(column, v))
            case None => "1=1"
          }
        // Only `[ col ::op:: kwd ]` is a parameter block. Any other
        // bracketed text — e.g. a MySQL-dialect `LIKE '[AI]%'`, where
        // brackets are LITERAL characters (unlike MSSQL's character
        // class, SURVEY P5) — passes through untouched.
        case _ => java.util.regex.Matcher.quoteReplacement(m.group(0))
      }
    })
    val selected = withBlocks.replace("@@SELECT_STRING@@", selectExpr)
    PlaceholderRe.replaceAllIn(selected, "1=1")
      .replaceAll("\\s+", " ").trim
  }
}
