package graft

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, FloatType, StructField, StructType}

/** The external-model boundary.
  *
  * The reference makes row-at-a-time network calls: five LLM chat sites and
  * one embedding site (`sru.request_embedding`,
  * `/root/reference/nl_targeting.py:33-41,54`,
  * `/root/reference/camp_vec_rcmn.py:30-43`,
  * `/root/reference/nl_targeting_save.py:122-132`,
  * `/root/reference/camp_vec_save.py:56`). We re-express that as:
  *
  *  - [[Embeddings.embedCol]] — a deterministic, fully-distributed stub
  *    embedder as a codegen'd column expression (xxhash64-seeded values in
  *    [-1, 1]). This is what tests and fixtures use; it never leaves the JVM.
  *  - [[Embeddings.embedPartitions]] — the production shape: batched
  *    `mapPartitions` calls through an [[Embedder]] (HTTP in prod, stub in
  *    tests). One connection per partition, vectorized batches — never the
  *    reference's per-row driver loop (`/root/reference/camp_vec_save.py:49-56`).
  *  - [[LlmClient]] — chat boundary; [[StubLlm]] gives deterministic
  *    query expansion / paraphrase / triple extraction so pipeline parity
  *    tests are stable across runs and partitions (SURVEY §7.4).
  */
trait Embedder extends Serializable {
  def dim: Int
  def embed(text: String): Array[Float]
  /** Batch hook — a real HTTP embedder overrides this to amortize calls. */
  def embedBatch(texts: Seq[String]): Seq[Array[Float]] = texts.map(embed)
}

/** Deterministic hash-based embedder (JVM-side twin of
  * [[Embeddings.embedCol]]'s semantics, same distribution, not bitwise
  * identical — pipelines must pick one form and stick with it). */
class StubEmbedder(val dim: Int = 64) extends Embedder {
  def embed(text: String): Array[Float] = {
    val out = new Array[Float](dim)
    var i = 0
    while (i < dim) {
      val h = scala.util.hashing.MurmurHash3.stringHash(text, i)
      out(i) = ((h & 0x7fffffff) % 1000) / 500.0f - 1.0f
      i += 1
    }
    out
  }
}

trait LlmClient extends Serializable {
  def complete(system: String, user: String): String
}

/** Deterministic stand-ins for the five chat call sites. Output grammar
  * mirrors the reference contracts (`!!!!`-separated lists,
  * `/root/reference/camp_vec_rcmn.py:17`, `/root/reference/nl_targeting_save.py:104`;
  * L2 value→operator prompts, `/root/reference/nl_targeting.py:64-68`). */
class StubLlm extends LlmClient {
  def complete(system: String, user: String): String = system match {
    case s if s.contains("키워드를 추출") => // L1: request → targeting triples
      TripleExtract.bracketFormat(user)
    case s if s.contains("expand") => // L5: 5 query expansions
      (1 to 5).map(i => s"$user 확장$i").mkString("!!!!")
    case s if s.contains("paraphrase") => // L4: 3 NL paraphrases
      (1 to 3).map(i => s"$user 표현$i").mkString("!!!!")
    case s if s.contains("숫자를 operator") => ValueNorm.integer(user) // L2
    case s if s.contains("날짜를 operator") => ValueNorm.date(user)    // L2
    case s if s.contains("맞는조건들만") => // L3 keep-matching filter
      // deterministic stub: keep every condition — extract the Condition
      // part of "Request : … Conditiion : {…}" verbatim (the reference's
      // temperature-0.7 call prunes non-matching entries;
      // /root/reference/nl_targeting.py:89-97 merges whatever comes back,
      // so keep-all is the neutral deterministic refinement)
      user.split("Conditiion : ").last
    case _ => user
  }
}

/** JVM twin of [[graft.operators.NlTargeting.extractTriples]]'s stub L1
  * grammar (spec-checked equal) — the triple-extraction form [[StubLlm]]
  * serves at the chat boundary. Output follows the reference's L1 contract
  * (`/root/reference/nl_targeting.py:8-27`): the bracket list
  * `[{속성:a,논리:p,값:v},…]`, one entry per recognized
  * `<attr>이/가 <value>` clause, polarity 부정 when the clause carries an
  * 아닌 marker, and spaces inside values replaced with `_` (output rule 4). */
object TripleExtract {
  /** The deterministic attribute lexicon of the stub — the fixture's four
    * condition names (a production LLM extracts attributes freely; the
    * stub recognizes exactly the conditions the fixture index carries). */
  val DefaultAttrs: Seq[String] =
    Seq("세그먼트", "우선순위", "구매금액", "주문일자")

  def bracketFormat(request: String,
      attrs: Seq[String] = DefaultAttrs): String = {
    val p = graft.operators.NlTargeting.triplePattern(attrs).r
    val entries = p.findAllMatchIn(request).map { m =>
      val value = m.group(2) +
        (if (m.group(3) != null) " " + m.group(3)
         else if (m.group(4) != null) " ~ " + m.group(4)
         else "")
      val polarity = if (m.group(5) != null) "부정" else "긍정"
      s"{속성:${m.group(1)},논리:$polarity,값:${value.replace(' ', '_')}}"
    }
    entries.mkString("[", ",", "]")
  }
}

/** JVM twin of [[graft.operators.NlTargeting.normalizeValue]]'s stub L2
  * grammar (spec-checked equal) — the form [[StubLlm]] serves at the chat
  * boundary. See normalizeValue's scaladoc for the grammar. */
object ValueNorm {
  private val IntOne = "^([0-9]+)(만)?원?\\s*(이상|이하|초과|미만|넘는)?$".r
  private val IntBtw = "^([0-9]+)(만)?원?\\s*(?:~|부터)\\s*([0-9]+)(만)?원?(?:\\s*까지)?$".r
  private val DateLike = "^(19|20)[0-9]{6}$".r
  private val DateOne = "^([0-9]{8})\\s*(이후|이전)?$".r
  private val DateBtw = "^([0-9]{8})\\s*(?:~|부터)\\s*([0-9]{8})(?:\\s*까지)?$".r

  private def clean(raw: String): String = raw.replace(",", "").trim
  private def amt(n: String, man: String): Long =
    n.toLong * (if (man == "만") 10000L else 1L)

  def integer(raw: String): String = clean(raw) match {
    case DateLike(_*) => ""
    case IntBtw(a, am, b, bm) => s"BETWEEN ${amt(a, am)} AND ${amt(b, bm)}"
    case IntOne(n, man, op) =>
      val o = op match {
        case "이상" => ">="; case "이하" => "<="
        case "초과" | "넘는" => ">"; case "미만" => "<"
        case _ => "="
      }
      s"$o${amt(n, man)}"
    case _ => ""
  }

  def date(raw: String): String = clean(raw) match {
    case DateBtw(a, b) => s"BETWEEN $a AND $b"
    case DateOne(d, op) =>
      val o = op match { case "이후" => ">="; case "이전" => "<="; case _ => "=" }
      s"$o$d"
    case _ => ""
  }
}

object Embeddings {

  /** Stub embedding as a native column expression: dim deterministic floats
    * in [-1, 1) — element i = (first 8 hex chars of md5("i:text") as an
    * integer) mod 1000, scaled. Distributed, codegen'd, no shuffle, no
    * network — the fixture convention for index builds.
    *
    * md5 (not xxhash64) so the DuckDB oracle reproduces every vector
    * bit-for-bit: `(('0x' || substr(md5(i || ':' || text), 1, 8))::BIGINT
    * % 1000 / 500.0 - 1.0)::FLOAT` — double math then one float32
    * rounding, identical in both engines. */
  def embedCol(text: Column, dim: Int = 64): Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      graft.functions.Md5Embed(
        org.apache.spark.sql.GraftSqlBridge.expression(text), dim))

  /** Higher-order-function twin of [[embedCol]] (spec-checked equal) —
    * the executable specification of the codegen expression's md5 math,
    * and the form the DuckDB oracle twin (`embSql`) mirrors. Kept out of
    * hot paths: it runs interpreted, re-serializing the full text per
    * dimension (~4 s of the 6 s campaign-index query at sf0.1). */
  def embedColHof(text: Column, dim: Int = 64): Column =
    transform(
      sequence(lit(0), lit(dim - 1)),
      i => (pmod(conv(substring(
            md5(concat(i.cast("string"), lit(":"), text)), 1, 8), 16, 10)
          .cast("long"), lit(1000)).cast("double") / 500.0 - 1.0)
        .cast("float"))

  /** Production-shaped embedding: batched mapPartitions through an
    * [[Embedder]]. Appends `outCol: array<float>` after `textCol`. */
  def embedPartitions(df: DataFrame, embedder: Embedder,
      textCol: String, outCol: String, batchSize: Int = 256): DataFrame = {
    val schema = StructType(df.schema.fields :+
      StructField(outCol, ArrayType(FloatType, containsNull = false)))
    val textIdx = df.schema.fieldIndex(textCol)
    val rdd = df.rdd.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        val vecs = embedder.embedBatch(batch.map(_.getString(textIdx)))
        batch.lazyZip(vecs).map { (r, v) => Row.fromSeq(r.toSeq :+ v.toSeq) }
      }
    }
    df.sparkSession.createDataFrame(rdd, schema)
  }
}
