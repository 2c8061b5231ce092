package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Pii

/** PII redaction on hand-built text: each pattern, the pass ordering, and
  * the no-PII identity. */
class PiiSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def redact(texts: String*): Seq[String] =
    texts.toDF("text").select(Pii.redact($"text").as("r"))
      .collect().map(_.getString(0)).toSeq

  private def count(text: String): (Int, Int, Int) = {
    val r = Seq(text).toDF("text")
      .select(Pii.counts($"text").map { case (n, c) => c.as(n) }: _*)
      .head()
    (r.getInt(0), r.getInt(1), r.getInt(2))
  }

  test("emails, IPs and phones each redact to their token") {
    assert(redact(
      "mail bob.smith+x@corp.example.org now",
      "server at 192.168.0.1 port 80",
      "call 555-0123 or 555-123-4567 or 010.1234.5678") == Seq(
      "mail [EMAIL] now",
      "server at [IP] port 80",
      "call [PHONE] or [PHONE] or [PHONE]"))
  }

  test("ordering: an IP is not half-eaten by the phone pattern and an " +
      "email's digits are gone before the phone pass") {
    assert(redact("ip 10.20.30.40 mail u555-0123@ex.com") ==
      Seq("ip [IP] mail [EMAIL]"))
  }

  test("counts mirror the redaction passes") {
    assert(count("a@b.co and c@d.org, 1.2.3.4, tel 555-0199") == (2, 1, 1))
    assert(count("no pii here at all") == (0, 0, 0))
  }

  test("text without PII is unchanged") {
    val plain = "the quick brown fox jumps over 42 lazy dogs."
    assert(redact(plain) == Seq(plain))
  }
}
