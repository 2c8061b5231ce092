package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Bitext

/** Margin-based bitext mining: brute-force equivalence on a seeded
  * random fixture, the hub-demotion property that motivates the margin
  * (Artetxe & Schwenk 2019), and block confinement. */
class BitextSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("vec", ArrayType(FloatType)),
    StructField("block", IntegerType)))

  private def frame(rows: Seq[(Long, Array[Float], Int)]) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        rows.map { case (i, v, b) => Row(i, v.toSeq, b) }, 3),
      schema)

  private def cos(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) {
      dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
      nb += b(i).toDouble * b(i); i += 1
    }
    if (na == 0 || nb == 0) 0.0 else dot / math.sqrt(na * nb)
  }

  test("minePairs equals a driver-side brute-force margin miner on a " +
      "seeded random fixture (same argmax target, same kept set)") {
    val rnd = new scala.util.Random(7)
    def vec() = Array.fill(8)(rnd.nextGaussian().toFloat)
    val src = (0L until 40L).map(i => (i, vec(), (i % 4).toInt))
    val tgt = (100L until 130L).map(i => (i, vec(), (i % 4).toInt))
    val k = 3
    // brute force: same-block candidates, ratio margin, argmax per src
    val cands = for {
      (si, sv, sb) <- src; (ti, tv, tb) <- tgt if sb == tb
    } yield (si, ti, cos(sv, tv))
    def scaled(c: Double) = math.floor(c * 1e12).toLong
    def avgTop(by: Map[Long, Seq[(Long, Double)]]) = by.map {
      case (id, ns) =>
        val top = ns.sortBy { case (nid, c) => (-c, nid) }.take(k)
        id -> top.map(t => scaled(t._2)).sum.toDouble / (top.size * 1e12)
    }
    val fwd = avgTop(cands.groupBy(_._1).map { case (s, xs) =>
      s -> xs.map(x => (x._2, x._3)).toSeq })
    val bwd = avgTop(cands.groupBy(_._2).map { case (t, xs) =>
      t -> xs.map(x => (x._1, x._3)).toSeq })
    val expected = cands
      .map { case (s, t, c) => (s, t, c, c / ((fwd(s) + bwd(t)) / 2.0)) }
      .groupBy(_._1).values
      .map(_.minBy { case (_, t, _, m) => (-m, t) })
      .filter(_._4 >= 1.0)
      .map { case (s, t, _, m) =>
        (s, t, BigDecimal(m).setScale(6, BigDecimal.RoundingMode.HALF_UP))
      }.toSet
    val got = Bitext.minePairs(frame(src), frame(tgt), "id", "vec",
        "block", k = k, minMargin = 1.0)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        BigDecimal(r.getDouble(3)).setScale(6,
          BigDecimal.RoundingMode.HALF_UP)))
      .toSet
    assert(got == expected,
      s"mined set diverges from brute force:\n got=$got\n exp=$expected")
  }

  test("the ratio margin demotes hubs: a target close to EVERYTHING " +
      "loses to the true pair that plain cosine argmax would miss") {
    // orthogonal-basis construction: srcs are e1..e4; the hub tgt sits
    // at cos 0.5 to EVERY src, the true pair tgt 101 at cos 0.49 to
    // src 0 only — raw cosine argmax for src 0 is the hub (0.5 > 0.49),
    // but the hub's crowded backward neighborhood inflates its margin
    // denominator while tgt 101's (0.49, 0) keeps its margin high
    def e(i: Int, scale: Float = 1f) = {
      val v = Array.fill(6)(0f); v(i) = scale; v
    }
    val srcRows = Seq((0L, e(0), 0), (1L, e(1), 0),
      (2L, e(2), 0), (3L, e(3), 0))
    val t101 = Array.fill(6)(0f)
    t101(0) = 0.49f; t101(4) = math.sqrt(1.0 - 0.49 * 0.49).toFloat
    val tgtRows = Seq(
      (100L, Array(0.5f, 0.5f, 0.5f, 0.5f, 0f, 0f), 0), // the hub
      (101L, t101, 0),
      (102L, e(5), 0))
    // precondition: raw cosine argmax picks the hub for src 0 too
    val rawArgmax = srcRows.map { case (_, sv, _) =>
      tgtRows.maxBy { case (_, tv, _) => cos(sv, tv) }._1 }
    assert(rawArgmax == Seq(100L, 100L, 100L, 100L),
      s"fixture lost hubness: $rawArgmax")
    val mined = Bitext.minePairs(frame(srcRows), frame(tgtRows), "id",
        "vec", "block", k = 2, minMargin = 0.0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(mined(0L) == 101L,
      s"margin should recover the true pair for src 0, got ${mined.get(0L)}")
    // and the hub must not win EVERY src the way raw cosine had it
    assert(mined.values.count(_ == 100L) < rawArgmax.count(_ == 100L),
      s"margin did not demote the hub: $mined vs raw $rawArgmax")
  }

  test("pairs never cross blocks and every src appears at most once") {
    val rnd = new scala.util.Random(11)
    def vec() = Array.fill(6)(rnd.nextGaussian().toFloat)
    val src = (0L until 30L).map(i => (i, vec(), (i % 3).toInt))
    val tgt = (50L until 80L).map(i => (i, vec(), (i % 3).toInt))
    val rows = Bitext.minePairs(frame(src), frame(tgt), "id", "vec",
        "block", k = 2, minMargin = 0.0).collect()
    val srcBlock = src.map(r => r._1 -> r._3).toMap
    val tgtBlock = tgt.map(r => r._1 -> r._3).toMap
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(srcBlock(r.getLong(0)) == tgtBlock(r.getLong(1)),
        s"cross-block pair: $r")
    }
    val ids = rows.map(_.getLong(0))
    assert(ids.distinct.length == ids.length, "duplicate src in output")
  }
}
