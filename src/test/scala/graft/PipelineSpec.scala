package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators._

class PipelineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("E2 NL targeting: polarity subtraction removes negated codes") {
    val triples = Seq(
      ("세그먼트", "긍정", "BUILDING"),
      ("세그먼트", "긍정", "MACHINERY"),
      ("세그먼트", "부정", "BUILDING"),
      ("우선순위", "긍정", "1-URGENT")).toDF("attr", "polarity", "value")
    val out = NlTargeting.targetCodes(triples,
        IndexBuild.conditionIndex(spark, TestSpark.sfDir), floor = 0.99)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getSeq[String](2).toList))
      .toSet
    assert(out == Set(
      ("세그먼트", "긍정", List("MACHINERY")),
      ("세그먼트", "부정", List("BUILDING")),
      ("우선순위", "긍정", List("1-URGENT"))))
  }

  test("embedCol matches the md5 reference values (DuckDB-reproducible)") {
    // expected values computed independently: int(md5("i:text")[:8], 16)
    // % 1000 / 500 - 1, rounded to float32
    val got = Seq(("hello", 0), ("세그먼트:BUILDING", 1)).toDF("t", "i")
      .select(col("t"), Embeddings.embedCol(col("t"), 4).as("v"))
      .collect().map(r => r.getString(0) -> r.getSeq[Float](1)).toMap
    assert(got("hello") == Seq(0.398f, 0.704f, -0.028f, 0.646f))
    assert(got("세그먼트:BUILDING") == Seq(0.748f, 0.65f, 0.616f, -0.122f))
  }

  test("L2 value normalization: column grammar, and StubLlm boundary agrees") {
    val cases = Seq(
      ("100만원 이상", "integer", ">=1000000"),
      ("1,000,000 이상", "integer", ">=1000000"),
      ("50만 초과", "integer", ">500000"),
      ("300 넘는", "integer", ">300"),
      ("42만원", "integer", "=420000"),
      ("10만 미만", "integer", "<100000"),
      ("5000 이하", "integer", "<=5000"),
      ("30만 부터 100만 까지", "integer", "BETWEEN 300000 AND 1000000"),
      ("500~900", "integer", "BETWEEN 500 AND 900"),
      ("19950101", "integer", ""),          // date masquerading as amount
      ("대충 많이", "integer", ""),            // unparseable
      ("19950101", "datePopup", "=19950101"),
      ("19950101 이후", "datePopup", ">=19950101"),
      ("19961231 이전", "datePopup", "<=19961231"),
      ("19950101 ~ 19961231", "datePopup", "BETWEEN 19950101 AND 19961231"),
      ("19950101 부터 19961231 까지", "datePopup", "BETWEEN 19950101 AND 19961231"),
      ("다음주", "datePopup", ""))           // unparseable
    val got = cases.map { case (v, t, _) => (v, t) }.toDF("v", "t")
      .select(col("v"), col("t"),
        NlTargeting.normalizeValue(col("v"), col("t")).as("norm"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getString(2)).toMap
    val llm = new StubLlm()
    cases.foreach { case (v, t, expect) =>
      assert(got((v, t)) == expect, s"column form: $v [$t]")
      val prompt = if (t == "integer") "아래 값 숫자를 operator로 표시해줘"
        else "아래 값 날짜를 operator로 표시해줘"
      assert(llm.complete(prompt, v) == expect, s"stub-llm form: $v [$t]")
    }
  }

  test("L3 keep-filter stub returns the condition dict verbatim") {
    val llm = new StubLlm()
    val cond = """{'세그먼트:긍정': ['BUILDING', 'MACHINERY']}"""
    val out = llm.complete(
      "Condition에서 Request에 맞는조건들만 남겨줘. …",
      s"Request : 세그먼트이(가) BUILDING 인것 찾아줘. Conditiion : $cond")
    assert(out == cond)
  }

  test("E2 value route: free-text amounts/dates become operator codes") {
    val triples = Seq(
      ("구매금액", "긍정", "100만원 이상"),
      ("구매금액", "긍정", "19950101"), // scrubbed: date on an integer cond
      ("주문일자", "긍정", "19950101 ~ 19961231"),
      ("주문일자", "부정", "19970615 이후")).toDF("attr", "polarity", "value")
    val out = NlTargeting.targetCodes(triples,
        IndexBuild.conditionIndex(spark, TestSpark.sfDir), floor = 0.99)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getSeq[String](2).toList))
      .toSet
    assert(out == Set(
      ("구매금액", "긍정", List(">=1000000")),
      ("주문일자", "긍정", List("BETWEEN 19950101 AND 19961231")),
      ("주문일자", "부정", List(">=19970615"))))
  }

  test("E1 audience count is positive and stable across runs") {
    val a = CampaignRecommend.audienceCount(spark, TestSpark.sfDir).head.getLong(0)
    val b = CampaignRecommend.audienceCount(spark, TestSpark.sfDir).head.getLong(0)
    assert(a == b && a > 0)
  }

  test("E3 campaign index: only [AI] campaigns, 64-dim vectors, deterministic") {
    val ix = IndexBuild.campaignIndex(spark, TestSpark.sfDir).cache()
    val n = ix.count()
    assert(n > 0)
    assert(ix.filter(!col("camp_sentence").contains("[AI]")).count() == 0)
    assert(ix.filter(size(col("camp_vec")) =!= 64).count() == 0)
    // determinism across evaluations (embedCol is pure)
    val v1 = ix.orderBy("camp_id").head.getSeq[Float](2)
    val v2 = IndexBuild.campaignIndex(spark, TestSpark.sfDir)
      .orderBy("camp_id").head.getSeq[Float](2)
    assert(v1 == v2)
  }

  test("Knn.topK returns the exact brute-force neighbors") {
    val e = Tables.load(spark, TestSpark.sfDir, "embeddings")
    val q = e.filter(col("vec_id") === 7).select(col("embedding").as("qvec"))
    val got = Knn.topK(e.filter(col("vec_id") =!= 7), q, 5)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    // brute force on the driver
    val all = e.collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val qv = all.find(_._1 == 7L).get._2
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { d += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i) }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val expect = all.filter(_._1 != 7L)
      .map { case (id, v) => (id, cos(v, qv)) }
      .sortBy { case (id, s) => (-s, id) }.take(5)
    assert(got.map(_._1).toSeq == expect.map(_._1).toSeq)
    got.zip(expect).foreach { case ((_, a), (_, b)) => assert(math.abs(a - b) < 1e-12) }
  }

  test("production-shaped mapPartitions embedder keeps schema and determinism") {
    val docs = Tables.load(spark, TestSpark.sfDir, "documents").limit(50)
    val out = Embeddings.embedPartitions(docs, new StubEmbedder(16), "text", "vec")
    assert(out.schema.fieldNames.last == "vec")
    val rows = out.select("doc_id", "vec").collect()
    assert(rows.length == 50 && rows.forall(_.getSeq[Float](1).length == 16))
    val again = Embeddings.embedPartitions(docs, new StubEmbedder(16), "text", "vec")
      .select("doc_id", "vec").collect()
    assert(rows.map(r => (r.getLong(0), r.getSeq[Float](1))).toMap ==
      again.map(r => (r.getLong(0), r.getSeq[Float](1))).toMap)
  }

  test("L1 triple extraction: clause grammar covers code, amount-particle, " +
      "negation, and date-range forms") {
    val req = "세그먼트가 BUILDING 인 고객 중 구매금액이 100만원 넘는 사람들, " +
      "우선순위가 1-URGENT 이 아닌, 주문일자가 19950101 부터 19961231 까지 인 " +
      "고객 찾아줘"
    val got = NlTargeting.extractTriples(
        spark.createDataFrame(Seq(Tuple1(req))).toDF("req"), "req")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(got == Set(
      ("세그먼트", "긍정", "BUILDING"),
      ("구매금액", "긍정", "100만원 넘는"),
      ("우선순위", "부정", "1-URGENT"),
      ("주문일자", "긍정", "19950101 ~ 19961231")))
  }

  test("L1 grammar fuzz: 100 seeded random requests — column extraction, " +
      "chat-boundary round-trip, and the generator's own triples agree") {
    val rnd = new scala.util.Random(42)
    val attrs = TripleExtract.DefaultAttrs
    def clause(): (String, (String, String, String)) = {
      val attr = attrs(rnd.nextInt(attrs.size))
      val (vText, vExpect) = rnd.nextInt(4) match {
        case 0 => val v = s"CODE${rnd.nextInt(99)}"; (v, v)
        case 1 =>
          val n = 1 + rnd.nextInt(900)
          val op = Seq("이상", "이하", "초과", "미만", "넘는")(rnd.nextInt(5))
          (s"${n}만원 $op", s"${n}만원 $op")
        case 2 =>
          val d = 19950000 + rnd.nextInt(9999)
          val op = Seq("", " 이후", " 이전")(rnd.nextInt(3))
          (s"$d$op", s"$d$op".trim)
        case _ =>
          val a = 19950000 + rnd.nextInt(999)
          val b = a + 1 + rnd.nextInt(999)
          (s"$a 부터 $b 까지", s"$a ~ $b")
      }
      val neg = rnd.nextBoolean()
      val marker = if (neg) " 이 아닌" else " 인"
      (s"$attr${if (rnd.nextBoolean()) "이" else "가"} $vText$marker",
        (attr, if (neg) "부정" else "긍정", vExpect))
    }
    val cases = (1 to 100).map { _ =>
      val cs = (0 to rnd.nextInt(3)).map(_ => clause())
      val connectors = Seq(", ", " 고객 중 ", " 그리고 ")
      val req = cs.map(_._1).mkString("", connectors(rnd.nextInt(3)), " 찾아줘")
      (req, cs.map(_._2))
    }
    val expected = cases.flatMap(_._2).sorted
    def collectTriples(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSeq.sorted
    val reqDf = spark.createDataFrame(cases.map(c => Tuple1(c._1))).toDF("req")
    assert(collectTriples(NlTargeting.extractTriples(reqDf, "req")) == expected)
    val llm = new StubLlm()
    val brackets = cases.map(c => Tuple1(llm.complete(NlTargeting.L1Prompt, c._1)))
    assert(collectTriples(NlTargeting.parseTriples(
      spark.createDataFrame(brackets).toDF("x"), "x")) == expected)
  }

  test("L1 chat boundary: StubLlm bracket contract + parseTriples equals " +
      "the direct column extraction") {
    val req = "세그먼트가 MACHINERY 인 고객, 구매금액이 5000 이상, " +
      "주문일자가 19970615 이후 인, 우선순위가 2-HIGH 이 아닌 고객"
    val raw = new StubLlm().complete(NlTargeting.L1Prompt, req)
    // the contract itself: bracket list, _ for spaces, 논리 in {긍정,부정}
    assert(raw.startsWith("[{속성:") && raw.endsWith("}]"))
    assert(raw.contains("값:5000_이상") && raw.contains("논리:부정"))
    val viaChat = NlTargeting.parseTriples(
        spark.createDataFrame(Seq(Tuple1(raw))).toDF("x"), "x")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    val direct = NlTargeting.extractTriples(
        spark.createDataFrame(Seq(Tuple1(req))).toDF("req"), "req")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(viaChat == direct && direct.size == 4)
  }

  test("no headline bench query plans an UNPARTITIONED window " +
      "(single-task global sort) or a NON-BROADCAST cartesian product " +
      "(all-pairs shuffle) — the two shapes that cannot scale out") {
    import org.apache.spark.sql.execution.window.{WindowExec, WindowGroupLimitExec}
    import org.apache.spark.sql.execution.joins.CartesianProductExec
    val qs = SparkEntry.queries
    Bench.headline.filter(qs.contains).foreach { name =>
      val plan = qs(name)(spark, TestSpark.sfDir).queryExecution.sparkPlan
      val bad = plan.collect {
        case w: WindowExec if w.partitionSpec.isEmpty => w.nodeName
        case w: WindowGroupLimitExec if w.partitionSpec.isEmpty => w.nodeName
        // crossJoin(broadcast(...)) plans BroadcastNestedLoopJoin (fine —
        // bounded build side); CartesianProductExec means two LARGE sides
        // met with no join key at all
        case c: CartesianProductExec => c.nodeName
      }
      assert(bad.isEmpty,
        s"$name plans a non-scalable operator (${bad.mkString(",")}) — " +
          "a foldable partition key or keyless join degraded the plan")
    }
  }

  test("heavyHitters: every exact heavy hitter survives with " +
      "in_sketch=true on a skewed stream; light keys are excluded") {
    import spark.implicits._
    // key 1 dominates (60%), key 2 is 20%, the rest are singletons
    val rows = Seq.fill(600)(1L) ++ Seq.fill(200)(2L) ++ (100L until 300L)
    val df = rows.toDF("k")
    val got = Audience.heavyHitters(df, "k", support = 0.1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    // exact hitters above 0.1 * 1000 = 100 rows: keys 1 and 2 only
    assert(got.map(x => (x._1, x._2)).toSet == Set((1L, 600L), (2L, 200L)))
    // the published guarantee: no false negatives
    assert(got.forall(_._3), s"sketch missed a true heavy hitter: $got")
  }
}
