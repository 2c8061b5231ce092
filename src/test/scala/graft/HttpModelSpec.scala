package graft

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.atomic.AtomicInteger

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[HttpEmbedder]] / [[HttpLlm]] against an in-process
  * `com.sun.net.httpserver` on an ephemeral localhost port — no network
  * egress, no credentials; the server speaks the same OpenAI-compatible
  * JSON shape the clients target. */
class HttpModelSpec extends AnyFunSuite {
  import HttpModel.mapper

  private val Dim = 8

  /** Server-side twin of the deterministic embedding the tests expect:
    * component i = murmur3(text, i) scaled to [-1, 1) — same formula as
    * [[StubEmbedder]] so expectations are easy to state. */
  private def serverEmbed(text: String): Array[Float] =
    new StubEmbedder(Dim).embed(text)

  private def readBody(ex: HttpExchange): String =
    new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)

  private def respond(ex: HttpExchange, code: Int, body: String,
      headers: Map[String, String] = Map.empty): Unit = {
    headers.foreach { case (k, v) => ex.getResponseHeaders.add(k, v) }
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.sendResponseHeaders(code, bytes.length.toLong)
    ex.getResponseBody.write(bytes)
    ex.close()
  }

  /** Embeddings handler: validates auth + shape, answers with the data
    * array REVERSED (indexes still correct) to prove the client re-sorts
    * by index rather than trusting arrival order. */
  private def embeddingsJson(body: String): String = {
    val req = mapper.readTree(body)
    val texts = (0 until req.get("input").size)
      .map(i => req.get("input").get(i).asText)
    val root = mapper.createObjectNode()
    val data = root.putArray("data")
    texts.zipWithIndex.reverse.foreach { case (t, i) =>
      val entry = data.addObject()
      entry.put("index", i)
      val emb = entry.putArray("embedding")
      serverEmbed(t).foreach(emb.add)
    }
    mapper.writeValueAsString(root)
  }

  /** Starts a server, runs `f(port)`, tears down. */
  private def withServer(handler: HttpExchange => Unit)(f: Int => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", (ex: HttpExchange) => handler(ex))
    server.start()
    try f(server.getAddress.getPort)
    finally server.stop(0)
  }

  /** maxRetries=2 embedder with no-op sleep so backoff costs no wall time. */
  private def embedder(port: Int, retries: Int = 2): HttpEmbedder =
    new HttpEmbedder(s"http://127.0.0.1:$port/v1/embeddings", "test-model",
        "test-key", Dim, maxRetries = retries) {
      override protected def sleep(ms: Long): Unit = ()
    }

  test("embedBatch round-trips and re-sorts by index (server replies " +
      "reversed); bearer auth header is sent") {
    val sawAuth = new java.util.concurrent.atomic.AtomicReference[String]("")
    withServer { ex =>
      sawAuth.set(ex.getRequestHeaders.getFirst("Authorization"))
      respond(ex, 200, embeddingsJson(readBody(ex)))
    } { port =>
      val texts = Seq("alpha", "beta", "gamma", "delta")
      val got = embedder(port).embedBatch(texts)
      assert(got.size == texts.size)
      texts.zipWithIndex.foreach { case (t, i) =>
        assert(got(i).sameElements(serverEmbed(t)), s"row $i ($t) misaligned")
      }
      assert(sawAuth.get == "Bearer test-key")
    }
  }

  test("429 with Retry-After then 500 then success: retries succeed and " +
      "every attempt reached the server") {
    val hits = new AtomicInteger(0)
    withServer { ex =>
      val body = readBody(ex)
      hits.incrementAndGet() match {
        case 1 => respond(ex, 429, """{"error":"rate limited"}""",
          Map("Retry-After" -> "0"))
        case 2 => respond(ex, 500, """{"error":"transient"}""")
        case _ => respond(ex, 200, embeddingsJson(body))
      }
    } { port =>
      val got = embedder(port).embedBatch(Seq("x"))
      assert(got.head.sameElements(serverEmbed("x")))
      assert(hits.get == 3)
    }
  }

  test("non-retryable 400 fails fast on the first attempt") {
    val hits = new AtomicInteger(0)
    withServer { ex =>
      hits.incrementAndGet()
      respond(ex, 400, """{"error":"bad request"}""")
    } { port =>
      val e = intercept[java.io.IOException](embedder(port).embed("x"))
      assert(e.getMessage.contains("HTTP 400"))
      assert(hits.get == 1, "400 must not be retried")
    }
  }

  test("persistent 503 exhausts maxRetries then raises with the last error") {
    val hits = new AtomicInteger(0)
    withServer { ex =>
      hits.incrementAndGet()
      respond(ex, 503, """{"error":"down"}""")
    } { port =>
      val e = intercept[java.io.IOException](
        embedder(port, retries = 2).embed("x"))
      assert(e.getMessage.contains("3 attempts") &&
        e.getMessage.contains("HTTP 503"))
      assert(hits.get == 3)
    }
  }

  test("embedPartitions drives the HTTP embedder from executors: batched " +
      "requests, row-aligned vectors over a real DataFrame") {
    val spark = TestSpark.spark
    val requests = new AtomicInteger(0)
    val rowsSeen = new AtomicInteger(0)
    withServer { ex =>
      val body = readBody(ex)
      requests.incrementAndGet()
      rowsSeen.addAndGet(mapper.readTree(body).get("input").size)
      respond(ex, 200, embeddingsJson(body))
    } { port =>
      val docs = Tables.load(spark, TestSpark.sfDir, "documents")
        .select(col("doc_id"), col("text")).limit(40)
      val out = Embeddings.embedPartitions(docs, embedder(port),
          "text", "vec", batchSize = 16)
        .collect()
      assert(out.length == 40)
      out.foreach { r =>
        val want = serverEmbed(r.getString(1))
        assert(r.getSeq[Float](2).toArray.sameElements(want),
          s"doc ${r.getLong(0)}: vector not aligned with its text")
      }
      assert(rowsSeen.get == 40)
      // batched transport: far fewer requests than rows
      assert(requests.get <= 8, s"expected batched calls, saw ${requests.get}")
    }
  }

  test("HttpLlm: chat round-trip parses choices[0].message.content and " +
      "sends model/temperature/messages") {
    withServer { ex =>
      val req = mapper.readTree(readBody(ex))
      assert(req.get("model").asText == "test-model")
      assert(req.get("temperature").asDouble == 0.0)
      val msgs = req.get("messages")
      assert(msgs.get(0).get("role").asText == "system")
      assert(msgs.get(1).get("role").asText == "user")
      val root = mapper.createObjectNode()
      val choice = root.putArray("choices").addObject()
      val msg = choice.putObject("message")
      msg.put("role", "assistant")
      msg.put("content",
        s"echo:${msgs.get(0).get("content").asText}|" +
          msgs.get(1).get("content").asText)
      respond(ex, 200, mapper.writeValueAsString(root))
    } { port =>
      val llm = new HttpLlm(s"http://127.0.0.1:$port/v1/chat/completions",
        "test-model", "test-key")
      assert(llm.complete("sys", "usr") == "echo:sys|usr")
    }
  }

  test("HttpLlm behind the StubLlm call-site contract: a server speaking " +
      "the stub grammar yields the same pipeline inputs as StubLlm") {
    val stub = new StubLlm
    withServer { ex =>
      val req = mapper.readTree(readBody(ex))
      val sys = req.get("messages").get(0).get("content").asText
      val usr = req.get("messages").get(1).get("content").asText
      val root = mapper.createObjectNode()
      root.putArray("choices").addObject().putObject("message")
        .put("content", stub.complete(sys, usr))
      respond(ex, 200, mapper.writeValueAsString(root))
    } { port =>
      val llm = new HttpLlm(s"http://127.0.0.1:$port/v1/chat/completions",
        "test-model", "")
      val sys = "다음 요청에서 키워드를 추출하라"
      val usr = "구매금액이 100만원 이상 인 고객"
      assert(llm.complete(sys, usr) == stub.complete(sys, usr))
    }
  }
}
