package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets
import java.time.Duration

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.ObjectNode

/** Production HTTP implementations of the external-model boundary
  * ([[Embedder]] / [[LlmClient]]) speaking the OpenAI-compatible JSON
  * wire shape the reference consumes through its `OpenAI(...)` client
  * (`/root/reference/camp_vec_rcmn.py:30-43`,
  * `/root/reference/nl_targeting.py:33-41`, embeddings via
  * `sru.request_embedding`, `/root/reference/camp_vec_save.py:56`).
  *
  * Design points, all driven by the 100 TB shape:
  *
  *  - '''Batched, not row-at-a-time.''' The reference loops
  *    `request_embedding` per row on a single driver
  *    (`/root/reference/camp_vec_save.py:49-56`). Here the client is the
  *    [[Embedder.embedBatch]] hook behind [[Embeddings.embedPartitions]]:
  *    one HTTP POST per `batchSize` texts, issued inside `mapPartitions`,
  *    so a 1000-executor cluster embeds 1000 partitions concurrently and
  *    the request count drops by the batch factor.
  *  - '''Per-executor connections.''' `HttpClient` is not serializable and
  *    must not ride the task closure — it is `@transient lazy`, so each
  *    executor JVM builds exactly one connection pool on first use.
  *  - '''Retry with backoff.''' 429 and 5xx responses (and transient
  *    connect/timeout IOExceptions) retry up to `maxRetries` times with
  *    exponential backoff; a `Retry-After: <seconds>` header, the standard
  *    rate-limit contract, overrides the computed delay. 4xx other than
  *    429 fails fast — retrying a malformed request only burns quota.
  *  - '''Order by index, not arrival.''' The embeddings response carries
  *    `data[i].index`; the client re-sorts on it, so a server that
  *    returns entries out of order still yields row-aligned vectors.
  *
  * Endpoints and keys are constructor parameters (no environment coupling,
  * no defaults pointing anywhere) — specs run against an in-test
  * `com.sun.net.httpserver` on localhost; production passes its own URL.
  */
object HttpModel {

  private[graft] val mapper = new ObjectMapper()

  /** One POST with retry/backoff. Returns the parsed response body.
    * @param sleeper  injectable for specs (real sleep in production) */
  private[graft] def postJson(client: HttpClient, url: String,
      apiKey: String, body: ObjectNode, timeout: Duration, maxRetries: Int,
      baseBackoffMs: Long, sleeper: Long => Unit): JsonNode = {
    val payload = mapper.writeValueAsBytes(body)
    var attempt = 0
    var lastErr: String = ""
    while (attempt <= maxRetries) {
      val delayMs: Option[Long] =
        try {
          val b = HttpRequest.newBuilder(URI.create(url))
            .timeout(timeout)
            .header("Content-Type", "application/json")
          if (apiKey.nonEmpty) b.header("Authorization", s"Bearer $apiKey")
          val resp = client.send(
            b.POST(HttpRequest.BodyPublishers.ofByteArray(payload)).build(),
            HttpResponse.BodyHandlers.ofString(StandardCharsets.UTF_8))
          resp.statusCode() match {
            case ok if ok / 100 == 2 => return mapper.readTree(resp.body())
            case code if code == 429 || code / 100 == 5 =>
              lastErr = s"HTTP $code: ${resp.body().take(500)}"
              val retryAfter = resp.headers().firstValue("Retry-After")
              Some(if (retryAfter.isPresent) retryAfter.get.trim.toLong * 1000L
                   else baseBackoffMs << attempt)
            case code => // non-retryable client error: fail fast
              throw new java.io.IOException(
                s"model endpoint $url returned HTTP $code: " +
                  resp.body().take(500))
          }
        } catch {
          case e: java.net.http.HttpTimeoutException =>
            lastErr = s"timeout: ${e.getMessage}"
            Some(baseBackoffMs << attempt)
          case e: java.net.ConnectException =>
            lastErr = s"connect: ${e.getMessage}"
            Some(baseBackoffMs << attempt)
        }
      delayMs.foreach(sleeper)
      attempt += 1
    }
    throw new java.io.IOException(
      s"model endpoint $url failed after ${maxRetries + 1} attempts; " +
        s"last error: $lastErr")
  }
}

/** OpenAI-compatible `/v1/embeddings` client.
  *
  * Request `{"model": m, "input": [texts...]}`; response
  * `{"data": [{"index": i, "embedding": [floats...]}]}` — the shape of
  * the service behind the reference's `sru.request_embedding`
  * (`/root/reference/camp_vec_save.py:56`).
  *
  * @param endpoint  full URL of the embeddings route
  * @param model     model name sent in the request body
  * @param apiKey    bearer token; empty string sends no auth header
  * @param dim       expected vector width (validated per response row) */
class HttpEmbedder(endpoint: String, model: String, apiKey: String,
    val dim: Int, timeoutSec: Int = 60, maxRetries: Int = 4,
    baseBackoffMs: Long = 250L) extends Embedder {

  @transient private lazy val client =
    HttpClient.newBuilder().connectTimeout(Duration.ofSeconds(10)).build()
  // overridable sleep so retry specs need not wait wall-clock backoff
  protected def sleep(ms: Long): Unit = Thread.sleep(ms)

  override def embed(text: String): Array[Float] =
    embedBatch(Seq(text)).head

  override def embedBatch(texts: Seq[String]): Seq[Array[Float]] = {
    if (texts.isEmpty) return Seq.empty
    val body = HttpModel.mapper.createObjectNode()
    body.put("model", model)
    val input = body.putArray("input")
    texts.foreach(input.add)
    val resp = HttpModel.postJson(client, endpoint, apiKey, body,
      Duration.ofSeconds(timeoutSec.toLong), maxRetries, baseBackoffMs, sleep)
    val data = resp.get("data")
    require(data != null && data.isArray && data.size == texts.size,
      s"embeddings response: expected ${texts.size} data entries, got " +
        (if (data == null) "none" else data.size.toString))
    val out = new Array[Array[Float]](texts.size)
    data.forEach { entry =>
      val idx = entry.get("index").asInt
      val emb = entry.get("embedding")
      require(emb != null && emb.size == dim,
        s"embedding[$idx]: expected dim $dim, got " +
          (if (emb == null) "none" else emb.size.toString))
      val v = new Array[Float](dim)
      var i = 0
      while (i < dim) { v(i) = emb.get(i).floatValue; i += 1 }
      out(idx) = v
    }
    require(out.forall(_ != null),
      "embeddings response: data entries do not cover all input indexes")
    out.toSeq
  }
}

/** OpenAI-compatible `/v1/chat/completions` client — the five reference
  * chat call sites' wire shape (`/root/reference/nl_targeting.py:33-41`:
  * system+user messages, temperature 0, bounded max_tokens; content read
  * from `choices[0].message.content`). */
class HttpLlm(endpoint: String, model: String, apiKey: String,
    temperature: Double = 0.0, maxTokens: Int = 300, timeoutSec: Int = 60,
    maxRetries: Int = 4, baseBackoffMs: Long = 250L) extends LlmClient {

  @transient private lazy val client =
    HttpClient.newBuilder().connectTimeout(Duration.ofSeconds(10)).build()
  protected def sleep(ms: Long): Unit = Thread.sleep(ms)

  def complete(system: String, user: String): String = {
    val body = HttpModel.mapper.createObjectNode()
    body.put("model", model)
    body.put("temperature", temperature)
    body.put("max_tokens", maxTokens)
    val msgs = body.putArray("messages")
    val sm = msgs.addObject(); sm.put("role", "system"); sm.put("content", system)
    val um = msgs.addObject(); um.put("role", "user"); um.put("content", user)
    val resp = HttpModel.postJson(client, endpoint, apiKey, body,
      Duration.ofSeconds(timeoutSec.toLong), maxRetries, baseBackoffMs, sleep)
    val content = Option(resp.get("choices"))
      .filter(c => c.isArray && c.size > 0)
      .map(_.get(0)).flatMap(c => Option(c.get("message")))
      .flatMap(m => Option(m.get("content")))
    require(content.isDefined,
      "chat response missing choices[0].message.content")
    content.get.asText
  }
}
