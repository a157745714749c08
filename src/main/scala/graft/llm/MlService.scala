package graft.llm

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets
import java.security.MessageDigest

/** ML remote-service enrichment (F6): the reference's broken-site-report
  * pipeline classifies report batches against an HTTP model service and
  * translates non-English bodies through ML.TRANSLATE before classifying
  * (broken_site_report_ml/main.py:13-66 — batched JSON POST with an API
  * key, a retry-until-ready loop, chunk size 20; main.py:228-286 —
  * translation with failed-status fallback to the original body).
  *
  * Spark-first shape: the HTTP boundary lives in `mapPartitions` — one
  * `java.net.http.HttpClient` per partition, requests batched
  * `batchSize` rows at a time, so a 1000-executor run fans the service
  * out without any driver round-trip. The MODEL is external by
  * definition; [[FakeMlServer]] is the deterministic stand-in (pure
  * functions of the payload) that makes the full loop — serialization,
  * batching, retry-until-ready, failure fallback — runnable and
  * oracle-checkable without network egress.
  */
object MlService {

  case class Report(uuid: Long, title: String, body: String)
  case class Enriched(uuid: Long, detected_lang: String, translated: Boolean,
      prediction: String, probability: Double, n_attempts: Int)

  // ---- client side (the production operator) ----

  /** Translate + classify `reports(uuid, title, body)` against the ML
    * service at `base`: POST /translate once, then POST
    * /{model}/predict/broken_site_report/batch in `batchSize` chunks,
    * re-POSTing not-ready reports up to `retryCount` times
    * (main.py:24-66 semantics; failed translations fall back to the
    * untranslated body, main.py:261-276). */
  def enrich(spark: SparkSession, reports: DataFrame, base: String,
      model: String = "invalidcompatibilityreport", apiKey: String = "docker-etl",
      batchSize: Int = 20, retryCount: Int = 21,
      retrySleepMs: Long = 0L): Dataset[Enriched] = {
    import spark.implicits._
    reports.select(col("uuid").cast("long"), col("title").cast("string"),
        col("body").cast("string"))
      .as[Report]
      .mapPartitions { it =>
        val client = HttpClient.newHttpClient()
        val mapper = new ObjectMapper()
        it.grouped(batchSize).flatMap { chunk =>
          // 1) translation pass: detected language + translated text;
          //    rows whose status is non-empty keep their original body
          val treq = mapper.createObjectNode()
          val tarr = treq.putArray("reports")
          chunk.foreach { r =>
            val o = tarr.addObject()
            o.put("uuid", r.uuid.toString); o.put("text", r.body)
          }
          val tresp = post(client, mapper, s"$base/translate", apiKey, treq)
            .get("reports")
          val translated = chunk.map { r =>
            val n = tresp.get(r.uuid.toString)
            val ok = n != null && n.get("status").asText.isEmpty
            val body = if (ok) n.get("translated_text").asText else r.body
            val lang = if (n != null) n.get("detected_language_code").asText else ""
            (r, body, lang, ok)
          }
          // 2) classification with the retry-until-ready loop: not-ready
          //    uuids are re-POSTed; exhausting retries is an error
          //    (main.py:59-66 aborts the run)
          var pending = translated.map { case (r, body, _, _) =>
            r.uuid.toString -> (r.title, body)
          }.toMap
          val done = scala.collection.mutable.Map[String, (String, Double, Int)]()
          var attempt = 0
          while (pending.nonEmpty && attempt < retryCount) {
            attempt += 1
            val creq = mapper.createObjectNode()
            val carr = creq.putArray("reports")
            pending.foreach { case (uuid, (title, body)) =>
              val o = carr.addObject()
              o.put("uuid", uuid); o.put("title", title); o.put("body", body)
            }
            val cresp = post(client, mapper,
              s"$base/$model/predict/broken_site_report/batch", apiKey, creq)
              .get("reports")
            val fields = cresp.properties().iterator()
            while (fields.hasNext) {
              val e = fields.next()
              if (e.getValue.get("ready").asBoolean) {
                done(e.getKey) = (e.getValue.get("prediction").asText,
                  e.getValue.get("probability").asDouble, attempt)
                pending -= e.getKey
              }
            }
            if (pending.nonEmpty && retrySleepMs > 0) Thread.sleep(retrySleepMs)
          }
          if (pending.nonEmpty)
            throw new IllegalStateException(
              s"couldn't classify ${pending.size} reports in $retryCount attempts")
          translated.map { case (r, _, lang, ok) =>
            val (pred, prob, att) = done(r.uuid.toString)
            Enriched(r.uuid, lang, ok, pred, prob, att)
          }
        }
      }
  }

  private def post(client: HttpClient, mapper: ObjectMapper, url: String,
      apiKey: String, body: ObjectNode): JsonNode = {
    val req = HttpRequest.newBuilder(URI.create(url))
      .header("X-Api-Key", apiKey)
      .header("Content-Type", "application/json")
      .POST(HttpRequest.BodyPublishers.ofString(mapper.writeValueAsString(body)))
      .build()
    val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() != 200)
      throw new IllegalStateException(s"$url -> HTTP ${resp.statusCode()}")
    mapper.readTree(resp.body())
  }

  // ---- the deterministic stand-in service ----

  /** The model functions the fake service applies — pure functions of
    * the payload, so an external oracle can recompute every enrichment
    * without running any service. Shared by [[FakeMlServer]] and specs. */
  object FakeModel {
    def md5hex(s: String): String =
      MessageDigest.getInstance("MD5").digest(s.getBytes(StandardCharsets.UTF_8))
        .map("%02x".format(_)).mkString

    /** "Translation": word order reversed. Lossless + self-inverse, so
      * the engine-side oracle recomputes it with list_reverse. */
    def translate(text: String): String = text.split(" ").reverse.mkString(" ")

    def detectedLang(text: String): String = md5hex(text).substring(0, 2)

    /** Translation fails (non-empty status) for uuid % 97 == 0 — the
      * fallback-to-original-body path (main.py:272 keeps only rows with
      * empty status). */
    def translateFails(uuid: Long): Boolean = uuid % 97 == 0

    /** Not ready on the FIRST request for uuid % 5 == 0 — exercises the
      * retry loop (main.py:46-59). */
    def slowFirstAttempt(uuid: Long): Boolean = uuid % 5 == 0

    def probability(body: String): Double =
      java.lang.Long.parseLong(md5hex(body).substring(0, 6), 16) / 16777216.0

    def prediction(body: String): String =
      if (probability(body) >= 0.5) "invalid" else "valid"
  }

  /** In-process HTTP stand-in for the bugbug-style service: same routes,
    * header check, batch JSON shapes and ready/not-ready protocol as
    * main.py:13-66 expects, deterministic [[FakeModel]] outputs. Start
    * with port 0 for an ephemeral port; `base` gives the URL. */
  final class FakeMlServer(port: Int = 0) {
    private val mapper = new ObjectMapper()
    private val seen = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    private val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", port), 0)
    private val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    server.setExecutor(pool)

    server.createContext("/", (ex: com.sun.net.httpserver.HttpExchange) => {
      try {
        val path = ex.getRequestURI.getPath
        if (ex.getRequestHeaders.getFirst("X-Api-Key") == null) {
          ex.sendResponseHeaders(403, -1)
        } else {
          val body = mapper.readTree(new String(
            ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8))
          val out = mapper.createObjectNode()
          val reports = out.putObject("reports")
          val arr = body.get("reports").asInstanceOf[ArrayNode]
          val it = arr.iterator()
          while (it.hasNext) {
            val r = it.next()
            val uuid = r.get("uuid").asText
            val o = reports.putObject(uuid)
            if (path == "/translate") {
              val text = r.get("text").asText
              o.put("detected_language_code", FakeModel.detectedLang(text))
              if (FakeModel.translateFails(uuid.toLong)) o.put("status", "error")
              else {
                o.put("translated_text", FakeModel.translate(text))
                o.put("status", "")
              }
            } else { // /{model}/predict/broken_site_report/batch
              val first = seen.add(uuid)
              if (first && FakeModel.slowFirstAttempt(uuid.toLong)) {
                o.put("ready", false)
              } else {
                val b = r.get("body").asText
                o.put("ready", true)
                o.put("prediction", FakeModel.prediction(b))
                o.put("probability", FakeModel.probability(b))
              }
            }
          }
          val bytes = mapper.writeValueAsBytes(out)
          ex.getResponseHeaders.add("Content-Type", "application/json")
          ex.sendResponseHeaders(200, bytes.length)
          ex.getResponseBody.write(bytes)
        }
      } finally ex.close()
    })
    server.start()

    def base: String = s"http://127.0.0.1:${server.getAddress.getPort}"
    // HttpServer.stop does NOT shut down a user-supplied executor; its
    // non-daemon threads would pin the JVM open after main() returns.
    def stop(): Unit = { server.stop(0); pool.shutdownNow() }
  }
}
