package graft

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.fasterxml.jackson.databind.ObjectMapper
import com.sun.net.httpserver.{HttpExchange, HttpServer}

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Static server-side observations: local-mode tasks run in this JVM, but
  * recording through JVM-static state keeps the spec valid even if the
  * transport were exercised from a forked executor.
  */
object HttpStubState {
  val embedRequests = new java.util.concurrent.atomic.AtomicInteger(0)
  val contentTypes = new java.util.concurrent.ConcurrentLinkedQueue[String]()
}

/** The REAL `HttpTransport`s (java.net.http over actual loopback sockets)
  * against an in-process `com.sun.net.httpserver` stub speaking the
  * reference protocols — `/api/embed` (embed_ollama.py:90-95 request/
  * response shapes) and the media JSON batch POST. The env-gated
  * ServiceSoakSpec needs live whisper/Ollama model backends and cannot run
  * hermetically; THIS spec pins everything below the model — URL assembly,
  * headers, request serialization, base64 payload round-trip, batch
  * framing, HTTP error → fail-soft skip — with nothing mocked inside the
  * JVM's HTTP stack.
  */
class ServiceHttpSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val mapper = new ObjectMapper()

  private def respond(ex: HttpExchange, status: Int, body: String): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(status, bytes.length)
    ex.getResponseBody.write(bytes)
    ex.close()
  }

  private def readBody(ex: HttpExchange): String =
    new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)

  /** Loopback server with the given handlers; returns its base URL. */
  private def withServer(handlers: (String, HttpExchange => Unit)*)(
      f: String => Unit): Unit = {
    val server = HttpServer.create(
      new InetSocketAddress(java.net.InetAddress.getLoopbackAddress, 0), 0)
    handlers.foreach { case (path, h) =>
      server.createContext(path, (ex: HttpExchange) => h(ex))
    }
    server.start()
    try f(s"http://${server.getAddress.getHostString}:${server.getAddress.getPort}")
    finally server.stop(0)
  }

  test("embed: real HTTP round-trip — batching, headers, modern response shape") {
    import graft.operators.EmbedService
    import spark.implicits._
    HttpStubState.embedRequests.set(0)
    HttpStubState.contentTypes.clear()
    val dim = 4
    val handler: HttpExchange => Unit = { ex =>
      HttpStubState.embedRequests.incrementAndGet()
      HttpStubState.contentTypes.add(ex.getRequestHeaders.getFirst("Content-Type"))
      val req = mapper.readTree(readBody(ex))
      assert(req.get("model").asText() == "stub-model")
      val in = req.get("input")
      val vecs = (0 until in.size()).map { i =>
        val t = in.get(i).asText()
        (0 until dim).map(k => (t.length + k) / 100.0).mkString("[", ",", "]")
      }
      respond(ex, 200, vecs.mkString("""{"embeddings": [""", ",", "]}"))
    }
    withServer("/api/embed" -> handler) { base =>
      val cfg = EmbedService.Config("stub-model", dim,
        EmbedService.HttpTransport(base), batchSize = 4)
      val df = (1 to 10).map(i => s"text number $i").toDF("text").repartition(1)
      val out = EmbedService.embedColumn(df, "text", "vector", cfg)
        .select("text", "vector").collect()
        .map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
      assert(out.size == 10)
      assert(out("text number 3") == (0 until dim).map(k => (13 + k) / 100.0))
      // 10 rows at batchSize=4 in one partition = 3 HTTP requests
      assert(HttpStubState.embedRequests.get() == 3)
      assert(HttpStubState.contentTypes.asScala.forall(_ == "application/json"))
    }
  }

  implicit class QueueOps[A](q: java.util.concurrent.ConcurrentLinkedQueue[A]) {
    def asScala: Seq[A] = {
      import scala.jdk.CollectionConverters._
      q.iterator().asScala.toSeq
    }
  }

  test("embed: HTTP 500 on one batch fail-softs that batch only, counted") {
    import graft.operators.EmbedService
    import spark.implicits._
    val handler: HttpExchange => Unit = { ex =>
      val req = mapper.readTree(readBody(ex))
      val in = req.get("input")
      val texts = (0 until in.size()).map(in.get(_).asText())
      if (texts.exists(_.contains("poison")))
        respond(ex, 500, """{"error": "overloaded"}""")
      else
        respond(ex, 200,
          texts.map(_ => "[0.5]").mkString("""{"embeddings": [""", ",", "]}"))
    }
    withServer("/api/embed" -> handler) { base =>
      val cfg = EmbedService.Config("stub-model", 1,
        EmbedService.HttpTransport(base), batchSize = 2)
      val skipped = spark.sparkContext.longAccumulator("skipped")
      // batches of 2 in row order: (a,b) ok, (poison1,poison2) 500, (c,d) ok
      val df = Seq("a", "b", "poison1", "poison2", "c", "d").toDF("text").coalesce(1)
      val out = EmbedService.embedColumn(df, "text", "vector", cfg, Some(skipped))
        .select("text").collect().map(_.getString(0)).toSet
      assert(out == Set("a", "b", "c", "d"))
      assert(skipped.value == 2)
    }
  }

  test("media: base64 payloads round-trip over real HTTP; bad endpoint fail-softs") {
    import graft.operators.MediaService
    val sttHandler: HttpExchange => Unit = { ex =>
      val req = mapper.readTree(readBody(ex))
      val paths = (0 until req.get("paths").size()).map(req.get("paths").get(_).asText())
      val data = (0 until req.get("data").size()).map(i =>
        java.util.Base64.getDecoder.decode(req.get("data").get(i).asText()))
      val node = mapper.createObjectNode()
      val ts = node.putArray("texts")
      paths.zip(data).foreach { case (p, b) =>
        // echo basename + decoded byte count + first byte: proves the
        // binary payload survived base64 framing bit-for-bit
        ts.add(s"stt:${p.substring(p.lastIndexOf('/') + 1)}:${b.length}:${b.head}")
      }
      respond(ex, 200, mapper.writeValueAsString(node))
    }
    withServer("/stt" -> sttHandler) { base =>
      val rows = Seq(
        ("audio/a.wav", Array[Byte](7, 8, 9)),
        ("audio/b.mp3", Array[Byte](-1, 0, 1, 2)))
      val df = spark.createDataFrame(rows).toDF("relpath", "content")
      val cfg = MediaService.Config(MediaService.Stt,
        MediaService.HttpTransport(base, "/stt"), batchSize = 8)
      val out = MediaService.annotate(df, "relpath", "content", "media_text", cfg)
        .collect().map(r => r.getAs[String]("relpath") -> r.getAs[String]("media_text")).toMap
      assert(out == Map(
        "audio/a.wav" -> "stt:a.wav:3:7",
        "audio/b.mp3" -> "stt:b.mp3:4:-1"))

      // wrong endpoint → HTTP 404 → fail-soft skip, rows dropped + counted
      val failed = spark.sparkContext.longAccumulator("stt_failed")
      val badCfg = MediaService.Config(MediaService.Stt,
        MediaService.HttpTransport(base, "/nope"), batchSize = 8)
      val bad = MediaService.annotate(df, "relpath", "content", "media_text",
        badCfg, failed = Some(failed))
      assert(bad.count() == 0)
      assert(failed.value == 2)
    }
  }
}
