package graft.operators

import scala.collection.mutable.ArrayBuffer

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types.{ArrayType, DoubleType}
import org.apache.spark.util.LongAccumulator

/** Production embedding stage (SURVEY §2.8 T3, the service path): batched
  * requests to an embedding server, executed as `mapPartitions` so each
  * partition holds ONE connection and pipelines its rows in batches of
  * `batchSize` — the Spark-native shape of the reference's batch loop
  * (reference: worker/app/services/embed_ollama.py:55-114, batch size 64
  * at scripts/dev/tools/ingest_dropzone.py).
  *
  * Contract reproduced from the reference:
  *  - POST {"model": m, "input": [texts…]} to `{base}/api/embed`;
  *  - THREE accepted response shapes (embed_ollama.py:8-42): modern
  *    `{"embeddings": [[…]…]}`, legacy single `{"embedding": […]}`,
  *    legacy batch `{"embeddings": [{"embedding": […]}…]}`;
  *  - count validation (vectors == texts) and non-empty-vector validation
  *    (embed_ollama.py:99-106);
  *  - fail-soft: a failed batch (network/HTTP/parse/validation) SKIPS its
  *    rows and bumps a skip counter instead of failing the job, like the
  *    reference's `points_skipped_embed_error` (qdrant_client.py:334-351);
  *    per-row dimension mismatches are likewise skipped and counted;
  *  - dev-mode short-circuit producing the bit-exact sha256 vectors of
  *    [[DevEmbed]] (EMBED_DEV_MODE, embed_ollama.py:85-87) — the
  *    oracle-testable path (q15).
  *
  * At 100 TB this stage is embarrassingly parallel and bounded by the
  * model servers, not Spark: each task streams its split in fixed-size
  * batches, holds ≤ one batch in memory, and shuffles nothing.
  */
object EmbedService {

  /** Pluggable transport so unit tests (and alternative backends) can
    * stand in for the HTTP call — mirrors the reference's mocked
    * `requests.post` tests (worker/tests/test_embed_unit.py:19-164).
    */
  trait Transport extends Serializable {
    /** Raw JSON response text for one batch request body. */
    def post(requestBodyJson: String): String
  }

  /** java.net.http POST to `{base}/api/embed` (embed_ollama.py:90-95),
    * with [[HttpSupport]]'s fault handling: full-exchange deadline
    * (covers mid-body stalls), bounded 429/503 backoff retries.
    */
  final case class HttpTransport(baseUrl: String, timeoutSeconds: Long = 180,
      maxRetries: Int = 3, retryBaseMillis: Long = 250)
      extends Transport {
    @transient private lazy val client = java.net.http.HttpClient.newHttpClient()
    override def post(body: String): String =
      HttpSupport.postJson(client, baseUrl.stripSuffix("/") + "/api/embed",
        body, timeoutSeconds, maxRetries, retryBaseMillis, "Ollama API error")
  }

  case class Config(
      model: String,
      dim: Int,
      transport: Transport,
      batchSize: Int = 64,
      devMode: Boolean = false,
      /** Fail the TASK once this many CONSECUTIVE batches fail in one
        * partition. Fail-soft skipping is for transient per-batch errors;
        * a persistent outage (bad URL, server down) would otherwise
        * silently drop the whole dataset and report "success" with zero
        * embedded rows — only stderr lines and an optional accumulator
        * would know. 0 disables the threshold.
        */
      maxConsecutiveFailures: Int = 10)

  private val mapper = new ObjectMapper()

  /** The three accepted response shapes → one vector per input text
    * (embed_ollama.py:8-42). Throws on anything else.
    */
  def parseEmbeddings(json: JsonNode): Seq[Array[Double]] = {
    def vec(n: JsonNode): Array[Double] =
      Array.tabulate(n.size())(i => n.get(i).asDouble())
    if (json.isObject && json.has("embeddings") && json.get("embeddings").isArray) {
      val embs = json.get("embeddings")
      if (embs.size() == 0) return Nil
      val first = embs.get(0)
      if (first.isArray)
        return (0 until embs.size()).map(i => vec(embs.get(i)))
      if (first.isObject && first.has("embedding"))
        return (0 until embs.size()).map(i => vec(embs.get(i).get("embedding")))
    }
    if (json.isObject && json.has("embedding") && json.get("embedding").isArray)
      return Seq(vec(json.get("embedding")))
    throw new IllegalArgumentException(
      "Unexpected Ollama response format while parsing embeddings")
  }

  private def requestBody(model: String, texts: Seq[String]): String = {
    val node = mapper.createObjectNode()
    node.put("model", model)
    val arr = node.putArray("input")
    texts.foreach(arr.add)
    mapper.writeValueAsString(node)
  }

  /** Embed one batch: request → parse → count/non-empty validation
    * (embed_ollama.py:96-106). Throws on any contract violation.
    */
  def embedBatch(cfg: Config, texts: Seq[String]): Seq[Array[Double]] = {
    if (texts.isEmpty) return Nil
    if (cfg.devMode)
      return texts.map(t =>
        DevEmbed.compute(org.apache.spark.unsafe.types.UTF8String.fromString(t), cfg.dim)
          .toDoubleArray())
    val parsed = parseEmbeddings(mapper.readTree(
      cfg.transport.post(requestBody(cfg.model, texts))))
    if (parsed.length != texts.length)
      throw new IllegalArgumentException(
        s"Embedding count mismatch: expected ${texts.length}, got ${parsed.length}")
    if (parsed.isEmpty || parsed.head.isEmpty)
      throw new IllegalArgumentException("Empty embedding returned from Ollama")
    parsed
  }

  /** Append `vectorCol` (array<double>) to `df` by embedding `textCol` in
    * batches per partition. Failed batches and wrong-dimension vectors are
    * dropped; `skipped` (if supplied) counts the dropped rows.
    */
  def embedColumn(
      df: DataFrame,
      textCol: String,
      vectorCol: String,
      cfg: Config,
      skipped: Option[LongAccumulator] = None): DataFrame = {
    val outSchema = df.schema.add(vectorCol, ArrayType(DoubleType, containsNull = false))
    val textIdx = df.schema.fieldIndex(textCol)
    df.mapPartitions { rows =>
      var consecutiveFailures = 0
      rows.grouped(cfg.batchSize).flatMap { batch =>
        val texts = batch.map(_.getString(textIdx))
        val vectors =
          try {
            val vs = embedBatch(cfg, texts.toSeq)
            consecutiveFailures = 0
            vs
          } catch {
            case e: Exception =>
              consecutiveFailures += 1
              if (cfg.maxConsecutiveFailures > 0 &&
                  consecutiveFailures >= cfg.maxConsecutiveFailures)
                throw new RuntimeException(
                  s"[embed] $consecutiveFailures consecutive batch failures — " +
                    s"embedding backend looks DOWN, failing the stage " +
                    s"(last error: ${e.getMessage})", e)
              skipped.foreach(_.add(batch.size))
              System.err.println(s"[embed] batch of ${batch.size} skipped: ${e.getMessage}")
              Nil
          }
        if (vectors.isEmpty) Iterator.empty
        else batch.iterator.zip(vectors.iterator).flatMap { case (row, v) =>
          if (v.length != cfg.dim) {
            skipped.foreach(_.add(1))
            None
          } else Some(Row.fromSeq(row.toSeq :+ v.toSeq))
        }
      }
    }(Encoders.row(outSchema))
  }
}
