package graft.operators

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types.StringType
import org.apache.spark.util.LongAccumulator

/** Media annotation service path (SURVEY §2.1 S10 audio STT / S11 image
  * caption): batched requests of binary media to an annotation server,
  * executed as `mapPartitions` — the same transport shape as
  * [[EmbedService]] (one connection per partition, fixed-size batches,
  * fail-soft with a dead-backend threshold).
  *
  * The reference runs BOTH models in-process (faster-whisper in
  * parse_audio.py:34-64, BLIP in images.py:5-40) with dev-mode/disabled
  * gates; at cluster scale in-process model weights per executor are the
  * wrong shape — a shared model fleet behind a batched transport is, and
  * it is exactly how the reference already treats embeddings. Contracts
  * reproduced:
  *  - dev-mode STT emits the reference's stub text verbatim
  *    (`[DEV] transcript of {name}`, parse_audio.py:27-32);
  *  - caption failures soft-fall to an EMPTY caption per item
  *    (images.py:31-40 catches and returns "") — the caller's
  *    `image: {rel}` fallback then applies, like process.py:911;
  *  - STT failures skip the batch's rows (counted), and a run of
  *    consecutive failures fails the stage (dead backend ≠ bad file).
  *
  * Response: JSON `{"texts": ["…", …]}` (one per input), or `{"text":
  * "…"}` for single-item batches.
  */
object MediaService {

  /** Pluggable transport: one batch request → raw JSON response.
    * `paths` ride along so the server can route by extension.
    */
  trait Transport extends Serializable {
    def post(paths: Seq[String], payloads: Seq[Array[Byte]]): String
  }

  /** java.net.http multipart-free POST: base64 payloads in a JSON body —
    * dependency-free and fine for the ≤ tens-of-MB media batch sizes this
    * stage uses.
    */
  final case class HttpTransport(baseUrl: String, endpoint: String,
      timeoutSeconds: Long = 300, maxRetries: Int = 3,
      retryBaseMillis: Long = 250) extends Transport {
    @transient private lazy val client = java.net.http.HttpClient.newHttpClient()
    override def post(paths: Seq[String], payloads: Seq[Array[Byte]]): String = {
      val mapper = new ObjectMapper()
      val node = mapper.createObjectNode()
      val ps = node.putArray("paths")
      paths.foreach(ps.add)
      val ds = node.putArray("data")
      payloads.foreach(b => ds.add(java.util.Base64.getEncoder.encodeToString(b)))
      // same fault handling as the embed transport ([[HttpSupport]]):
      // full-exchange deadline + bounded 429/503 backoff
      HttpSupport.postJson(client, baseUrl.stripSuffix("/") + endpoint,
        mapper.writeValueAsString(node), timeoutSeconds, maxRetries,
        retryBaseMillis, "media service error")
    }
  }

  sealed trait Kind { def devStub(name: String): String }
  /** Audio STT (parse_audio.py): dev stub is the reference's verbatim. */
  case object Stt extends Kind {
    def devStub(name: String): String = s"[DEV] transcript of $name"
  }
  /** Image caption (images.py): disabled/dev gate yields empty caption. */
  case object Caption extends Kind {
    def devStub(name: String): String = ""
  }

  case class Config(
      kind: Kind,
      transport: Transport,
      batchSize: Int = 8,
      devMode: Boolean = false,
      maxConsecutiveFailures: Int = 10)

  private val mapper = new ObjectMapper()

  /** `{"texts": [...]}` (one per input) or `{"text": "..."}`; count must
    * match the batch.
    */
  def parseTexts(json: JsonNode, expected: Int): Seq[String] = {
    if (json.isObject && json.has("texts") && json.get("texts").isArray) {
      val ts = json.get("texts")
      val out = (0 until ts.size()).map(i => ts.get(i).asText())
      if (out.length != expected)
        throw new IllegalArgumentException(
          s"media text count mismatch: expected $expected, got ${out.length}")
      return out
    }
    if (json.isObject && json.has("text") && expected == 1)
      return Seq(json.get("text").asText())
    throw new IllegalArgumentException("Unexpected media service response format")
  }

  private def basename(path: String): String =
    path.substring(path.lastIndexOf('/') + 1)

  /** Append `outCol` (string annotation) to `df` by sending
    * (`pathCol`, `contentCol` binary) in batches per partition.
    * STT: failed batches skip their rows (counted) until the consecutive
    * threshold fails the stage. Caption: failed batches soft-fall to ""
    * per item (the reference's per-image catch), still counted.
    */
  def annotate(
      df: DataFrame,
      pathCol: String,
      contentCol: String,
      outCol: String,
      cfg: Config,
      failed: Option[LongAccumulator] = None): DataFrame = {
    val outSchema = df.schema.add(outCol, StringType)
    val pIdx = df.schema.fieldIndex(pathCol)
    val cIdx = df.schema.fieldIndex(contentCol)
    df.mapPartitions { rows =>
      var consecutive = 0
      rows.grouped(cfg.batchSize).flatMap { batch =>
        val paths = batch.map(_.getString(pIdx))
        // None = batch skipped entirely (failed STT below the dead-backend
        // threshold); Some = one annotation per input row
        val texts: Option[Seq[String]] =
          if (cfg.devMode) Some(paths.map(p => cfg.kind.devStub(basename(p))))
          else
            try {
              val payloads = batch.map(_.getAs[Array[Byte]](cIdx))
              val out = parseTexts(
                mapper.readTree(cfg.transport.post(paths.toSeq, payloads.toSeq)),
                batch.size)
              consecutive = 0
              Some(out)
            } catch {
              case e: Exception =>
                consecutive += 1
                if (cfg.maxConsecutiveFailures > 0 &&
                    consecutive >= cfg.maxConsecutiveFailures)
                  throw new RuntimeException(
                    s"[media] $consecutive consecutive batch failures — " +
                      s"backend looks DOWN (last error: ${e.getMessage})", e)
                failed.foreach(_.add(batch.size))
                System.err.println(
                  s"[media] batch of ${batch.size} failed: ${e.getMessage}")
                cfg.kind match {
                  case Caption => Some(paths.map(_ => "")) // soft-empty per item
                  case Stt => None                         // skip the rows
                }
            }
        texts match {
          case None => Iterator.empty
          case Some(ts) => batch.iterator.zip(ts.iterator)
            .map { case (row, t) => Row.fromSeq(row.toSeq :+ t) }
        }
      }
    }(Encoders.row(outSchema))
  }
}
