package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Uuid5
import graft.operators.{Chunker, DevEmbed}

/** File ingestion: the reference's dropzone pipeline (SURVEY §3.1) as one
  * declarative DataFrame lineage —
  *   discovery → ignore filters → kind inference → parse → canonicalize →
  *   ids → chunk → embed → chunk rows.
  *
  * Sources re-expressed Spark-first (SURVEY §2.1):
  *  - S1 discovery: `spark.read.format("binaryFile")` recursive listing —
  *    distributed, no driver-side walk;
  *  - S2 kind inference by extension (reference:
  *    worker/app/services/discovery.py:70-79, api upload.go:24-48);
  *  - P4 ignore filters: extension blocklist + `smoke_`/`test_`/`temp_`/
  *    hidden prefixes (reference: discovery.py:39-67, config.py:105);
  *  - S3/S4/S5/S6 parsers routed by kind (file_router.py:23-103) — CSV
  *    rows to `"v1 | v2"` lines, JSON flattened to `"a.b[0]: value"`
  *    lines, JSONL per line with `$[i]` prefixes;
  *  - F11 canonical relpath + F6 deterministic ids (docids.py:28-49);
  *  - P7 empty-content guard (process.py:422-425);
  *  - T1 chunk + T3 dev-embed per chunk.
  *
  * At scale: one narrow map over file splits, no shuffle until the store
  * write. Real parsers for binary formats (pdf/docx/audio/image) plug in as
  * additional `parseX` branches; in this environment they are stubbed like
  * the reference's dev modes.
  */
object FileIngest {

  val IgnoredExtensions: Seq[String] = Seq("tmp", "part", "swp", "ds_store", "crdownload")
  val IgnoredPrefixes: Seq[String] = Seq("smoke_", "test_", "temp_", ".", "~")

  /** S2: extension → kind (text|csv|json|pdf|doc|html|audio|image). */
  def kindForExtension(ext: Column): Column = {
    val e = lower(ext)
    when(e.isin("txt", "md", "markdown", "rst", "log"), "text")
      .when(e.isin("csv", "tsv"), "csv")
      .when(e.isin("json", "jsonl"), "json")
      .when(e === "pdf", "pdf")
      .when(e.isin("doc", "docx"), "doc")
      .when(e.isin("html", "htm"), "html")
      .when(e.isin("mp3", "wav", "m4a", "flac", "ogg"), "audio")
      .when(e.isin("png", "jpg", "jpeg", "gif", "webp", "bmp"), "image")
      .otherwise("text") // reference falls back to raw text (file_router.py:96-103)
  }

  /** F11: canonical POSIX relpath under the dropzone root
    * (docids.py:28-41): strip the root prefix, `./`, and the historical
    * `data/dropzone/` prefix.
    */
  def canonicalRelpath(path: Column, root: String): Column = {
    val rootNorm = root.stripSuffix("/") + "/"
    val stripped = regexp_replace(path, "^file:", "")
    val rel = regexp_replace(stripped, "^" + java.util.regex.Pattern.quote(rootNorm), "")
    val noDot = regexp_replace(rel, "^\\./", "")
    regexp_replace(noDot, "^data/dropzone/", "")
  }

  private def basename(path: Column): Column = element_at(split(path, "/"), -1)
  private def extension(path: Column): Column =
    lower(regexp_extract(basename(path), "\\.([^.]+)$", 1))

  /** P4: ignore-filter predicate over the canonical relpath. */
  def keepFile(relpath: Column): Column = {
    val name = basename(relpath)
    val extOk = !extension(relpath).isin(IgnoredExtensions: _*)
    val prefixOk = IgnoredPrefixes
      .map(p => !lower(name).startsWith(p))
      .reduce(_ && _)
    extOk && prefixOk
  }

  /** S4: CSV text → `"v1 | v2"` lines (reference caps: 5000 rows, 50 cols,
    * 2000 chars/cell — parse_csv.py:4-23, parsers_csv.py:6-26).
    */
  def csvToLines(raw: Column): Column = {
    val rows = slice(split(raw, "\r?\n"), 1, 5000)
    array_join(
      filter(
        transform(rows, row =>
          array_join(
            transform(slice(split(row, ","), 1, 50), c =>
              substring(trim(c), 1, 2000)),
            " | ")),
        l => trim(l) =!= ""),
      "\n")
  }

  /** S5/F14: flatten a parsed JSON value into `"a.b[0]: value"` lines.
    * Dynamic JSON (schema unknown at plan time) goes through a
    * VariantType-free recursive walk on the driver-side schema when known;
    * for the fully dynamic case we parse with Jackson in a codegen-friendly
    * static call (see [[JsonFlatten]]).
    */
  def jsonToLines(raw: Column): Column = JsonFlatten.jsonFlatten(raw)

  /** S12: extension router — one `when` dispatch per kind
    * (file_router.py:23-103). Binary kinds are stubbed with a
    * deterministic placeholder like the reference's dev modes
    * (`audio` AUDIO_DEV_MODE, `image` caption fallback process.py:911).
    */
  def routeText(kind: Column, rawText: Column, relpath: Column): Column =
    when(kind === "csv", csvToLines(rawText))
      .when(kind === "json" && relpath.endsWith(".jsonl"), JsonFlatten.jsonlFlatten(rawText))
      .when(kind === "json", jsonToLines(rawText))
      .when(kind === "audio", concat(lit("audio transcript stub: "), relpath))
      .when(kind === "image", concat(lit("image: "), relpath))
      .when(kind === "pdf", rawText) // real extraction: pdfbox branch at deploy
      .when(kind === "doc", rawText) // real extraction: poi branch at deploy
      .when(kind === "html",
        trim(regexp_replace(
          regexp_replace(rawText, "(?is)<(script|style|noscript)[^>]*>.*?</\\1>", " "),
          "(?s)<[^>]*>", " ")))
      .otherwise(rawText)

  /** Document-level parse: directory → one row per kept, non-empty file
    * (document_id, kind, path, text, content_sig, bytes). `text` is the
    * routed FULL document text with newlines intact — line-oriented
    * normalizers (note2json, transcript detection) must run on THIS frame;
    * the chunker below collapses whitespace.
    */
  /** Raw scan of a files frame (path, content, length) — shared by the
    * batch directory read and streaming micro-batches, so both produce
    * IDENTICAL documents (a divergent streaming copy once re-landed chat
    * files under different ids — silent duplicates).
    */
  def scanFilesFrame(files: DataFrame, dropzone: String): DataFrame =
    files
      .withColumn("relpath", canonicalRelpath(col("path"), dropzone))
      .filter(keepFile(col("relpath")))
      .withColumn("kind", kindForExtension(extension(col("relpath"))))
      .withColumn("raw_text", decode(col("content"), "UTF-8"))
      .withColumn("content_sig", sha2(col("raw_text"), 256)) // F3 provenance
      .select(col("relpath"), col("kind"), col("raw_text"),
        col("content_sig"), col("length").as("bytes"))

  /** Raw scan: kept files with decoded text, BEFORE parser routing
    * (chat-export detection must see the raw JSON, not its flattened
    * form).
    */
  private def scanFiles(spark: SparkSession, dropzone: String): DataFrame =
    scanFilesFrame(
      spark.read.format("binaryFile")
        .option("recursiveFileLookup", "true")
        .load(dropzone)
        .select(col("path"), col("content"), col("length")),
      dropzone)

  private def routePlain(scanned: DataFrame): DataFrame =
    scanned
      .withColumn("text", routeText(col("kind"), col("raw_text"), col("relpath")))
      .filter(trim(col("text")) =!= "") // P7 empty-content guard
      .withColumn("document_id", Uuid5.documentId(col("relpath")))
      .select(col("document_id"), col("kind"), col("relpath").as("path"),
        col("text"), col("content_sig"), col("bytes"))

  def parseDirectory(spark: SparkSession, dropzone: String): DataFrame =
    routePlain(scanFiles(spark, dropzone))

  /** Document-level parse with chat awareness (the reference's full T8
    * routing): ChatGPT exports explode into one document per conversation
    * with `chatgpt:{id}` ids (process.py:1253-1600); text files that score
    * ≥ 0.85 transcript confidence become `kind=chat` documents with
    * `transcript:{sig}:{thread}` ids (process.py:437-439); everything else
    * passes through [[parseDirectory]] unchanged.
    */
  def parseDirectoryWithChat(spark: SparkSession, dropzone: String): DataFrame =
    routeDocuments(scanFiles(spark, dropzone))

  /** Chat-aware document routing over a scanned frame (see
    * [[parseDirectoryWithChat]]).
    */
  def routeDocuments(scanned: DataFrame): DataFrame = {
    val isExportCol = col("relpath").endsWith(".json") &&
      size(ChatExport.chatConversations(col("raw_text"))) > 0

    val plain = routePlain(scanned.filter(!isExportCol))
    val chats = scanned.filter(isExportCol)
      .select(col("content_sig"), col("bytes"),
        posexplode(ChatExport.chatConversations(col("raw_text"))).as(Seq("ci", "conv")))
      .select(
        concat(lit("chatgpt:"), col("conv.conversation_id")).as("document_id"),
        lit("chat").as("kind"),
        concat(lit("chatgpt/"), col("conv.conversation_id")).as("path"),
        col("conv.text").as("text"),
        col("content_sig"), col("bytes"))

    val transcriptHit = col("kind") === "text" &&
      Transcript.isTranscript(col("text"), col("path"))
    val plainKept = plain.filter(!transcriptHit)
    val transcripts = plain.filter(transcriptHit)
      .withColumn("t", Transcript.parseTranscriptCol(col("text"), col("path")))
      .filter(col("t").isNotNull)
      .select(col("t.document_id").as("document_id"), lit("chat").as("kind"),
        col("path"), col("t.text").as("text"), col("content_sig"), col("bytes"))

    plainKept.unionByName(chats).unionByName(transcripts)
  }

  private def chunkAndEmbed(
      documents: DataFrame, chunkSize: Int, chunkOverlap: Int, embedDim: Int): DataFrame =
    documents
      .select(col("document_id"), col("kind"), col("path"),
        col("content_sig"), col("bytes"),
        posexplode(
          when(col("kind") === "chat", Chunker.chunkChatCol(col("text"), chunkSize))
            .otherwise(Chunker.chunkTextCol(col("text"), chunkSize, chunkOverlap)))
          .as(Seq("idx", "text")))
      .withColumn("id", Uuid5.chunkId(col("document_id"), col("idx")))
      .withColumn("vector", DevEmbed.devEmbed(col("text"), embedDim))
      .select("id", "document_id", "kind", "path", "idx", "text", "vector",
        "content_sig", "bytes")

  /** Full ingest: directory → chunk rows
    * (id, document_id, kind, path, idx, text, vector, meta…). Chat
    * documents (exploded exports + detected transcripts) go through the
    * chat-aware chunker (T2), everything else through the sliding window.
    */
  def ingestDirectory(
      spark: SparkSession,
      dropzone: String,
      chunkSize: Int = Chunker.DefaultSize,
      chunkOverlap: Int = Chunker.DefaultOverlap,
      embedDim: Int = 64): DataFrame =
    chunkAndEmbed(parseDirectoryWithChat(spark, dropzone), chunkSize, chunkOverlap, embedDim)

  /** Chunk rows from an in-memory files frame (path, content, length) —
    * the SAME lineage as [[ingestDirectory]], for streaming micro-batches.
    */
  def chunksFromFiles(
      files: DataFrame, dropzone: String,
      chunkSize: Int = Chunker.DefaultSize,
      chunkOverlap: Int = Chunker.DefaultOverlap,
      embedDim: Int = 64): DataFrame =
    chunkAndEmbed(routeDocuments(scanFilesFrame(files, dropzone)),
      chunkSize, chunkOverlap, embedDim)
}
