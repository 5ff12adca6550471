package graft.sources

import java.sql.{Connection, DriverManager}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Relational mirror of the chunk store — the reference's Postgres side
  * (`db/migrations/0001_init.sql:1-25`: `documents`, `chunks`, `images`
  * with UUID keys and ON DELETE CASCADE; populated by the worker beside
  * Qdrant). The engine's source of truth stays the parquet chunk store;
  * this publishes a queryable SQL copy for the reference's API joins.
  *
  * Scale contract (what `df.write.jdbc(mode=overwrite)` gets wrong at
  * 100 TB): a mirror refresh must move only the DELTA. [[upsert]] stages
  * the delta with Spark's parallel JDBC writer (executors stream
  * partitions straight into a per-call stage table), then one
  * driver-side set-wise `DELETE … WHERE id IN (SELECT id FROM stage)` +
  * `INSERT … SELECT` publishes it transactionally on the DB side — no
  * row ever passes through the driver, and replacement is by-key, not
  * by-truncation. Deletes ride the `documents` FK cascade, mirroring the
  * reference DDL.
  *
  * Dialects: [[DerbyDialect]] (embedded Derby, the JDBC engine in
  * /opt/spark/jars — the in-sandbox round-trip target) and
  * [[PostgresDialect]], whose bootstrap DDL reproduces the reference
  * migration verbatim in type shape (UUID / TEXT / TIMESTAMPTZ DEFAULT
  * now() / TEXT[] / CHECK kind) and whose publish step casts the staged
  * string columns back into those types. The dialect is derived from the
  * JDBC URL; `JdbcMirrorSpec` validates the generated Postgres SQL
  * against the migration's shapes, and a live round-trip runs when
  * `GRAFT_PG_URL` points at a real server (env-gated, like
  * ServiceSoakSpec).
  */
object JdbcMirror {

  /** Per-engine SQL generation: bootstrap DDL, and the publish-time
    * SELECT expressions that convert a staged column (written by Spark's
    * JDBC writer, which maps StringType to CLOB/TEXT) into the target
    * column's declared type.
    */
  sealed trait Dialect {
    def name: String
    /** table -> CREATE TABLE, in FK order. */
    def bootstrapDdl: Seq[(String, String)]
    /** SELECT-list expression for staged column `column` of `table`,
      * with the stage aliased `s`.
      */
    def publishExpr(table: String, column: String): String
    /** Expression extracting the staged key for the DELETE probe —
      * must be type-compatible with the target key column.
      */
    def keyProbe(keyCol: String): String
  }

  /** Portable embedded-engine shape: CHAR(36) keys, TIMESTAMP,
    * comma-joined tags in a CLOB.
    */
  case object DerbyDialect extends Dialect {
    val name = "derby"
    val bootstrapDdl: Seq[(String, String)] = Seq(
      "documents" ->
        """CREATE TABLE documents (
           id CHAR(36) PRIMARY KEY,
           filename VARCHAR(4096) NOT NULL,
           kind VARCHAR(16) NOT NULL,
           size_bytes BIGINT,
           mime VARCHAR(255),
           created_at TIMESTAMP)""",
      "chunks" ->
        """CREATE TABLE chunks (
           id CHAR(36) PRIMARY KEY,
           document_id CHAR(36) REFERENCES documents(id) ON DELETE CASCADE,
           idx INT NOT NULL,
           text CLOB NOT NULL,
           created_at TIMESTAMP)""",
      "images" ->
        """CREATE TABLE images (
           id CHAR(36) PRIMARY KEY,
           document_id CHAR(36) REFERENCES documents(id) ON DELETE CASCADE,
           path VARCHAR(4096) NOT NULL,
           caption CLOB,
           tags CLOB,
           created_at TIMESTAMP)""",
      "skipped_files" ->
        """CREATE TABLE skipped_files (
           id CHAR(36) PRIMARY KEY,
           path VARCHAR(4096) NOT NULL,
           kind VARCHAR(16) NOT NULL,
           size_bytes BIGINT,
           reason VARCHAR(32) NOT NULL,
           batch_id BIGINT,
           created_at TIMESTAMP)""")
    def publishExpr(table: String, column: String): String = s"""s."$column""""
    def keyProbe(keyCol: String): String =
      s"""CAST(s."$keyCol" AS VARCHAR(512))"""
  }

  /** Reference-faithful Postgres shape (db/migrations/0001_init.sql:1-25):
    * UUID keys, TEXT, TIMESTAMPTZ DEFAULT now(), TEXT[] tags, CHECK'd
    * kind. The stage lands string-typed, so publish casts keys to uuid,
    * timestamps to timestamptz, and splits tags with string_to_array.
    */
  case object PostgresDialect extends Dialect {
    val name = "postgres"
    val bootstrapDdl: Seq[(String, String)] = Seq(
      "documents" ->
        """CREATE TABLE documents (
           id UUID PRIMARY KEY,
           filename TEXT NOT NULL,
           kind TEXT CHECK (kind IN ('text','image','pdf','audio')) NOT NULL,
           size_bytes BIGINT,
           mime TEXT,
           created_at TIMESTAMPTZ DEFAULT now())""",
      "chunks" ->
        """CREATE TABLE chunks (
           id UUID PRIMARY KEY,
           document_id UUID REFERENCES documents(id) ON DELETE CASCADE,
           idx INT NOT NULL,
           text TEXT NOT NULL,
           created_at TIMESTAMPTZ DEFAULT now())""",
      "images" ->
        """CREATE TABLE images (
           id UUID PRIMARY KEY,
           document_id UUID REFERENCES documents(id) ON DELETE CASCADE,
           path TEXT NOT NULL,
           caption TEXT,
           tags TEXT[],
           created_at TIMESTAMPTZ DEFAULT now())""",
      // extension table (not in 0001_init.sql): the reference logs its
      // per-run skip ledger instead of persisting it
      // (ingest_dropzone.py:512-522); the mirror publishes it queryable
      "skipped_files" ->
        """CREATE TABLE skipped_files (
           id UUID PRIMARY KEY,
           path TEXT NOT NULL,
           kind TEXT NOT NULL,
           size_bytes BIGINT,
           reason TEXT CHECK (reason IN ('empty_file','extraction_empty')) NOT NULL,
           batch_id BIGINT,
           created_at TIMESTAMPTZ DEFAULT now())""")
    def publishExpr(table: String, column: String): String = column match {
      case "id" | "document_id" => s"""CAST(s."$column" AS uuid)"""
      case "created_at"         => s"""CAST(s."$column" AS timestamptz)"""
      case "tags" if table == "images" =>
        s"""string_to_array(NULLIF(s."$column", ''), ',')"""
      case _ => s"""s."$column""""
    }
    def keyProbe(keyCol: String): String = s"""CAST(s."$keyCol" AS uuid)"""
  }

  /** The skip-ledger mirror rows: one deterministic id per (batch, path),
    * so a replayed publish replaces its own rows instead of duplicating.
    */
  def skipLedgerRows(ledger: DataFrame,
      createdAt: java.sql.Timestamp): DataFrame =
    ledger.select(
      graft.functions.Uuid5.documentId(
        concat_ws("#", col("batch"), col("path"))).as("id"),
      col("path"), col("kind"),
      col("bytes").as("size_bytes"), col("reason"),
      col("batch").as("batch_id"),
      lit(createdAt).as("created_at"))

  /** Publish the accumulated per-batch skip ledger
    * (`Dropzone.readSkipLedger`'s shape: batch, path, kind, bytes,
    * reason) into the `skipped_files` mirror table — the reference logs
    * this per ingest run (ingest_dropzone.py:512-522); here it is
    * queryable beside documents/chunks. Idempotent by the deterministic
    * (batch, path) key.
    */
  def mirrorSkipLedger(ledger: DataFrame, t: Target,
      createdAt: java.sql.Timestamp): Long = {
    bootstrap(t)
    upsert(skipLedgerRows(ledger, createdAt), "skipped_files", "id", t)
  }

  def dialectFor(url: String): Dialect =
    if (url.startsWith("jdbc:postgresql")) PostgresDialect else DerbyDialect

  final case class Target(url: String, user: String = "", password: String = "") {
    val dialect: Dialect = dialectFor(url)
    def props: java.util.Properties = {
      val p = new java.util.Properties()
      if (user.nonEmpty) p.setProperty("user", user)
      if (password.nonEmpty) p.setProperty("password", password)
      p
    }
  }

  private def withConn[A](t: Target)(f: Connection => A): A = {
    val c = DriverManager.getConnection(t.url, t.props)
    try f(c) finally c.close()
  }

  private def tableExists(c: Connection, name: String): Boolean = {
    // Derby folds unquoted identifiers UP, Postgres folds DOWN — probe both
    Seq(name.toUpperCase, name.toLowerCase).exists { n =>
      val rs = c.getMetaData.getTables(null, null, n, null)
      try rs.next() finally rs.close()
    }
  }

  /** Reference-DDL bootstrap (idempotent). The FK keeps ON DELETE
    * CASCADE so document deletion propagates inside the DB exactly as in
    * the reference.
    */
  def bootstrap(t: Target): Unit = withConn(t) { c =>
    val st = c.createStatement()
    try t.dialect.bootstrapDdl.foreach { case (name, sql) =>
      if (!tableExists(c, name)) st.executeUpdate(sql.replaceAll("\\s+", " "))
    } finally st.close()
  }

  /** The publish statements [[upsert]] runs, exposed for spec-level
    * validation of the dialect branch without a live server.
    */
  def publishSql(table: String, keyCol: String, columns: Seq[String],
      stage: String, d: Dialect): Seq[String] = Seq(
    s"DELETE FROM $table WHERE $keyCol IN" +
      s" (SELECT ${d.keyProbe(keyCol)} FROM $stage s)",
    s"INSERT INTO $table (${columns.mkString(", ")})" +
      s" SELECT ${columns.map(d.publishExpr(table, _)).mkString(", ")}" +
      s" FROM $stage s")

  /** Delta upsert: stage with the parallel executor-side JDBC writer,
    * publish with one set-wise DELETE+INSERT on the DB. `df` must carry
    * the target table's columns; replacement is by `keyCol`. The stage
    * name is unique per call (concurrent upserts into the same table
    * cannot interleave each other's deltas) and is dropped in a finally
    * block, so a failed publish does not strand it.
    *
    * Returns the published row count as reported by the DB's INSERT
    * update count — callers that want to log it must NOT re-execute the
    * frame's read lineage with a `df.count()` (r12 advice: that doubled
    * MirrorPublish's store-read cost just to print a number).
    */
  def upsert(df: DataFrame, table: String, keyCol: String, t: Target): Long = {
    val stage = s"${table}_stg_" +
      java.util.UUID.randomUUID().toString.replace("-", "").take(12)
    df.write.mode("overwrite").jdbc(t.url, stage, t.props)
    try {
      withConn(t) { c =>
        c.setAutoCommit(false)
        val st = c.createStatement()
        // staged columns MUST be table-qualified AND quoted: Spark's JDBC
        // writer creates case-sensitive (quoted) column names, so an
        // unqualified `keyCol` in the subquery would fail to resolve
        // against the stage and silently CORRELATE to the outer table —
        // `WHERE id IN (SELECT id)` is a tautology that deletes every row
        try {
          // the last statement is the INSERT … SELECT; its update count
          // IS the published row count, for free
          val counts = publishSql(table, keyCol, df.columns.toSeq, stage,
            t.dialect).map(st.executeUpdate(_).toLong)
          c.commit()
          counts.last
        } catch { case e: Throwable => c.rollback(); throw e }
        finally st.close()
      }
    } finally {
      try withConn(t) { c =>
        val st = c.createStatement()
        try st.executeUpdate(s"DROP TABLE $stage") finally st.close()
      } catch { case _: Exception => () } // publish error wins; stray stage is re-droppable
    }
  }

  /** Mirror a chunk-store frame: documents roll up from their chunks
    * (the reference writes both sides in the same worker transaction),
    * then the chunk rows — FK order. Columns follow the reference DDL;
    * `created_at` is the mirror publish time only in the reference (a
    * DB default); here it is supplied by the caller for determinism.
    */
  def mirrorChunks(chunks: DataFrame, t: Target,
      createdAt: java.sql.Timestamp): Long = {
    bootstrap(t)
    val docs = chunks
      .groupBy(col("document_id"))
      .agg(first(col("path"), ignoreNulls = true).as("filename"),
        first(col("kind"), ignoreNulls = true).as("kind"),
        sum(octet_length(col("text"))).as("size_bytes"))
      .select(col("document_id").as("id"), col("filename"),
        // the reference DB knows only the coarse kinds (0001_init.sql:4
        // CHECK) and its worker writes csv/json/html/docx documents as
        // kind='text' (process.py:553,610,642) — the engine's finer router
        // kinds coarse-map the same way here, or a live Postgres publish
        // would fail its CHECK on the first .csv document (Derby has no
        // CHECK, so only a live target ever saw this)
        when(coalesce(col("kind"), lit("text"))
            .isin("text", "image", "pdf", "audio"),
            coalesce(col("kind"), lit("text")))
          .otherwise(lit("text")).as("kind"),
        col("size_bytes"),
        lit(null).cast("string").as("mime"),
        lit(createdAt).as("created_at"))
    upsert(docs, "documents", "id", t)
    upsert(chunks.select(col("id"), col("document_id"),
        col("idx").cast("int").as("idx"), col("text"),
        lit(createdAt).as("created_at")),
      "chunks", "id", t)
  }

  /** Mirror image-kind rows into the `images` table (the reference's
    * third mirror table: caption + tags per stored image). `tags` arrive
    * as an array column and stage comma-joined; the Postgres dialect
    * splits them back into the reference's TEXT[] at publish.
    */
  def mirrorImages(images: DataFrame, t: Target,
      createdAt: java.sql.Timestamp): Long = {
    bootstrap(t)
    upsert(images.select(col("id"), col("document_id"), col("path"),
        col("caption"),
        array_join(col("tags"), ",").as("tags"),
        lit(createdAt).as("created_at")),
      "images", "id", t)
  }

  /** Delete documents by id — one set-wise statement; chunk/image rows
    * die via the FK cascade, like the reference's DELETE.
    */
  def deleteDocuments(ids: Seq[String], t: Target): Unit =
    deleteByKey("documents", "id", ids, t)

  /** Delete individual chunk rows — the mirror side of a re-drop that
    * chunks SHORTER (the chunk-store upsert computes the dead tail ids;
    * the mirror applies the same list).
    */
  def deleteChunks(ids: Seq[String], t: Target): Unit =
    deleteByKey("chunks", "id", ids, t)

  private def deleteByKey(table: String, keyCol: String, ids: Seq[String],
      t: Target): Unit =
    if (ids.nonEmpty) withConn(t) { c =>
      val probe = t.dialect match {
        case PostgresDialect => s"DELETE FROM $table WHERE $keyCol = CAST(? AS uuid)"
        case _               => s"DELETE FROM $table WHERE $keyCol = ?"
      }
      val ps = c.prepareStatement(probe)
      try {
        ids.foreach { id => ps.setString(1, id); ps.addBatch() }
        ps.executeBatch()
      } finally ps.close()
    }

  def readTable(spark: SparkSession, table: String, t: Target): DataFrame =
    spark.read.jdbc(t.url, table, t.props)
}
