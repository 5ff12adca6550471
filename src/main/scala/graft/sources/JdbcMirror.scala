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
  * partitions straight into `<table>_stage`), then one driver-side
  * set-wise `DELETE … WHERE id IN (SELECT id FROM stage)` + `INSERT …
  * SELECT` publishes it transactionally on the DB side — no row ever
  * passes through the driver, and replacement is by-key, not
  * by-truncation. Deletes ride the `documents` FK cascade, mirroring the
  * reference DDL.
  *
  * Dialect: tested against embedded Derby (the JDBC engine in
  * /opt/spark/jars); Postgres differs only in the bootstrap DDL types
  * (UUID/TIMESTAMPTZ/TEXT[] vs CHAR(36)/TIMESTAMP/VARCHAR — tags are
  * comma-joined in the portable shape).
  */
object JdbcMirror {

  final case class Target(url: String, user: String = "", password: String = "") {
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
    val rs = c.getMetaData.getTables(null, null, name.toUpperCase, null)
    try rs.next() finally rs.close()
  }

  /** Reference-DDL bootstrap (idempotent). Key/text types are the
    * portable dialect; the FK keeps ON DELETE CASCADE so document
    * deletion propagates inside the DB exactly as in the reference.
    */
  def bootstrap(t: Target): Unit = withConn(t) { c =>
    val ddl = Seq(
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
           created_at TIMESTAMP)""")
    val st = c.createStatement()
    try ddl.foreach { case (name, sql) =>
      if (!tableExists(c, name)) st.executeUpdate(sql.replaceAll("\\s+", " "))
    } finally st.close()
  }

  /** Delta upsert: stage with the parallel executor-side JDBC writer,
    * publish with one set-wise DELETE+INSERT on the DB. `df` must carry
    * the target table's columns; replacement is by `keyCol`.
    */
  def upsert(df: DataFrame, table: String, keyCol: String, t: Target): Unit = {
    val stage = s"${table}_stage"
    df.write.mode("overwrite").jdbc(t.url, stage, t.props)
    withConn(t) { c =>
      c.setAutoCommit(false)
      val st = c.createStatement()
      try {
        // the stage column MUST be table-qualified AND quoted: Spark's
        // JDBC writer creates case-sensitive (quoted) column names, so an
        // unqualified `keyCol` in the subquery would fail to resolve
        // against the stage and silently CORRELATE to the outer table —
        // `WHERE id IN (SELECT id)` is a tautology that deletes every row
        // the CAST makes the stage's string type (CLOB under Derby's
        // Spark dialect) comparable with the target's CHAR key
        st.executeUpdate(
          s"""DELETE FROM $table WHERE $keyCol IN""" +
            s""" (SELECT CAST(s."$keyCol" AS VARCHAR(512)) FROM $stage s)""")
        st.executeUpdate(
          s"INSERT INTO $table SELECT * FROM $stage")
        c.commit()
      } catch { case e: Throwable => c.rollback(); throw e }
      finally st.close()
    }
    withConn(t) { c =>
      val st = c.createStatement()
      try st.executeUpdate(s"DROP TABLE $stage") finally st.close()
    }
  }

  /** Mirror a chunk-store frame: documents roll up from their chunks
    * (the reference writes both sides in the same worker transaction),
    * then the chunk rows — FK order. Columns follow the reference DDL;
    * `created_at` is the mirror publish time only in the reference (a
    * DB default); here it is supplied by the caller for determinism.
    */
  def mirrorChunks(chunks: DataFrame, t: Target,
      createdAt: java.sql.Timestamp): Unit = {
    bootstrap(t)
    val docs = chunks
      .groupBy(col("document_id"))
      .agg(first(col("path"), ignoreNulls = true).as("filename"),
        first(col("kind"), ignoreNulls = true).as("kind"),
        sum(octet_length(col("text"))).as("size_bytes"))
      .select(col("document_id").as("id"), col("filename"),
        coalesce(col("kind"), lit("text")).as("kind"),
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
    * as an array column and land comma-joined — the portable shape for
    * the reference's TEXT[].
    */
  def mirrorImages(images: DataFrame, t: Target,
      createdAt: java.sql.Timestamp): Unit = {
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
      val ps = c.prepareStatement(s"DELETE FROM $table WHERE $keyCol = ?")
      try {
        ids.foreach { id => ps.setString(1, id); ps.addBatch() }
        ps.executeBatch()
      } finally ps.close()
    }

  def readTable(spark: SparkSession, table: String, t: Target): DataFrame =
    spark.read.jdbc(t.url, table, t.props)
}
