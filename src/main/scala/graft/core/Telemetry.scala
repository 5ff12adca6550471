package graft.core

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.functions._
import org.apache.spark.sql.util.QueryExecutionListener

/** Pipeline telemetry (SURVEY §2.4 A4/A7): the reference keeps per-run
  * counters (files_scanned, chunks_parsed, per-kind maps —
  * ingest_dropzone.py:512-522; monotonically incremented totals —
  * telemetry.py:56-71). On Spark these become `df.observe` metrics —
  * computed inside the job with zero extra passes — collected by a
  * QueryExecutionListener.
  */
object Telemetry {

  val MetricsName = "graft_metrics"

  private val lastMetrics = new ConcurrentHashMap[String, Row]()

  /** Attach ingest-summary metrics to a chunk-level DataFrame; they are
    * observed when the frame is executed (write/count/...).
    */
  def observeIngest(chunks: DataFrame, runId: String = "last"): DataFrame =
    chunks.observe(s"$MetricsName/$runId",
      count(lit(1)).as("chunks"),
      approx_count_distinct(col("document_id")).as("documents_approx"),
      sum(length(col("text"))).as("chars"),
      count(when(col("kind") === "text", 1)).as("kind_text"),
      count(when(col("kind") === "csv", 1)).as("kind_csv"),
      count(when(col("kind") === "json", 1)).as("kind_json"))

  /** Install the listener once per session; metrics land in [[metrics]]. */
  def install(spark: SparkSession): Unit =
    spark.listenerManager.register(new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
        qe.observedMetrics.foreach { case (name, row) =>
          if (name.startsWith(MetricsName)) {
            val runId = name.stripPrefix(s"$MetricsName/")
            lastMetrics.put(runId, row)
          }
        }
      override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit = ()
    })

  /** Last observed metrics row for a run id (reference's last-ingest
    * snapshot, status.py:51-91).
    */
  def metrics(runId: String = "last"): Option[Row] = Option(lastMetrics.get(runId))
}
