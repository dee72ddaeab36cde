package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Batch sinks mirroring the reference's dual logs (Node.java:1162-1187):
  * `job<k>_results.log` (operator outputs) and `job<k>_tuples.log`
  * (`uniqueId,workerId,lineNumber,result` lineage). Our lineage identity is
  * (file, line_no) from [[Tables.lines]] plus the physical partition id in
  * place of the worker id; delivery is exactly-once (idempotent overwrite)
  * rather than the reference's append-with-possible-duplicates.
  *
  * Streaming equivalents live in [[graft.streaming.StreamingPipeline]]
  * (checkpointed file sink). */
object Sinks {

  /** Write the results log and, when lineage columns are present, the
    * tuple/lineage log next to it. */
  def writeResultsWithLineage(
      result: DataFrame,
      resultsPath: String,
      lineagePath: String,
      lineageCols: Seq[String] = Seq("file", "line_no")): Unit = {
    result.write.mode("overwrite").parquet(resultsPath)
    val present = lineageCols.filter(result.columns.contains)
    if (present.nonEmpty) {
      result
        .select(present.map(col) :+ spark_partition_id().as("worker"): _*)
        .write.mode("overwrite").parquet(lineagePath)
    }
  }
}
