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

  /** Compact a directory of appended parquet files — the Spark analog of the
    * reference's replica merge (`MergeData`, RainStorm.java:651-768): many
    * concurrent appenders converge to one well-formed file set, all appended
    * rows survive, inter-writer order unspecified (exactly the reference's
    * contract, §1.4). At scale this is the small-file fix for
    * append-heavy sinks: a directory accreting thousands of tiny files per
    * hour reads back at one-file-per-task until compacted.
    *
    * `targetFileMb` sizes output files from the actual input bytes —
    * `repartition(n)` (round-robin, balanced), NOT `coalesce(1)`, which
    * would collapse the read into a single task. The input file set is
    * SNAPSHOTTED up front: the rewrite reads exactly those files and the
    * swap removes exactly those files, so a file appended concurrently with
    * the compaction is neither folded in nor deleted — it simply survives
    * to the next compaction. The rewrite goes through a temp dir + a
    * backed-up swap so a crash mid-compact never loses the originals.
    *
    * Refuses a streaming file-sink directory (`_spark_metadata` present):
    * its exactly-once transaction log enumerates the original files by
    * name, and a compaction would silently orphan every committed batch.
    * Compact streaming sinks from the sink side (fewer, larger
    * micro-batches) or by rewriting to a NEW directory instead. */
  def compact(
      spark: org.apache.spark.sql.SparkSession,
      dir: String,
      targetFileMb: Int = 128): Unit = {
    import java.io.File
    import java.nio.file.{Files, StandardCopyOption}
    val src = new File(dir)
    require(!new File(src, "_spark_metadata").exists(),
      s"$dir is a streaming file-sink directory (_spark_metadata): compacting it " +
        "would orphan every batch in the sink's transaction log")
    // the snapshot: everything after this line operates on exactly this set
    val snapshot = src.listFiles().filter(_.getName.endsWith(".parquet"))
    if (snapshot.isEmpty) return
    val bytes = snapshot.map(_.length()).sum
    val nOut = math.max(1, math.ceil(bytes / (targetFileMb * 1024.0 * 1024.0)).toInt)
    val tmp = Files.createTempDirectory(src.getParentFile.toPath, ".compact_").toFile
    spark.read.parquet(snapshot.map(_.toString).toIndexedSeq: _*).repartition(nOut)
      .write.mode("overwrite").parquet(tmp.toString)
    val bak = Files.createTempDirectory(src.getParentFile.toPath, ".compact_bak_").toFile
    snapshot.foreach { f =>
      Files.move(f.toPath, new File(bak, f.getName).toPath,
        StandardCopyOption.REPLACE_EXISTING)
    }
    tmp.listFiles().foreach { f =>
      if (f.getName.endsWith(".parquet"))
        Files.move(f.toPath, new File(src, f.getName).toPath,
          StandardCopyOption.REPLACE_EXISTING)
    }
    org.apache.commons.io.FileUtils.deleteDirectory(bak)
    org.apache.commons.io.FileUtils.deleteDirectory(tmp)
  }

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
