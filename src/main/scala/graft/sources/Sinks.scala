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
    * to the next compaction.
    *
    * Crash recovery: the swap is a manifest + marker commit protocol, with
    * the scratch dirs INSIDE the target as dot-prefixed children (hidden
    * from Spark's readers). A manifest naming every original and every
    * replacement file is persisted before the first move; a `committed`
    * marker lands only after the last move. The next compact() call
    * deterministically finishes the story: committed → scrub leftovers,
    * uncommitted → roll the originals back and drop the partial
    * replacements. Durability ordering for power crashes: the manifest (and
    * the directories it lives in) is fsynced before the first move, so no
    * persisted ordering of renames can surface a replacement file the
    * manifest doesn't name; and every replacement's CONTENTS plus the
    * target directory are fsynced before the `committed` marker is created,
    * so recovery can never see `committed` while the replacement bytes are
    * still volatile — a crash before the marker rolls back to the fsync'd
    * originals, a crash after it has durable replacements. A crash at ANY
    * instant therefore loses no appended row (modulo a filesystem that
    * refuses directory fsync, where the guarantee degrades to its own
    * rename-ordering promises — see [[fsyncDir]]). (Readers racing a
    * compaction may transiently see a mixed file set — same as any
    * multi-file swap on a plain filesystem; crash safety, not reader
    * isolation, is the contract here, matching the reference's MergeData.)
    * A missing or not-yet-created directory is a no-op.
    *
    * Concurrency: an exclusive lock file (`.compact.lock`, advisory OS
    * file lock) serializes compactions of one directory — two concurrent
    * compact() calls would otherwise destroy each other (the second's
    * recovery pass rolls back the first's in-flight swap). The second
    * caller blocks, then sees the first's committed result.
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
    import java.nio.file.{Files, StandardCopyOption, StandardOpenOption}
    val src = new File(dir)
    if (!src.isDirectory) return // nothing has been appended yet
    require(!new File(src, "_spark_metadata").exists(),
      s"$dir is a streaming file-sink directory (_spark_metadata): compacting it " +
        "would orphan every batch in the sink's transaction log")
    // in-process monitor first (same-JVM overlap on an OS file lock throws
    // OverlappingFileLockException rather than blocking), then the OS lock
    // for cross-process exclusion
    val monitor = jvmLocks.computeIfAbsent(src.getCanonicalPath, _ => new Object)
    monitor.synchronized {
    val lockCh = java.nio.channels.FileChannel.open(new File(src, LockName).toPath,
      StandardOpenOption.CREATE, StandardOpenOption.WRITE)
    val lock = lockCh.lock() // exclusive; a second compactor process blocks here
    try {
      recoverInterrupted(src)
      // the snapshot: everything after this line operates on exactly this set
      val snapshot = src.listFiles().filter(f => f.isFile && f.getName.endsWith(".parquet"))
      if (snapshot.isEmpty) return
      val bytes = snapshot.map(_.length()).sum
      val nOut = math.max(1, math.ceil(bytes / (targetFileMb * 1024.0 * 1024.0)).toInt)
      val tmp = Files.createTempDirectory(src.toPath, TmpPrefix).toFile
      spark.read.parquet(snapshot.map(_.toString).toIndexedSeq: _*).repartition(nOut)
        .write.mode("overwrite").parquet(tmp.toString)
      val replacements = tmp.listFiles().filter(_.getName.endsWith(".parquet"))
      val bak = Files.createTempDirectory(src.toPath, BakPrefix).toFile
      // the manifest makes every later step replayable: first the full plan,
      // forced to disk (file contents + its directory entry) so no persisted
      // ordering of the renames below can outrun it...
      val manifest =
        replacements.map(f => s"new\t${f.getName}") ++ snapshot.map(f => s"old\t${f.getName}")
      Files.write(new File(bak, ManifestName).toPath,
        java.util.Arrays.asList(manifest: _*))
      fsyncFile(new File(bak, ManifestName))
      fsyncDir(bak)
      fsyncDir(src)
      // ...then the moves it describes
      snapshot.foreach { f =>
        Files.move(f.toPath, new File(bak, f.getName).toPath,
          StandardCopyOption.REPLACE_EXISTING)
      }
      replacements.foreach { f =>
        val dst = new File(src, f.getName)
        Files.move(f.toPath, dst.toPath, StandardCopyOption.REPLACE_EXISTING)
        fsyncFile(dst) // replacement CONTENTS durable before we can commit
      }
      fsyncDir(src) // ...and their directory entries
      Files.createFile(new File(bak, CommittedName).toPath) // the commit point
      fsyncDir(bak) // marker entry durable before the bak originals vanish
      org.apache.commons.io.FileUtils.deleteDirectory(bak)
      org.apache.commons.io.FileUtils.deleteDirectory(tmp)
    } finally {
      lock.release()
      lockCh.close()
    }
    }
  }

  private val jvmLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  private val TmpPrefix = ".compact_tmp_"
  private val BakPrefix = ".compact_bak_"
  private val ManifestName = "manifest"
  private val CommittedName = "committed"
  private val LockName = ".compact.lock"

  /** fsync a file's contents. */
  private def fsyncFile(f: java.io.File): Unit = {
    val ch = java.nio.channels.FileChannel.open(f.toPath,
      java.nio.file.StandardOpenOption.WRITE)
    try ch.force(true) finally ch.close()
  }

  /** fsync a directory so its entries (new files, renames) are durable.
    * Some filesystems refuse to open a directory for sync — crash
    * durability degrades to the filesystem's rename-ordering there, which
    * is the pre-fsync behavior, so best-effort is strictly an improvement. */
  private def fsyncDir(d: java.io.File): Unit = {
    try {
      val ch = java.nio.channels.FileChannel.open(d.toPath,
        java.nio.file.StandardOpenOption.READ)
      try ch.force(true) finally ch.close()
    } catch { case _: java.io.IOException => }
  }

  /** Finish or roll back a compaction interrupted by a crash, using the
    * scratch dirs it left inside `src`. Committed bak → the swap finished,
    * scrub it; uncommitted bak with a manifest → delete the replacement
    * files named by the manifest (some may have landed) and restore every
    * original; bak without a manifest → nothing was moved yet. Leftover tmp
    * dirs are always safe to drop once baks are resolved. */
  private def recoverInterrupted(src: java.io.File): Unit = {
    import java.io.File
    import java.nio.file.{Files, StandardCopyOption}
    import scala.jdk.CollectionConverters._
    val children = src.listFiles()
    children.filter(d => d.isDirectory && d.getName.startsWith(BakPrefix)).foreach { bak =>
      val committed = new File(bak, CommittedName).exists()
      val manifestFile = new File(bak, ManifestName)
      if (!committed && manifestFile.exists()) {
        val lines = Files.readAllLines(manifestFile.toPath).asScala
        val newNames = lines.collect { case l if l.startsWith("new\t") => l.drop(4) }
        newNames.foreach(n => Files.deleteIfExists(new File(src, n).toPath))
        bak.listFiles().filter(_.getName.endsWith(".parquet")).foreach { f =>
          Files.move(f.toPath, new File(src, f.getName).toPath,
            StandardCopyOption.REPLACE_EXISTING)
        }
      }
      org.apache.commons.io.FileUtils.deleteDirectory(bak)
    }
    children.filter(d => d.isDirectory && d.getName.startsWith(TmpPrefix))
      .foreach(org.apache.commons.io.FileUtils.deleteDirectory)
  }

  /** Deterministic sharded JSONL export — the training-shard writer at the
    * END of a curation pipeline (the artifact a trainer's data loader
    * consumes: N line-delimited-JSON shards of roughly `maxShardBytes`
    * each, membership a PURE FUNCTION of the row id so re-exports, added
    * executors, and engine swaps produce byte-identical shard membership).
    *
    * Shard count: one aggregate sums an EXPLICIT per-row byte estimator —
    * `octet_length(text columns) + octet_length(id) + rowOverhead`, exact
    * integers both engines — and nShards = ceil(total / maxShardBytes)
    * (integer ceil-div). Estimated bytes, not serialized bytes, by design:
    * the estimator is engine-portable (a DuckDB oracle derives the SAME
    * shard count and assignment), while to_json's exact formatting is not.
    * Assignment: the [[graft.operators.Curation.hashBucketSalted]] salted
    * md5 mod nShards — the split/sample discipline.
    *
    * Scale shape: one estimator agg (partial-combined) + the one
    * data-sized exchange ANY export pays (repartition on the shard id, so
    * each shard is written by exactly one task as exactly one file) + the
    * streaming JSON writer. Hash collisions may co-locate two shards in
    * one task; each still writes its own file under its `shard=` dir.
    * Returns the shard count.
    *
    * Incremental delivery: pass `fixedShards = Some(n)` (the count a
    * previous full export returned) and `append = true` — the new batch
    * lands as ONE additional file per touched `shard=` dir, membership
    * identical to what the full export would assign (it is a pure
    * function of (id, salt, n)), and the estimator agg is skipped. The
    * standard daily-increment shape; re-balance by re-running the full
    * export when drift warrants. */
  def exportShardedJsonl(
      df: DataFrame,
      outDir: String,
      idCol: String,
      maxShardBytes: Long,
      rowOverhead: Int = 32,
      salt: String = "shard",
      fixedShards: Option[Int] = None,
      append: Boolean = false): Int = {
    require(maxShardBytes >= 1, s"maxShardBytes must be >= 1: $maxShardBytes")
    fixedShards.foreach(n => require(n >= 1, s"fixedShards must be >= 1: $n"))
    // withColumn REPLACES by name — a pre-existing 'shard' column would be
    // silently overwritten, changing the exported payload without warning
    require(!df.columns.contains("shard"),
      "exportShardedJsonl: input already has a 'shard' column — rename it " +
        "(the export derives its own shard id and would silently replace it)")
    val nShards = fixedShards.getOrElse {
      val textBytes = df.columns.filter(_ != idCol)
        .map(c => coalesce(octet_length(col(c).cast("string")), lit(0)))
        .foldLeft(octet_length(col(idCol).cast("string")).cast("long"))(_ + _)
      val total = df.agg(sum(textBytes + lit(rowOverhead)).cast("long"))
        .collect()(0) match {
          case r if r.isNullAt(0) => 0L
          case r => r.getLong(0)
        }
      val n = math.max(1L, (total + maxShardBytes - 1) / maxShardBytes)
      // fail fast, never wrap: a silent .toInt truncation here would break
      // the pure-function membership contract (engine vs oracle vs rerun)
      require(n <= Int.MaxValue,
        s"shard count $n exceeds Int.MaxValue — raise maxShardBytes " +
          s"(=$maxShardBytes) for this ${total}B corpus")
      n.toInt
    }
    df.withColumn("shard",
        graft.operators.Curation.hashBucketSalted(col(idCol), salt, nShards))
      .repartition(nShards, col("shard"))
      .write.mode(if (append) "append" else "overwrite")
      .partitionBy("shard").json(outDir)
    nShards
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
