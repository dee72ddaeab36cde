package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Source layer: schema-on-read replaces the reference's hard-coded positional
  * column array (Node.java:113-115) and its HyDFS fetch-to-local-disk scan
  * (Node.java:304-312). Storage durability/replication is delegated to the
  * filesystem (SURVEY.md §1.5) — Spark reads any Hadoop-compatible path.
  */
object Tables {

  /** The one schema the reference knows: 19 string columns for the
    * Traffic_Signs CSVs (Node.java:113-115; files carry no header row). */
  val trafficSignsSchema: StructType = StructType(
    Seq("X", "Y", "OBJECTID", "Sign_Type", "Size_", "Supplement", "Sign_Post",
      "Year_Insta", "Category", "Notes", "MUTCD", "Ownership", "FACILITYID",
      "Schools", "Location_Adjusted", "Replacement_Zone", "Sign_Text",
      "Set_ID", "FieldVerifiedDate").map(StructField(_, StringType, nullable = true)))

  /** Proper RFC-4180 CSV read (quoted commas handled) — the deliberate
    * divergence from the reference's naive `line.split(",")`
    * (Operators.java:174, SURVEY.md §1.1). */
  def trafficSigns(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(trafficSignsSchema)
      .option("header", "false").option("quote", "\"").option("escape", "\"")
      .csv(path)

  /** Compatibility mode (SURVEY.md §7.3): the reference's naive `split(",")`
    * column semantics, quoted commas and all — byte-parity with its outputs
    * on rows where RFC-4180 and naive parsing disagree. Off the default
    * path; use [[trafficSigns]] unless replicating reference output. */
  def trafficSignsNaive(spark: SparkSession, path: String): DataFrame = {
    val parts = split(col("value"), ",")
    spark.read.text(path).select(
      trafficSignsSchema.fieldNames.zipWithIndex.map {
        case (n, i) => parts.getItem(i).as(n)
      }.toSeq: _*)
  }

  /** Line-tuple source: one row per text line with lineage identity
    * (file, line_no) — the Spark analog of the reference's
    * `uniqueId:filename,lineNumber` tuple id (Node.java:907-913).
    *
    * Exact numbering even when one file spans multiple scan blocks: a block's
    * rows always sit in one scan partition in file order (a FilePartition
    * holds whole splits), but FilePartitions bin-pack splits sorted by SIZE,
    * so partition order does NOT follow file offset order — ordering by
    * `monotonically_increasing_id` alone misnumbers multi-block files. Keying
    * on `_metadata.file_block_start` restores the offset order:
    *   1. in-block index: row_number over (file, block) — a BALANCED shuffle
    *      (blocks are <= maxPartitionBytes), never one reducer per file;
    *   2. per-(file, block) line counts, prefix-summed per file in block
    *      order — one tiny row per block (~800k rows at 100 TB / 128 MB);
    *   3. broadcast the offsets back: line_no = block offset + in-block index.
    */
  def lines(spark: SparkSession, path: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val raw = spark.read.text(path).select(
      col("value"),
      col("_metadata.file_path").as("file"),
      col("_metadata.file_block_start").as("__blk"))
    // mid ascends within each scan partition, so after the (file, block)
    // shuffle it reconstructs the original in-block (= in-file) row order
    val wBlk = Window.partitionBy(col("file"), col("__blk"))
      .orderBy(monotonically_increasing_id())
    val offsets = raw.groupBy("file", "__blk")
      .agg(count(lit(1)).as("__n"))
      .withColumn("__off",
        sum("__n").over(Window.partitionBy("file").orderBy("__blk")) - col("__n"))
      .select("file", "__blk", "__off")
    raw
      .withColumn("__i", row_number().over(wBlk).cast("long") - 1L)
      .join(broadcast(offsets), Seq("file", "__blk"))
      .withColumn("line_no", col("__off") + col("__i"))
      .select("value", "file", "line_no")
  }

  val tableNames: Seq[String] =
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings")

  /** Schema-by-path cache (r18): `DataFrameReader.parquet` EAGERLY infers
    * the schema — a footer read + file listing costing ~80 ms per call on
    * the bench host where `read.schema(cached).parquet` costs ~10 ms —
    * and the query registry constructs 1-3 table reads per query. The
    * cache holds ONLY the inferred StructType (pure metadata, the thing a
    * catalog/metastore persists); every read still scans the parquet
    * DATA, and each call builds a FRESH relation (fresh attribute ids, so
    * self-joins are unaffected). Keyed by (path, the two confs that can
    * change what a timestamp column infers as); a path, once read under a
    * given conf pair, is assumed schema-stable for the JVM lifetime — the
    * testdata contract (tests that rewrite schemas use fresh temp dirs). */
  private val schemaCache = new java.util.concurrent.ConcurrentHashMap[
    (String, String, String), org.apache.spark.sql.types.StructType]()

  /** Load one driver-generated parquet table from an sf directory. */
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val path = s"$sfDir/$name.parquet"
    val key = (path,
      spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false"),
      spark.conf.get("spark.sql.parquet.inferTimestampNTZ.enabled", "true"))
    val sch = schemaCache.computeIfAbsent(key,
      _ => spark.read.parquet(path).schema)
    spark.read.schema(sch).parquet(path)
  }

  /** Events table with a usable instant-typed `ts`, whatever the parquet
    * snapshot stored:
    *   - TIMESTAMP(NANOS) reads as a nanos-since-epoch long under
    *     spark.sql.legacy.parquet.nanosAsLong=true — convert via integer
    *     division (double division would lose precision above 2^53 ns);
    *   - timestamp[us] without isAdjustedToUTC reads as TIMESTAMP_NTZ when
    *     a session has NTZ inference on (GraftSession turns it off) — the
    *     stored wall-clock fields are UTC instants, so rebuild the instant
    *     via make_timestamp(..., 'UTC'). A bare cast(ts as timestamp) would
    *     interpret the wall clock in the SESSION zone — epoch-preserving
    *     only when that zone happens to be UTC; make_timestamp with an
    *     explicit fixed-offset zone is correct under any session zone (and
    *     'UTC' has no DST, so the field→instant map is bijective). */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    val e = table(spark, sfDir, "events")
    e.schema("ts").dataType match {
      case LongType => e.withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
      case TimestampNTZType => e.withColumn("ts", expr(
        "make_timestamp(year(ts), month(ts), day(ts), hour(ts), minute(ts), date_part('SECOND', ts), 'UTC')"))
      case _ => e
    }
  }

  /** Register all tables as temp views (for spark.sql use). `events` goes
    * through [[events]] so the view's `ts` is instant-typed whatever the
    * snapshot stored (raw registration would expose a nanos long or an NTZ
    * column to SQL, contradicting that contract). */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    tableNames.foreach { n =>
      val df = if (n == "events") events(spark, sfDir) else table(spark, sfDir, n)
      df.createOrReplaceTempView(n)
    }

  /** JSONL (newline-delimited JSON) ingest with an explicit quarantine
    * contract — the interchange format every crawl/annotation pipeline
    * ships. Schema is REQUIRED (schema inference is a full extra pass over
    * the data and is nondeterministic under corrupt rows — never acceptable
    * at 100 TB). The read goes through the TEXT source + `from_json` with a
    * corrupt-record field, NOT `spark.read.json`: the json scan forbids
    * plans that touch only its corrupt column (SPARK-21610 — the documented
    * workaround is caching, a second read, or exactly this formulation),
    * while the text+from_json shape parses once, stays scan-bound with zero
    * shuffles, never silently drops a row (DROPMALFORMED's failure mode)
    * and never kills the job on one bad line (FAILFAST's). Malformed lines
    * come back with null data fields and the raw line byte-exact in
    * `corruptCol`. The same expression runs on `readStream.text` for
    * ingest. */
  def jsonl(
      spark: SparkSession,
      path: String,
      schema: StructType,
      corruptCol: String = "_corrupt_record"): DataFrame = {
    require(!schema.fieldNames.contains(corruptCol),
      s"schema already defines $corruptCol")
    val withCorrupt = schema.add(StructField(corruptCol, StringType, nullable = true))
    spark.read.text(path)
      .select(from_json(col("value"), withCorrupt,
        Map("mode" -> "PERMISSIVE",
          "columnNameOfCorruptRecord" -> corruptCol)).as("__j"))
      .select((schema.fieldNames.toSeq :+ corruptCol).map(n => col("__j." + n)): _*)
  }

  /** (good, quarantined) split of [[jsonl]]: good rows lose the corrupt
    * column; quarantined rows keep their (null) data fields plus the raw
    * line for a replay/fix-up sink. */
  def jsonlSplit(
      spark: SparkSession,
      path: String,
      schema: StructType,
      corruptCol: String = "_corrupt_record"): (DataFrame, DataFrame) = {
    val all = jsonl(spark, path, schema, corruptCol)
    (all.filter(col(corruptCol).isNull).drop(corruptCol),
      all.filter(col(corruptCol).isNotNull))
  }
}
