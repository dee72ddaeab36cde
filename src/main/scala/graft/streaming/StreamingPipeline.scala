package graft.streaming

import graft.ops.{OpCompiler, StreamOp}
import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.types.{DoubleType, LongType, StructType}

/** Structured-Streaming execution of the reference's job model
  * (SURVEY.md §2.3): the same compiled operator pipeline over an unbounded
  * source, with the running count as checkpointed keyed state.
  *
  * Delivery: the reference is at-least-once with possible duplicates (per-tuple
  * ACK + 5s retry, no receiver dedup — Node.java:1528-1544, :117). Spark's
  * checkpointing + replayable sources + idempotent file sinks give
  * exactly-once — a strict upgrade, documented in SURVEY.md §2.3.
  */
object StreamingPipeline {

  /** State for the streaming running count: rows seen so far per shard. */
  final case class CountState(n: Long)

  /** Per-record running count over an unbounded stream, the reference's
    * AGGREGATE op (1,2,3,... one output per input, Operators.java:93-100).
    *
    * `shards` > 1 reproduces the reference's *actual* deployed semantics — N
    * interleaved partial counters, one per stage-2 worker (SURVEY.md §2.1 O9
    * caveat) — and scales linearly (state is keyed by shard). `shards` = 1 is
    * the reference's *intended* single global counter; that is inherently a
    * single serial stream of state updates on any engine, so it funnels each
    * micro-batch through one task — fine for control-plane-sized streams,
    * wrong for 100 TB (use shards > 1 or the batch prefix-sum instead). */
  def runningCount(
      df: DataFrame,
      outputCol: String = "running_count",
      shards: Int = 1): DataFrame = {
    val outSchema: StructType = df.schema.add(outputCol, LongType, nullable = false)
    val outEnc = Encoders.row(outSchema)
    val shardCol = usableShardCol(df)
    df.groupByKey { r: Row => math.floorMod(shardCol(r), shards) }(Encoders.scalaInt)
      .flatMapGroupsWithState[CountState, Row](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: Int, rows: Iterator[Row], state: GroupState[CountState]) =>
          var c = state.getOption.map(_.n).getOrElse(0L)
          // materialize the micro-batch slice: state.update must happen
          // before the returned iterator is consumed
          val out = rows.map { r => c += 1; Row.fromSeq(r.toSeq :+ c) }.toVector
          state.update(CountState(c))
          out.iterator
      }(Encoders.kryo[CountState], outEnc)
  }

  /** Shard key extractor: first column's hash (stable across retries for the
    * same row — required for exactly-once counting under task replay). */
  private def usableShardCol(df: DataFrame): Row => Int =
    r => if (r.isNullAt(0)) 0 else r.get(0).hashCode()

  /** State for the streaming running sum/max/min: None until the first
    * non-null value (SQL window semantics). */
  final case class AggAcc(acc: Option[Double])

  /** Streaming `AGGREGATE:sum|max|min:field` (graft.ops.RunningCount.Kind):
    * per-shard running aggregate of a numeric field, one output per input.
    * Accumulates in double — a stream is an ordered sequence, so the
    * accumulation order is the arrival order on both engines; the batch
    * decimal-exactness concern (cross-engine windowed-sum reassociation)
    * does not apply. Same sharding semantics as [[runningCount]]. */
  def runningAgg(
      df: DataFrame,
      valueCol: String,
      kind: graft.ops.RunningCount.Kind,
      outputCol: String,
      shards: Int = 1): DataFrame = {
    import graft.ops.RunningCount.Kind
    require(kind != Kind.Count, "use runningCount for the counter")
    val outSchema: StructType = df.schema.add(outputCol, DoubleType, nullable = true)
    val outEnc = Encoders.row(outSchema)
    val shardCol = usableShardCol(df)
    val vIdx = df.schema.fieldIndex(valueCol)
    val step: (Double, Double) => Double = kind match {
      case Kind.Sum => _ + _
      case Kind.Max => math.max
      case Kind.Min => math.min
      case Kind.Count => sys.error("unreachable")
    }
    df.groupByKey { r: Row => math.floorMod(shardCol(r), shards) }(Encoders.scalaInt)
      .flatMapGroupsWithState[AggAcc, Row](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: Int, rows: Iterator[Row], state: GroupState[AggAcc]) =>
          var acc = state.getOption.flatMap(_.acc)
          val out = rows.map { r =>
            if (!r.isNullAt(vIdx)) {
              val v = r.get(vIdx).asInstanceOf[Number].doubleValue()
              acc = Some(acc.fold(v)(step(_, v)))
            }
            Row.fromSeq(r.toSeq :+ acc.map(Double.box).orNull)
          }.toVector
          state.update(AggAcc(acc))
          out.iterator
      }(Encoders.kryo[AggAcc], outEnc)
  }

  /** Compile a reference op chain onto a (possibly streaming) DataFrame.
    * Stateless ops are the exact same Catalyst transforms as batch
    * (OpCompiler); AGGREGATE switches to the streaming state operator. */
  def pipeline(ops: Seq[StreamOp], ctx: OpCompiler.Ctx, shards: Int = 1)(
      df: DataFrame): DataFrame =
    ops.foldLeft((df, ctx)) { case ((d, c), op) =>
      op match {
        case StreamOp.Aggregate => (runningCount(d, shards = shards), c)
        case StreamOp.AggregateField(kind, field) =>
          (runningAgg(d, field, kind,
            "running_" + kind.toString.toLowerCase, shards), c)
        case other =>
          val (f, c2) = OpCompiler.compile(other, c)
          (f(d), c2)
      }
    }._1

  /** Text-line file stream source — the streaming analog of Tables.lines
    * (the reference's chunk files appearing in HyDFS). */
  def fileLines(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.text(dir).withColumn("file", input_file_name())

  /** Socket source (BASELINE.json spark_approach: "Structured Streaming +
    * Kafka/socket source"; no Kafka connector ships in this environment). */
  def socketLines(spark: SparkSession, host: String, port: Int): DataFrame =
    spark.readStream.format("socket")
      .option("host", host).option("port", port).load()

  /** Event-time tumbling-window counts with a watermark — the windowed-agg
    * surface the reference lacks entirely (SURVEY.md §2.3: no event time, no
    * windows, no late-data handling). State is keyed by (window, key):
    * partition-scalable, expired by the watermark. */
  def windowedCounts(
      events: DataFrame,
      tsCol: String = "ts",
      keyCol: String = "event_type",
      windowLen: String = "1 hour",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen), col(keyCol))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("w_start"), col(keyCol), col("n"))

  /** Sliding-window event-time counts: each event lands in len/slide
    * overlapping windows. Same watermarked state shape as [[windowedCounts]];
    * state size multiplies by the overlap factor, not the stream length. */
  def slidingCounts(
      events: DataFrame,
      tsCol: String = "ts",
      keyCol: String = "event_type",
      windowLen: String = "2 hours",
      slide: String = "1 hour",
      watermark: String = "4 hours"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen, slide), col(keyCol))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("w_start"), col(keyCol), col("n"))

  /** Session-window event-time counts: per key, events within `gap` of the
    * previous event share a session (gaps-and-islands). Works on batch and
    * streaming frames — Spark's session_window merges partial sessions under
    * the watermark; state is bounded by open sessions per key. */
  def sessionCounts(
      events: DataFrame,
      tsCol: String = "ts",
      keyCol: String = "event_type",
      gap: String = "30 minutes",
      watermark: Option[String] = None): DataFrame = {
    val src = watermark.fold(events)(events.withWatermark(tsCol, _))
    src
      .groupBy(session_window(col(tsCol), gap), col(keyCol))
      .agg(count(lit(1)).as("n"))
      .select(col("session_window.start").as("s_start"), col(keyCol), col("n"))
  }

  /** Results sink: append files + checkpoint — the analog of the reference's
    * job<k>_results.log with exactly-once instead of at-least-once. */
  def startFileSink(
      df: DataFrame,
      outDir: String,
      checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    df.writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .outputMode(OutputMode.Append)
      .trigger(trigger)
      .start()
}
