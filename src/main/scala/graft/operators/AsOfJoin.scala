package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: for every left row, the single most recent
  * right row with the same key and `rightTs <= leftTs` — the query behind
  * feature lookups ("the user's latest profile snapshot when this event
  * fired"), trade/quote alignment, and slowly-changing-dimension reads.
  * Spark has no ASOF JOIN operator; the standard workarounds are a range
  * join (quadratic blow-up between dense keys) or a windowed dedup after an
  * inequality join. This is the composition that stays linear:
  *
  * Tag both inputs, UNION them (cheap: no shuffle yet), then one window
  * over (key, ts, side) carrying `last(right payload, ignoreNulls)` up to
  * the current row. Right rows sort BEFORE left rows at equal ts, so a
  * same-instant right row is visible (the ASOF `>=` convention, matching
  * DuckDB). Exactly ONE shuffle on the key — same cost as the groupBys
  * around it — and no row-count explosion at any key density: 100 TB of
  * events against 10 TB of snapshots moves each row exactly once. Window
  * state is one payload struct per partition-frame, not a buffered list.
  *
  * Left rows keep all their columns; matched right columns arrive as
  * `asof_<col>` (null where no right row precedes).
  *
  * PRECONDITION: the right side should be unique per (key, ts) — two right
  * rows tying on both leave `last()` picking whichever the shuffle ordered
  * later, a payload-nondeterministic result (as in any engine's ASOF; the
  * gate queries pre-aggregate with groupBy(key, ts) for exactly this
  * reason). Duplicate LEFT rows are fine and each keeps its match.
  *
  * `direction`: "backward" (default) matches the most recent right row with
  * `rightTs <= leftTs`; "forward" matches the EARLIEST right row with
  * `rightTs >= leftTs` (pandas merge_asof's directions; same-instant rows
  * match in both). Forward is the same window walked in reverse time. */
object AsOfJoin {

  /** `tolerance` (pandas merge_asof parity): a match further than this from
    * the left timestamp is discarded (the row keeps flowing with a null
    * match). Units: event-time MICROSECONDS for timestamp columns, the
    * column's own units for numeric ts. Sound as a post-filter because the
    * as-of match is the CLOSEST candidate — if it sits outside the
    * tolerance, every other candidate sits further. */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftTsCol: String = "ts",
      rightTsCol: String = "ts",
      rightValueCols: Seq[String] = Nil,
      direction: String = "backward",
      tolerance: Option[Long] = None): DataFrame = {
    require(keyCols.nonEmpty, "as-of join needs at least one key column")
    require(direction == "backward" || direction == "forward",
      s"direction must be backward|forward: $direction")
    tolerance.foreach(t => require(t >= 0, s"tolerance must be >= 0: $t"))
    val valueCols =
      if (rightValueCols.nonEmpty) rightValueCols
      else right.columns.toSeq.filterNot(c => keyCols.contains(c) || c == rightTsCol)
    require(valueCols.nonEmpty, "right side has no payload columns")

    val leftCols = left.columns.toSeq
    // one unified layout: keys, event time, side tag, left payload struct,
    // right payload struct (each side nulls the other's struct)
    val lTagged = left.select(
      keyCols.map(col) ++ Seq(
        col(leftTsCol).as("__t"),
        lit(1).as("__side"),
        struct(leftCols.map(col): _*).as("__l"),
        lit(null).cast(structType(right, valueCols :+ rightTsCol)).as("__r")): _*)
    // SQL join semantics: a null key or null ts on the right can never
    // match anything (`=` and `>=` are never true against null) — drop
    // those rows BEFORE the union, or the window would group null keys
    // together and hand null-key left rows a match a real join would not.
    // Null-key/ts LEFT rows keep flowing and get a null match: their
    // partition holds no right rows (null keys) or they sort before every
    // right row (null ts, asc_nulls_first).
    val rTagged = right
      .filter((keyCols :+ rightTsCol).map(col(_).isNotNull).reduce(_ && _))
      .select(
        keyCols.map(col) ++ Seq(
          col(rightTsCol).as("__t"),
          lit(0).as("__side"),
          lit(null).cast(structType(left, leftCols)).as("__l"),
          struct((valueCols :+ rightTsCol).map(col): _*).as("__r")): _*)

    // both directions order right rows (side 0) before left rows at equal
    // ts, so a same-instant match is visible; forward just walks time
    // backwards. Nulls-first under .desc keeps null-ts LEFT rows ahead of
    // every right row in either direction (they must not match).
    val tOrder = if (direction == "backward") col("__t").asc
                 else col("__t").desc_nulls_first
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy(tOrder, col("__side").asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val carried0 = lTagged.unionByName(rTagged)
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    val carried = tolerance match {
      case None => carried0
      case Some(tol) =>
        val mTs = col("__m").getField(rightTsCol)
        val diff =
          if (direction == "backward") tsDiff(col("__t"), mTs, right.schema(rightTsCol).dataType)
          else tsDiff(mTs, col("__t"), right.schema(rightTsCol).dataType)
        // null diff (no match / null left ts) falls through to null — the
        // same "no match" the row already had
        carried0.withColumn("__m", when(diff <= tol, col("__m")))
    }

    carried.select(
      leftCols.map(c => col("__l").getField(c).as(c)) ++
        valueCols.map(c => col("__m").getField(c).as(s"asof_$c")) :+
        col("__m").getField(rightTsCol).as(s"asof_$rightTsCol"): _*)
  }

  /** As-of join for a STREAMING left side against a static snapshot table —
    * the streaming feature-lookup shape (events × slowly-changing profile
    * snapshots). The union+window composition above can't run on a stream
    * (no window functions over unbounded input), and the naive
    * join-then-max-per-event needs a stateful post-join aggregation. This
    * takes a different route with ZERO streaming state: one batch `lead()`
    * window turns each snapshot into a half-open validity interval
    * (backward: `[ts, next_ts)`; forward: `(prev_ts, ts]`), and the
    * stream-static join condition `key match AND leftTs inside interval`
    * then hits AT MOST ONE snapshot row per event. Stateless append-mode
    * plan: no watermark needed, checkpoint recovery is the file-source
    * offset log alone, and each micro-batch costs one hash join (the
    * planner broadcasts the interval table when it fits — the common case
    * for dimension snapshots; at 100 TB of stream the events never shuffle
    * at all on that plan). Same null semantics, output layout
    * (`asof_<col>`), same-instant `>=`/`<=` conventions and right-side
    * (key, ts)-uniqueness precondition as [[asofJoin]]; parity is
    * spec-pinned on in-order streams and oracle-gated in batch mode
    * (`q_asof_iv` — the operator is pure DataFrame composition, so the
    * same code path serves both).
    *
    * By default the static subplan (snapshot scan + validity window)
    * re-executes every micro-batch. `persistSnapshots = true` persists the
    * derived INTERVAL table (MEMORY_AND_DISK) so batch 1 materializes it
    * once and later batches read the cached blocks (spec-pinned: the
    * snapshot rows are evaluated exactly once across batches). The cache
    * holds the post-window interval rows — keys, payload, ts, bound — not
    * the raw snapshot table; it lives until the session ends or the caller
    * clears it (`spark.catalog.clearCache()` / unpersisting). Leave it off
    * for one-shot batch use of this operator, where a cache is pure
    * overhead. */
  def asofJoinStreamStatic(
      events: DataFrame,
      snapshots: DataFrame,
      keyCols: Seq[String],
      leftTsCol: String = "ts",
      rightTsCol: String = "ts",
      rightValueCols: Seq[String] = Nil,
      direction: String = "backward",
      tolerance: Option[Long] = None,
      persistSnapshots: Boolean = false): DataFrame = {
    require(keyCols.nonEmpty, "as-of join needs at least one key column")
    require(direction == "backward" || direction == "forward",
      s"direction must be backward|forward: $direction")
    tolerance.foreach(t => require(t >= 0, s"tolerance must be >= 0: $t"))
    val valueCols =
      if (rightValueCols.nonEmpty) rightValueCols
      else snapshots.columns.toSeq.filterNot(c => keyCols.contains(c) || c == rightTsCol)
    require(valueCols.nonEmpty, "right side has no payload columns")

    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols.map(col): _*).orderBy(col(rightTsCol).asc)
    val boundCol =
      if (direction == "backward") lead(col(rightTsCol), 1).over(w)
      else lag(col(rightTsCol), 1).over(w)
    // right-side rows with a null key or ts can never match (SQL join
    // semantics) — drop them before the window, as the batch path does
    val ivd0 = snapshots
      .filter((keyCols :+ rightTsCol).map(col(_).isNotNull).reduce(_ && _))
      .withColumn("__bound", boundCol)
      .select(keyCols.map(k => col(k).as(s"__k_$k")) ++
        valueCols.map(c => col(c).as(s"asof_$c")) ++ Seq(
          col(rightTsCol).as(s"asof_$rightTsCol"), col("__bound")): _*)
    val ivd =
      if (persistSnapshots)
        ivd0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      else ivd0

    val sameKey = keyCols.map(k => events(k) === ivd(s"__k_$k")).reduce(_ && _)
    val inInterval =
      if (direction == "backward")
        events(leftTsCol) >= ivd(s"asof_$rightTsCol") &&
          (ivd("__bound").isNull || events(leftTsCol) < ivd("__bound"))
      else
        events(leftTsCol) <= ivd(s"asof_$rightTsCol") &&
          (ivd("__bound").isNull || events(leftTsCol) > ivd("__bound"))
    // tolerance rides in the ON clause: a stale interval hit fails the
    // predicate and the left-outer join emits the same null match a
    // post-filter would (sound for the same closest-candidate reason as
    // the batch path)
    val withinTol = tolerance match {
      case None => lit(true)
      case Some(tol) =>
        val dt = snapshots.schema(rightTsCol).dataType
        if (direction == "backward")
          tsDiff(events(leftTsCol), ivd(s"asof_$rightTsCol"), dt) <= tol
        else
          tsDiff(ivd(s"asof_$rightTsCol"), events(leftTsCol), dt) <= tol
    }
    // drop helper columns via the ivd-side REFERENCE, not the bare name: an
    // events frame legitimately carrying a `__bound` (or `__k_*`) column of
    // its own must keep it — drop-by-name would take both
    keyCols.foldLeft(
      events.join(ivd, sameKey && inInterval && withinTol, "left_outer").drop(ivd("__bound"))) {
      (d, k) => d.drop(ivd(s"__k_$k"))
    }
  }

  /** Elapsed "a - b" in the tolerance's units: event-time micros for
    * timestamp columns, the column's own units otherwise. */
  /** INTERVAL OVERLAP JOIN — pairs of intervals from two relations that
    * overlap in time (sessions × campaign windows, incidents ×
    * deployments): the temporal-join family member [[asofJoin]] (nearest
    * PAST point) and the banding range join (point ∈ static band) can't
    * express, because BOTH sides are genuine interval SETS.
    *
    * Plan: each interval explodes to the fixed-width time CHUNKS it
    * covers, the join is EQUI on chunk id, the exact overlap predicate
    * filters the chunk-collisions, and a distinct collapses pairs that
    * share several chunks. Shuffle volume is Σ(interval span / chunk)
    * rows and per-chunk work is occupancy² — the standard
    * spatial-gridding trade: size `chunk` near the typical interval
    * length (too fine explodes rows, too coarse degrades toward
    * all-pairs within a chunk). Never n² globally, no broadcast of
    * either side.
    *
    * Inputs carry (id, start_us, end_us) as epoch-micro longs with
    * start ≤ end (degenerate point intervals allowed); touching
    * intervals (end_a = start_b) count as overlapping with overlap_us
    * = 0, the closed-interval convention. */
  def overlapJoin(
      a: DataFrame,
      b: DataFrame,
      chunk: String = "1 hour",
      aIdCol: String = "a_id",
      bIdCol: String = "b_id",
      startCol: String = "start_us",
      endCol: String = "end_us"): DataFrame = {
    val chunkUs = graft.ops.Intervals.subDayMicros(chunk)
    require(chunkUs > 0, s"chunk must be positive: $chunk")
    def chunked(df: DataFrame, idCol: String, p: String) = df
      .select(col(idCol).as(s"${p}_id"), col(startCol).as(s"${p}_s"),
        col(endCol).as(s"${p}_e"))
      .where(col(s"${p}_s").isNotNull && col(s"${p}_e") >= col(s"${p}_s"))
      .withColumn("__ch", explode(sequence(
        expr(s"${p}_s div ${chunkUs}L"), expr(s"${p}_e div ${chunkUs}L"))))
    chunked(a, aIdCol, "a").join(chunked(b, bIdCol, "b"), Seq("__ch"))
      .filter(col("a_s") <= col("b_e") && col("b_s") <= col("a_e"))
      .select(col("a_id").as(aIdCol), col("b_id").as(bIdCol),
        (least(col("a_e"), col("b_e")) -
          greatest(col("a_s"), col("b_s"))).as("overlap_us"))
      .distinct()
  }

  private def tsDiff(a: Column, b: Column,
      dt: org.apache.spark.sql.types.DataType): Column = dt match {
    case org.apache.spark.sql.types.TimestampType |
         org.apache.spark.sql.types.TimestampNTZType =>
      // NTZ casts through the session zone; the DIFFERENCE is zone-invariant
      unix_micros(a.cast("timestamp")) - unix_micros(b.cast("timestamp"))
    case _ => a - b
  }

  private def structType(df: DataFrame, cols: Seq[String]) =
    org.apache.spark.sql.types.StructType(
      cols.map(c => df.schema(c)))
}
