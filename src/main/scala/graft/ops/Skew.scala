package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Manual skew levers for the cases AQE's runtime skew-join splitting does
  * not cover (AQE splits oversized SHUFFLE partitions of sort-merge joins;
  * it does not help aggregation hot keys or broadcast-ineligible dim joins).
  *
  * The reference never hits this — its only "shuffle" is round-robin by line
  * number (Node.java:934-946) — but a 100 TB keyed workload does.
  */
object Skew {

  private val S = "__graft_salt"

  /** INNER-join a skewed fact side to a small-ish dim side without AQE: the
    * fact's hot keys are spread over `salt` sub-keys, the dim side is
    * replicated `salt` ways. Exact same rows as `fact.join(dim, keys)` for
    * inner joins — and ONLY inner joins: an outer flavor would surface each
    * unmatched dim row `salt` times, so this helper hard-codes the join type.
    * Shuffle partitions see at most ~1/salt of any hot key.
    *
    * The salt is a hash of the whole fact row — a pure function of row
    * content, so it is reproducible under task retry and independent of
    * partition layout (`monotonically_increasing_id`/`spark_partition_id`
    * are not: their values move when the scan splits differently). Duplicate
    * fact rows share a salt, which only matters if the hot key's rows are
    * near-identical — pass a wider `salt` there. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, keys: Seq[String], salt: Int = 8): DataFrame = {
    require(salt >= 1)
    val saltCol = pmod(hash(fact.columns.map(col).toSeq: _*), lit(salt))
    val left = fact.withColumn(S, saltCol)
    val right = dim.withColumn(S, explode(array((0 until salt).map(lit): _*)))
    left.join(right, keys :+ S, "inner").drop(S)
  }

  /** Drop every row of keys carrying more than `maxRows` rows — the
    * hot-key guard SCALE.md prescribes ahead of per-key total-order
    * operators (sessionize, as-of join), where one bot user with 10⁹
    * events funnels through a single window task that AQE cannot split.
    * Cost: one partial-aggregated keyed count (tiny output: one row per
    * key) + one anti-join against the HOT subset only — at any realistic
    * skew that's a handful of keys, so the planner broadcasts it and the
    * data never shuffles. Null keys group together like SQL GROUP BY: a
    * null-key flood is dropped like any hot key (below the cap they
    * survive — the anti-join's null-safe equality handles them). */
  def dropHotKeys(df: DataFrame, keyCols: Seq[String], maxRows: Long): DataFrame = {
    require(keyCols.nonEmpty, "need at least one key column")
    require(maxRows >= 1, s"maxRows must be >= 1: $maxRows")
    val hot = df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("__graft_n"))
      .filter(col("__graft_n") > maxRows)
      .select(keyCols.map(k => col(k).as(s"__hot_$k")): _*)
    // null-SAFE equality: a hot null key must match its own rows (plain =
    // would let a null-key flood through)
    val cond = keyCols.map(k => df(k) <=> hot(s"__hot_$k")).reduce(_ && _)
    df.join(hot, cond, "left_anti")
  }

  /** Exact distinct count per key under value skew: values are pre-bucketed
    * by hash(value) % salt — buckets are DISJOINT value sets, so the
    * per-(key, bucket) distinct counts sum to the exact global count. Two
    * balanced shuffles instead of one hot one. */
  def saltedCountDistinct(
      df: DataFrame,
      keyCol: String,
      valCol: String,
      salt: Int = 16,
      outputCol: String = "n_distinct"): DataFrame =
    df.groupBy(col(keyCol), pmod(hash(col(valCol)), lit(salt)).as(S))
      .agg(count_distinct(col(valCol)).as("__graft_partial"))
      .groupBy(col(keyCol))
      .agg(sum("__graft_partial").as(outputCol))
}
