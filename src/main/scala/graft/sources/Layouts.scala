package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.exchange.Exchange

/** Physical-layout levers for repeated keyed work — the piece of the 100 TB
  * design that removes shuffles rather than tuning them. The reference has no
  * analog (its one redistribution is round-robin by line number,
  * Node.java:934-946); at cluster scale, pre-bucketing the big fact tables on
  * their join/agg keys turns every subsequent join between co-bucketed tables
  * into a zero-exchange sort-merge join.
  *
  * Bucketing is Spark's storage-level hash partitioning: `bucketBy(n, keys)`
  * writes each partition as `n` files by `hash(keys) % n` and records the
  * layout in the catalog; the planner then proves both join sides are
  * hash-distributed on the key and plans NO Exchange. Worth it when a table
  * is joined/aggregated on the same key by many queries (fact-dim star
  * schemas, dedup postings, feature joins) — one write-time shuffle amortized
  * over every later read.
  */
object Layouts {

  /** Write `df` as a bucketed (and bucket-sorted) managed table. Sorting
    * within buckets additionally removes the sort-merge join's per-read sort.
    * The pre-write `repartition(buckets, keys)` uses the SAME HashPartitioning
    * pmod arithmetic as the bucket-id spec, so each write task holds exactly
    * one bucket id and writes exactly one file — without the explicit
    * partition count, a task still mixes keys from many bucket ids and the
    * write explodes into up to `numWritePartitions * buckets` small files.
    * On a cluster, pick `buckets` ~ total cores (one bucket per slot). */
  def writeBucketed(
      df: DataFrame,
      table: String,
      keys: Seq[String],
      buckets: Int): Unit = {
    import org.apache.spark.sql.functions.col
    df.repartition(buckets, keys.map(col): _*)
      .write
      .format("parquet")
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .mode("overwrite")
      .saveAsTable(table)
  }

  def readTable(spark: SparkSession, table: String): DataFrame = spark.table(table)

  /** Write `df` sorted for parquet DATA SKIPPING on `sortCols`:
    * range-repartition (globally disjoint key ranges per output file) +
    * sort-within-partitions, so every row group's min/max footer stats
    * cover a narrow slice of the key space. A later scan with a pushed
    * predicate on those columns then prunes whole row groups/files from
    * the footer alone — at 100 TB this is the difference between reading
    * the corpus and reading the slice (the same lever a clustered/Z-ordered
    * table gives; one write-time range shuffle amortized over every later
    * selective read). Complements [[writeBucketed]]: bucketing removes JOIN
    * exchanges on the key, sorting removes SCAN volume under range/point
    * predicates; LayoutsSpec measures the scan-row reduction. */
  def writeSorted(
      df: DataFrame,
      dir: String,
      sortCols: Seq[String],
      partitions: Int): Unit = {
    import org.apache.spark.sql.functions.col
    require(sortCols.nonEmpty, "need at least one sort column")
    require(partitions >= 1, s"partitions must be >= 1: $partitions")
    df.repartitionByRange(partitions, sortCols.map(col): _*)
      .sortWithinPartitions(sortCols.map(col): _*)
      .write.mode("overwrite").parquet(dir)
  }

  /** Number of Exchange (shuffle/broadcast-exchange) nodes in the final
    * physical plan — 0 on a co-bucketed join is the whole point. Unwraps the
    * AQE leaf wrappers: AdaptiveSparkPlanExec before execution, and the
    * Shuffle/BroadcastQueryStageExec nodes a FINALIZED adaptive plan wraps
    * every exchange in — both are leaves, so the naive walk reports a false
    * 0 on exactly the plans with exchanges. */
  def countExchanges(df: DataFrame): Int = {
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def walk(p: SparkPlan): Int = p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case q: QueryStageExec => walk(q.plan)
      case _ =>
        (if (p.isInstanceOf[Exchange]) 1 else 0) +
          p.children.map(walk).sum +
          p.subqueries.map(walk).sum
    }
    walk(df.queryExecution.executedPlan)
  }
}
