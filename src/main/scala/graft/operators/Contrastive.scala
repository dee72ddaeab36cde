package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Contrastive-pair mining for embedding training: deterministic uniform
  * negatives (the in-batch-negatives replacement that is reproducible
  * across reruns and engines) and ANN-style HARD negatives (nearest
  * different-label neighbors — the pairs that actually move a contrastive
  * loss once easy negatives saturate). No reference analog; part of the
  * training-data extension surface.
  *
  * Numeric policy: ring negatives are pure integer arithmetic on md5-ring
  * positions (hash-gateable end to end); hard negatives follow the
  * q_sim_topk cosine contract (exact sequential fold, engine-portable). */
object Contrastive {

  /** `k` deterministic uniform negatives per row: every id takes a
    * position on the salted-md5 ring (decorrelated from id order and from
    * any data attribute), and its j-th negative is the id sitting
    * `j * floor(N/(k+1))` (min 1) steps around the ring. Properties: a
    * pure function of (ids, salt) — rerun/partition/engine-stable;
    * negatives are near-uniform over the corpus (the md5 ring is a random
    * permutation); self-pairs are filtered (only possible when the step
    * wraps, i.e. N <= k).
    *
    * Scale shape: the ring position is the two-phase distributed prefix
    * count ([[graft.ops.RunningCount]], no single-task sort); the k-fold
    * expansion happens on (id, pos) pairs — never on payloads — and ONE
    * pos-keyed join resolves negative positions back to ids. Distinct
    * salts draw independent negative sets (fresh negatives per epoch). */
  def ringNegatives(
      df: DataFrame,
      idCol: String,
      k: Int = 4,
      salt: String = "negatives"): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    val ring = graft.ops.RunningCount.withRunningCount(
      df.select(col(idCol)),
      Seq(md5(concat(col(idCol).cast("string"), lit(":" + salt))), col(idCol)),
      "__pos")
    val n = ring.agg(count(lit(1)).cast("long").as("__n"))
    val step = greatest(floor(col("__n") / lit(k + 1)).cast("long"), lit(1L))
    val expanded = ring.crossJoin(broadcast(n))
      .withColumn("j", explode(array((1 to k).map(lit): _*)))
      .withColumn("__neg_pos",
        pmod(col("__pos") - 1 + col("j") * step, col("__n")) + 1)
      .filter(col("__neg_pos") =!= col("__pos"))
    val lookup = ring.select(col("__pos").as("__neg_pos"),
      col(idCol).as("neg_" + idCol))
    expanded.join(lookup, Seq("__neg_pos"))
      .select(col(idCol), col("j").cast("long").as("j"), col("neg_" + idCol))
  }

  /** Top-`k` HARD negatives per query vector: the nearest neighbors whose
    * `labelCol` DIFFERS from the query's — the informative pairs for a
    * contrastive/triplet loss. Brute-force cosine form (the oracle-exact
    * baseline, same contract as `Similarity.bruteForceTopK`: broadcast
    * queries, corpus-streamed pair scan, map-side-limited top-k window);
    * swap the corpus side for an LSH/IVF-bucketed frame at scale exactly
    * as the ANN operators do. Rows with a null label on either side never
    * pair (a null label is "unknown", not "different"). */
  def hardNegatives(
      queries: DataFrame,
      corpus: DataFrame,
      k: Int = 5,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      labelCol: String = "label"): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    val q = queries.select(col(idCol).as("q_id"), col(vecCol).as("q_v"),
      col(labelCol).as("q_label"))
    val parts = corpus.sparkSession.sessionState.conf.numShufflePartitions
    val c = corpus.select(col(idCol).as("n_id"), col(vecCol).as("n_v"),
      col(labelCol).as("n_label")).repartition(parts)
    val scored = c.join(broadcast(q),
        col("q_id") =!= col("n_id") && col("q_label") =!= col("n_label"))
      .withColumn("cos",
        graft.functions.VectorFunctions.cosineSimilarity(col("q_v"), col("n_v")))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("n_id").asc)
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("q_label"), col("n_id"),
        col("n_label"), col("rank"), col("cos"))
  }
}
