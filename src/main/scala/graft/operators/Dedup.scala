package graft.operators

import graft.functions.{Sketches, TextFunctions}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deduplication suite for training-data pipelines, sized for 100 TB:
  * nothing collects to the driver, every stage is a keyed shuffle or a
  * broadcast, and the O(n²) pair space is only ever materialized AFTER
  * LSH bucketing (candidate pairs), never globally.
  *
  * Exact dedup is a hash groupBy; near-dup is the standard two-phase
  * MinHash-LSH (Broder 1997 / Leskovec-Rajaraman-Ullman ch.3):
  * shingle -> minhash signature -> banded buckets -> bucket join ->
  * exact-Jaccard verification of candidates only.
  */
object Dedup {

  /** Exact duplicate groups keyed by content fingerprint: one row per distinct
    * content with the surviving (minimum) id and the duplicate count. */
  def exact(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    docs
      .select(col(idCol), md5(col(textCol)).as("fp"))
      .groupBy("fp")
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_dups"))

  /** All pairs with exact n-gram-shingle Jaccard >= threshold, via brute-force
    * pair enumeration. Exact but O(n²) — the correctness oracle for
    * [[minhashLsh]]; at scale use the LSH variant. */
  def ngramJaccardPairs(
      docs: DataFrame,
      threshold: Double,
      ngram: Int = 3,
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val withSets = docs.select(
      col(idCol).as("id"),
      TextFunctions.shingleSet(col(textCol), ngram).as("sh"))
    val a = withSets.toDF("a_id", "a_sh")
    val b = withSets.toDF("b_id", "b_sh")
    a.join(b, col("a_id") < col("b_id"))
      .withColumn("inter", size(array_intersect(col("a_sh"), col("b_sh"))))
      .withColumn("jac", round(col("inter").cast("double") /
        (size(col("a_sh")) + size(col("b_sh")) - col("inter")).cast("double"), 4))
      .filter(col("jac") >= threshold)
      .select(col("a_id"), col("b_id"), col("jac"))
  }

  /** MinHash-LSH near-dup pairs, verified: shingle -> k-minhash signature
    * (single-pass Catalyst expression) -> banded bucket join for candidates ->
    * exact Jaccard filter. With bands*rowsPerBand hashes, P(miss a pair at
    * Jaccard j) = (1 - j^rowsPerBand)^bands — at the defaults (32x4) a j=0.9
    * pair is missed with p ~ 1e-15. Bucket join shuffles by (band, key), so
    * work scales with bucket occupancy, not n². */
  def minhashLsh(
      docs: DataFrame,
      threshold: Double,
      ngram: Int = 3,
      bands: Int = 32,
      rowsPerBand: Int = 4,
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val k = bands * rowsPerBand
    val withSig = docs.select(
      col(idCol).as("id"),
      TextFunctions.shingleSet(col(textCol), ngram).as("sh"))
      .withColumn("sig", Sketches.minhashSignature(col("sh"), k))
      .withColumn("bands", Sketches.lshBands(col("sig"), bands, rowsPerBand))
      .select(col("id"), col("sh"), explode(col("bands")).as("b"))
      .select(col("id"), col("sh"), col("b.band").as("band"), col("b.key").as("key"))

    val l = withSig.toDF("a_id", "a_sh", "band", "key")
    val r = withSig.toDF("b_id", "b_sh", "band", "key")
    val candidates = l.join(r, Seq("band", "key"))
      .filter(col("a_id") < col("b_id"))
      .select("a_id", "b_id", "a_sh", "b_sh")
      .dropDuplicates("a_id", "b_id")

    candidates
      .withColumn("inter", size(array_intersect(col("a_sh"), col("b_sh"))))
      .withColumn("jac", round(col("inter").cast("double") /
        (size(col("a_sh")) + size(col("b_sh")) - col("inter")).cast("double"), 4))
      .filter(col("jac") >= threshold)
      .select(col("a_id"), col("b_id"), col("jac"))
  }

  /** SimHash near-dup pairs: 64-bit simhash per doc; candidates via the
    * pigeonhole band trick (split the 64 bits into `chunks` pieces — any pair
    * within hamming distance < chunks shares at least one exact piece), then
    * verified with an exact popcount <= maxHamming filter. Scales like
    * MinHash-LSH (keyed bucket join). */
  def simhashPairs(
      docs: DataFrame,
      maxHamming: Int = 6,
      chunks: Int = 8,
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    require(64 % chunks == 0, "chunks must divide 64")
    val bits = 64 / chunks
    val withSig = docs.select(
      col(idCol).as("id"),
      Sketches.simhash64(TextFunctions.tokens(col(textCol))).as("sig"))
    val banded = withSig.select(
      col("id"), col("sig"),
      explode(array((0 until chunks).map { c =>
        struct(lit(c).as("band"),
          shiftrightunsigned(col("sig"), c * bits).bitwiseAND(lit((1L << bits) - 1)).as("key"))
      }: _*)).as("b"))
      .select(col("id"), col("sig"), col("b.band").as("band"), col("b.key").as("key"))

    val l = banded.toDF("a_id", "a_sig", "band", "key")
    val r = banded.toDF("b_id", "b_sig", "band", "key")
    l.join(r, Seq("band", "key"))
      .filter(col("a_id") < col("b_id"))
      .dropDuplicates("a_id", "b_id")
      .withColumn("hamming", bit_count(col("a_sig").bitwiseXOR(col("b_sig"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("a_id"), col("b_id"), col("hamming"))
  }

  /** Embedding near-dup pairs: cosine >= threshold. Brute-force pair space —
    * use [[Similarity.annLsh]] bucketing for the scale path; this exact
    * variant is the oracle. Cosine is computed in double with a rounded
    * threshold key for cross-engine stability. */
  def embeddingCosinePairs(
      embeddings: DataFrame,
      threshold: Double,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    import graft.functions.VectorFunctions._
    val v = embeddings.select(col(idCol).as("id"), col(vecCol).as("v"))
    val a = v.toDF("a_id", "a_v")
    val b = v.toDF("b_id", "b_v")
    a.join(b, col("a_id") < col("b_id"))
      .withColumn("cos", cosineRounded(col("a_v"), col("b_v"), 6))
      .filter(col("cos") >= threshold)
      .select(col("a_id"), col("b_id"), round(col("cos"), 4).as("cos"))
  }
}
