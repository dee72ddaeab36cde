package graft.tools

import graft.operators.Similarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe for the bitext scale paths, three readouts:
  *
  * 1. PLAN pin — with size-based broadcasts disabled
  *    (autoBroadcastJoinThreshold = -1) the physical plan of
  *    `bitextMarginMineLsh` / `bitextMarginMineIvf` must contain ZERO
  *    BroadcastExchange nodes: every join is keyed shuffle, so neither
  *    corpus side is ever required to fit in executor memory. An
  *    explicit `broadcast()` in the operator would survive the
  *    threshold and fail this pin (the r14 finding:
  *    `y.join(broadcast(x), "bucket")` broadcast a corpus-sized
  *    exploded probe frame). ASSERTED, not just printed — a regression
  *    aborts the probe (the QualityPlanProbe discipline).
  * 2. RECALL table — LSH-candidate winner agreement vs brute at several
  *    pruning levels and SEED COUNTS (multi-seed candidate union), the
  *    threshold-selection evidence for the q_bitext_recall* gates.
  * 3. IVF TRAINED vs DETERMINISTIC — winner agreement vs brute for the
  *    lowest-id-seeded cells and for kmeansIterate-trained cells at the
  *    SAME nlist/nprobe, the evidence for q_bitext_ivf_trained
  *    (trained cells must prune at least as well at equal budget).
  */
object BitextProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", 16)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val xs = emb.filter(col("vec_id") % 2 === 0)
    val ys = emb.filter(col("vec_id") % 2 === 1)

    // --- plan pin: zero BroadcastExchange under threshold = -1 ---
    // (the PQ path's two codebook broadcasts are bounded metadata and are
    // excluded from the corpus-resident pin by construction: they are
    // nlist/kCodes-row one-row aggregates, not corpus sides — still, the
    // pin covers it: explicit broadcast() of METADATA frames under
    // threshold -1 appears as BroadcastExchange, so the PQ path pins a
    // KNOWN count of 2 instead of 0)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    for ((name, df) <- Seq(
        "lsh" -> Similarity.bitextMarginMineLsh(xs, ys, k = 4, nPlanes = 4),
        "ivf" -> Similarity.bitextMarginMineIvf(xs, ys, k = 4,
          nlist = 16, nprobe = 4))) {
      val plan = df.queryExecution.executedPlan.toString()
      val nBroadcast = "BroadcastExchange".r.findAllIn(plan).length
      println(s"${name}_broadcast_exchanges_with_threshold_off=$nBroadcast " +
        s"(MUST be 0: all joins keyed shuffle, no corpus side resident)")
      require(nBroadcast == 0,
        s"$name: $nBroadcast BroadcastExchange nodes with size-based " +
          "broadcasts off — a corpus side is being broadcast (r14 regression)")
    }
    // PQ path: its codebook is a ONE-ROW aggregate cross-joined onto both
    // scans (IdentityBroadcastMode — bounded metadata, replicated per
    // reference of the shortlist subplan), so the corpus pin here is:
    // ZERO keyed broadcasts (HashedRelationBroadcastMode — what the r14
    // corpus-broadcast bug produced) and every BroadcastExchange an
    // Identity one-row frame.
    locally {
      val df = Similarity.bitextMarginMinePq(xs, ys, k = 4, cand = 8,
        nlist = 16, nprobe = 4)
      val plan = df.queryExecution.executedPlan.toString()
      val nTotal = "BroadcastExchange".r.findAllIn(plan).length
      val nIdentity = "BroadcastExchange Identity".r.findAllIn(plan).length
      val nHashed = "HashedRelationBroadcastMode".r.findAllIn(plan).length
      println(s"pq_broadcast_exchanges_with_threshold_off=$nTotal " +
        s"identity_one_row=$nIdentity hashed_keyed=$nHashed " +
        "(hashed MUST be 0: a keyed broadcast means a corpus side)")
      require(nHashed == 0 && nIdentity == nTotal,
        s"pq: $nHashed keyed / ${nTotal - nIdentity} non-identity " +
          "BroadcastExchange nodes with size-based broadcasts off — a " +
          "corpus side is being broadcast (r14 regression)")
    }
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")

    // --- recall: agreement vs brute across nPlanes and seed counts ---
    val brute = Similarity.bitextMarginMine(xs, ys, k = 4)
      .select(col("x_id"), col("y_id").as("yb"))
    def agreement(approx: org.apache.spark.sql.DataFrame): (Any, Any) = {
      val a = brute.join(approx.select(col("x_id"), col("y_id").as("yl")),
          Seq("x_id"))
        .agg(sum(when(col("yb") === col("yl"), 1).otherwise(0)), count(lit(1)))
        .collect()(0)
      (a.get(0), a.get(1))
    }
    val seedPool = Seq(0x5DEECE66DL, 0x9E3779B9L, 0x2545F491L)
    for (n <- Seq(2, 4); nSeeds <- Seq(1, 2, 3)) {
      val (ag, tot) = agreement(Similarity.bitextMarginMineLsh(
        xs, ys, k = 4, nPlanes = n, seeds = seedPool.take(nSeeds)))
      println(s"nPlanes=$n seeds=$nSeeds agree=$ag/$tot")
    }

    // --- PQ-ADC shortlist: agreement vs brute across the cand knee ---
    // (the co-cell candidate pool at nprobe=4/nlist=16 is ~62 pairs/x;
    // cand bounds the EXACT scorings, so agreement must approach the IVF
    // path's own co-cell ceiling as cand grows — the readout below picks
    // the default at the knee)
    for (cand <- Seq(4, 8, 16, 24, 32, 48)) {
      val (ag, tot) = agreement(Similarity.bitextMarginMinePq(
        xs, ys, k = 4, cand = cand, nlist = 16, nprobe = 4))
      println(s"pq_adc cand=$cand m=4 kCodes=16 nlist=16 nprobe=4 agree=$ag/$tot")
    }
    // finer subquantizers: better ADC ranking at the same cand budget
    for (m <- Seq(8); cand <- Seq(8, 16)) {
      val (ag, tot) = agreement(Similarity.bitextMarginMinePq(
        xs, ys, k = 4, cand = cand, nlist = 16, nprobe = 4, m = m))
      println(s"pq_adc cand=$cand m=$m kCodes=16 nlist=16 nprobe=4 agree=$ag/$tot")
    }
    // PQ's actual lever: widen nprobe with the CHEAP ADC (table lookups),
    // keep the EXACT verify at cand pairs/x — the FAISS read-path shape.
    // The IVF row above exact-scores the whole nprobe=4 co-cell pool
    // (~62/x) for 113/250; these rows must beat it on agreement while
    // exact-scoring 4-8x fewer pairs.
    for ((np, m, kc, cand) <- Seq((8, 8, 16, 8), (8, 8, 16, 16),
        (16, 8, 16, 8), (16, 8, 16, 16), (16, 8, 16, 24),
        (16, 8, 32, 16))) {
      val (ag, tot) = agreement(Similarity.bitextMarginMinePq(
        xs, ys, k = 4, cand = cand, nlist = 16, nprobe = np, m = m,
        kCodes = kc))
      println(s"pq_adc cand=$cand m=$m kCodes=$kc nlist=16 nprobe=$np agree=$ag/$tot")
    }

    // --- multi-seed PQ codebooks: the LSH `seeds` union applied to ADC
    // rankers — a brute winner is missed only if EVERY codebook ranks it
    // below cand; budget = |seeds|*cand exact scorings per x (compare:
    // IVF's ~62-pair co-cell pool, LSH 3-seed's ~3/4-of-pairs pool) ---
    for (nSeeds <- Seq(2, 3); cand <- Seq(8, 16, 24)) {
      val (ag, tot) = agreement(Similarity.bitextMarginMinePq(
        xs, ys, k = 4, cand = cand, nlist = 16, nprobe = 16, m = 8,
        kCodes = 32, seeds = seedPool.take(nSeeds)))
      println(s"pq_adc_seeds seeds=$nSeeds cand=$cand m=8 kCodes=32 " +
        s"nlist=16 nprobe=16 agree=$ag/$tot budget=${nSeeds * cand}/x")
    }

    // --- IVF: deterministic lowest-id cells vs kmeansIterate-trained ---
    val (agDet, totDet) = agreement(Similarity.bitextMarginMineIvf(
      xs, ys, k = 4, nlist = 16, nprobe = 4))
    println(s"ivf_deterministic nlist=16 nprobe=4 agree=$agDet/$totDet")
    for (rounds <- Seq(1, 3, 5)) {
      val cents = Similarity.kmeansIterate(ys, k = 16, rounds = rounds)
        .collect().sortBy(_.getLong(0)).map(_.getSeq[Double](1).toArray)
      import spark.implicits._
      val cb = cents.toSeq.zipWithIndex
        .map { case (v, i) => (i.toLong, v.toSeq) }.toDF("cid", "cv")
      val (ag, tot) = agreement(Similarity.bitextMarginMineIvf(
        xs, ys, k = 4, nlist = 16, nprobe = 4, codebookSource = Some(cb)))
      println(s"ivf_trained rounds=$rounds nlist=16 nprobe=4 agree=$ag/$tot")
    }
    spark.stop()
  }
}
