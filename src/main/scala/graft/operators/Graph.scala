package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link-graph importance for data curation — the CommonCrawl-style "rank
  * domains/pages by the link structure, then prioritize high-rank sources"
  * signal (Page et al. 1999; used as a quality prior by crawl-based corpus
  * pipelines). Implemented as FIXED-POINT INTEGER PageRank: ranks live as
  * 64-bit integers in units of `1/scale`, every step is integer
  * multiply/divide, so K iterations produce BIT-IDENTICAL results on any
  * engine and any partitioning — float PageRank's order-dependent partial
  * sums can never cross an exact-hash gate, this can.
  */
object Graph {

  /** Weighted PageRank after exactly `iters` power iterations, all integer.
    *
    * Semantics (per iteration, damping d = dampNum/dampDen):
    *   contrib(edge e) = (rank(src) * w(e)) div wsum(src)
    *   rank'(n) = base + (dampNum * Σ_in contrib) div dampDen
    *              [+ (dampNum * danglingSum) div (dampDen * N) if
    *               `redistributeDangling`]
    * with base = (scale * (dampDen - dampNum)) div (dampDen * N) and
    * rank_0 = scale div N. Integer floor-division loses < 1 rank-unit per
    * term, so total mass drifts down by at most (E + N) units (= 1e-12-ish
    * at the default scale) per iteration — the deterministic price of
    * exactness; ordering is unaffected. With `redistributeDangling =
    * false` the mass of sink nodes (no out-edges) evaporates instead of
    * being spread uniformly — the naive-PageRank convention, still a
    * well-defined fixed spec (and the cross-engine-checkable one: the
    * uniform spread needs a second recursive reference SQL's WITH
    * RECURSIVE cannot express).
    *
    * Overflow bounds (document, not check): total mass ≤ scale, so
    * `dampNum * Σcontrib` ≤ dampNum * scale and `rank * w` ≤ scale *
    * max-weight must both stay under 2^63 — the defaults (scale 10^12,
    * damp 85/100) leave room for per-edge weights up to ~9·10^6.
    *
    * Scale shape: edges normalize ONCE into (src, dst, w, wsum) — a
    * src-keyed partial-agg shuffle — and are pinned so K iterations re-read
    * a materialized edge list, not the upstream lineage. Each iteration is
    * the classic distributed step: one src-keyed join (ranks are small
    * rows: node + long), one dst-keyed partial-agg sum, one left join back
    * onto the node list; the rank frame is pinned per iteration
    * (localCheckpoint) so the plan stays constant-size over K rounds — the
    * same discipline as [[Dedup.clusters]]. Nothing data-sized touches the
    * driver (one `count()` of the NODE table fixes N). On a 10^8-node
    * domain graph each iteration shuffles O(E) longs — exactly the shape a
    * 1000-executor cluster wants. */
  def pageRank(
      edges: DataFrame,
      iters: Int = 10,
      dampNum: Long = 85L,
      dampDen: Long = 100L,
      scale: Long = 1000000000000L,
      srcCol: String = "src",
      dstCol: String = "dst",
      weightCol: Option[String] = None,
      redistributeDangling: Boolean = false): DataFrame = {
    require(iters >= 1, s"iters must be >= 1: $iters")
    require(dampDen > 0 && dampNum >= 0 && dampNum <= dampDen,
      s"damping must satisfy 0 <= num <= den: $dampNum/$dampDen")
    require(scale >= 1, s"scale must be >= 1: $scale")
    val w = weightCol.map(col(_).cast("long")).getOrElse(lit(1L))
    val e0 = edges.select(col(srcCol).as("__src"), col(dstCol).as("__dst"),
      w.as("__w"))
    // one src-keyed agg for the normalizer, carried onto each edge row;
    // pinned: K iterations must re-read bytes, not re-run edge lineage
    val wsums = e0.groupBy("__src").agg(sum("__w").as("__wsum"))
    val en = e0.join(wsums, Seq("__src")).localCheckpoint(true)
    val nodes = e0.select(col("__src").as("node"))
      .union(e0.select(col("__dst").as("node")))
      .distinct()
      // the dangling flag rides the node list so the per-iteration filter
      // costs nothing (no join against the edge table inside the loop)
      .join(wsums.select(col("__src").as("node")).withColumn("__has_out", lit(true)),
        Seq("node"), "left")
      .withColumn("__has_out", coalesce(col("__has_out"), lit(false)))
      .localCheckpoint(true)
    val n = nodes.count()
    require(n > 0, "graph has no nodes")
    val base = (scale * (dampDen - dampNum)) / (dampDen * n)
    var ranks = nodes.select(col("node"), col("__has_out"),
      lit(scale / n).as("rank")).localCheckpoint(true)
    for (_ <- 1 to iters) {
      // `div` (IntegralDivide), not `/`: Spark's `/` on longs is DOUBLE
      // division — one float would forfeit the bit-exactness contract
      val contribs = en.join(ranks, en("__src") === ranks("node"))
        .selectExpr("__dst", "rank * __w div __wsum AS __c")
        .groupBy("__dst").agg(sum("__c").as("__in"))
      val stepped = nodes
        .join(contribs, nodes("node") === contribs("__dst"), "left")
        .selectExpr("node", "__has_out",
          s"${base}L + (${dampNum}L * coalesce(__in, 0L)) div ${dampDen}L AS rank")
      val next =
        if (!redistributeDangling) stepped
        else {
          // sink mass, spread uniformly: one-row agg broadcast — reads the
          // PREVIOUS pinned ranks, so no second pass over anything large
          val dangling = ranks.filter(!col("__has_out"))
            .agg(coalesce(sum("rank"), lit(0L)).as("__dsum"))
          stepped.crossJoin(broadcast(dangling))
            .selectExpr("node", "__has_out",
              s"rank + (${dampNum}L * __dsum) div ${dampDen * n}L AS rank")
        }
      ranks = next.localCheckpoint(true)
    }
    ranks.select(col("node"), col("rank"))
  }
}
