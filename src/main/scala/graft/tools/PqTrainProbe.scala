package graft.tools

import graft.GraftSession
import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** Scratch probe: recall@5 (50 queries) and mean ADC self-distortion of
  * PQ vs per-subspace L2 training rounds (rounds=0 == seeded codebook). */
object PqTrainProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = GraftSession.local(16, "graft-pq-train-probe")
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val qs = emb.filter(col("vec_id") < 50)
    val exact = Similarity.bruteForceTopK(qs, emb, k = 5).localCheckpoint(true)
    for (r <- Seq(0, 1, 2, 5, 10)) {
      val cb = Similarity.pqTrainCodebooks(emb, m = 4, k = 16, dim = 64, rounds = r)
      val cbSrc = cb.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toSeq
        .toDF("vec_id", "embedding")
      val appx = Similarity.pqSearch(qs, emb, m = 4, k = 16, dim = 64,
        topK = 5, codebookSource = Some(cbSrc))
      val rec = Similarity.recallAtK(appx, exact, k = 5)
        .agg(avg(col("recall"))).collect()(0).getDouble(0)
      // distortion: mean over corpus of sum_j ||v_j - codeword(code_j)||^2
      val codes = Similarity.pqEncode(emb, m = 4, k = 16, dim = 64,
        codebookSource = Some(cbSrc))
      val joined = emb.join(codes, Seq("vec_id"))
      val dist = joined.select((0 until 4).map { j =>
        val sub = slice(transform(col("embedding"), _.cast("double")), j * 16 + 1, 16)
        val cw = element_at(typedLit(cb.map(_.slice(j * 16, j * 16 + 16)).toSeq),
          (col(s"code_$j") + 1).cast("int"))
        aggregate(zip_with(sub, cw, (x, y) => (x - y) * (x - y)), lit(0.0), _ + _)
      }.reduce(_ + _).as("d2"))
        .agg(avg("d2")).collect()(0).getDouble(0)
      println(f"[pqtrain] rounds=$r%-3d recall@5(50q) = $rec%.3f  mean distortion = $dist%.4f")
    }
    spark.stop()
  }
}
