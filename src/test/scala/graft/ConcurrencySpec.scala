package graft

import org.scalatest.funsuite.AnyFunSuite
import scala.concurrent.{Await, Future}
import scala.concurrent.duration._
import scala.concurrent.ExecutionContext.Implicits.global

/** A shared SparkSession serving concurrent queries — the deployment shape
  * of a long-lived cluster session. Guards the engine's driver-side shared
  * state (IVF model cache, ThreadLocal md5 digests, expression instances)
  * against races: every concurrent result must equal its serial run. */
class ConcurrencySpec extends AnyFunSuite with SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("concurrent gate queries return serial-identical results") {
    val names = Seq(
      "q_dedup_simhash", "q_sketches", "q_split_assign", "q_dedup_minhash",
      "q_sim_ivf", "q_media_features", "q_lang_id", "q_running_count")
    def run(name: String): (String, Long) = {
      val df = SparkEntry.queries(name)(spark, sf)
      // order-insensitive content digest: sum of per-row hashes
      val digest = df.selectExpr("CAST(sum(CAST(xxhash64(struct(*)) AS DECIMAL(38,0))) AS STRING) AS d")
        .first().getString(0)
      name -> (if (digest == null) 0L else digest.hashCode.toLong)
    }
    val serial = names.map(run).toMap
    // two concurrent waves, all queries in flight at once
    for (_ <- 1 to 2) {
      val concurrent = Await.result(
        Future.traverse(scala.util.Random.shuffle(names))(n => Future(run(n))),
        5.minutes).toMap
      assert(concurrent == serial)
    }
  }

  test("cold-cache concurrent annIvf calls agree (single promise-owned fit)") {
    import org.apache.spark.sql.functions.col
    import graft.operators.Similarity
    // a corpus plan this JVM has never fit on -> fresh cache key; every
    // concurrent caller must resolve through the same promise and see the
    // same trained quantizer
    val emb = spark.read.parquet(s"$sf/embeddings.parquet").filter(col("vec_id") % 7 =!= 3)
    val queries = emb.filter(col("vec_id") < 5)
    def run(): Set[(Long, Long, Long)] =
      Similarity.annIvf(queries, emb, k = 3, nlist = 4, nprobe = 2)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val results = Await.result(
      Future.traverse(1 to 4)(_ => Future(run())), 5.minutes)
    assert(results.toSet.size == 1, "concurrent IVF results diverged")
  }
}
