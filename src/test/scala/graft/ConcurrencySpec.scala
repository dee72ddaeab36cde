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
}
