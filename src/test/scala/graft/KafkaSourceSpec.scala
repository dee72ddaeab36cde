package graft

import graft.streaming.StreamingPipeline
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** The config-gated Kafka source: option plumbing and value decode are pure
  * and tested here; `load()` needs the spark-sql-kafka connector jar, which
  * this sandbox doesn't ship — the last test pins the exact failure mode so
  * the gate is visible rather than silent.
  *
  * End-to-end (real broker) attempted round 7 and provably environmental:
  * adding `spark-sql-kafka-0-10 % 4.1.2` and `kafka % 3.9.0` (embedded
  * broker) to Test scope fails resolution under COURSIER_MODE=offline —
  * `sbt update` → "Error downloading org.apache.spark:
  * spark-sql-kafka-0-10_2.13:4.1.2 / Not found" (and the same for
  * org.apache.kafka:kafka_2.13); the pre-warmed cache holds only
  * scalatest/scalacheck/log4j, /opt/spark/jars has no kafka artifact, and
  * the environment has zero egress. On a normal deployment the connector
  * ships via `--packages org.apache.spark:spark-sql-kafka-0-10_2.13:<ver>`
  * and [[StreamingPipeline.kafkaLines]] runs unchanged. */
class KafkaSourceSpec extends AnyFunSuite with SparkSpec {

  test("kafkaOptions: documented connector keys, multi-topic subscribe") {
    val opts = StreamingPipeline.kafkaOptions(
      "broker1:9092,broker2:9092", Seq("events", "logs"),
      startingOffsets = "latest", maxOffsetsPerTrigger = Some(50000L))
    assert(opts("kafka.bootstrap.servers") == "broker1:9092,broker2:9092")
    assert(opts("subscribe") == "events,logs")
    assert(opts("startingOffsets") == "latest")
    assert(opts("maxOffsetsPerTrigger") == "50000")
    assert(opts("failOnDataLoss") == "true")
  }

  test("kafkaOptions: extra options pass through and may override") {
    val opts = StreamingPipeline.kafkaOptions("b:9092", Seq("t"),
      extra = Map("kafka.security.protocol" -> "SSL", "startingOffsets" -> "latest"))
    assert(opts("kafka.security.protocol") == "SSL")
    assert(opts("startingOffsets") == "latest")
  }

  test("kafkaOptions rejects empty brokers / topics") {
    intercept[IllegalArgumentException](StreamingPipeline.kafkaOptions("", Seq("t")))
    intercept[IllegalArgumentException](StreamingPipeline.kafkaOptions("b:9092", Nil))
  }

  test("decodeKafka: UTF-8 value bytes -> line model with (topic, partition, offset) lineage") {
    // the connector's fixed output schema, reproduced on a batch frame
    val kafkaSchema = StructType(Seq(
      StructField("key", BinaryType), StructField("value", BinaryType),
      StructField("topic", StringType), StructField("partition", IntegerType),
      StructField("offset", LongType), StructField("timestamp", TimestampType),
      StructField("timestampType", IntegerType)))
    val rows = java.util.Arrays.asList(
      Row(null, "hello kafka".getBytes("UTF-8"), "events", 0, 7L, null, 0),
      Row("k".getBytes("UTF-8"), "zweite Zeile".getBytes("UTF-8"), "events", 3, 9L, null, 0))
    val df = spark.createDataFrame(rows, kafkaSchema)
    val out = StreamingPipeline.decodeKafka(df).collect().sortBy(_.getLong(3))
    assert(out.map(_.getString(0)).toSeq == Seq("hello kafka", "zweite Zeile"))
    assert(out.map(r => (r.getString(1), r.getInt(2), r.getLong(3))).toSeq ==
      Seq(("events", 0, 7L), ("events", 3, 9L)))
  }

  test("kafkaLines is wired to format(\"kafka\") — resolution fails without the connector jar") {
    val e = intercept[Exception] {
      StreamingPipeline.kafkaLines(spark, "broker:9092", Seq("events"))
    }
    assert(e.getMessage.toLowerCase.contains("kafka"))
  }
}
