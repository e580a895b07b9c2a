package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Classpath-gated Kafka integration (round-13 verdict ask #4).
  *
  * /opt/spark/jars ships no spark-sql-kafka connector (SURVEY.md §0), so
  * the reference's A1/A8 Kafka wiring (`streaming/Sources.kafkaStream` +
  * `ExactlyOnceSink`) has the right architecture but — in THIS
  * environment — can never execute. This spec makes that gap explicit
  * and self-healing instead of silent:
  *
  *  - with no connector jar, every test CANCELS with a message (visible
  *    in the run as canceled, not green-by-vacuity);
  *  - the day a `spark-sql-kafka-0-10` jar lands on the classpath, the
  *    wiring test activates with NO code change and validates the option
  *    plumbing and the connector's schema contract without a broker;
  *  - given additionally a live broker (`SPARK_GRAFT_KAFKA_BOOTSTRAP`),
  *    the full produce → read → window → ExactlyOnceSink round-trip runs,
  *    including the restart-idempotence half of the exactly-once claim.
  *
  * Nothing here imports a Kafka class: the gates are reflective
  * (`Class.forName`) and the wiring is the stringly `format("kafka")`
  * lookup, so the spec compiles and cancels cleanly in the jar-less
  * environment.
  */
class KafkaIntegrationSpec extends SparkSuite {

  /** The connector's streaming-source provider — the class Spark's
    * DataSource lookup resolves `format("kafka")` to. */
  private val providerClass = "org.apache.spark.sql.kafka010.KafkaSourceProvider"

  private def kafkaJarPresent: Boolean =
    try { Class.forName(providerClass); true }
    catch { case _: ClassNotFoundException => false }

  private def broker: Option[String] = sys.env.get("SPARK_GRAFT_KAFKA_BOOTSTRAP")

  private def assumeJar(): Unit =
    assume(kafkaJarPresent,
      s"$providerClass not on the classpath (/opt/spark/jars ships no " +
        "spark-sql-kafka connector) — canceling; this test activates " +
        "unchanged the day the jar exists")

  test("kafka source wiring: provider resolves, schema contract holds, bad options fail fast") {
    assumeJar()
    // No broker needed: load() resolves the provider and validates options
    // eagerly; the broker is first contacted at query START, so the wiring
    // and schema can be asserted offline.
    val df = streaming.Sources.kafkaStream(spark, "localhost:9092", "graft_events")
    assert(df.isStreaming, "kafka source must be a streaming frame")
    assert(df.schema.fieldNames.toSeq == Seq("key", "value", "ts"),
      "kafkaStream's projection contract: (key STRING, value STRING, ts TIMESTAMP)")
    // a subscription-less reader must be rejected at load(), not at runtime
    intercept[Exception] {
      spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", "localhost:9092")
        .load()
    }
  }

  /** The canned batch: 60 events, 3 types, spanning three 10-minute
    * windows — enough to make the tumbling aggregate non-trivial and the
    * expected output computable by the batch twin on the same rows. */
  private def cannedEvents: DataFrame = {
    import spark.implicits._
    (0 until 60).map { i =>
      val ts = java.sql.Timestamp.valueOf(f"2024-01-01 10:${i % 30}%02d:00")
      (i.toLong, ts, s"type_${i % 3}", (i % 7) + 0.25)
    }.toDF("event_id", "ts", "event_type", "value")
  }

  test("kafka round-trip: produce -> tumbling counts -> ExactlyOnceSink, restart-idempotent") {
    assumeJar()
    assume(broker.isDefined,
      "no SPARK_GRAFT_KAFKA_BOOTSTRAP broker configured — canceling the live round-trip")
    val bs = broker.get
    val topic = s"graft_rt_${java.util.UUID.randomUUID().toString.take(8)}"
    val work = Files.createTempDirectory("graft_kafka_rt").toString
    val outDir = s"$work/out"
    val ckpt = s"$work/ckpt"

    // 1. produce: CSV-encode the canned events into the topic (batch write)
    cannedEvents
      .select(col("event_id").cast("string").as("key"),
        concat_ws(",", col("event_id"), col("ts").cast("string"),
          col("event_type"), col("value")).as("value"))
      .write.format("kafka")
      .option("kafka.bootstrap.servers", bs)
      .option("topic", topic)
      .save()

    // 2. consume: the production wiring — source-agnostic transform over
    // the parsed stream, exactly-once parquet publication per batch
    def runOnce(): Unit = {
      val parsed = streaming.Sources.kafkaStream(spark, bs, topic)
        .select(split(col("value"), ",").as("f"))
        .select(
          col("f").getItem(0).cast("long").as("event_id"),
          col("f").getItem(1).cast("timestamp").as("ts"),
          col("f").getItem(2).as("event_type"),
          col("f").getItem(3).cast("double").as("value"))
      val q = parsed
        .withWatermark("ts", "0 seconds")
        .writeStream
        .foreachBatch { (df: DataFrame, id: Long) =>
          streaming.ExactlyOnceSink.parquetSink(outDir)(
            Pipeline.tumblingCounts(df), id)
        }
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    runOnce()
    val firstRun = spark.read.parquet(outDir)
      .select("win_start", "event_type", "cnt", "sum_value").collect().toSet
    val expected = Pipeline.tumblingCounts(cannedEvents)
      .select("win_start", "event_type", "cnt", "sum_value").collect().toSet
    assert(firstRun == expected,
      "kafka round-trip output must equal the batch twin on the same rows")

    // 3. restart with the same checkpoint and no new data: the WAL replays
    // no batch and the sink publishes nothing new — the restart half of
    // exactly-once (the crash/race halves live in ExactlyOnceProtocolSpec)
    runOnce()
    val secondRun = spark.read.parquet(outDir)
      .select("win_start", "event_type", "cnt", "sum_value").collect().toSet
    assert(secondRun == firstRun, "a no-new-data restart must publish no duplicates")
  }
}
