package graft

import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Batch source formats beyond parquet: CSV and JSON round-trips. */
class SourcesSpec extends SparkSuite {

  private lazy val base = Tables.events(spark, sf001)
    .select("event_id", "user_id", "event_type", "value")

  test("csv source round-trips with explicit schema") {
    val dir = Files.createTempDirectory("csv_src").toString
    base.write.mode("overwrite").option("header", "true").csv(dir)
    val back = spark.read.schema(base.schema).option("header", "true").csv(dir)
    assert(back.count() == base.count())
    assert(back.agg(sum("event_id")).head.getLong(0) ==
      base.agg(sum("event_id")).head.getLong(0))
    assert(back.schema == base.schema)
  }

  test("orc source round-trips with schema intact") {
    val dir = Files.createTempDirectory("orc_src").toString
    base.write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir)
    assert(back.count() == base.count())
    assert(back.schema == base.schema)
    assert(back.agg(sum("event_id")).head.getLong(0) ==
      base.agg(sum("event_id")).head.getLong(0))
  }

  test("json source round-trips with explicit schema") {
    val dir = Files.createTempDirectory("json_src").toString
    base.write.mode("overwrite").json(dir)
    val back = spark.read.schema(base.schema).json(dir)
    assert(back.count() == base.count())
    assert(back.select("event_type").distinct().count() ==
      base.select("event_type").distinct().count())
  }
}
