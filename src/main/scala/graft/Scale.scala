package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling utilities (SURVEY.md §4.4: "skewed keys -> salting or AQE
  * skew-join").
  *
  * AQE's skew handling covers sort-merge joins at runtime; for HASH
  * AGGREGATIONS over power-law keys the classic fix is explicit two-phase
  * salted aggregation: spray each hot key across `salts` sub-keys, partial
  * aggregate on (key, salt), then merge the partials. Cost: one extra
  * narrow stage; benefit: no single reducer owns a hot key's entire volume.
  */
object Scale {

  /** Two-phase salted sum/count per key: returns (key, cnt, sum) computed
    * as groupBy(key, salt) -> groupBy(key), never concentrating a hot key
    * in one task. `valueDec` must be an exact (decimal) sum expression so
    * the two-phase result is bit-equal to the direct aggregation. */
  def saltedCountSum(
      df: DataFrame, key: Column, valueDecimalExpr: String, salts: Int): DataFrame =
    df.withColumn("__salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(salts)))
      .groupBy(key.as("k"), col("__salt"))
      .agg(count(lit(1)).as("pc"), expr(s"sum($valueDecimalExpr)").as("ps"))
      .groupBy("k")
      .agg(sum("pc").as("cnt"), sum("ps").as("sum_dec"))
      .select(col("k"), col("cnt"), col("sum_dec").cast("double").as("sum_value"))
}
