package graft

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.functions._
import org.apache.spark.sql.util.QueryExecutionListener

/** Batch-pipeline observability surface: standard data-quality metrics
  * attached to any frame via `observe()` so they ride the SAME pass as the
  * real action (no second scan — the production alternative to running a
  * separate profiling query per stage), plus a collector that snapshots
  * every named observation point per completed action.
  *
  * At 100 TB this is the shape that keeps monitoring free: `observe`
  * aggregates are computed inside the existing exchanges as
  * `CollectMetrics` operators, so row counts / null rates / control sums
  * arrive with the job instead of doubling its IO. Sums go through exact
  * decimal lanes (the [[graft.queries.Det]] discipline) so a control-total
  * reconciliation is bit-stable across partitionings.
  */
object Metrics {

  /** Attach the standard DQ observation point `name` to `df`: total rows,
    * a null count per column in `nullCols`, and an exact-decimal control
    * sum (surfaced as DOUBLE) per column in `sumCols`. The returned frame
    * is the same data — only the observation rides along. */
  def audit(df: DataFrame, name: String,
            nullCols: Seq[String] = Nil, sumCols: Seq[String] = Nil): DataFrame = {
    val aggs: Seq[Column] =
      count(lit(1)).as("rows") +:
        (nullCols.map(c => count(when(col(c).isNull, 1)).as(s"nulls_$c")) ++
          sumCols.map(c =>
            sum(col(c).cast("decimal(28,2)")).cast("double").as(s"sum_$c")))
    df.observe(name, aggs.head, aggs.tail: _*)
  }

  /** Snapshots every named observation of every completed action.
    * Register around the actions of interest (or use [[withCollector]]),
    * then read [[Collector.await]] — listener callbacks are async, so
    * reads poll up to a deadline. Last write wins per name. */
  final class Collector extends QueryExecutionListener {
    private val seen = new java.util.concurrent.ConcurrentHashMap[String, Row]()
    override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
      qe.observedMetrics.foreach { case (n, r) => seen.put(n, r) }
    override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit = ()
    def get(name: String): Option[Row] = Option(seen.get(name))
    def await(name: String, timeoutMs: Long = 10000L): Option[Row] = {
      val deadline = System.nanoTime() + timeoutMs * 1000000L
      var r = get(name)
      while (r.isEmpty && System.nanoTime() < deadline) { Thread.sleep(25); r = get(name) }
      r
    }
  }

  /** Run `body` with a registered [[Collector]]; always unregisters. */
  def withCollector[T](spark: SparkSession)(body: Collector => T): T = {
    val c = new Collector
    spark.listenerManager.register(c)
    try body(c) finally spark.listenerManager.unregister(c)
  }
}
