package graft.tools
import org.apache.spark.sql.SparkSession
/** Prints the PushedFilters and ReadSchema lines of every parquet scan in
  * the named queries — the direct check that a predicate reached the reader
  * and that the scan reads only the columns the query needs (both matter at
  * 100 TB and are invisible in small-SF timings; `documents.text` dominates
  * that table's bytes, so an unpruned text read is a real scale bug). Run
  * after any driver data-generation flip: a type change on a filtered
  * column can silently turn a scan-level filter into a post-scan one. */
object PushdownCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q_sql_q3", "q_sql_q5", "q_sql_q7", "q_sql_q18", "q_filter_range")
    for (n <- names) {
      graft.SparkEntry.queries.get(n) match {
        case None => println(s"== $n: UNKNOWN query key (not in SparkEntry.queries)")
        case Some(fn) =>
          val qe = fn(spark, sfDir).queryExecution
          val full = qe.explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
          val pushed = "PushedFilters: \\[[^\\]]*\\]".r.findAllIn(full).toSeq
          // ReadSchema runs to end-of-line: struct<...> payloads nest more
          // angle brackets (array<float>), which a [^>]* scan would truncate
          val schemas = "ReadSchema: [^\\n]*".r.findAllIn(full).toSeq
          println(s"== $n (${pushed.size} scans)")
          pushed.foreach(f => println("   " + f.take(220)))
          schemas.foreach(s => println("   " + s.take(220)))
      }
    }
    spark.stop()
  }
}
