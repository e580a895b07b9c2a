package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame

/** Exactly-once file sink for Structured Streaming (SURVEY.md §4.3).
  *
  * The reference demo's whole point (reconstructed in SURVEY.md §2 A8-A9;
  * /root/reference is empty) is end-to-end exactly-once delivery: Flink
  * two-phase-commits a transactional Kafka producer with its checkpoint
  * barriers. Spark's equivalent guarantee composes differently:
  *
  *   - the streaming checkpoint's offsets WAL pins the exact input range of
  *     every micro-batch, so a replayed batch N carries IDENTICAL data;
  *   - therefore an idempotent commit keyed by batchId suffices:
  *       1. txn begin   = write batch output under out/_staging_batch=N
  *       2. pre-commit  = finish the parquet write
  *       3. commit      = atomic rename to out/batch=N IFF absent
  *   - a crash between write and commit replays batch N; the staging dir is
  *     rewritten and the rename/skip makes delivery exactly-once — no loss
  *     (offsets WAL), no duplication (already-committed check).
  *
  * Works on any filesystem with atomic dir rename (local, HDFS). For object
  * stores or a real Kafka sink, swap the commit step for a transactional
  * producer with transactional.id = (checkpointDir, batchId) — same
  * protocol, not locally testable (no Kafka connector jar, SURVEY.md §0).
  */
object ExactlyOnceSink {

  /** foreachBatch handler writing each micro-batch to outDir/batch=N. */
  def parquetSink(outDir: String): (DataFrame, Long) => Unit = (df, batchId) => {
    val spark = df.sparkSession
    val conf = spark.sparkContext.hadoopConfiguration
    val out = new Path(outDir)
    val fs = out.getFileSystem(conf)
    val committed = new Path(out, s"batch=$batchId")
    if (!fs.exists(committed)) {
      val staging = new Path(out, s"_staging_batch=$batchId")
      if (fs.exists(staging)) fs.delete(staging, true)
      df.write.mode("overwrite").parquet(staging.toString)
      // atomic publish; if a concurrent/replayed attempt won, drop ours
      if (!fs.rename(staging, committed)) fs.delete(staging, true)
    }
  }
}
