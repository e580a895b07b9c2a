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

  // One lock per (outDir, batch): concurrent DUPLICATE attempts in the same
  // JVM (speculative/re-executed tasks, a second query instance on the same
  // checkpoint) serialize here, so at most one attempt is ever in the
  // write-then-publish window. This matters because Hadoop FileSystem
  // rename is NOT a reliable exclusive commit under contention: the local
  // implementation falls back to move-into-directory or copy-with-overwrite
  // semantics when the destination exists, either of which can clobber or
  // pollute an already-committed batch (observed: a losing attempt's
  // partial output REPLACING the winner's). Cross-PROCESS zombies are
  // narrowed by the re-check just before the rename — and in a real
  // deployment the streaming checkpoint already admits one driver, while
  // object stores swap this commit step for a transactional producer (see
  // above). Entries are one tiny Object per batch ever committed by this
  // JVM — bounded by the stream's lifetime, cleared with the process.
  private val commitLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  /** foreachBatch handler writing each micro-batch to outDir/batch=N. */
  def parquetSink(outDir: String): (DataFrame, Long) => Unit = (df, batchId) => {
    val spark = df.sparkSession
    val conf = spark.sparkContext.hadoopConfiguration
    val out = new Path(outDir)
    val fs = out.getFileSystem(conf)
    val committed = new Path(out, s"batch=$batchId")
    val lock = commitLocks.computeIfAbsent(s"$outDir#$batchId", _ => new Object)
    lock.synchronized {
      if (!fs.exists(committed)) {
        // attempt-PRIVATE staging: a crashed attempt's leftover dir can
        // never be confused with (or half-overwritten into) ours
        val staging = new Path(out,
          s"_staging_batch=$batchId-${java.util.UUID.randomUUID}")
        df.write.mode("overwrite").parquet(staging.toString)
        // publish IFF still absent; if a cross-process attempt won the
        // window, drop ours — never rename onto an existing committed dir
        // (that is the non-atomic fallback path described above)
        if (fs.exists(committed) || !fs.rename(staging, committed))
          fs.delete(staging, true)
      }
      // batch committed (by us, a racing winner, or a previous
      // incarnation): sweep abandoned staging dirs of THIS batch —
      // crashed attempts leave them behind
      if (fs.exists(committed)) {
        val stale = fs.globStatus(new Path(out, s"_staging_batch=$batchId-*"))
        if (stale != null) stale.foreach(st => fs.delete(st.getPath, true))
      }
    }
  }
}
