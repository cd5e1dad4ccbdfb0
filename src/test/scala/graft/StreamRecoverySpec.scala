package graft

import java.nio.file.{Files, Path, StandardCopyOption}

import org.apache.spark.sql.{Dataset, SaveMode}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import streaming.Streams

/** Checkpoint kill/resume proof for the stateful streaming surface (r11
  * verdict item #4): every st query replays its source and asserts END
  * state only — none showed the engine surviving a MID-STREAM kill. This
  * spec drives st03's production sessionization kernel
  * ([[Streams.sessionStates]] — the exact mapGroupsWithState dataflow the
  * declared query runs) through a two-file source, stops the query
  * between committed micro-batches (a "kill" at the batch boundary —
  * the graceful-stop/resume contract), starts a NEW query from the
  * SAME checkpoint, and proves the resumed output equals both the
  * single-run streaming output and the batch-declarative expectation.
  * The second test covers the IN-FLIGHT failure class (r12 ADVICE #5):
  * the sink throws mid-batch on its first attempt, the query dies with
  * an uncommitted batch, and a restart from the same checkpoint must
  * REPLAY that batch (same batch id, same rows) and converge to the
  * same final state — the replay-idempotence property a production
  * crawl-ingest (st14/st18's use case) actually needs.
  *
  * The fixture is built so a session STRADDLES the kill point: losing
  * the state store's (lastTs, counters) on resume would either open a
  * spurious session (n_sessions = 4) or reset counters (n_events < 12),
  * so state-recovery failure cannot pass. The sink is foreachBatch (the
  * fault-tolerant sink shape — the memory sink refuses checkpoint
  * recovery in update mode), collecting per-batch emissions; final state
  * per user = the row with the highest n_events (monotone per user).
  */
class StreamRecoverySpec extends AnyFunSuite {
  import TestSpark._

  // 30 users x 12 events: sessions of 4 events 10 min apart, 50-min gaps
  // between sessions (> the 30-min threshold) => exactly 3 sessions per
  // user. Per-user minute offset (u % 7) staggers users without moving
  // any event across the file-split cutoff's session boundary.
  private val evs: Seq[(Long, Long)] = for {
    u <- 1L to 30L
    k <- 0 until 12
  } yield (u, ((k * 10 + (k / 4) * 40 + u % 7) * 60L) * 1000000L)

  // cutoff at minute 95: file1 ends mid-session-2 (events at minutes
  // 80/90 are in, 100/110 out) — the straddling session recovery must
  // stitch back together
  private val cutMicros = 95L * 60L * 1000000L

  /** Write rows as a single parquet FILE (not directory) into srcDir,
    * with a controlled mtime so the file source replays in order. */
  private def stageFile(rows: Seq[(Long, Long)], srcDir: Path, name: String,
      mtimeMs: Long): Unit = {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft_recov_stage")
    rows.toDF("user_id", "tsMicros").coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    val part = Files.list(tmp).filter(_.getFileName.toString.endsWith(".parquet"))
      .findFirst().get()
    val dst = srcDir.resolve(name)
    Files.copy(part, dst, StandardCopyOption.REPLACE_EXISTING)
    Files.setLastModifiedTime(dst, java.nio.file.attribute.FileTime.fromMillis(mtimeMs))
  }

  /** Run the production sessionization kernel over srcDir as a streaming
    * query from `chk`, one file per micro-batch, collecting every
    * update-mode emission into `buf`; returns after the source drains. */
  private def runOnce(srcDir: Path, chk: Path,
      buf: scala.collection.mutable.ArrayBuffer[(Long, Long, Long)]): Unit = {
    import spark.implicits._
    val schema = spark.read.parquet(srcDir.toString).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(srcDir.toString)
      .as[Streams.Ev]
    val q = Streams.sessionStates(stream).writeStream
      .outputMode("update")
      .option("checkpointLocation", chk.toString)
      .foreachBatch { (ds: Dataset[Streams.UserSessions], _: Long) =>
        val rows = ds.collect().map(u => (u.user_id, u.n_sessions, u.n_events))
        buf.synchronized { buf ++= rows }
        ()
      }
      .start()
    try q.processAllAvailable()
    finally q.stop()
  }

  /** Latest state per user: n_events is monotone within a user, so the
    * max-(n_events) emission is the final state. */
  private def finalState(buf: Seq[(Long, Long, Long)]): Map[Long, (Long, Long)] =
    buf.groupBy(_._1).map { case (u, rows) =>
      val last = rows.maxBy(_._3)
      u -> (last._2, last._3)
    }

  test("st03's stateful kernel resumes from a checkpoint after a mid-stream kill") {
    val root = Files.createTempDirectory("graft_recov")
    val (f1, f2) = evs.partition(_._2 < cutMicros)
    assert(f1.nonEmpty && f2.nonEmpty, "cutoff must split the fixture")
    // sanity: the cutoff splits a session (users have events both sides
    // within one 30-min-gap session: minute 90 in f1, 100 in f2)
    assert(f1.exists(e => e._2 >= 80L * 60 * 1000000L) &&
      f2.exists(e => e._2 <= 111L * 60 * 1000000L))

    // --- single-run reference: both files staged, one query ---
    val srcA = Files.createDirectory(root.resolve("srcA"))
    val now = System.currentTimeMillis()
    stageFile(f1, srcA, "e1.parquet", now - 120000)
    stageFile(f2, srcA, "e2.parquet", now - 60000)
    val bufA = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
    runOnce(srcA, root.resolve("chkA"), bufA)
    val singleRun = finalState(bufA.toSeq)

    // --- kill/resume: file1 only, stop, add file2, NEW query, SAME chk ---
    val srcB = Files.createDirectory(root.resolve("srcB"))
    stageFile(f1, srcB, "e1.parquet", now - 120000)
    val chkB = root.resolve("chkB")
    val bufB = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
    runOnce(srcB, chkB, bufB)                       // batch 0, then "crash"
    val afterKill = finalState(bufB.toSeq)
    // mid-stream state: sessions 1..2 seen, session 2 still open
    assert(afterKill.values.forall { case (s, e) => s == 2L && e < 12L },
      s"pre-kill state should be mid-stream, got ${afterKill.take(3)}")
    stageFile(f2, srcB, "e2.parquet", now - 60000)  // the next crawl delta
    runOnce(srcB, chkB, bufB)                       // resume from checkpoint
    val resumed = finalState(bufB.toSeq)

    // --- the recovery property ---
    val expected = (1L to 30L).map(u => u -> (3L, 12L)).toMap
    assert(singleRun == expected, "single-run streaming != declarative sessions")
    assert(resumed == expected, "resumed-from-checkpoint != declarative sessions")
    assert(resumed == singleRun)
  }

  test("an in-flight batch failure is replayed with the same batch id on restart") {
    // r12 ADVICE #5: the graceful-stop test above proves resume from a
    // COMMITTED checkpoint; this one fails a batch MID-FLIGHT — the sink
    // throws on its first attempt at the second file's batch, before
    // writing anything — and proves the restarted query replays that
    // exact batch (same id, same data) to the correct final state.
    import spark.implicits._
    val root = Files.createTempDirectory("graft_recov_fail")
    val (f1, f2) = evs.partition(_._2 < cutMicros)
    val src = Files.createDirectory(root.resolve("src"))
    val now = System.currentTimeMillis()
    stageFile(f1, src, "e1.parquet", now - 120000)
    stageFile(f2, src, "e2.parquet", now - 60000)
    val chk = root.resolve("chk")
    val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
    val attempts = scala.collection.mutable.ArrayBuffer.empty[Long]
    @volatile var armed = true
    def run(): Unit = {
      val schema = spark.read.parquet(src.toString).schema
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src.toString)
        .as[Streams.Ev]
      val q = Streams.sessionStates(stream).writeStream
        .outputMode("update")
        .option("checkpointLocation", chk.toString)
        .foreachBatch { (ds: Dataset[Streams.UserSessions], batchId: Long) =>
          attempts.synchronized { attempts += batchId }
          // fail batch 1's FIRST attempt before any row reaches the
          // sink (the transactional-sink contract: nothing partial)
          if (batchId == 1 && armed) {
            armed = false
            throw new RuntimeException("injected mid-flight sink failure")
          }
          val rows = ds.collect().map(u => (u.user_id, u.n_sessions, u.n_events))
          buf.synchronized { buf ++= rows }
          ()
        }
        .start()
      try q.processAllAvailable()
      finally q.stop()
    }
    // first run dies inside batch 1 (processAllAvailable surfaces the
    // foreachBatch exception); the checkpoint holds batch 0 committed,
    // batch 1 uncommitted
    intercept[Throwable] { run() }
    assert(!armed, "the injected failure must have fired")
    // restart from the SAME checkpoint: batch 1 replays (same id) and
    // the stream drains to the declarative end state
    run()
    assert(attempts.count(_ == 1L) == 2,
      s"batch 1 must be attempted twice (fail + replay), got $attempts")
    val expected = (1L to 30L).map(u => u -> (3L, 12L)).toMap
    assert(finalState(buf.toSeq) == expected,
      "replayed-after-failure state != declarative sessions")
  }
}
