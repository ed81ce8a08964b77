package graft.tables

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** High-version-count stress over the commit log: proves the
  * checkpointing claims EMPIRICALLY (counting metadata reads through the
  * [[VersionedTable.logJsonReads]] funnel) instead of trusting the
  * Scaladoc — a table with ~1,000 commits must open in
  * O(CheckpointInterval) JSON reads, serve txn watermarks (hit AND miss)
  * within the same bound via the checkpoint's folded `txns` map, and
  * [[VersionedTable.cleanLog]] must keep the log dir bounded without
  * breaking reads, recent time travel, or the surviving watermarks. */
class LogStressSpec extends AnyFunSuite {

  test("1000 commits: snapshot + txn watermark probes stay O(CheckpointInterval); cleanLog bounds the dir") {
    val s = graft.SharedSpark.spark
    val dir = Files.createTempDirectory("graft-logstress").toString
    VersionedTable.create(s, s.range(10).toDF("id"), s"$dir/t")
    val t = VersionedTable.forPath(s, s"$dir/t")
    // an EARLY txn-pinned append: its watermark must later be served from
    // the checkpoint's folded txns map — by then the backward scan stops
    // ~999 commits above this one (and after cleanLog the commit that
    // carried it is physically gone)
    t.append(s.range(1).toDF("id"), txn = Some(("appA", 7L)))
    val schemaJson = t.read.schema.json
    // metadata-only commits (empty add/remove): the log machinery is the
    // thing under stress, not parquet writing
    ((t.currentVersion + 1) to 1000L).foreach { v =>
      t.commit(LogEntry(v, System.currentTimeMillis(), "WRITE", schemaJson,
        Seq.empty, Seq.empty, Seq.empty, Map("numFiles" -> "0")))
    }
    assert(t.currentVersion == 1000L)

    val reads = VersionedTable.logJsonReads
    def counted[T](body: => T): (T, Long) = {
      val before = reads.get(); val r = body; (r, reads.get() - before)
    }

    // fresh handle, no warm state: opening + reading current must replay
    // from the newest checkpoint, not the 1,000-file log
    val (rows, openReads) = counted {
      VersionedTable.forPath(s, s"$dir/t").read.count()
    }
    assert(rows == 11L)
    assert(openReads <= 30,
      s"open-table read cost was $openReads metadata reads — not O(CheckpointInterval)")

    val (hit, hitReads) = counted(t.lastTxnBatchId("appA"))
    assert(hit.contains(7L))
    assert(hitReads <= 30,
      s"txn watermark HIT cost $hitReads reads — checkpoint txns map not consulted")

    // the miss path is the one that used to walk the whole log
    val (miss, missReads) = counted(t.lastTxnBatchId("no-such-app"))
    assert(miss.isEmpty)
    assert(missReads <= 30,
      s"txn watermark MISS cost $missReads reads — not bounded by the checkpoint")

    // ---- cleanLog: metadata truncation keeps the dir bounded ----------
    val logDir = new java.io.File(s"$dir/t/_graft_log")
    def logFiles() = logDir.listFiles().count(_.getName.endsWith(".json"))
    val before = logFiles()
    assert(before > 1000, s"expected ~1000 commit files + checkpoints, saw $before")
    val deleted = t.cleanLog(retainVersions = 20)
    assert(deleted > 900, s"expected >900 files truncated, deleted $deleted")
    val after = logFiles()
    assert(after <= 40, s"log dir still has $after files after cleanLog")

    // everything at/above the anchor keeps working on a fresh handle
    val t2 = VersionedTable.forPath(s, s"$dir/t")
    assert(t2.read.count() == 11L)
    assert(t2.readVersion(990L).count() == 11L) // recent time travel survives
    assert(t2.lastTxnBatchId("appA").contains(7L),
      "txn watermark must survive log truncation via the checkpoint txns map")
    // below the truncation point time travel is GONE, loudly (Delta shape)
    intercept[IllegalArgumentException](t2.readVersion(100L).count())

    deleteRec(new java.io.File(dir))
  }

  private def deleteRec(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(deleteRec))
    f.delete(): Unit
  }
}
