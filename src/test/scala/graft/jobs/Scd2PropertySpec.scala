package graft.jobs

import java.nio.file.Files

import graft.SharedSpark
import graft.tables.VersionedTable
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.Prop.propBoolean
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property-based SCD2 invariants over RANDOM batch sequences
  * (reference: notes.md:132-134 — "no overlapping intervals per key;
  * exactly one current row per key" — encoded there as design goals,
  * verified here mechanically with ScalaCheck).
  *
  * Each case generates 2-3 daily batches of random events (random key
  * subsets, 1-2 events per key at distinct times, statuses prefixed per
  * batch so every cross-batch resend is a REAL change — the
  * identical-resend corner is reference-faithful but deliberately
  * excluded so the strict invariants must hold), runs the real
  * HeaderEtlJob over them, and checks the resulting table:
  *   1. exactly one is_current row per key,
  *   2. per key, versions ordered by valid_from_ts are CONTIGUOUS
  *      (prev.valid_to_ts == next.valid_from_ts) and only the last is
  *      open at the 9999-12-31 sentinel,
  *   3. (contratto_cod, valid_from_ts) is unique,
  *   4. re-running the final batch changes nothing (idempotence — the
  *      reference's T5 scenario, test/run_all_test.py:132-158).
  */
class Scd2PropertySpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  private case class Ev(key: String, hour: Int, minute: Int, status: String)

  private val batchDates = Seq("2023-01-25", "2023-01-26", "2023-01-27")

  /** One batch: a random subset of keys, 1-2 events each at distinct
    * minutes, statuses carrying the batch index (always a change vs the
    * previous batch). */
  private def batchGen(b: Int): Gen[List[Ev]] =
    for {
      keys <- Gen.someOf((1 to 6).map(i => f"K$i%07d"))
      evs <- Gen.sequence[List[List[Ev]], List[Ev]](keys.toList.map { k =>
        for {
          n <- Gen.choose(1, 2)
          hours <- Gen.pick(n, 8 until 20)
          statuses <- Gen.listOfN(n, Gen.oneOf("A", "B", "C"))
        } yield hours.toList.sorted.zip(statuses).map { case (h, st) =>
          Ev(k, h, (h * 7) % 60, s"S$b-$st")
        }
      }).map(_.flatten)
    } yield evs

  private val scenarioGen: Gen[List[List[Ev]]] =
    for {
      nBatches <- Gen.choose(2, 3)
      batches <- Gen.sequence[List[List[Ev]], List[Ev]](
        (0 until nBatches).toList.map(batchGen))
    } yield batches

  private val cols = Seq("contratto_cod", "codice_ordine_sap",
    "tipo_contratto", "codice_opec", "data_firma", "net_amount",
    "causale_annullamento", "data_annullamento", "codice_agente",
    "status_quote", "creazione_dta", "event_time")

  private def writeBatch(dir: String, date: String, evs: Seq[Ev]): String = {
    val fname = s"header_${date.replace("-", "")}.csv"
    val rows = evs.map(e => Seq(
      e.key, "3000000001", "365", "OPEC0001", "2023-01-01", "1500.00",
      "", "", "10001", e.status, "2023-01-01",
      f"$date ${e.hour}%02d:${e.minute}%02d:00").mkString("|"))
    val content = (cols.mkString("|") +: rows).mkString("\n")
    val p = java.nio.file.Paths.get(s"$dir/$fname")
    java.nio.file.Files.createDirectories(p.getParent)
    java.nio.file.Files.writeString(p, content)
    p.toString
  }

  private def checkInvariants(tablePath: String): Unit = {
    val MaxTs = java.sql.Timestamp.valueOf("9999-12-31 00:00:00")
    val rows = VersionedTable.forPath(spark, tablePath).read
      .select("contratto_cod", "valid_from_ts", "valid_to_ts", "is_current")
      .collect()
      .map(r => (r.getString(0), r.getTimestamp(1), r.getTimestamp(2), r.getBoolean(3)))

    // 3. unique (key, valid_from_ts)
    val dupKeys = rows.groupBy(r => (r._1, r._2)).filter(_._2.length > 1)
    assert(dupKeys.isEmpty, s"duplicate (key, valid_from): ${dupKeys.keys}")

    rows.groupBy(_._1).foreach { case (key, vs) =>
      val sorted = vs.sortBy(_._2.getTime)
      // 1. exactly one current
      assert(vs.count(_._4) == 1, s"$key: ${vs.count(_._4)} current rows")
      // 2. contiguity + only last open
      sorted.sliding(2).foreach {
        case Array(prev, next) =>
          assert(prev._3 == next._2,
            s"$key: gap/overlap ${prev._3} -> ${next._2}")
          assert(!prev._4, s"$key: non-last row is_current")
        case _ =>
      }
      assert(sorted.last._3 == MaxTs, s"$key: last row not open")
      assert(sorted.last._4, s"$key: last row not current")
    }
  }

  test("random batch sequences preserve the SCD2 interval invariants") {
    val prop = Prop.forAll(scenarioGen) { batches =>
      val nonEmpty = batches.zipWithIndex.filter(_._1.nonEmpty)
      nonEmpty.nonEmpty ==> {
        val root = Files.createTempDirectory("graft-scd2-prop").toString
        var lastFile: String = null
        nonEmpty.foreach { case (evs, i) =>
          lastFile = writeBatch(s"$root/crm", batchDates(i), evs)
          HeaderEtlJob.run(spark, lastFile, s"$root/table",
            s"$root/discarded", s"$root/metrics")
        }
        checkInvariants(s"$root/table")

        // 4. idempotence: re-running the final batch is a no-op
        val before = VersionedTable.forPath(spark, s"$root/table").read
          .select("contratto_cod", "valid_from_ts", "valid_to_ts", "is_current")
          .collect().map(_.toString).sorted.toSeq
        HeaderEtlJob.run(spark, lastFile, s"$root/table",
          s"$root/discarded", s"$root/metrics")
        val after = VersionedTable.forPath(spark, s"$root/table").read
          .select("contratto_cod", "valid_from_ts", "valid_to_ts", "is_current")
          .collect().map(_.toString).sorted.toSeq
        assert(before == after, "re-running the final batch must change nothing")
        Prop.passed
      }
    }
    val params = SCTest.Parameters.default
      .withMinSuccessfulTests(5)
      .withInitialSeed(Seed(42L))
    val result = SCTest.check(params, prop)
    assert(result.passed, s"property failed: ${result.status}")
  }
}
