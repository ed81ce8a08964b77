package graft.jobs

import java.nio.file.Files

import graft.SharedSpark
import graft.tables.VersionedTable
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.Prop.propBoolean
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property-based interval invariants for the ITEMS date-grained SCD2
  * pipeline over random batch sequences (companion of
  * [[Scd2PropertySpec]]): random key subsets per batch, batch-prefixed
  * prices so every cross-batch resend is a real `<>` change, and
  * occasional in-batch duplicate pairs exercising the drop-all-copies
  * quirk (a dropped key simply skips that batch). Invariants:
  *   1. (key, valid_from) unique,
  *   2. versions per key are contiguous (prev.valid_to == next.valid_from),
  *   3. exactly one open version (9999-12-31) per key,
  *   4. re-running the final batch is a no-op (unchanged values never
  *      re-close or re-insert).
  */
class ItemsPropertySpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  private val batchDates = Seq("20230123", "20230125", "20230127")

  private case class It(key: String, ann: String, price: String, dup: Boolean)

  private def batchGen(b: Int): Gen[List[It]] =
    for {
      keys <- Gen.someOf((1 to 6).map(i => f"Y$i%08d"))
      items <- Gen.sequence[List[It], It](keys.toList.map { k =>
        for {
          cents <- Gen.choose(0, 99)
          dup <- Gen.frequency(4 -> false, 1 -> true)
        } yield It(k, "10", f"${100 * (b + 1)}.$cents%02d", dup)
      })
    } yield items

  private val scenarioGen: Gen[List[List[It]]] =
    for {
      n <- Gen.choose(2, 3)
      bs <- Gen.sequence[List[List[It]], List[It]]((0 until n).toList.map(batchGen))
    } yield bs

  private val cols = Seq("contratto_cod", "numero_annuncio", "list_total",
    "contracted_price", "total_discount", "data_attivazione",
    "data_fine_prestazione", "product_code", "quantity",
    "causale_annullamento", "data_annullamento", "status_item", "creazione_dta")

  private def writeBatch(dir: String, date: String, items: Seq[It]): String = {
    val rows = items.flatMap { it =>
      val row = Seq(it.key, it.ann, "1000.00", it.price, "0.00",
        "2023-01-01", "2023-12-31", "PROD1", "1", "", "", "L", "2023-01-01")
        .mkString("|")
      if (it.dup) Seq(row, row) else Seq(row)
    }
    val p = java.nio.file.Paths.get(s"$dir/items_$date.txt")
    java.nio.file.Files.createDirectories(p.getParent)
    java.nio.file.Files.writeString(p, (cols.mkString("|") +: rows).mkString("\n"))
    p.toString
  }

  private def checkInvariants(tablePath: String): Unit = {
    val MaxDate = java.sql.Date.valueOf("9999-12-31")
    val rows = VersionedTable.forPath(spark, tablePath).read
      .select("contratto_cod", "numero_annuncio", "valid_from", "valid_to")
      .collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getDate(2), r.getDate(3)))

    val dup = rows.groupBy(r => (r._1, r._2)).filter(_._2.length > 1)
    assert(dup.isEmpty, s"duplicate (key, valid_from): ${dup.keys}")

    rows.groupBy(_._1).foreach { case (key, vs) =>
      val sorted = vs.sortBy(_._2.getTime)
      assert(vs.count(_._3 == MaxDate) == 1,
        s"$key: ${vs.count(_._3 == MaxDate)} open versions")
      sorted.sliding(2).foreach {
        case Array(prev, next) =>
          assert(prev._3 == next._2, s"$key: gap/overlap ${prev._3} -> ${next._2}")
        case _ =>
      }
      assert(sorted.last._3 == MaxDate, s"$key: last version not open")
    }
  }

  test("random items batch sequences preserve the SCD2 interval invariants") {
    val prop = Prop.forAll(scenarioGen) { batches =>
      val nonEmpty = batches.zipWithIndex.filter(_._1.nonEmpty)
      nonEmpty.nonEmpty ==> {
        val root = Files.createTempDirectory("graft-items-prop").toString
        var lastFile: String = null
        nonEmpty.foreach { case (items, i) =>
          lastFile = writeBatch(s"$root/crm", batchDates(i), items)
          ItemsEtlJob.run(spark, lastFile, s"$root/table")
        }
        checkInvariants(s"$root/table")

        val snap = VersionedTable.forPath(spark, s"$root/table").read
          .collect().map(_.toString).sorted.toSeq
        ItemsEtlJob.run(spark, lastFile, s"$root/table")
        val again = VersionedTable.forPath(spark, s"$root/table").read
          .collect().map(_.toString).sorted.toSeq
        assert(snap == again, "re-running the final batch must change nothing")
        Prop.passed
      }
    }
    val params = SCTest.Parameters.default
      .withMinSuccessfulTests(5)
      .withInitialSeed(Seed(7L))
    val result = SCTest.check(params, prop)
    assert(result.passed, s"property failed: ${result.status}")
  }
}
