package graft.tools

import java.nio.file.Files

import graft.SharedSpark
import graft.jobs.ItemsEtlJob
import graft.tables.VersionedTable
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Generator semantics for the items volume-curve workload, pinning the
  * r12-ADVICE re-send contract: untracked columns identical across
  * batches (id-anchored dates, never batch-date-derived), a guaranteed
  * single-tracked-field change per re-send, and quirk rows whose
  * NULL → value price change is invisible to the reference's
  * non-null-safe `<>` predicate (reference: notes.md:3-20) — so the
  * merge accounting is exact integer arithmetic over the planted
  * populations, no collision terms. */
class ItemsDataGenSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  private lazy val root = Files.createTempDirectory("graft-itemsgen").toString
  private val N = 20000L
  private val NewCount = math.round(N * 50.0 / 100.0)
  private val UpdCount = N - NewCount

  // planted populations among the re-sent ids 0..UpdCount-1
  private def quirkIds(until: Long) = (0L until until).count(_ % 97 == 31)
  private def dupIds(until: Long) = (0L until until).count(_ % 1000 == 7)
  private def quirkAndDupIds(until: Long) =
    (0L until until).count(i => i % 97 == 31 && i % 1000 == 7)

  test("batch1/batch2: re-sent rows differ ONLY in contracted_price") {
    ItemsDataGen.writeBatch1(spark, N, "20230123", s"$root/crm", 4, seed = 42)
    ItemsDataGen.writeBatch2(spark, N, "20230125", s"$root/crm", 4, baseSeed = 42)
    def readDrop(date: String) = spark.read
      .option("header", "true").option("sep", "|")
      .csv(s"$root/crm/items_$date.txt")
    val b1 = readDrop("20230123").dropDuplicates("contratto_cod", "numero_annuncio")
    val b2 = readDrop("20230125").filter(col("contratto_cod").startsWith("C"))
    assert(b2.count() === UpdCount)
    // join re-sends to their batch1 originals: every untracked column —
    // including the TRACKED-but-deliberately-unchanged total_discount
    // and data_fine_prestazione — must be byte-identical
    val joined = b2.alias("u").join(b1.alias("e"),
      Seq("contratto_cod", "numero_annuncio"))
    val unchangedCols = ItemsDataGen.OutCols
      .filterNot(_ == "contracted_price")
      .filterNot(c => c == "contratto_cod" || c == "numero_annuncio")
    unchangedCols.foreach { c =>
      val diff = joined.filter(!(col(s"u.$c") <=> col(s"e.$c"))).count()
      assert(diff === 0, s"column $c differs between batches on re-sent keys")
    }
    // price: every re-send changes it — non-quirk rows +1 on batch1's
    // value, quirk rows NULL → value (both REAL changes)
    assert(joined.filter(col("u.contracted_price") <=> col("e.contracted_price"))
      .count() === 0)
    // the CSV reader maps empty fields to NULL — match either encoding
    val quirks = joined.filter(col("e.contracted_price").isNull ||
      col("e.contracted_price") === "")
    assert(quirks.count() === quirkIds(UpdCount))
    assert(quirks.filter(col("u.contracted_price").isNull ||
      col("u.contracted_price") === "").count() === 0)
  }

  test("end-to-end merge accounting is exact integer arithmetic") {
    val table = s"$root/table"
    val m1 = ItemsEtlJob.runWithMetrics(spark,
      s"$root/crm/items_20230123.txt", table)
    // batch1: dup keys (two copies each) are ALL dropped; the logged
    // duplicated count is the flag==2 rows (reference quirk: both copies)
    val dupK = dupIds(N)
    assert(m1.duplicated_count === 2L * dupK)
    assert(m1.staged_count === N - dupK)
    assert(m1.inserted_count === N - dupK)

    val m2 = ItemsEtlJob.runWithMetrics(spark,
      s"$root/crm/items_20230125.txt", table)
    val q = quirkIds(UpdCount)
    val d = dupIds(UpdCount)
    val qd = quirkAndDupIds(UpdCount)
    // closed = re-sends − quirk rows (`<>` cannot see NULL→value) −
    // keys dup-dropped from batch1 (nothing to close), + the overlap
    // counted twice
    val expectedClosed = UpdCount - q - d + qd
    // inserted = new contracts + re-versions of the closed rows + fresh
    // inserts of the dup-dropped keys (their quirk overlap included —
    // no existing row means the NULL-price blind spot doesn't apply)
    val expectedInserted = NewCount + expectedClosed + d
    assert(m2.closed_count === expectedClosed)
    assert(m2.inserted_count === expectedInserted)
    assert(m2.duplicated_count === 0L)

    // the quirk rows' table state: still ONE open version carrying
    // batch1's NULL price — the change arrived and was not versioned,
    // the preserved reference defect in action
    val t = VersionedTable.forPath(spark, table).read
    val quirkKey = concat(lit("C"), lpad(floor(lit(31) / 3).cast("string"), 8, "0"))
    val versions = t.filter(col("contratto_cod") === quirkKey &&
      col("numero_annuncio") === "A01") // id 31 → annuncio 31 % 3 = 1
    assert(versions.count() === 1)
    val row = versions.select("contracted_price", "valid_to").collect()(0)
    assert(row.isNullAt(0), "quirk row's NULL price must survive un-versioned")
    assert(row.get(1).toString.startsWith("9999-12-31"))
  }

  test("seeded determinism: regenerating either batch is byte-identical") {
    val p1 = ItemsDataGen.writeBatch2(spark, 3000L, "20230125",
      s"$root/crmA", 4, baseSeed = 42)
    val p2 = ItemsDataGen.writeBatch2(spark, 3000L, "20230125",
      s"$root/crmB", 4, baseSeed = 42)
    def rd(p: String) = spark.read
      .option("header", "true").option("sep", "|").csv(p)
    assert(rd(p1).exceptAll(rd(p2)).isEmpty && rd(p2).exceptAll(rd(p1)).isEmpty)
  }
}
