package graft.jobs

import java.nio.file.Files

import graft.SharedSpark
import graft.tables.VersionedTable
import org.scalatest.funsuite.AnyFunSuite

/** Robustness: an EMPTY daily drop (header line only) — a plausible
  * production occurrence the reference never tests — must flow through
  * both pipelines without error and without changing table state. */
class EmptyBatchSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  private val headerCols = Seq("contratto_cod", "codice_ordine_sap",
    "tipo_contratto", "codice_opec", "data_firma", "net_amount",
    "causale_annullamento", "data_annullamento", "codice_agente",
    "status_quote", "creazione_dta", "event_time")
  private val itemsCols = Seq("contratto_cod", "numero_annuncio",
    "list_total", "contracted_price", "total_discount", "data_attivazione",
    "data_fine_prestazione", "product_code", "quantity",
    "causale_annullamento", "data_annullamento", "status_item", "creazione_dta")

  test("empty header batch: zero metrics, table unchanged") {
    val root = Files.createTempDirectory("graft-empty-h").toString
    def row(cod: String): Seq[String] =
      Seq(cod, "3000000001", "365", "OPEC0001", "2023-01-01", "1500.00",
        "", "", "10001", "Accepted", "2023-01-01", "2023-01-25 10:00:00")
    TestCsv.write(s"$root/crm/header_20230125.csv", headerCols, Seq(row("E1")))
    HeaderEtlJob.run(spark, s"$root/crm/header_20230125.csv",
      s"$root/table", s"$root/discarded", s"$root/metrics")
    val before = VersionedTable.forPath(spark, s"$root/table").read.count()

    TestCsv.write(s"$root/crm/header_20230126.csv", headerCols, Seq.empty)
    val m = HeaderEtlJob.run(spark, s"$root/crm/header_20230126.csv",
      s"$root/table", s"$root/discarded", s"$root/metrics")
    assert(m.staged_count == 0 && m.inserted_count == 0 && m.closed_count == 0)
    assert(m.dq_total == 0 && m.dq_kept == 0 && m.dq_discarded == 0)
    assert(VersionedTable.forPath(spark, s"$root/table").read.count() == before)
  }

  test("fully-discarded header batch: kept split absent, zero kept, table unchanged") {
    val root = Files.createTempDirectory("graft-alldisc-h").toString
    def row(cod: String, et: String): Seq[String] =
      Seq(cod, "3000000001", "365", "OPEC0001", "2023-01-01", "1500.00",
        "", "", "10001", "Accepted", "2023-01-01", et)
    TestCsv.write(s"$root/crm/header_20230125.csv", headerCols,
      Seq(row("E1", "2023-01-25 10:00:00")))
    HeaderEtlJob.run(spark, s"$root/crm/header_20230125.csv",
      s"$root/table", s"$root/discarded", s"$root/metrics")
    val before = VersionedTable.forPath(spark, s"$root/table").read.count()

    // every row's event date mismatches the file's batch date → the
    // validation staging write produces NO kept partition at all
    TestCsv.write(s"$root/crm/header_20230126.csv", headerCols,
      Seq(row("E2", "2023-01-20 10:00:00"), row("", "2023-01-26 10:00:00")))
    val m = HeaderEtlJob.run(spark, s"$root/crm/header_20230126.csv",
      s"$root/table", s"$root/discarded", s"$root/metrics")
    assert(m.dq_total == 2 && m.dq_kept == 0 && m.dq_discarded == 2)
    assert(m.dq_batch_date_mismatch == 1 && m.dq_null_key == 1)
    assert(m.staged_count == 0 && m.inserted_count == 0 && m.closed_count == 0)
    assert(spark.read.parquet(s"$root/discarded/discarded_20230126").count() == 2)
    assert(VersionedTable.forPath(spark, s"$root/table").read.count() == before)
  }

  test("empty items batch: no-op merge, table unchanged") {
    val root = Files.createTempDirectory("graft-empty-i").toString
    def item(cod: String): Seq[String] =
      Seq(cod, "10", "1000.00", "100.00", "0.00", "2023-01-01", "2023-12-31",
        "PROD1", "1", "", "", "L", "2023-01-01")
    TestCsv.write(s"$root/crm/items_20230123.txt", itemsCols, Seq(item("Y1")))
    ItemsEtlJob.run(spark, s"$root/crm/items_20230123.txt", s"$root/table")
    TestCsv.write(s"$root/crm/items_20230125.txt", itemsCols, Seq.empty)
    val dups = ItemsEtlJob.run(spark, s"$root/crm/items_20230125.txt", s"$root/table")
    assert(dups == 0)
    val df = VersionedTable.forPath(spark, s"$root/table").read
    assert(df.count() == 1)
  }
}
