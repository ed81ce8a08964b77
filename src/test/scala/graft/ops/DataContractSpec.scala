package graft.ops

import java.nio.file.Files

import graft.SharedSpark
import graft.jobs.TestCsv
import org.scalatest.funsuite.AnyFunSuite

/** Data-contract checks (reference: header_etl_test.py:33-73,
  * test/items_etl_test.py:38-81) over engine-generated fixtures with the
  * same shape as the reference's `*_corrected_date.txt` files, plus
  * negative cases per rule — which the reference suite never exercises. */
class DataContractSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  private lazy val root = Files.createTempDirectory("graft-contract").toString

  private val headerCols = Seq("contratto_cod", "codice_ordine_sap",
    "tipo_contratto", "codice_opec", "data_firma", "net_amount",
    "causale_annullamento", "data_annullamento", "codice_agente",
    "status_quote", "creazione_dta")

  private def headerRow(key: String, status: String = "Accepted",
                        firma: String = "21/1/2023", amount: String = "1500.50",
                        creazione: String = "15/1/2023"): Seq[String] =
    Seq(key, "3000000001", "365", "OPEC0001", firma, amount, "", "",
      "10001", status, creazione)

  private def readCsv(name: String, rows: Seq[Seq[String]]) = {
    val p = s"$root/$name.txt"
    TestCsv.write(p, headerCols, rows)
    spark.read.option("header", "true").option("sep", "|").csv(p)
  }

  test("clean header fixture passes the full contract") {
    val df = readCsv("header_clean", Seq(
      headerRow("C00000001"), headerRow("C00000002", status = "Rejected"),
      headerRow("C00000003", firma = "3/12/2022"),
      headerRow("C00000004", amount = "49999.99"),
      headerRow("C00000005", creazione = "1/1/2023"),
      headerRow("C00000006", status = "Pending"),
      headerRow("C00000007")))
    assert(DataContract.check(df, DataContract.HeaderContract) === Nil)
    DataContract.enforce(df, DataContract.HeaderContract) // no throw
  }

  test("each violated rule is reported with its offending row count") {
    val df = readCsv("header_bad", Seq(
      headerRow("C00000001"),
      Seq("", "3000000001", "365", "OPEC0001", "21/1/2023", "1500.50", "", "",
        "10001", "Accepted", "15/1/2023"), // NULL key (empty -> null via CSV)
      headerRow("C0000000001"), // 11 chars > varchar(9)
      headerRow("C00000003", firma = "2023-01-21"), // wrong date format
      headerRow("C00000004", amount = "not-a-number"), // decimal parse fail
      headerRow("C00000005"), headerRow("C00000005"))) // duplicate key pair
    val v = DataContract.check(df, DataContract.HeaderContract)
    def rule(field: String, rule: String): Option[Long] =
      v.find(x => x.field == field && x.rule.startsWith(rule)).map(_.badRows)
    assert(rule("contratto_cod", "not_null") === Some(1))
    assert(rule("contratto_cod", "max_length") === Some(1))
    assert(rule("data_firma", "date_format") === Some(1))
    assert(rule("net_amount", "decimal") === Some(1))
    assert(rule("contratto_cod,status_quote", "key_unique") === Some(2))
    val ex = intercept[IllegalStateException] {
      DataContract.enforce(df, DataContract.HeaderContract)
    }
    assert(ex.getMessage.contains("net_amount"))
  }

  test("items contract validates decimal / number / yyyyMMdd-date fields") {
    val itemsCols = Seq("contratto_cod", "numero_annuncio", "list_total",
      "contracted_price", "total_discount", "data_attivazione",
      "data_fine_prestazione", "product_code", "quantity",
      "causale_annullamento", "data_annullamento", "status_item", "creazione_dta")
    val p = s"$root/items_clean.txt"
    TestCsv.write(p, itemsCols, Seq(
      Seq("Y06119362", "10", "1000.00", "400.00", "600.00", "23/1/2023", "",
        "PROD01", "1", "", "", "A", "20230123"),
      Seq("Y06119362", "11", "2000.00", "", "", "", "25/12/2023",
        "PROD02", "3", "", "", "B", "20230123")))
    val df = spark.read.option("header", "true").option("sep", "|").csv(p)
    assert(DataContract.check(df, DataContract.ItemsContract) === Nil)

    // corrupt quantity + creazione_dta -> exactly those two rules fire
    val p2 = s"$root/items_bad.txt"
    TestCsv.write(p2, itemsCols, Seq(
      Seq("Y06119362", "10", "1000.00", "400.00", "600.00", "23/1/2023", "",
        "PROD01", "many", "", "", "A", "2023-01-23")))
    val df2 = spark.read.option("header", "true").option("sep", "|").csv(p2)
    val v = DataContract.check(df2, DataContract.ItemsContract)
    assert(v.map(_.field).toSet === Set("quantity", "creazione_dta"))
  }
}
