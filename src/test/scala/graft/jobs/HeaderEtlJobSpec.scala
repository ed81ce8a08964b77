package graft.jobs

import java.nio.file.Files
import java.sql.Timestamp

import graft.SharedSpark
import graft.tables.VersionedTable
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The five SCD2 scenarios of the reference's authoritative suite
  * (reference: test/run_all_test.py:40-158), plus the 5-format timestamp
  * fallback and the global interval invariants. Tests share one table and
  * run in declaration order, mirroring the reference script. */
class HeaderEtlJobSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  private val header = Seq("contratto_cod", "codice_ordine_sap",
    "tipo_contratto", "codice_opec", "data_firma", "net_amount",
    "causale_annullamento", "data_annullamento", "codice_agente",
    "status_quote", "creazione_dta", "event_time")

  private lazy val root = Files.createTempDirectory("graft-header-etl").toString
  private lazy val crmDir = s"$root/crm/header"
  private lazy val tablePath = s"$root/landing/header"
  private lazy val discardedPath = s"$root/discarded/header"
  private lazy val metricsPath = s"$root/metrics/header"

  private def runBatch(file: String, rows: Seq[Seq[String]]): HeaderRunMetrics = {
    val path = s"$crmDir/$file"
    TestCsv.write(path, header, rows)
    HeaderEtlJob.run(spark, path, tablePath, discardedPath, metricsPath)
  }

  private def tableFor(key: String) =
    VersionedTable.forPath(spark, tablePath).read
      .filter(col("contratto_cod") === key)
      .orderBy(col("valid_from_ts").asc)

  private val MaxTs = Timestamp.valueOf("9999-12-31 00:00:00")

  test("T1: initial load creates one open version") {
    runBatch("header_20230101.csv", Seq(
      Seq("C1", "ORD1", "365", "P1", "2022-01-01", "100.00", "", "", "AG1",
        "Accepted", "11/25/2022", "2023-01-01 10:00:00")))
    val rows = tableFor("C1").collect()
    assert(rows.length == 1)
    assert(rows(0).getAs[Boolean]("is_current"))
    assert(rows(0).getAs[Timestamp]("valid_to_ts") == MaxTs)
    assert(rows(0).getAs[Timestamp]("valid_from_ts") ==
      Timestamp.valueOf("2023-01-01 10:00:00"))
    // creazione_dta parsed through the M/d/yyyy fallback on the init path
    assert(rows(0).getAs[java.sql.Date]("creazione_dta_parsed") ==
      java.sql.Date.valueOf("2022-11-25"))
  }

  test("T2: changed status closes previous version and opens a new one") {
    runBatch("header_20230102.csv", Seq(
      Seq("C1", "ORD1", "365", "P1", "2022-01-01", "100.00", "", "", "AG1",
        "Rifiutata", "11/25/2022", "2023-01-02 12:00:00")))
    val rows = tableFor("C1").collect()
    assert(rows.length == 2)
    val (first, second) = (rows(0), rows(1))
    assert(!first.getAs[Boolean]("is_current"))
    assert(second.getAs[Boolean]("is_current"))
    assert(first.getAs[Timestamp]("valid_to_ts") ==
      second.getAs[Timestamp]("valid_from_ts"))
    assert(first.getAs[String]("closed_by_batch") != null)
    assert(second.getAs[String]("status_quote") == "Rifiutata")
  }

  test("T3: intra-batch events become contiguous version rows") {
    runBatch("header_20230103.csv", Seq(
      Seq("C2", "ORD2", "365", "P1", "", "200.00", "", "", "AG2",
        "Accepted", "", "2023-01-03 09:00:00"),
      Seq("C2", "ORD2", "365", "P1", "", "200.00", "", "", "AG2",
        "Rifiutata", "", "2023-01-03 15:00:00")))
    val rows = tableFor("C2").collect()
    assert(rows.length == 2, s"expected 2 versions for C2, got ${rows.length}")
    assert(rows(0).getAs[Timestamp]("valid_to_ts") ==
      rows(1).getAs[Timestamp]("valid_from_ts"))
    assert(!rows(0).getAs[Boolean]("is_current"))
    assert(rows(1).getAs[Boolean]("is_current"))
  }

  test("T4: dedup keeps only the latest of identical duplicates") {
    val dup = Seq("C3", "ORD3", "365", "P1", "", "50.00", "", "", "AG3",
      "Accepted", "", "2023-01-04 08:00:00")
    val m = runBatch("header_20230104.csv", Seq(
      dup, dup, dup, dup,
      Seq("C3", "ORD3", "365", "P1", "", "50.00", "", "", "AG3",
        "Signed", "", "2023-01-04 09:00:00"),
      Seq("C10", "ORD3", "365", "P1", "", "50.00", "", "", "AG3",
        "Suspended", "", "2023-01-04 09:00:00")))
    assert(m.dq_duplicates_older == 3) // 4 copies → 3 discarded as older dups
    val c3 = tableFor("C3").collect()
    assert(c3.length == 2, s"expected 2 versions for C3, got ${c3.length}")
    assert(c3(0).getAs[String]("status_quote") == "Accepted")
    assert(c3(1).getAs[String]("status_quote") == "Signed")
    assert(!c3(0).getAs[Boolean]("is_current"))
    assert(c3(1).getAs[Boolean]("is_current"))
    val c10 = tableFor("C10").collect()
    assert(c10.length == 1 && c10(0).getAs[Boolean]("is_current"))
  }

  test("T5: re-run with a superset batch adds exactly the new event") {
    runBatch("header_20230105.csv", Seq(
      Seq("C4", "ORD4", "365", "P1", "", "75.00", "", "", "AG4",
        "Accepted", "", "2023-01-05 11:00:00")))
    val before = tableFor("C4").count()
    // same file name, superset content — idempotent re-run semantics
    runBatch("header_20230105.csv", Seq(
      Seq("C4", "ORD4", "365", "P1", "", "75.00", "", "", "AG4",
        "Accepted", "", "2023-01-05 11:00:00"),
      Seq("C4", "ORD4", "365", "P1", "", "75.00", "", "", "AG4",
        "Signed", "", "2023-01-05 12:00:00")))
    val after = tableFor("C4").collect()
    assert(before == after.length - 1,
      s"idempotence failed: before=$before after=${after.length}")
    assert(after.last.getAs[String]("status_quote") == "Signed")
    assert(after.last.getAs[Boolean]("is_current"))
    // the 11:00 row was closed at the first changing event
    assert(after.head.getAs[Timestamp]("valid_to_ts") ==
      Timestamp.valueOf("2023-01-05 12:00:00"))
  }

  test("ISO offset timestamps (.SSSXXX) are kept, not discarded") {
    val m = runBatch("header_20230106.csv", Seq(
      Seq("C5", "ORD5", "365", "P1", "", "80.00", "", "", "AG5",
        "Accepted", "", "2023-01-06T08:00:00.000+01:00")))
    assert(m.dq_kept == 1 && m.dq_discarded == 0)
    val rows = tableFor("C5").collect()
    assert(rows.length == 1)
    // +01:00 normalized to the UTC session zone
    assert(rows(0).getAs[Timestamp]("valid_from_ts") ==
      Timestamp.valueOf("2023-01-06 07:00:00"))
  }

  test("invariants: contiguous intervals, exactly one current row per key") {
    import spark.implicits._
    val df = VersionedTable.forPath(spark, tablePath).read
    // exactly one open row per key (reference: test/run_all_test.py:124-130)
    val badCurrent = df.groupBy("contratto_cod")
      .agg(sum(when(col("is_current"), 1).otherwise(0)).as("n"))
      .filter(col("n") =!= 1).count()
    assert(badCurrent == 0, "keys with != 1 current row")
    // contiguity: valid_to_ts == next valid_from_ts within each key
    // (reference: test/run_all_test.py:98)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("contratto_cod").orderBy(col("valid_from_ts").asc)
    val gaps = df
      .withColumn("next_from", lead("valid_from_ts", 1).over(w))
      .filter(col("next_from").isNotNull &&
        col("valid_to_ts") =!= col("next_from"))
      .count()
    assert(gaps == 0, "non-contiguous version intervals")
    // discarded sink exists for the dup batch
    assert(spark.read.parquet(s"$discardedPath/discarded_20230104").count() == 3)
    // a CLEAN batch's discard sink must still be a readable (empty)
    // parquet dataset, not a bare directory
    assert(spark.read.parquet(s"$discardedPath/discarded_20230101").count() == 0)
    // metrics CSVs were written (one dir per batch)
    val metricsDirs = new java.io.File(metricsPath).list()
    assert(metricsDirs != null && metricsDirs.nonEmpty)
  }
}
