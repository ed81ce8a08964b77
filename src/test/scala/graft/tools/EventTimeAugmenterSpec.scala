package graft.tools

import java.nio.file.{Files, Paths}

import graft.SharedSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Event-time augmenter semantics
  * (reference: src/utils/header_event_time_creation.py:26-115). */
class EventTimeAugmenterSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  private val cols = Seq("contratto_cod", "codice_ordine_sap",
    "tipo_contratto", "codice_opec", "data_firma", "net_amount",
    "causale_annullamento", "data_annullamento", "codice_agente",
    "status_quote", "creazione_dta")

  test("augments raw drops with seeded event times, single-file pipe CSV out") {
    val root = Files.createTempDirectory("graft-evt").toString
    val in = s"$root/in"
    val out = s"$root/out"
    Files.createDirectories(Paths.get(in))
    def row(i: Int): String =
      (Seq(f"C$i%08d", s"SAP$i", "365", "OPEC0001", "2023-01-01", "100.00",
        "", "", "10001", "Accepted", "2023-01-01")).mkString("|")
    val content = (cols.mkString("|") +: (0 until 50).map(row)).mkString("\n")
    Files.writeString(Paths.get(s"$in/header_20230123.txt"), content)
    Files.writeString(Paths.get(s"$in/not_matching.txt"), content)

    val written = EventTimeAugmenter.run(spark, in, out)
    assert(written.map(_._1) == Seq("header_20230123.txt"),
      "only pattern-matching files are processed")
    // single FILE (not a directory), pipe-separated, header intact
    assert(Files.isRegularFile(Paths.get(s"$out/header_20230123.txt")))
    val df = spark.read.option("header", "true").option("sep", "|")
      .csv(s"$out/header_20230123.txt")
    assert(df.count() == 50)
    assert(df.columns.toSeq == cols :+ "event_time")
    // every event_time is an on-the-hour timestamp ON the file's date
    assert(df.filter(col("event_time")
      .rlike("^2023-01-23T\\d{2}:00:00(\\.0+)?")).count() == 50 ||
      df.filter(col("event_time")
        .rlike("^2023-01-23 \\d{2}:00:00")).count() == 50)
    // seeded: a re-run reproduces identical content
    val out2 = s"$root/out2"
    EventTimeAugmenter.run(spark, in, out2)
    val df2 = spark.read.option("header", "true").option("sep", "|")
      .csv(s"$out2/header_20230123.txt")
    assert(df.exceptAll(df2).isEmpty && df2.exceptAll(df).isEmpty)
    // the synthetic hours actually vary across rows (rand, not constant)
    assert(df.select(substring(col("event_time"), 12, 2)).distinct().count() > 3)
  }
}
