package graft.tools

import graft.GraftSession
import graft.sources.SingleFileCsv
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Event-time augmenter for raw header drops
  * (reference: src/utils/header_event_time_creation.py:26-115): reads
  * every `header_YYYYMMDD.txt` in a directory with a STRING-ONLY schema
  * (no automatic date parsing), normalizes empty `creazione_dta` to NULL,
  * attaches a synthetic `event_time` — hour drawn per row from
  * `floor(rand(seed) * 24)` with the seed derived from the file's date,
  * so a re-run reproduces the same times — and writes each batch back as
  * a single pipe-separated CSV.
  *
  * Faithful quirk: the reference computes the trimmed/NULL-normalized
  * `creazione_dta_raw` and then DROPS it before saving — the output
  * carries the ORIGINAL `creazione_dta` (normalization happens again in
  * the ETL's transform step). Preserved as-is.
  */
object EventTimeAugmenter {

  val FileRegex = """header_(\d{8})\.txt""".r

  /** String-only header schema (reference: :26-38 — 11 columns, no
    * event_time yet). */
  val HeaderSchemaStr: StructType = StructType(Seq(
    StructField("contratto_cod", StringType, nullable = false),
    StructField("codice_ordine_sap", StringType),
    StructField("tipo_contratto", StringType),
    StructField("codice_opec", StringType),
    StructField("data_firma", StringType),
    StructField("net_amount", StringType),
    StructField("causale_annullamento", StringType),
    StructField("data_annullamento", StringType),
    StructField("codice_agente", StringType),
    StructField("status_quote", StringType),
    StructField("creazione_dta", StringType)))

  /** Augment one raw batch frame for `yyyymmdd` (reference: :84-107). */
  private[tools] def augment(df: DataFrame, yyyymmdd: String): DataFrame = {
    val fileDate =
      s"${yyyymmdd.substring(0, 4)}-${yyyymmdd.substring(4, 6)}-${yyyymmdd.substring(6, 8)}"
    val seed = yyyymmdd.toLong
    df
      .withColumn("creazione_dta_raw", trim(col("creazione_dta")))
      .withColumn("creazione_dta_raw",
        when(col("creazione_dta_raw") === "", lit(null))
          .otherwise(col("creazione_dta_raw")))
      .withColumn("hour_rand", floor(rand(seed) * 24).cast("int"))
      .withColumn("event_time_str", concat(
        lit(fileDate), lit(" "),
        lpad(col("hour_rand").cast("string"), 2, "0"), lit(":00:00")))
      .withColumn("event_time",
        to_timestamp(col("event_time_str"), "yyyy-MM-dd HH:mm:ss"))
      .drop("creazione_dta_raw", "hour_rand", "event_time_str")
  }

  /** Process every matching file under `inputDir` into `outputDir`.
    * @return the written (name, byteCount) pairs */
  def run(spark: SparkSession, inputDir: String, outputDir: String): Seq[(String, Long)] = {
    val files = Option(new java.io.File(inputDir).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && FileRegex.pattern.matcher(f.getName).matches())
      .sortBy(_.getName)
    files.toSeq.map { f =>
      val FileRegex(yyyymmdd) = f.getName: @unchecked
      val df = spark.read
        .option("header", "true").option("sep", "|")
        .schema(HeaderSchemaStr)
        .csv(f.getPath)
      val out = augment(df, yyyymmdd)
      val bytes = SingleFileCsv.write(out, s"$outputDir/${f.getName}",
        header = true, sep = "|")
      f.getName -> bytes
    }
  }
}

/** `runMain graft.tools.EventTimeAugmenterMain <input_dir> <output_dir>`
  * (reference: src/utils/header_event_time_creation.py CLI shape). */
object EventTimeAugmenterMain {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: EventTimeAugmenterMain <input_dir> <output_dir>")
    val spark = GraftSession.local("graft-event-time")
    val written = EventTimeAugmenter.run(spark, args(0), args(1))
    written.foreach { case (name, bytes) => println(s"written: $name ($bytes bytes)") }
    if (written.isEmpty) println(s"no header_YYYYMMDD.txt files found in ${args(0)}")
    spark.stop()
  }
}
