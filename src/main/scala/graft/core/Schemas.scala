package graft.core

import org.apache.spark.sql.types._

/** Fixed input schemas and SCD2 constants of the CRM pipelines.
  * Reference: src/header_etl.py:23-50, src/items_etl.py:9-40. */
object Schemas {
  /** Sentinel "open interval" timestamp (reference: src/header_etl.py:23). */
  val MaxTs = "9999-12-31 00:00:00"
  /** Sentinel "open interval" date, yyyyMMdd (reference: src/items_etl.py:9). */
  val MaxDate = "99991231"

  val HeaderDateRegex = """header_(\d{8})\.csv"""
  val ItemsDateRegex = """items_(\d{8})\.txt"""

  val HeaderDedupKeys: Seq[String] = Seq("contratto_cod", "event_time")
  val ItemsDedupKeys: Seq[String] = Seq("contratto_cod", "numero_annuncio")
  val PartitionColumns: Seq[String] =
    Seq("valid_from_year", "valid_from_month", "valid_from_day")

  /** Reference: src/header_etl.py:37-50. */
  val Header: StructType = StructType(Seq(
    StructField("contratto_cod", StringType, nullable = false),
    StructField("codice_ordine_sap", StringType, nullable = true),
    StructField("tipo_contratto", StringType, nullable = false),
    StructField("codice_opec", StringType, nullable = false),
    StructField("data_firma", StringType, nullable = true),
    StructField("net_amount", StringType, nullable = false),
    StructField("causale_annullamento", StringType, nullable = true),
    StructField("data_annullamento", StringType, nullable = true),
    StructField("codice_agente", StringType, nullable = false),
    StructField("status_quote", StringType, nullable = true),
    StructField("creazione_dta", StringType, nullable = true),
    StructField("event_time", TimestampType, nullable = true)))

  /** Reference: src/items_etl.py:26-40. */
  val Items: StructType = StructType(Seq(
    StructField("contratto_cod", StringType, nullable = false),
    StructField("numero_annuncio", StringType, nullable = false),
    StructField("list_total", DecimalType(18, 2), nullable = false),
    StructField("contracted_price", DecimalType(18, 2), nullable = true),
    StructField("total_discount", DecimalType(18, 2), nullable = true),
    StructField("data_attivazione", DateType, nullable = true),
    StructField("data_fine_prestazione", DateType, nullable = true),
    StructField("product_code", StringType, nullable = false),
    StructField("quantity", StringType, nullable = false),
    StructField("causale_annullamento", StringType, nullable = true),
    StructField("data_annullamento", DateType, nullable = true),
    StructField("status_item", StringType, nullable = false),
    StructField("creazione_dta", DateType, nullable = false)))
}
