package graft.jobs

import graft.core.Schemas
import graft.tables.VersionedTable
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DateType

/** OP-A: date-grained SCD2 for contract items
  * (reference: src/items_etl.py:46-143).
  *
  * Pipeline: pipe-CSV scan with `valid_from` extracted from the file name
  * via `regexp_extract(input_file_name(), ...)`; whole-partition
  * count-window dedup that — deliberately, matching the reference — drops
  * ALL copies of any key occurring more than once (not keep-one; see
  * SURVEY.md §2.6 W3); date transform with the 9999-12-31 open sentinel;
  * then either an init partitioned write or the staged-union SCD2 merge:
  * changed open rows are closed (`valid_to = new valid_from`) and their
  * new versions inserted through never-matching NULL mergeKey rows.
  *
  * The change predicate uses non-null-safe `<>` on {contracted_price,
  * total_discount, data_fine_prestazione} — a known reference defect
  * (reference: notes.md:3-20) preserved for parity.
  */
object ItemsEtlJob {

  /** All table columns, for the whenNotMatchedInsert values map
    * (reference: src/items_etl.py:121-141). */
  private[jobs] val InsertColumns: Seq[String] = Seq(
    "contratto_cod", "numero_annuncio", "list_total", "contracted_price",
    "total_discount", "data_attivazione", "data_fine_prestazione",
    "product_code", "quantity", "causale_annullamento", "data_annullamento",
    "status_item", "creazione_dta", "valid_from", "valid_from_year",
    "valid_from_month", "valid_from_day", "valid_to")

  /** @return number of duplicated rows dropped by the dedup step (the
    *         reference logs this count — src/items_etl.py:57-61). */
  def run(spark: SparkSession, readPath: String, writePath: String): Long = {
    // ---- EXTRACT (reference: src/items_etl.py:49-52) -------------------
    val dfExtracted = spark.read
      .option("header", "true").option("sep", "|")
      .schema(Schemas.Items)
      .csv(readPath)
      .withColumn("valid_from",
        regexp_extract(input_file_name(), Schemas.ItemsDateRegex, 1))

    // ---- DEDUP: drop ALL copies of keys occurring >1 time --------------
    // (reference quirk, preserved: src/items_etl.py:57-64 keeps flag==1
    // and logs flag==2 — keys with 3+ copies are dropped but not counted)
    val wDup = Window.partitionBy(Schemas.ItemsDedupKeys.map(col): _*)
    val flagged = dfExtracted.withColumn("flag", count(lit(1)).over(wDup))
    val duplicatedCount = flagged.filter(col("flag") === 2).count()
    val deduped = flagged.filter(col("flag") === 1)

    // ---- TRANSFORM (reference: src/items_etl.py:68-73) -----------------
    val dfTransformed = deduped
      .withColumn("valid_from", to_date(col("valid_from"), "yyyyMMdd").cast(DateType))
      .withColumn("valid_to", to_date(lit(Schemas.MaxDate), "yyyyMMdd").cast(DateType))
      .withColumn("valid_from_year", year(col("valid_from")))
      .withColumn("valid_from_month", month(col("valid_from")))
      .withColumn("valid_from_day", dayofmonth(col("valid_from")))
      .drop("flag")

    if (!VersionedTable.isTable(spark, writePath)) {
      // ---- INIT (reference: src/items_etl.py:79-81) --------------------
      VersionedTable.create(spark, dfTransformed, writePath, Schemas.PartitionColumns)
    } else {
      // ---- SCD2 MERGE (reference: src/items_etl.py:86-143) -------------
      val table = VersionedTable.forPath(spark, writePath)

      // open rows whose tracked values differ from this batch's updates
      // — `<>` non-null-safe, as in the reference
      val newItemsToInsert = dfTransformed.alias("updates")
        .join(table.read.alias("existing"), Schemas.ItemsDedupKeys)
        .where("existing.valid_to = date('9999-12-31') AND (" +
          "updates.contracted_price <> existing.contracted_price OR " +
          "updates.total_discount <> existing.total_discount OR " +
          "updates.data_fine_prestazione <> existing.data_fine_prestazione)")

      // staged union: NULL-mergeKey rows can never match → always inserted
      // (the new open versions); keyed rows close their open predecessor
      // (reference: src/items_etl.py:106-110)
      val stagedUpdates = newItemsToInsert
        .selectExpr("NULL as mergeKey", "NULL as mergeKey2", "updates.*")
        .union(dfTransformed.selectExpr(
          "contratto_cod as mergeKey", "numero_annuncio as mergeKey2", "*"))

      table.alias("existing")
        .merge(stagedUpdates.alias("staged_updates"),
          "existing.contratto_cod = mergeKey AND existing.numero_annuncio = mergeKey2")
        .whenMatchedUpdate(
          condition = "existing.valid_to = date('9999-12-31') AND (" +
            "staged_updates.contracted_price <> existing.contracted_price OR " +
            "staged_updates.total_discount <> existing.total_discount OR " +
            "staged_updates.data_fine_prestazione <> existing.data_fine_prestazione)",
          set = Map("valid_to" -> "staged_updates.valid_from"))
        .whenNotMatchedInsert(values =
          InsertColumns.map(c => c -> s"staged_updates.$c").toMap)
        .execute()
    }
    duplicatedCount
  }
}
