package graft.tools

import java.time.LocalDate
import java.time.format.DateTimeFormatter

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Seeded synthetic items-batch generator — the OP-A (items SCD2)
  * counterpart of [[HeaderDataGen]], so the bench can publish an items
  * volume curve next to the header one. The reference ships only small
  * fixture drops for the items pipeline (reference: crm/items_*.txt);
  * this reproduces their shape at arbitrary row counts.
  *
  * batch1 = `n` unique (contratto_cod, numero_annuncio) item rows (~3
  * items per contract) for `batchDate`, plus a planted 1-per-`dupEvery`
  * duplicated key whose copies the pipeline's drop-ALL-duplicates window
  * (SURVEY.md §2.6 W3) must discard and count; batch2 = `pctNew`% items
  * under brand-new `N`-prefixed contracts plus price-changed re-sends of
  * the first existing items — the rows the SCD2 merge must close and
  * re-version through the `<>` change predicate.
  *
  * Scale note: pure seeded `spark.range` pipelines — fully distributed,
  * no windows, no joins; `repartition(partitions)` sets output
  * parallelism. Attributes derive from the range id (not row position),
  * so a key's unchanged attributes are IDENTICAL across batches and the
  * only tracked-field diff is the deliberately re-seeded price.
  */
object ItemsDataGen {

  val StatusItem: Seq[String] = Seq("Active", "Cancelled", "Suspended")

  /** Output column order of an items CSV drop (matches Schemas.Items). */
  val OutCols: Seq[String] = Seq(
    "contratto_cod", "numero_annuncio", "list_total", "contracted_price",
    "total_discount", "data_attivazione", "data_fine_prestazione",
    "product_code", "quantity", "causale_annullamento", "data_annullamento",
    "status_item", "creazione_dta")

  private def pick(values: Seq[String], idxExpr: String): Column =
    expr(s"array(${values.map(v => s"'$v'").mkString(",")})[cast($idxExpr AS int)]")

  /** One seeded frame of `nRows` items. `priceSeed` drives ONLY the
    * tracked decimal fields, so batch2 regenerates the same keys with a
    * different `priceSeed` to produce guaranteed-changed rows. Every
    * value is a function of the range id — deterministic regardless of
    * partitioning. */
  private[graft] def makeItemsDf(spark: SparkSession, nRows: Long,
                                 base: String, partitions: Int,
                                 priceSeed: Long): DataFrame =
    spark.range(0, nRows).repartition(partitions)
      .withColumn("contratto_cod",
        concat(lit("C"), lpad(floor(col("id") / 3).cast("string"), 8, "0")))
      .withColumn("numero_annuncio",
        concat(lit("A"), lpad(pmod(col("id"), lit(3)).cast("string"), 2, "0")))
      .withColumn("list_total",
        expr("cast(100 + (id % 900) as string) || '.00'"))
      // tracked fields: a seeded hash of (id, priceSeed) → re-seeding
      // changes every row's price while staying id-deterministic.
      // NULL price every 97th item exercises the reference's `<>`
      // non-null-safe quirk (a NULL→value change is NOT versioned).
      .withColumn("contracted_price",
        when(pmod(col("id"), lit(97)) === 31, lit(""))
          .otherwise(expr(s"cast(pmod(abs(hash(id, ${priceSeed}L)), 80000) + 1000 as string) || '.50'")))
      .withColumn("total_discount",
        expr(s"cast(pmod(abs(hash(id, ${priceSeed}L + 1)), 500) as string) || '.25'"))
      .withColumn("data_attivazione",
        expr(s"cast(date_add('$base', -cast(id % 300 as int)) as string)"))
      .withColumn("data_fine_prestazione",
        when(pmod(col("id"), lit(5)) === 0, lit(""))
          .otherwise(expr(s"cast(date_add('$base', cast(id % 365 as int)) as string)")))
      .withColumn("product_code",
        concat(lit("P"), lpad(pmod(col("id"), lit(200)).cast("string"), 4, "0")))
      .withColumn("quantity", expr("cast(1 + id % 5 as string)"))
      .withColumn("causale_annullamento", lit(""))
      .withColumn("data_annullamento", lit(""))
      .withColumn("status_item", pick(StatusItem, s"id % ${StatusItem.size}"))
      .withColumn("creazione_dta",
        expr(s"cast(date_add('$base', -cast(id % 400 as int)) as string)"))
      .select((Seq("id") ++ OutCols).map(col): _*)

  /** Write the initial drop `items_<date>.txt` (a pipe-CSV dir whose
    * name carries the batch date, as the file-name regex extract
    * expects): `nRows` unique keys + one duplicated key per `dupEvery`
    * rows (two copies — both dropped and counted by the pipeline).
    * @return the written path */
  def writeBatch1(spark: SparkSession, nRows: Long, batchDate: String,
                  outDir: String, partitions: Int, seed: Long,
                  dupEvery: Long = 1000L): String = {
    val path = s"$outDir/items_$batchDate.txt"
    val base = makeItemsDf(spark, nRows, isoDate(batchDate), partitions, seed)
    val dups = base.filter(pmod(col("id"), lit(dupEvery)) === 7)
    base.unionByName(dups).drop("id")
      .write.mode("overwrite").option("header", "true").option("sep", "|").csv(path)
    path
  }

  /** Write the update drop: `pctNew`% items under new `N`-prefixed
    * contracts + price-changed re-sends of existing items 0..k (same
    * keys and unchanged attributes, re-seeded tracked fields — every
    * re-send is a REAL change the merge must version).
    * @return the written path */
  def writeBatch2(spark: SparkSession, nRows: Long, batchDate: String,
                  outDir: String, partitions: Int, seed: Long,
                  pctNew: Double = 50.0): String = {
    val base = isoDate(batchDate)
    val newCount = math.round(nRows * pctNew / 100.0)
    val updateCount = nRows - newCount
    val newDf = makeItemsDf(spark, newCount, base, partitions, seed + 10)
      .withColumn("contratto_cod",
        concat(lit("N"), expr("substring(contratto_cod, 2, 8)")))
    // re-sends of existing items 0..updateCount-1: identical keys and
    // untracked attributes (id-derived, same seed-independent exprs),
    // tracked fields re-seeded → changed
    val updates = makeItemsDf(spark, updateCount, base, partitions, seed + 20)
    val path = s"$outDir/items_$batchDate.txt"
    newDf.unionByName(updates).drop("id")
      .write.mode("overwrite").option("header", "true").option("sep", "|").csv(path)
    path
  }

  private def isoDate(batchDate: String): String =
    LocalDate.parse(batchDate, DateTimeFormatter.ofPattern("yyyyMMdd"))
      .format(DateTimeFormatter.ISO_LOCAL_DATE)
}
