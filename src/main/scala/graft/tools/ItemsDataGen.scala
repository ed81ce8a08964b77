package graft.tools

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
  * under brand-new `N`-prefixed contracts plus re-sends of the first
  * existing items.
  *
  * Re-send contract (what makes the accounting EXACT, by construction):
  * every attribute of [[makeItemsDf]] is a function of the range id and
  * the seed alone — dates anchor on a FIXED date, never the batch date —
  * so a re-sent key's untracked columns are byte-identical across
  * batches. [[writeBatch2]] then changes exactly ONE tracked field per
  * re-send: `contracted_price` is bumped by +1 integer unit over
  * batch1's value (guaranteed ≠, no hash-collision term), except for the
  * planted NULL-price rows (id % 97 == 31), which flip NULL → a real
  * price while `total_discount` and `data_fine_prestazione` stay
  * identical — a REAL change the reference's non-null-safe `<>`
  * predicate cannot see, so those rows must NOT be versioned (the
  * notes.md:3-20 defect, genuinely exercised at every batch size).
  *
  * Scale note: pure seeded `spark.range` pipelines — fully distributed,
  * no windows, no joins; `repartition(partitions)` sets output
  * parallelism.
  */
object ItemsDataGen {

  val StatusItem: Seq[String] = Seq("Active", "Cancelled", "Suspended")

  /** Fixed date anchor for the id-derived date columns: NOT the batch
    * date, so a key's dates are identical in every drop that re-sends it
    * (data_fine_prestazione is TRACKED by the `<>` predicate — were it
    * batch-date-derived, every re-send would version regardless of
    * price, which is exactly the r12 ADVICE defect this anchors away). */
  private val DateAnchor = "2023-01-01"

  /** Output column order of an items CSV drop (matches Schemas.Items). */
  val OutCols: Seq[String] = Seq(
    "contratto_cod", "numero_annuncio", "list_total", "contracted_price",
    "total_discount", "data_attivazione", "data_fine_prestazione",
    "product_code", "quantity", "causale_annullamento", "data_annullamento",
    "status_item", "creazione_dta")

  private def pick(values: Seq[String], idxExpr: String): Column =
    expr(s"array(${values.map(v => s"'$v'").mkString(",")})[cast($idxExpr AS int)]")

  /** The NULL-price quirk rows: their batch1 `contracted_price` is NULL
    * and their batch2 re-send changes ONLY that field (NULL → value). */
  private[graft] def isQuirkRow(idCol: Column): Column =
    pmod(idCol, lit(97)) === 31

  /** Batch1's price for non-quirk id `i` under `seed` (integer part;
    * the printed value appends ".50"). */
  private def priceExpr(seed: Long, bump: Int): Column =
    expr(s"cast(pmod(abs(hash(id, ${seed}L)), 80000) + ${1000 + bump} as string) || '.50'")

  /** One seeded frame of `nRows` items. Every value is a function of the
    * range id and `seed` alone (dates anchor on [[DateAnchor]], not the
    * batch date) — deterministic regardless of partitioning, and
    * identical across drops that regenerate the same ids with the same
    * seed. `seed` drives only the two tracked decimal fields. */
  private[graft] def makeItemsDf(spark: SparkSession, nRows: Long,
                                 partitions: Int, seed: Long): DataFrame =
    spark.range(0, nRows).repartition(partitions)
      .withColumn("contratto_cod",
        concat(lit("C"), lpad(floor(col("id") / 3).cast("string"), 8, "0")))
      .withColumn("numero_annuncio",
        concat(lit("A"), lpad(pmod(col("id"), lit(3)).cast("string"), 2, "0")))
      .withColumn("list_total",
        expr("cast(100 + (id % 900) as string) || '.00'"))
      // tracked fields: a seeded hash of (id, seed) for the price; NULL
      // price every 97th item plants the `<>` non-null-safe quirk rows
      .withColumn("contracted_price",
        when(isQuirkRow(col("id")), lit(""))
          .otherwise(priceExpr(seed, bump = 0)))
      .withColumn("total_discount",
        expr(s"cast(pmod(abs(hash(id, ${seed}L + 1)), 500) as string) || '.25'"))
      .withColumn("data_attivazione",
        expr(s"cast(date_add('$DateAnchor', -cast(id % 300 as int)) as string)"))
      .withColumn("data_fine_prestazione",
        when(pmod(col("id"), lit(5)) === 0, lit(""))
          .otherwise(expr(s"cast(date_add('$DateAnchor', cast(id % 365 as int)) as string)")))
      .withColumn("product_code",
        concat(lit("P"), lpad(pmod(col("id"), lit(200)).cast("string"), 4, "0")))
      .withColumn("quantity", expr("cast(1 + id % 5 as string)"))
      .withColumn("causale_annullamento", lit(""))
      .withColumn("data_annullamento", lit(""))
      .withColumn("status_item", pick(StatusItem, s"id % ${StatusItem.size}"))
      .withColumn("creazione_dta",
        expr(s"cast(date_add('$DateAnchor', -cast(id % 400 as int)) as string)"))
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
    val base = makeItemsDf(spark, nRows, partitions, seed)
    val dups = base.filter(pmod(col("id"), lit(dupEvery)) === 7)
    base.unionByName(dups).drop("id")
      .write.mode("overwrite").option("header", "true").option("sep", "|").csv(path)
    path
  }

  /** Write the update drop: `pctNew`% items under new `N`-prefixed
    * contracts + re-sends of existing items 0..k−1. `baseSeed` MUST be
    * batch1's seed — the re-sends regenerate batch1's exact rows from it
    * and then change one tracked field each (see the object scaladoc):
    * non-quirk rows get batch1's price + 1 (guaranteed versioned), quirk
    * rows flip NULL → a real price (guaranteed NOT versioned under the
    * reference's `<>`). Expected merge accounting is therefore exact
    * integer arithmetic over the planted populations — no probabilistic
    * collision terms.
    * @return the written path */
  def writeBatch2(spark: SparkSession, nRows: Long, batchDate: String,
                  outDir: String, partitions: Int, baseSeed: Long,
                  pctNew: Double = 50.0): String = {
    val newCount = math.round(nRows * pctNew / 100.0)
    val updateCount = nRows - newCount
    val newDf = makeItemsDf(spark, newCount, partitions, baseSeed + 10)
      .withColumn("contratto_cod",
        concat(lit("N"), expr("substring(contratto_cod, 2, 8)")))
    // re-sends: batch1's exact rows (same seed → identical untracked AND
    // tracked fields), then the single-field change per the contract above
    val updates = makeItemsDf(spark, updateCount, partitions, baseSeed)
      .withColumn("contracted_price",
        when(isQuirkRow(col("id")), priceExpr(baseSeed, bump = 0))
          .otherwise(priceExpr(baseSeed, bump = 1)))
    val path = s"$outDir/items_$batchDate.txt"
    newDf.unionByName(updates).drop("id")
      .write.mode("overwrite").option("header", "true").option("sep", "|").csv(path)
    path
  }
}
