package graft.tools

import java.time.LocalDate
import java.time.format.DateTimeFormatter

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Seeded synthetic header-batch generator
  * (reference: src/utils/generate_header_datasets.py).
  *
  * batch1 = `n` rows keyed `C00000000..C<n-1>`; batch2 = `pctNew`% brand-new
  * keys (`N`-prefixed) plus updates of randomly picked existing keys, with
  * fresh attributes attached through the reference's row_number-over-rand
  * zip join (operator coverage W4 + J4, reference
  * :173-175 of generate_header_datasets.py).
  *
  * `event_time` is ISO with a `+01:00` offset: events in local hour 0 parse
  * to the previous UTC day and are discarded as BATCH_DATE_MISMATCH by
  * validation — reproducing the reference's published DQ profile of
  * ~1/24 of rows discarded (BASELINE.md, 416,960 of 10M).
  *
  * Scale note: everything is a seeded `spark.range` pipeline — fully
  * distributed, `repartition(partitions)` controls output parallelism.
  * The zip join's id is a salted per-bucket `row_number` permutation
  * ([[permRid]]) — the partitioned, deterministic equivalent of the
  * reference's un-partitioned `row_number() OVER (ORDER BY rand())`
  * (W4), whose single-partition global sort was the generator's
  * bottleneck at the 10M bench size.
  */
object HeaderDataGen {

  val TipiContratto: Seq[String] = Seq("365", "366", "400")
  val StatusQuote: Seq[String] = Seq("Accepted", "Rejected", "Pending")

  /** Output column order of a header CSV drop. */
  val OutCols: Seq[String] = Seq(
    "contratto_cod", "codice_ordine_sap", "tipo_contratto", "codice_opec",
    "data_firma", "net_amount", "causale_annullamento", "data_annullamento",
    "codice_agente", "status_quote", "creazione_dta", "event_time")

  /** SQL array-literal modular pick (reference :56,78). */
  private def pick(values: Seq[String], idxExpr: String): Column =
    expr(s"array(${values.map(v => s"'$v'").mkString(",")})[cast($idxExpr AS int)]")

  /** One seeded batch of `nRows` header rows for `eventDate`
    * (reference: make_header_df_from_range, :40-94). */
  def makeHeaderDf(spark: SparkSession, nRows: Long, eventDate: LocalDate,
                   partitions: Int, seed: Long): DataFrame =
    makeHeaderDfWithId(spark, nRows, eventDate, partitions, seed)
      .select(OutCols.map(col): _*)

  /** Same, keeping the generator's range `id` for the batch2 zip. */
  private def makeHeaderDfWithId(spark: SparkSession, nRows: Long, eventDate: LocalDate,
                                 partitions: Int, seed: Long): DataFrame = {
    val base = eventDate.format(DateTimeFormatter.ISO_LOCAL_DATE)
    spark.range(0, nRows).repartition(partitions)
      .withColumn("contratto_cod",
        concat(lit("C"), lpad(col("id").cast("string"), 8, "0")))
      .withColumn("codice_ordine_sap", (lit(3000000000L) + col("id")).cast("string"))
      .withColumn("tipo_contratto", pick(TipiContratto, s"id % ${TipiContratto.size}"))
      .withColumn("codice_opec",
        expr("concat('OPEC', lpad(cast(id % 1000 AS string), 4, '0'))"))
      .withColumn("rand1", floor(rand(seed + 1) * 366).cast("int"))
      .withColumn("rand2", floor(rand(seed + 2) * 31).cast("int"))
      .withColumn("data_firma", expr(s"date_add('$base', -rand1)").cast("string"))
      .withColumn("creazione_dta", expr("date_add(data_firma, -rand2)").cast("string"))
      .withColumn("net_amount",
        (floor(rand(seed + 3) * (50000 - 1000) * 100) / 100).cast("string"))
      .withColumn("causale_annullamento", lit(""))
      .withColumn("data_annullamento", lit(""))
      .withColumn("codice_agente", expr("cast(10000 + cast(id % 500 AS int) AS string)"))
      .withColumn("status_quote", pick(StatusQuote, s"id % ${StatusQuote.size}"))
      .withColumn("event_time", concat(
        lit(s"${base}T"),
        lpad(floor(rand(seed + 4) * 24).cast("string"), 2, "0"), lit(":"),
        lpad(floor(rand(seed + 5) * 60).cast("string"), 2, "0"), lit(":"),
        lpad(floor(rand(seed + 6) * 60).cast("string"), 2, "0"),
        lit(".000+01:00")))
      .select((Seq("id") ++ OutCols).map(col): _*)
  }

  /** Buckets of the salted permutation zip. */
  private val SaltBuckets = 64

  /** Deterministic pseudo-random permutation rank `__rid` ∈ 1..n — the
    * scalable replacement for the reference's un-partitioned
    * `row_number() OVER (ORDER BY rand())` zip id (W4), which sorts the
    * whole frame on ONE partition (at the 10M bench size that global sort
    * was the generator's bottleneck and sprayed `WindowExec: No Partition
    * Defined` warnings). Here: salt rows into [[SaltBuckets]] groups by a
    * seeded hash of the range id, row_number within each bucket ordered
    * by a second seeded hash, then offset by the cumulative bucket sizes
    * (one tiny collect of ≤ SaltBuckets counts). Fully seeded →
    * deterministic; per-bucket windows → no single-partition sort. */
  private def permRid(df: DataFrame, seed: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val salted = df.withColumn("__salt",
      pmod(hash(col("id"), lit(seed)), lit(SaltBuckets)).cast("int"))
    val counts = salted.groupBy("__salt").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val offsets = (0 until SaltBuckets)
      .scanLeft(0L)((acc, b) => acc + counts.getOrElse(b, 0L))
    val offExpr = element_at(
      map((0 until SaltBuckets).flatMap(b => Seq(lit(b), lit(offsets(b)))): _*),
      col("__salt"))
    val w = Window.partitionBy("__salt")
      .orderBy(xxhash64(col("id"), lit(seed + 1)), col("id"))
    salted.withColumn("__rid", row_number().over(w).cast("long") + offExpr)
      .drop("__salt")
  }

  /** Write the initial batch as a pipe-CSV drop dir `header_<date>.csv`.
    * @return the written path */
  def writeBatch1(spark: SparkSession, nRows: Long, batchDate: String,
                  outDir: String, partitions: Int, seed: Long): String = {
    val path = s"$outDir/header_$batchDate.csv"
    makeHeaderDf(spark, nRows, parseDate(batchDate), partitions, seed)
      .write.mode("overwrite").option("header", "true").option("sep", "|").csv(path)
    path
  }

  /** Write the update batch: `pctNew`% new `N`-keys + updates of random
    * existing `C`-keys with freshly generated attributes zipped on via
    * row_number-over-rand (reference: generate_batch2_distributed,
    * :149-186). @return the written path */
  def writeBatch2(spark: SparkSession, nRows: Long, batchDate: String,
                  outDir: String, partitions: Int, seed: Long,
                  existingCount: Long, pctNew: Double = 50.0): String = {
    val date = parseDate(batchDate)
    val newCount = math.round(nRows * pctNew / 100.0)
    val updateCount = nRows - newCount

    val newDf = makeHeaderDf(spark, newCount, date, partitions, seed + 10)
      .withColumn("contratto_cod",
        concat(lit("N"), expr("substring(contratto_cod, 2, 8)")))

    // updates: random existing key per row (duplicate picks possible, as in
    // the reference — they become intra-batch version rows downstream),
    // zipped to freshly generated attributes via the salted permutation
    // rid (different seeds per side → a pseudo-random pairing, like the
    // reference's rand-ordered zip but partitioned and deterministic)
    val updates = permRid(
      spark.range(0, updateCount).repartition(partitions)
        .withColumn("idx", floor(rand(seed + 20) * existingCount).cast("int"))
        .withColumn("contratto_cod",
          concat(lit("C"), lpad(col("idx").cast("string"), 8, "0")))
        .select("id", "contratto_cod"),
      seed + 30).select("contratto_cod", "__rid")
    val helper = permRid(
      makeHeaderDfWithId(spark, updateCount, date, partitions, seed + 21)
        .drop("contratto_cod"),
      seed + 31).drop("id")
    val updatesFinal = updates.join(helper, Seq("__rid"), "left").drop("__rid")

    val path = s"$outDir/header_$batchDate.csv"
    newDf.unionByName(updatesFinal.select(OutCols.map(col): _*)).limit(nRows.toInt)
      .write.mode("overwrite").option("header", "true").option("sep", "|").csv(path)
    path
  }

  private def parseDate(yyyymmdd: String): LocalDate =
    LocalDate.parse(yyyymmdd, DateTimeFormatter.BASIC_ISO_DATE)
}
