package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic corpus-composition operators (SURVEY.md §7.6 family):
  * reproducible stratified sampling and temperature-based mixture
  * weighting — the standard knobs for assembling a training corpus from
  * heterogeneous strata (languages, length buckets, sources).
  *
  * Sampling decisions are pure per-row expressions (keep a row iff a
  * uniform hash of its id falls under the stratum's rate): no shuffle,
  * no state, and the SAME subset on every run and at any parallelism —
  * the property that makes corpus builds auditable. The uniform variate
  * is injectable for engines that must reproduce the subset externally.
  */
object Sampling {

  /** Uniform [0,1) variate from the row id — xxhash64-based, seeded. */
  def uniformHash(idCol: String, seed: Long): Column =
    pmod(xxhash64(col(idCol), lit(seed)), lit(1000000L)).cast("double") / 1000000.0

  /** Keep each row with its stratum's probability, deterministically.
    * @param rates       stratum value → keep rate in [0,1]
    * @param defaultRate rate for strata absent from `rates`
    * @param uniform     optional replacement for the hash variate (e.g.
    *                    an arithmetic hash an external system can
    *                    reproduce); defaults to [[uniformHash]] */
  def stratifiedSample(df: DataFrame, idCol: String, stratumCol: String,
                       rates: Map[String, Double],
                       defaultRate: Double = 0.0,
                       seed: Long = 42L,
                       uniform: Option[Column] = None): DataFrame = {
    require(rates.values.forall(r => r >= 0 && r <= 1), "rates must be in [0,1]")
    val u = uniform.getOrElse(uniformHash(idCol, seed))
    val rateCol = rates.foldLeft(lit(defaultRate)) { case (acc, (k, r)) =>
      when(col(stratumCol) === k, lit(r)).otherwise(acc)
    }
    df.filter(u < rateCol)
  }

  /** Per-stratum keep rates implementing temperature sampling: stratum
    * probabilities p_i are flattened to q_i ∝ p_i^(1/T) (T > 1 upsamples
    * rare strata — the multilingual-corpus mixing rule), then scaled so
    * the expected kept total is `targetRows`, capped at 1 per stratum.
    * One small aggregate (stratum cardinality rows) reaches the driver. */
  def temperatureRates(df: DataFrame, stratumCol: String,
                       temperature: Double, targetRows: Long): Map[String, Double] = {
    require(temperature > 0, "temperature must be positive")
    val counts = df.groupBy(stratumCol).count().collect()
      .map(r => Option(r.get(0)).map(_.toString).getOrElse("") -> r.getLong(1)).toMap
    val total = counts.values.sum.toDouble
    if (total == 0) return Map.empty
    val weights = counts.map { case (k, c) =>
      k -> math.pow(c / total, 1.0 / temperature)
    }
    val wSum = weights.values.sum
    // expected kept rows = Σ c_i · rate_i = targetRows when uncapped
    counts.map { case (k, c) =>
      k -> math.min(1.0, targetRows * (weights(k) / wSum) / c)
    }
  }

  /** Temperature-mixed sample: [[temperatureRates]] + [[stratifiedSample]]. */
  def temperatureMix(df: DataFrame, idCol: String, stratumCol: String,
                     temperature: Double, targetRows: Long,
                     seed: Long = 42L): DataFrame =
    stratifiedSample(df, idCol, stratumCol,
      temperatureRates(df, stratumCol, temperature, targetRows), seed = seed)

  /** Keep at most `cap` rows per group value — the C4/RefinedWeb
    * per-domain quota that stops a handful of huge hosts from dominating
    * a crawl-derived corpus. The kept subset is a deterministic uniform
    * sample WITHIN each group: rows are ranked by `md5(id:seed)` (an
    * order any engine can replay — unlike a partition-order `limit`,
    * which is nondeterministic, and unlike "first cap by id", which
    * biases toward old documents) and the first `cap` survive.
    *
    * Scale: ONE keyed shuffle (the window partition). The cap bounds
    * every group's OUTPUT; a pathologically hot key still shuffles its
    * input rows to one reducer and pays a per-group sort there, but the
    * sort is Spark's spillable external sort — memory-safe, and AQE
    * skew-split does not apply to windows, so for a truly degenerate
    * key pre-aggregate with a salted two-level rank instead. */
  def perGroupCap(df: DataFrame, idCol: String, groupCol: String,
                  cap: Int, seed: Long = 42L): DataFrame = {
    require(cap > 0, "cap must be positive")
    val rank = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(md5(concat(col(idCol).cast("string"), lit(":" + seed))), col(idCol))
    df.withColumn("__rk", row_number().over(rank))
      .filter(col("__rk") <= cap)
      .drop("__rk")
  }

  /** Epoch-weighted mixture with UPSAMPLING — the half of corpus mixing
    * [[temperatureMix]] can't do (rates cap at 1.0): a stratum assigned
    * `epochs = 2.3` emits every row 2 times plus a deterministic 30% of
    * rows a 3rd time, so rare-but-valuable strata (curated books, low-
    * resource languages) are seen fractional-epochs-many times per pass,
    * the standard pretraining-mixture knob. Each emitted copy carries a
    * 1-based `copy` index so downstream shuffling/sharding treats
    * repetitions as distinct examples.
    *
    * Scale: MAP-ONLY — the copy count is a pure expression and the
    * fan-out an `explode(sequence(...))`; output rows = Σ epochs(s)·|s|,
    * no shuffle, no state. The fractional coin is the same injectable
    * per-row variate as [[stratifiedSample]] (replayable externally).
    * `epochs < 1` degrades gracefully to deterministic downsampling. */
  def epochMix(df: DataFrame, idCol: String, stratumCol: String,
               epochs: Map[String, Double], defaultEpochs: Double = 1.0,
               seed: Long = 42L,
               uniform: Option[Column] = None): DataFrame = {
    require((epochs.values ++ Seq(defaultEpochs)).forall(_ >= 0.0),
      "epochs must be non-negative")
    val u = uniform.getOrElse(uniformHash(idCol, seed))
    val e = epochs.foldLeft(lit(defaultEpochs)) { case (acc, (s, v)) =>
      when(col(stratumCol) === s, lit(v)).otherwise(acc)
    }
    val copies = (floor(e) +
      when(u < (e - floor(e)), lit(1L)).otherwise(lit(0L))).cast("int")
    df.withColumn("__n", copies)
      .filter(col("__n") >= 1)
      .select(col("*"), explode(sequence(lit(1), col("__n"))).as("copy"))
      .drop("__n")
  }

  /** Deterministic global shuffle into a fixed number of output shards —
    * the training-export layout step (WebDataset/TFRecord-style shard
    * files consumed round-robin by data loaders). Every run, at any
    * parallelism, assigns a row the SAME `(shard, pos)`, so an export is
    * reproducible and resumable.
    *
    * The permutation key is the base-16 value of 15 hex chars of
    * `md5(id:seed)` — 60 unbiased bits, and an order ANY engine can
    * replay (DuckDB, Trino, plain SQL), unlike `rand()` or a hash whose
    * implementation is engine-private. `shard = key % numShards` is a
    * pure per-row expression (map-only, no shuffle); `pos` is the row's
    * rank within its shard in key order, so concatenating shards
    * `0..numShards-1` each in `pos` order replays ONE global seeded
    * permutation restricted to shards — what a multi-worker loader reads.
    *
    * Scale: ONE keyed shuffle total (the per-shard window; the physical
    * export is then `repartition(col("shard"))` +
    * `sortWithinPartitions("pos")` + `write.partitionBy("shard")`,
    * reusing the same partitioning). Pick `numShards` so a shard is
    * output-file-sized (thousands of shards at 100 TB): the window
    * groups scale with the shard count, the per-shard sort is Spark's
    * spillable external sort, and the md5 key spreads rows uniformly so
    * no shard is skewed by construction. */
  def shuffleShards(df: DataFrame, idCol: String, numShards: Int,
                    seed: Long = 42L): DataFrame = {
    require(numShards > 0, "numShards must be positive")
    val key = conv(substring(
      md5(concat(col(idCol).cast("string"), lit(":" + seed))), 1, 15),
      16, 10).cast("long")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col("__key"), col(idCol))
    df.withColumn("__key", key)
      .withColumn("shard", pmod(col("__key"), lit(numShards.toLong)).cast("int"))
      .withColumn("pos", (row_number().over(w) - 1).cast("long"))
      .drop("__key")
  }
}
