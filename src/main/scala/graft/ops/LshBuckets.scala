package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Shared candidate generation for the bucketed-LSH dedup family
  * (MinHash bands, SimHash block combos, hyperplane embedding LSH).
  *
  * The naive bucket self-join is QUADRATIC in the largest bucket, and
  * real corpora produce scale-PROPORTIONAL buckets two ways:
  *  - corpus-wide boilerplate (license headers, navigation chrome)
  *    pins some signature slots to the template's features, so a fixed
  *    FRACTION of the corpus agrees on those buckets even though
  *    pairwise similarity is far below threshold (measured: at 900k
  *    docs the top three minhash band buckets held 12k/9.8k/8.1k docs =
  *    154M of 162M candidate pairs, and the verification joins filled
  *    80 GB of spill disk);
  *  - genuinely huge near-identical clusters (spam, default/zero
  *    embeddings), where ALL of a member's buckets are the cluster —
  *    enumerating those pairs is inherently quadratic.
  *
  * The guard makes candidate work linear without losing either case:
  * buckets at or under `maxBucket` contribute every intra-bucket pair
  * (the exact LSH recall guarantee); buckets OVER the cap contribute a
  * spanning CHAIN instead — members sorted by id, each linked to its
  * successor, one candidate per row. Downstream exact verification
  * then decides:
  *  - boilerplate mega-buckets: chain edges fail verification (the
  *    pairs were false positives) — nothing survives, nothing lost;
  *  - true mega-clusters: chain edges pass, and connected components /
  *    SemDeDup consumers recover the FULL cluster from the chain. Only
  *    the explicit pair ENUMERATION inside an over-cap true cluster is
  *    reduced — which is the quadratic output no linear algorithm can
  *    emit anyway; raise `maxBucket` if that enumeration is required.
  *
  * Cost shape: one hash shuffle of the (id, bucket) rows for the
  * occupancy count + successor window (mega buckets land one-per-task —
  * linear rows, one edge per row), then the small-bucket self-join on
  * the same partitioning.
  */
private[ops] object LshBuckets {

  /** Distinct candidate pairs (__id1 < __id2) from a bucket frame of
    * (`idCol`, `bucketCol`) rows: all-pairs within buckets ≤ cap,
    * spanning chains within buckets > cap. */
  def candidates(buckets: DataFrame, idCol: String, bucketCol: String,
                 maxBucket: Int): DataFrame = {
    val byBucket = Window.partitionBy(bucketCol)
    val byId = Window.partitionBy(bucketCol).orderBy(col(idCol))
    // one Exchange: occupancy and successor share the bucket partitioning
    val withOcc = buckets
      .withColumn("__occ", count(lit(1)).over(byBucket))
      .withColumn("__next", lead(col(idCol), 1).over(byId))
    val small = withOcc.filter(col("__occ") <= maxBucket)
      .select(col(idCol), col(bucketCol))
    val allPairs = small.alias("l")
      .join(small.alias("r"),
        col(s"l.$bucketCol") === col(s"r.$bucketCol") &&
          col(s"l.$idCol") < col(s"r.$idCol"), "inner")
      .select(col(s"l.$idCol").as("__id1"), col(s"r.$idCol").as("__id2"))
    // __next =!= id: a doc whose band hashes collide (32-bit) appears
    // TWICE in one bucket; lead() would link it to itself and exact
    // verification would pass the (x, x) pair at similarity 1. Dropping
    // the self-edge keeps connectivity — the duplicate row's successor
    // still links x to the next distinct id.
    val chains = withOcc
      .filter(col("__occ") > maxBucket && col("__next").isNotNull &&
        col("__next") =!= col(idCol))
      .select(col(idCol).as("__id1"), col("__next").as("__id2"))
    allPairs.union(chains).distinct()
  }
}
