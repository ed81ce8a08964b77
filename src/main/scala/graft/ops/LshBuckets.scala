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
  * The guard makes candidate work linear: buckets at or under
  * `maxBucket` contribute every intra-bucket pair (the exact LSH
  * recall guarantee); buckets OVER the cap contribute a sparse linear
  * edge set instead — members are hash-salted into ~`segmentRows`-row
  * segments, each member links to its next `chainLinks` successors by
  * id within its segment, and every segment's min id links to the
  * bucket's global min (so the bucket stays one connected structure).
  * Downstream exact verification then decides:
  *  - boilerplate mega-buckets: the sparse edges fail verification
  *    (the pairs were false positives) — nothing survives;
  *  - true mega-clusters: the edges pass, and connected components /
  *    SemDeDup consumers recover the FULL cluster. Only the explicit
  *    pair ENUMERATION inside an over-cap true cluster is reduced —
  *    the quadratic output no linear algorithm can emit anyway.
  *
  * RECALL CAVEAT (the honest limit of any linear over-cap policy): a
  * true pair whose similarity is DRIVEN BY the shared boilerplate —
  * e.g. Jaccard 0.6 where most of the overlap is a common license
  * header — collides mostly on the over-cap template buckets, where
  * only the sparse edges are emitted. Such a pair is found only if the
  * two ids fall within `chainLinks` verified hops (every hop must
  * itself be a true pair, since failed edges break the walk). Pairs
  * whose similarity comes from doc-SPECIFIC content land in
  * cluster-sized buckets and keep the exact guarantee. If enumerating
  * template-driven pairs matters more than bounding the candidate set,
  * raise `maxBucket` (up to `Int.MaxValue` for exact LSH semantics)
  * and budget the quadratic verification cost.
  *
  * Scale shape — NO per-bucket window anywhere (a window partition is
  * one task AQE cannot split, and an over-cap bucket is by definition
  * corpus-proportional): occupancy is a partial-agg `groupBy` (one row
  * per distinct bucket reaches the shuffle) joined back onto the
  * bucket frame (probe-side skew is AQE-splittable); the successor
  * windows are keyed by (bucket, segment) whose partitions are
  * hash-balanced to ~`segmentRows` rows regardless of bucket size.
  * An EAGER max-occupancy probe (one agg over the cached distinct
  * bucket frame) short-circuits the whole guard when no bucket
  * exceeds the cap, so clean corpora run the plain bucket self-join.
  */
private[ops] object LshBuckets {

  /** Candidate pairs (__id1 < __id2) from a bucket frame of
    * (`idCol`, `bucketCol`) rows: all-pairs within buckets ≤ cap,
    * segmented successor edges + a segment-min star within buckets
    * over the cap. Duplicate (id, bucket) rows — 32-bit band
    * collisions, cross-table bucket-key collisions — are dropped
    * first, so occupancy counts distinct members and no self-edges
    * can arise.
    *
    * NOT a pure plan builder: unless `maxBucket == Int.MaxValue`, the
    * call EAGERLY runs one Spark job (the max-occupancy probe) and —
    * except when an external `probe` reads clean — persists the
    * (id, bucket) frame as a side effect, a cache that lingers until
    * [[Caches.releaseAll]]. A caller that builds the returned frame
    * but never executes it still pays the probe job.
    *
    * `probe`: an optional (`idCol`, `bucketCol`) SUBSET frame whose max
    * raw occupancy stands in for the full frame's in the eager probe —
    * for bucket families whose occupancy distribution is symmetric
    * across sub-keys (e.g. simhash block-pair combos, where template
    * bias spreads over all 64 bits and so over all combos), probing a
    * few sub-keys costs proportionally less than aggregating the full
    * exploded frame. CONTRACT: a probe that reads clean when some
    * UNPROBED bucket is over the cap only forfeits the guard (the plain
    * self-join goes quadratic in that bucket — a performance cliff,
    * not a correctness bug: downstream exact verification still rejects
    * false pairs). Pass None unless the symmetry argument holds.
    *
    * `knownMaxOcc`: the result of a [[maxRawOccupancy]] call the caller
    * already ran (e.g. to branch on the guard outcome before deciding
    * to call this at all) — skips the eager probe job entirely. Same
    * false-clean contract as `probe` when the caller's number was
    * measured on a subset. */
  def candidates(bucketsRaw: DataFrame, idCol: String, bucketCol: String,
                 maxBucket: Int, chainLinks: Int = 2,
                 segmentRows: Int = 4096,
                 probe: Option[DataFrame] = None,
                 knownMaxOcc: Option[Long] = None): DataFrame = {
    require(chainLinks >= 1 && segmentRows >= 2, "degenerate chain parameters")

    def allPairsOf(frame: DataFrame): DataFrame = frame.alias("l")
      .join(frame.alias("r"),
        col(s"l.$bucketCol") === col(s"r.$bucketCol") &&
          col(s"l.$idCol") < col(s"r.$idCol"), "inner")
      .select(col(s"l.$idCol").as("__id1"), col(s"r.$idCol").as("__id2"))

    // exact LSH semantics requested — skip the occupancy machinery
    if (maxBucket == Int.MaxValue)
      return allPairsOf(bucketsRaw.select(col(idCol), col(bucketCol))).distinct()

    val frame = bucketsRaw.select(col(idCol), col(bucketCol))
    // WITHOUT an external probe, the (id, bucket) frame is consumed by
    // the probe agg and then by both sides of the self-join — persist
    // the post-explode rows (two longs each) so the probe job doubles
    // as cache materialization and the join jobs read narrow cached
    // blocks instead of re-deriving signatures. WITH an external probe
    // the persist is deferred: on a clean read the self-join runs
    // directly off the caller's (persisted) upstream — re-exploding a
    // hot cache twice is cheaper than materializing a bucket cache
    // nothing else reads (measured on q17: probe-then-cold-self-join
    // cost +0.4 s; the deferred shape sits at the pre-probe baseline).
    lazy val raw = Caches.registered(
      frame.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    // eager max-occupancy probe: ONE map-side-combined agg job over the
    // RAW bucket frame (or the caller's representative probe subset)
    // decides whether any bucket can exceed the cap.
    // Raw row counts over-count duplicate (id, bucket) rows, so
    // "raw max ≤ cap" safely implies every distinct occupancy is under
    // the cap too — and clean corpora (the common case, and every
    // corpus below the boilerplate-collision scale) then run the plain
    // bucket self-join with no distinct pass and no occupancy join.
    val maxOcc = knownMaxOcc.getOrElse(maxRawOccupancy(
      probe.map(_.select(col(idCol), col(bucketCol))).getOrElse(raw), bucketCol))
    if (maxOcc <= maxBucket)
      return allPairsOf(if (probe.isEmpty && knownMaxOcc.isEmpty) raw else frame)
        .distinct()

    // over-cap corpus: distinct members feed the true occupancy count,
    // the small-bucket self-join, and the guard machinery (cheap to
    // re-derive from the cached raw frame — one exchange of longs)
    val buckets = raw.distinct()
    // occupancy by partial-agg groupBy, NOT count().over(
    // Window.partitionBy(bucket)): the window form puts an entire
    // corpus-proportional bucket into one unsplittable task. The occ
    // frame is one row per distinct bucket (small), so AQE turns the
    // join-back into a broadcast at runtime.
    val occ = buckets.groupBy(col(bucketCol)).agg(count(lit(1)).as("__occ"))
    val withOcc = buckets.join(occ, Seq(bucketCol))
    val small = withOcc.filter(col("__occ") <= maxBucket)
      .select(col(idCol), col(bucketCol))
    val allPairs = allPairsOf(small)

    // over-cap rows: hash-salt into segments of ~segmentRows members so
    // every successor window partition is bounded and AQE-splittable
    // work stays upstream; deterministic (no rand()). The segment COUNT
    // is quantized to a power of two: a boilerplate cohort lands in
    // MANY band/table buckets with near-identical occupancy, and equal
    // segment counts make those buckets segment identically — their
    // successor edges then collapse in the final distinct() instead of
    // multiplying the verification join by the number of bands
    // (measured at 3M docs: occupancy-exact segment counts produced
    // per-bucket-unique edges and tripled the minhash verification
    // volume vs deduplicated chains).
    val numSegs = greatest(lit(1.0), pow(lit(2.0),
      ceil(log2(greatest(col("__occ").cast("double") / segmentRows, lit(1.0))))))
    val big = withOcc.filter(col("__occ") > maxBucket)
      .withColumn("__seg", pmod(xxhash64(col(idCol)), numSegs.cast("long")))
    val bySeg = Window.partitionBy(col(bucketCol), col("__seg"))
      .orderBy(col(idCol))
    // next `chainLinks` successors by id within the segment: distance-1
    // edges alone fragment a true sub-cluster interleaved with
    // non-members (member→interloper edges fail verification), so each
    // member also reaches past up to chainLinks−1 interlopers.
    val chainEdges = big
      .withColumn("__nbrs",
        array((1 to chainLinks).map(i => lead(col(idCol), i).over(bySeg)): _*))
      .select(col(idCol).as("__id1"), explode(col("__nbrs")).as("__id2"))
      .filter(col("__id2").isNotNull)
    // stitch segments: every segment's min id → the bucket's global
    // min id (tiny frames — one row per (bucket, segment)).
    val segMins = big.groupBy(col(bucketCol), col("__seg"))
      .agg(min(col(idCol)).as("__segMin"))
    val starEdges = segMins
      .withColumn("__bktMin", min(col("__segMin")).over(
        Window.partitionBy(col(bucketCol))))
      .filter(col("__segMin") =!= col("__bktMin"))
      .select(col("__bktMin").as("__id1"), col("__segMin").as("__id2"))

    allPairs.union(chainEdges).union(starEdges).distinct()
  }

  /** Max RAW bucket occupancy of `frame` — ONE eager map-side-combined
    * agg job. Raw counts over-count duplicate (id, bucket) rows, so a
    * result ≤ cap safely implies every DISTINCT occupancy is under the
    * cap too. Callers use it to branch on the guard outcome up front
    * (and then hand the number to [[candidates]] via `knownMaxOcc`). */
  def maxRawOccupancy(frame: DataFrame, bucketCol: String): Long = {
    val row = frame.groupBy(col(bucketCol)).agg(count(lit(1)).as("__occ"))
      .agg(max(col("__occ"))).head()
    if (row.isNullAt(0)) 0L else row.getLong(0)
  }
}
