package graft.ops

import graft.expressions.{CosineSim, NearestCentroid, PqAdcScore, PqEncode, RandProjBuckets, RandProjSig}
import org.apache.spark.sql.{Column, DataFrame, GraftColumnBridge}
import org.apache.spark.sql.functions._

/** Embedding similarity search (SURVEY.md §7.6): brute-force cosine top-k
  * as the exact baseline, and a random-hyperplane LSH bucketed variant as
  * the 100 TB scale path (probes a bounded set of signature buckets
  * instead of scanning every vector).
  *
  * Dot products and norms are codegen'd higher-order functions
  * (`zip_with` + `aggregate`) over the `array<float>` column — no UDFs,
  * all math in double.
  */
object Similarity {

  /** Cosine similarity between two array<float|double> columns — the
    * native [[graft.expressions.CosineSim]] expression (codegen'd JVM
    * loop; the zip_with + aggregate SQL formulation it replaces was
    * interpreted per element and ~30× slower over millions of pairs). */
  def cosineExpr(a: String, b: String): Column =
    GraftColumnBridge.column(CosineSim(
      GraftColumnBridge.expression(col(a)), GraftColumnBridge.expression(col(b))))

  /** Decode one collected row's array<float|double> column to doubles. */
  private def vecOf(row: org.apache.spark.sql.Row, idx: Int = 0): Array[Double] =
    row.getSeq[Any](idx).map {
      case f: java.lang.Float => f.toDouble
      case d: java.lang.Double => d.doubleValue
    }.toArray

  /** Shared exact-rank tail of every ANN path: score `candidates`
    * against the broadcast query vector and keep the top k by exact
    * cosine. The `(cosine DESC, id ASC)` tie-break is load-bearing —
    * the pinned recall oracles (q19/q71/q75) and q14/q33/q34 all assume
    * this deterministic order. Plans as TakeOrderedAndProject. */
  private def rankExact(candidates: DataFrame, emb: DataFrame,
                        idCol: String, vecCol: String,
                        queryId: Long, k: Int): DataFrame = {
    val query = emb.filter(col(idCol) === queryId)
      .select(col(vecCol).as("__qvec"))
    candidates
      .filter(col(idCol) =!= queryId)
      .crossJoin(broadcast(query))
      .withColumn("cosine", cosineExpr(vecCol, "__qvec"))
      .orderBy(col("cosine").desc, col(idCol).asc)
      .limit(k)
      .select(col(idCol), col("cosine"))
  }

  /** Exact top-k by cosine against the vector of `queryId`. The query row
    * is broadcast; every vector is scored (one scan), top-k via ordered
    * limit. Deterministic tie-break on id. */
  def bruteForceTopK(emb: DataFrame, idCol: String, vecCol: String,
                     queryId: Long, k: Int): DataFrame =
    rankExact(emb, emb, idCol, vecCol, queryId, k)

  /** Exact embedding near-duplicate pairs: every pair with cosine ≥
    * `threshold`. A distributed block self-join — O(n²) dot products
    * spread over the cluster. This is the correct algorithm when the
    * threshold is low (no sublinear method exists for far pairs) and the
    * oracle baseline for [[cosinePairsLsh]]; at 100 TB with a HIGH
    * threshold use the LSH variant, which probes only colliding buckets.
    * @return (idCol_1, idCol_2, cosine) with idCol_1 < idCol_2 */
  def cosinePairs(emb: DataFrame, idCol: String, vecCol: String,
                  threshold: Double): DataFrame = {
    val l = emb.select(col(idCol).as("__id1"), col(vecCol).as("__v1"))
    val r = emb.select(col(idCol).as("__id2"), col(vecCol).as("__v2"))
    l.join(r, col("__id1") < col("__id2"))
      .withColumn("cosine", cosineExpr("__v1", "__v2"))
      .filter(col("cosine") >= threshold)
      .select(col("__id1").as(s"${idCol}_1"), col("__id2").as(s"${idCol}_2"),
        col("cosine"))
  }

  /** Embedding near-duplicate pairs via OR-of-ANDs random-hyperplane LSH:
    * `tables` independent `bits`-bit signatures per vector (the native
    * [[graft.expressions.RandProjBuckets]] expression), candidates =
    * pairs sharing ANY table bucket, then exact-cosine verification.
    *
    * Recall for a pair at cosine c: 1-(1-p^bits)^tables with
    * p = 1 - acos(c)/π — defaults give ≈0.9999 at c = 0.99, ≈0.97 at
    * c = 0.9. Precision is exact (every candidate is verified). The
    * shuffle is bounded by n·tables bucket rows — never all-pairs.
    *
    * Candidates pass a 128-bit Hamming PREFILTER (two independent
    * [[graft.expressions.RandProjSig]] longs) before any vector is
    * attached: with occupancy held constant by the bits-∝-log(n) rule,
    * random same-bucket collisions — pairs near cosine 0 — dominate
    * the candidate set (~60 per vector, measured 123M candidates at 2M
    * vectors), and carrying a dim·4-byte vector through their
    * verification shuffles wrote tens of GB of disk per join. The
    * prefilter cutoff sits 5σ above a threshold-cosine pair's expected
    * Hamming distance (miss probability ~1e-7, far below the table
    * collision miss rate above), while a random pair survives it with
    * p ≈ 1e-5 — the exact-cosine join then verifies thousands of rows
    * instead of hundreds of millions. The prefilter also gates the
    * over-cap CONNECTIVITY edges (chain/star, below): a missed chain
    * edge costs more than one pair — it can split a true cluster for
    * component consumers (SemDeDup). Mitigated, not exempted: an
    * over-cap member carries UP TO `chainLinks` incident chain edges
    * on each side (interior members of a ≥3-member segment have ≥2
    * independent incident edges, so a single ~1e-7 miss leaves them
    * connected through a surviving parallel edge — the spec-verified
    * 2-edge-connectivity of the chain construction), while the star
    * edge attaches only to each SEGMENT'S min id. Corner case: the
    * non-min member of a 2-member segment has exactly one incident
    * chain edge, so a miss there detaches it — segments target
    * `segmentRows` ≈ 4096 members, making 2-member segments a
    * hash-imbalance tail of already-rare barely-over-cap buckets.
    *
    * `maxBucket` guards the intra-bucket pair expansion: identical
    * embeddings (zero/default vectors from failed embedding jobs, spam)
    * share EVERY table's bucket, so a big exact-dup cluster is a
    * guaranteed mega-bucket and all-pairs within it is quadratic.
    * Over-cap buckets degrade to sparse verified successor edges —
    * full cluster connectivity for SemDeDup/component consumers at
    * linear cost, with the template-driven-pair recall caveat
    * documented on [[graft.ops.LshBuckets.candidates]]. Size `bits` so
    * EXPECTED occupancy (n·2^-bits) stays well under the cap — the cap
    * is a pathological-tail guard, not a tuning knob.
    * @return (idCol_1, idCol_2, cosine) with idCol_1 < idCol_2 */
  def cosinePairsLsh(emb: DataFrame, idCol: String, vecCol: String,
                     threshold: Double,
                     tables: Int = 8, bits: Int = 8,
                     seed: Long = 7L,
                     maxBucket: Int = 4096): DataFrame = {
    val bucketsCol = GraftColumnBridge.column(
      RandProjBuckets(GraftColumnBridge.expression(col(vecCol)), tables, bits, seed))
    // 128-bit prefilter signature: two independent 64-plane raw
    // signatures, seeded apart from the bucket tables' planes
    def preSig(s: Long) = GraftColumnBridge.column(
      RandProjSig(GraftColumnBridge.expression(col(vecCol)), 64, s))
    // persisted: both sides of the bucket self-join reuse the signatures;
    // registered with Caches so the caller can release after materializing
    val base = Caches.registered(
      emb.select(col(idCol), col(vecCol))
        .withColumn("__buckets", bucketsCol)
        .withColumn("__pa", preSig(seed * 1000003L + 1))
        .withColumn("__pb", preSig(seed * 1000003L + 2))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    // Hamming prefilter: cutoff 5σ above the expected distance of a
    // pair at EXACTLY the threshold cosine (the worst true pair), so
    // the filter's miss rate is negligible against the LSH tables'
    // own collision miss rate. NOTE: the over-cap chain/star edges from
    // LshBuckets pass through this filter too — a dropped borderline
    // TRUE edge there (~1e-7) breaks cluster CONNECTIVITY for
    // SemDeDup/component consumers rather than losing one pair; the
    // K=2 chain redundancy covers isolated misses (two independent
    // edges must both miss to detach a member).
    val fTh = math.acos(math.max(-1.0, math.min(1.0, threshold))) / math.Pi
    val maxHamming = math.ceil(
      128 * fTh + 5.0 * math.sqrt(128 * fTh * (1 - fTh))).toInt
    // the bucket frame CARRIES the two prefilter longs (4 longs/row vs
    // 2): on a clean corpus the Hamming cut then runs INSIDE the bucket
    // self-join stage — before the pair distinct and before any other
    // exchange — so the raw candidate volume (n²·tables/2^bits rows at
    // uniform occupancy) never hits the shuffle layer. The former shape
    // (bare candidates → distinct → two psig attach joins → filter)
    // shuffled every unfiltered candidate 3×: at 6M vectors / 300× that
    // filled the disk quota (scale_r11_300x_heavy.json preopt errors)
    // even though survivors were in the thousands.
    val buckets = base.select(col(idCol), col("__pa"), col("__pb"),
      explode(col("__buckets")).as("__b"))
    // eager occupancy probe (one map-combined agg — the simhash-pairs
    // protocol): clean corpora take the inline path; a mega-bucket
    // corpus falls back to the guard + psig-attach joins below
    val probeMaxOcc = LshBuckets.maxRawOccupancy(
      buckets.select(col(idCol), col("__b")), "__b")
    val hammingOk = expr(
      s"bit_count(l.__pa ^ r.__pa) + bit_count(l.__pb ^ r.__pb)") <= maxHamming
    val prefiltered = if (probeMaxOcc <= maxBucket) {
      buckets.alias("l").join(buckets.alias("r"),
          col("l.__b") === col("r.__b") &&
            col(s"l.$idCol") < col(s"r.$idCol"), "inner")
        .filter(hammingOk)
        .select(col(s"l.$idCol").as("__id1"), col(s"r.$idCol").as("__id2"))
        .distinct()
    } else {
      val sigs = base.select(col(idCol), col("__pa"), col("__pb"))
      LshBuckets.candidates(buckets.select(col(idCol), col("__b")),
          idCol, "__b", maxBucket, knownMaxOcc = Some(probeMaxOcc))
        .join(sigs.select(col(idCol).as("__id1"), col("__pa").as("__a1"),
          col("__pb").as("__b1")).hint("shuffle_hash"), "__id1")
        .join(sigs.select(col(idCol).as("__id2"), col("__pa").as("__a2"),
          col("__pb").as("__b2")).hint("shuffle_hash"), "__id2")
        .filter(expr("bit_count(__a1 ^ __a2) + bit_count(__b1 ^ __b2)")
          <= maxHamming)
        .select(col("__id1"), col("__id2"))
    }
    val vecs = base.select(col(idCol), col(vecCol))
    // shuffle_hash on the vector side: sort-merge would SORT the
    // candidate stream with a ~dim·4-byte vector attached to every row
    // — at 2M vectors / 123M candidates that was a tens-of-GB sort
    // (measured: execution-memory exhaustion at 24 g heap). The hash
    // build side is the vectors frame, whose per-partition slice is
    // corpus/shuffle-partitions — scale shuffle partitions with the
    // corpus and the build stays executor-resident; the (prefiltered,
    // now thousands-of-rows) candidate stream is never sorted.
    prefiltered
      .join(vecs.select(col(idCol).as("__id1"), col(vecCol).as("__v1"))
        .hint("shuffle_hash"), "__id1")
      .join(vecs.select(col(idCol).as("__id2"), col(vecCol).as("__v2"))
        .hint("shuffle_hash"), "__id2")
      .withColumn("cosine", cosineExpr("__v1", "__v2"))
      .filter(col("cosine") >= threshold)
      .select(col("__id1").as(s"${idCol}_1"), col("__id2").as(s"${idCol}_2"),
        col("cosine"))
  }

  /** IVF (inverted-file) approximate top-k: vectors are assigned to
    * their nearest of `nCentroids` anchor vectors (sampled
    * deterministically from the data — one pass, no iterative k-means);
    * a query scans only the `nProbe` centroid cells closest to it, then
    * ranks by exact cosine.
    *
    * Scale: the assignment column is a small int — at 100 TB the table
    * is written partitioned/bucketed by it, so a query becomes a
    * partition-pruned scan of ~nProbe/nCentroids of the data, and the
    * centroid set (K × dim doubles) is the only driver/broadcast state.
    * Raise nCentroids with corpus size to hold cell size constant. */
  /** Anchor-selection frame: the K vectors with the lowest id-hash —
    * deterministic without any stored state. Spark plans orderBy+limit(K)
    * as TakeOrderedAndProject (a per-partition K-heap merged on the
    * driver — one scan, K·partitions rows moved, NO global sort);
    * PlanAuditSpec regression-guards that shape. */
  private[graft] def ivfAnchorFrame(emb: DataFrame, idCol: String,
                                    vecCol: String, nCentroids: Int): DataFrame =
    emb.select(col(vecCol))
      .orderBy(expr(s"xxhash64($idCol)"), col(idCol))
      .limit(nCentroids)

  /** Coarse-quantizer probe: rows of `emb` whose nearest-centroid cell
    * is among the `nProbe` cells closest (by cosine) to the query's
    * vector. Shared by [[ivfTopK]] and [[ivfPqTopK]] — the one collected
    * query row and the K-centroid set are the only driver state. In
    * production the `__cell` int is written as a partition column once
    * at ingest and this filter becomes a partition-pruned scan. */
  private def probedCells(emb: DataFrame, idCol: String, vecCol: String,
                          queryId: Long, nCentroids: Int,
                          nProbe: Int): DataFrame = {
    // deterministic anchors: first K vectors in id-hash order
    val anchors = ivfAnchorFrame(emb, idCol, vecCol, nCentroids).collect()
    val centroids: Seq[Seq[Double]] = anchors.toSeq.map(vecOf(_).toSeq)

    // the query-vector fetch never needs the __cell column — reading it
    // from the raw frame saves a full centroid-assignment pass (the probe
    // scan below is then the ONLY pass evaluating NearestCentroid)
    val qRow = emb.filter(col(idCol) === queryId)
      .select(col(vecCol)).collect()
    require(qRow.nonEmpty, s"query id $queryId not found")
    val qVec = vecOf(qRow(0)).toSeq
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val probes = centroids.zipWithIndex
      .sortBy { case (c, _) => -cos(c, qVec) }.take(nProbe).map(_._2)

    val assignCol = GraftColumnBridge.column(
      NearestCentroid(GraftColumnBridge.expression(col(vecCol)), centroids))
    emb.withColumn("__cell", assignCol)
      .filter(col("__cell").isin(probes: _*))
      .drop("__cell")
  }

  def ivfTopK(emb: DataFrame, idCol: String, vecCol: String,
              queryId: Long, k: Int,
              nCentroids: Int = 16, nProbe: Int = 4): DataFrame =
    rankExact(probedCells(emb, idCol, vecCol, queryId, nCentroids, nProbe),
      emb, idCol, vecCol, queryId, k)

  /** Approximate top-k via random-hyperplane LSH: vectors are bucketed by
    * a `planes`-bit signature (the native codegen'd
    * [[graft.expressions.RandProjSig]] expression — a JVM loop over the
    * cached seeded planes; the interpreted `aggregate`/`transform` SQL
    * formulation it replaces ran dim×planes lambda steps per row, an
    * order of magnitude slower); only buckets within Hamming distance
    * `probeHamming` of the query signature are scanned, then ranked by
    * exact cosine. Bounded driver state: one collected query signature.
    *
    * Scale: the bucket column is a plain int — at 100 TB the bucketed
    * table would be written partitioned/bucketed by it, turning a query
    * into a partition-pruned scan of ~(Σ C(planes,≤h))/2^planes of the
    * data (56/1024 ≈ 5% for the default 10 planes, h=2; raise `planes`
    * as the corpus grows to keep expected candidates ≈ constant). */
  def lshTopK(emb: DataFrame, idCol: String, vecCol: String,
              queryId: Long, k: Int,
              planes: Int = 10, probeHamming: Int = 2,
              seed: Long = 7L): DataFrame = {
    require(planes <= 24, "signature must fit an int bucket")
    val bucketed = emb.withColumn("__bucket",
      GraftColumnBridge.column(RandProjSig(
        GraftColumnBridge.expression(col(vecCol)), planes, seed)).cast("int"))

    // one tiny collect: the query row's signature bucket
    val qRow = bucketed.filter(col(idCol) === queryId)
      .select(col("__bucket"), col(vecCol).as("__qvec")).collect()
    require(qRow.nonEmpty, s"query id $queryId not found")
    val qBucket = qRow(0).getInt(0)

    // probe set: all buckets within Hamming <= probeHamming of the query's
    // (probeHamming = planes probes every bucket — the exact limit)
    val probes: Seq[Int] = {
      val bits = (0 until planes).toSeq
      val flips = (0 to math.min(probeHamming, planes))
        .flatMap(h => bits.combinations(h))
      flips.map(_.foldLeft(qBucket)((b, i) => b ^ (1 << i))).distinct
    }

    rankExact(
      bucketed.filter(col("__bucket").isin(probes: _*)).drop("__bucket"),
      emb, idCol, vecCol, queryId, k)
  }

  /** Approximate top-k via MULTI-TABLE (OR-of-ANDs) random-hyperplane
    * LSH — the production operating point. A single-table signature
    * (`lshTopK`) needs neighbors to agree on most of one long signature,
    * which collapses when the top-k live at moderate cosine (≈0.6, bit-
    * agreement p ≈ 0.7): P(agree on 10 bits) ≈ 0.03. `tables`
    * independent short signatures fix that the standard way (E2LSH,
    * FAISS IndexLSH): a candidate only has to match the query in ANY one
    * table, so recall per true neighbor is 1-(1-p^bits)^tables — the
    * defaults (48×8) give ≈0.94 at c = 0.6 and ≈1 at c ≥ 0.8, while a
    * random vector (p = 0.5) collides with probability
    * 1-(1-2^-bits)^tables ≈ 0.17, so ~17% of the corpus is ever scored.
    * Signatures come from the same codegen'd
    * [[graft.expressions.RandProjBuckets]] expression the near-dup-pairs
    * path uses (per-table seed baked into the hashed bucket, so one
    * `arrays_overlap` against the query's bucket array is exactly
    * per-table equality); candidate selection is MAP-ONLY — no shuffle,
    * no explode, no dedup — followed by exact-cosine TakeOrdered.
    *
    * Scale: at 100 TB the bucket arrays are written once as an exploded
    * (bucket, id) postings table bucketed by `bucket`; a query then
    * equi-joins its `tables` buckets against the postings (partition-
    * pruned, like the IVF cell layout) instead of re-scanning. Raise
    * `bits` with corpus size to hold expected candidates constant; the
    * only driver state is the query row's bucket array. */
  def lshTopKMulti(emb: DataFrame, idCol: String, vecCol: String,
                   queryId: Long, k: Int,
                   tables: Int = 48, bits: Int = 8,
                   seed: Long = 7L): DataFrame = {
    val bucketsCol = GraftColumnBridge.column(RandProjBuckets(
      GraftColumnBridge.expression(col(vecCol)), tables, bits, seed))
    val bucketed = emb.withColumn("__buckets", bucketsCol)

    // one tiny collect: the query row's per-table bucket array
    val qRow = bucketed.filter(col(idCol) === queryId)
      .select(col("__buckets")).collect()
    require(qRow.nonEmpty, s"query id $queryId not found")
    val qBuckets = qRow(0).getSeq[Long](0)

    rankExact(
      bucketed.filter(arrays_overlap(col("__buckets"),
        array(qBuckets.map(lit): _*))).drop("__buckets"),
      emb, idCol, vecCol, queryId, k)
  }

  /** The write-once POSTINGS layout behind [[lshTopKMulti]]'s scale
    * story, concretely: one exploded (bucket, id) row per table per
    * vector, computed in a single map-only pass. At 100 TB this frame
    * is written `partitionBy("bucket")` (or bucketed) once at ingest;
    * every query then touches only its `tables` buckets. */
  def lshPostings(emb: DataFrame, idCol: String, vecCol: String,
                  tables: Int = 48, bits: Int = 8,
                  seed: Long = 7L): DataFrame =
    emb.select(col(idCol),
      explode(GraftColumnBridge.column(RandProjBuckets(
        GraftColumnBridge.expression(col(vecCol)), tables, bits, seed)))
        .as("bucket"))

  /** [[lshTopKMulti]] served from a precomputed [[lshPostings]] frame:
    * the query's bucket list prunes the postings (partition-pruned when
    * the postings are written partitioned by bucket), matched ids are
    * deduped (a vector can collide in several tables) and joined back
    * to the vectors for the exact re-rank — equi-joins only, candidate-
    * sized shuffles. Returns exactly what [[lshTopKMulti]] returns at
    * the same parameters (spec-enforced). */
  def lshTopKFromPostings(postings: DataFrame, emb: DataFrame,
                          idCol: String, vecCol: String,
                          queryId: Long, k: Int,
                          tables: Int = 48, bits: Int = 8,
                          seed: Long = 7L): DataFrame = {
    val qRow = emb.filter(col(idCol) === queryId)
      .select(GraftColumnBridge.column(RandProjBuckets(
        GraftColumnBridge.expression(col(vecCol)), tables, bits, seed))).collect()
    require(qRow.nonEmpty, s"query id $queryId not found")
    val qBuckets = qRow(0).getSeq[Long](0)
    val candidateIds = postings
      .filter(col("bucket").isin(qBuckets: _*))
      .select(col(idCol)).distinct()
    rankExact(emb.join(candidateIds, Seq(idCol)),
      emb, idCol, vecCol, queryId, k)
  }

  // ---- id-keyed vector LOOKUP layout --------------------------------------
  // [[lshTopKFromPostings]]'s one remaining linear term was its exact
  // re-rank: the candidate join scanned the vectors frame end-to-end. The
  // layout below makes the candidate fetch a PRUNED POINT LOOKUP instead —
  // the same pushed-IN-list pattern the postings bucket filter uses.

  /** Bucket assignment of the id-keyed lookup layout:
    * `pmod(xxhash64(id), nBuckets)`. Hash (not range) bucketing, so newly
    * ingested ids spread uniformly with no re-balancing. */
  private def idBucketCol(idCol: String, nBuckets: Int): Column =
    pmod(xxhash64(col(idCol)), lit(nBuckets.toLong)).cast("int")

  /** Driver-side replica of [[idBucketCol]] for one literal id — the same
    * Catalyst XxHash64 (seed 42) the distributed writer evaluated, so a
    * query can name its candidates' buckets without touching the data. */
  private[graft] def idBucketOf(id: Long, nBuckets: Int): Int = {
    import org.apache.spark.sql.catalyst.expressions.{Literal, XxHash64}
    val h = XxHash64(Seq(Literal(id)), 42L).eval(null).asInstanceOf[Long]
    (((h % nBuckets) + nBuckets) % nBuckets).toInt
  }

  /** WRITE-ONCE id-keyed vector lookup layout: `nBuckets` hash partitions
    * on the id (directory per bucket), rows sorted by id within each
    * bucket's files. A candidate fetch ([[fetchVectorsById]]) then prunes
    * to at most |ids| bucket directories — exact, metadata-only partition
    * pruning — and pushes the id IN-list into the surviving parquet
    * scans. With `nBuckets` raised ∝ corpus (rows per bucket held
    * constant, like a file-sized Delta bucket), the fetch reads
    * O(candidates) rows INDEPENDENT of corpus size — closing the last
    * corpus-linear term on the postings ANN query path. Written once at
    * ingest, alongside [[lshPostings]] / [[pqCodes]]. */
  def writeVectorLookup(emb: DataFrame, idCol: String, dir: String,
                        nBuckets: Int = 64): Unit =
    emb.withColumn("id_bucket", idBucketCol(idCol, nBuckets))
      .repartition(col("id_bucket"))
      .sortWithinPartitions(col("id_bucket"), col(idCol))
      .write.mode("overwrite").partitionBy("id_bucket").parquet(dir)

  /** Point-fetch rows of a [[writeVectorLookup]] layout for a BOUNDED id
    * list: the bucket IN-list (computed driver-side from the same hash)
    * prunes partitions, the id IN-list is pushed into the scan.
    * Plan-audited by PlanAuditSpec; the scan's input rows are measured
    * sublinear-in-corpus by ScaleBench's ann fetch row. */
  def fetchVectorsById(lookup: DataFrame, idCol: String, ids: Seq[Long],
                       nBuckets: Int): DataFrame = {
    require(ids.nonEmpty, "fetchVectorsById needs at least one id")
    val buckets = ids.map(idBucketOf(_, nBuckets)).distinct
    lookup
      .filter(col("id_bucket").isin(buckets: _*))
      .filter(col(idCol).isin(ids: _*))
      .drop("id_bucket")
  }

  /** [[lshTopKFromPostings]] with BOTH halves served from write-once
    * layouts — the production read path: the query's bucket IN-list
    * prunes the postings scan (as before), and the exact re-rank fetches
    * ONLY the candidate rows through the id-keyed lookup layout instead
    * of scanning the vectors frame. The candidate id list crosses the
    * driver; it is bounded BY DESIGN — raising `bits` with corpus size
    * holds expected candidates constant (the documented postings
    * contract) — and `maxCandidates` fails loudly rather than silently
    * collecting a corpus (fall back to [[lshTopKFromPostings]]'s
    * join-based fetch for wider probes). Returns exactly what
    * [[lshTopKMulti]] returns at the same parameters (spec-enforced). */
  def lshTopKFromPostingsLookup(postings: DataFrame, lookup: DataFrame,
                                idCol: String, vecCol: String,
                                queryId: Long, k: Int, nBuckets: Int,
                                tables: Int = 48, bits: Int = 8,
                                seed: Long = 7L,
                                maxCandidates: Int = 65536): DataFrame = {
    val qFrame = fetchVectorsById(lookup, idCol, Seq(queryId), nBuckets)
    val qRow = qFrame.select(GraftColumnBridge.column(RandProjBuckets(
      GraftColumnBridge.expression(col(vecCol)), tables, bits, seed))).collect()
    require(qRow.nonEmpty, s"query id $queryId not found")
    val qBuckets = qRow(0).getSeq[Long](0)
    val cand = postings.filter(col("bucket").isin(qBuckets: _*))
      .select(col(idCol)).distinct()
      .limit(maxCandidates + 1).collect().map(_.getLong(0)).toSeq
    require(cand.length <= maxCandidates,
      s"candidate set exceeded maxCandidates=$maxCandidates — raise bits " +
        "(buckets ∝ corpus) or use lshTopKFromPostings' join-based fetch")
    rankExact(fetchVectorsById(lookup, idCol, cand, nBuckets),
      qFrame, idCol, vecCol, queryId, k)
  }

  /** The write-once CODES column behind [[pqTopK]]'s scale story: the
    * input frame plus an `__codes` array<int> column (m small ints per
    * vector). Written once at ingest; queries ADC-scan the codes and
    * only refine-read the raw vectors of the top candidates. */
  def pqCodes(emb: DataFrame, vecCol: String,
              codebook: Seq[Seq[Seq[Double]]]): DataFrame =
    emb.withColumn("__codes",
      GraftColumnBridge.column(PqEncode(
        GraftColumnBridge.expression(col(vecCol)), codebook)))

  /** Deterministic PQ codebook: up to `sampleSize` vectors in id-hash
    * order (the [[ivfAnchorFrame]] idiom — no stored state, same result
    * every run), L2-normalized and split into `m` sub-vectors; per
    * subspace, `kCent` centroids from `iters` Lloyd iterations seeded
    * with the first `kCent` samples. All driver-side math is over a
    * ≤ sampleSize × dim double matrix — bounded, like the IVF anchors.
    * @return codebook(s)(c) = centroid c of subspace s */
  private[graft] def pqTrainCodebook(emb: DataFrame, idCol: String, vecCol: String,
                                     m: Int, kCent: Int,
                                     sampleSize: Int = 256,
                                     iters: Int = 5): Seq[Seq[Seq[Double]]] = {
    val sample: Array[Array[Double]] =
      ivfAnchorFrame(emb, idCol, vecCol, sampleSize).collect().map { r =>
        val raw = vecOf(r)
        val n = math.sqrt(raw.map(x => x * x).sum)
        if (n > 0) raw.map(_ / n) else raw
      }
    require(sample.nonEmpty, "cannot train PQ on an empty frame")
    val dim = sample.head.length
    require(dim % m == 0, s"dim $dim must be divisible by m=$m")
    val dsub = dim / m
    (0 until m).map { s =>
      val sub = sample.map(_.slice(s * dsub, (s + 1) * dsub))
      var cents = sub.take(kCent).map(_.clone)
      var it = 0
      while (it < iters) {
        val sums = Array.fill(cents.length)(new Array[Double](dsub))
        val counts = new Array[Int](cents.length)
        sub.foreach { v =>
          var best = 0; var bestD = Double.MaxValue
          var c = 0
          while (c < cents.length) {
            var d = 0.0; var i = 0
            while (i < dsub) { val t = v(i) - cents(c)(i); d += t * t; i += 1 }
            if (d < bestD) { bestD = d; best = c }
            c += 1
          }
          var i = 0
          while (i < dsub) { sums(best)(i) += v(i); i += 1 }
          counts(best) += 1
        }
        cents = cents.zipWithIndex.map { case (old, c) =>
          if (counts(c) == 0) old else sums(c).map(_ / counts(c))
        }
        it += 1
      }
      cents.map(_.toSeq).toSeq
    }
  }

  /** Approximate top-k via product quantization with exact re-ranking —
    * the compressed-scan ANN path: every vector is stored as `m` small
    * ints (8 ints vs 64 floats here: 8–32× less data scanned), a query
    * builds one m × kCent lookup table driver-side and ADC-scores the
    * whole corpus as a MAP-ONLY codegen'd projection (one table lookup +
    * add per subspace — no per-row dot product), the top `refine`·k ADC
    * candidates are then re-ranked by exact cosine. Both top-k steps
    * plan as TakeOrderedAndProject (per-partition heaps, no global
    * sort).
    *
    * Scale: at 100 TB the code column is written once next to the
    * embeddings (or replacing them, keeping a raw copy for refine-reads
    * only of the candidate rows); the ADC scan reads m ints per row
    * instead of the full vector, and composes with the IVF cell column
    * (scan only probed cells) for sublinear candidates. Codebook and
    * LUT are bounded plan state (m·kCent·dim/m and m·kCent doubles). */
  /** The query-side ADC lookup table: normalize the raw query vector
    * like the codes, then lut(s)(c) = q_sub(s) · centroid(s)(c)
    * ⇒ Σ_s lut ≈ q·v̂ = cosine. Shared by [[pqTopK]] and
    * [[pqTopKFromCodes]] so the two paths can't drift. */
  private def adcLut(qRaw: Array[Double],
                     codebook: Seq[Seq[Seq[Double]]]): Seq[Seq[Double]] = {
    val qn = math.sqrt(qRaw.map(x => x * x).sum)
    val q = if (qn > 0) qRaw.map(_ / qn) else qRaw
    val m = codebook.length
    val dsub = q.length / m
    (0 until m).map { s =>
      codebook(s).map { cent =>
        cent.zipWithIndex.map { case (x, i) => x * q(s * dsub + i) }.sum
      }
    }
  }

  def pqTopK(emb: DataFrame, idCol: String, vecCol: String,
             queryId: Long, k: Int,
             m: Int = 8, kCent: Int = 16, refine: Int = 8,
             sampleSize: Int = 256,
             trainedCodebook: Option[Seq[Seq[Seq[Double]]]] = None): DataFrame = {
    val codebook = trainedCodebook.getOrElse(
      pqTrainCodebook(emb, idCol, vecCol, m, kCent, sampleSize))

    // one tiny collect: the query vector, normalized like the codes
    val qRow = emb.filter(col(idCol) === queryId).select(col(vecCol)).collect()
    require(qRow.nonEmpty, s"query id $queryId not found")
    val lut = adcLut(vecOf(qRow(0)), codebook)

    val coded = emb.withColumn("__codes",
      GraftColumnBridge.column(PqEncode(
        GraftColumnBridge.expression(col(vecCol)), codebook)))
    val scored = coded.withColumn("__adc",
      GraftColumnBridge.column(PqAdcScore(
        GraftColumnBridge.expression(col("__codes")), lut)))
    val candidates = scored
      .filter(col(idCol) =!= queryId)
      .orderBy(col("__adc").desc, col(idCol).asc)
      .limit(refine * k)
      .select(col(idCol), col(vecCol))
    rankExact(candidates, emb, idCol, vecCol, queryId, k)
  }

  /** [[pqTopK]] served from a precomputed CODES frame (`idCol`,
    * `codesCol` — NO raw vectors) plus the id-keyed
    * [[writeVectorLookup]] layout: the ADC scan reads m small ints per
    * row, and the refine-read fetches only the top refine·k candidates'
    * raw vectors through [[fetchVectorsById]]'s pruned point lookup —
    * the production IVFADC read shape, where raw vectors never stream
    * through a query. The refine·k id list crossing the driver is
    * bounded by construction (a limit). Returns exactly what [[pqTopK]]
    * returns with the same codebook (spec-enforced). */
  def pqTopKFromCodes(codes: DataFrame, lookup: DataFrame,
                      idCol: String, vecCol: String,
                      queryId: Long, k: Int,
                      codebook: Seq[Seq[Seq[Double]]],
                      nBuckets: Int,
                      refine: Int = 8,
                      codesCol: String = "__codes"): DataFrame = {
    val qFrame = fetchVectorsById(lookup, idCol, Seq(queryId), nBuckets)
    val qRow = qFrame.select(col(vecCol)).collect()
    require(qRow.nonEmpty, s"query id $queryId not found")
    val lut = adcLut(vecOf(qRow(0)), codebook)
    val candIds = codes
      .withColumn("__adc", GraftColumnBridge.column(PqAdcScore(
        GraftColumnBridge.expression(col(codesCol)), lut)))
      .filter(col(idCol) =!= queryId)
      .orderBy(col("__adc").desc, col(idCol).asc)
      .limit(refine * k)
      .select(col(idCol)).collect().map(_.getLong(0)).toSeq
    rankExact(fetchVectorsById(lookup, idCol, candIds, nBuckets),
      qFrame, idCol, vecCol, queryId, k)
  }

  /** IVF + PQ composed (the FAISS IVFADC architecture, sans residual
    * encoding): the coarse quantizer prunes the corpus to the `nProbe`
    * cells nearest the query — at 100 TB a partition-pruned scan, since
    * the cell is a plain int partition column — and only the surviving
    * rows are ADC-scored against the PQ lookup table, then exact
    * re-ranked. Candidate count is ~nProbe/nCentroids of the corpus and
    * the scan reads m ints per surviving row: the two prunings compose
    * multiplicatively, which is the production ANN shape for corpora too
    * large to ADC-scan whole.
    *
    * The PQ codebook is trained on the full corpus sample (not per
    * cell) so codes are globally comparable; in production both the
    * cell column and the code column are written once at ingest and
    * every query reuses them — here both are computed inline, keeping
    * the query self-contained and deterministic. No residual encoding:
    * codes quantize the vectors themselves, trading a little recall at
    * equal m for not needing a per-cell recentering expression;
    * `refine`-deep exact re-ranking recovers the ordering. */
  def ivfPqTopK(emb: DataFrame, idCol: String, vecCol: String,
                queryId: Long, k: Int,
                nCentroids: Int = 16, nProbe: Int = 4,
                m: Int = 8, kCent: Int = 16, refine: Int = 8): DataFrame = {
    val probed = probedCells(emb, idCol, vecCol, queryId, nCentroids, nProbe)
    // codebook trained on the FULL corpus sample (codes must be globally
    // comparable across cells); the query row's own cell is always probed
    // (it IS a nearest centroid's cell), so pqTopK finds it for the LUT
    val codebook = pqTrainCodebook(emb, idCol, vecCol, m, kCent)
    pqTopK(probed, idCol, vecCol, queryId, k, m, kCent, refine,
      trainedCodebook = Some(codebook))
  }

  /** Hard-negative mining for contrastive/embedding training: for every
    * ANCHOR vector, the `k` corpus vectors most cosine-similar to it
    * whose label DIFFERS — the "confusing" negatives that make a batch
    * informative (the in-batch-negatives upgrade every retrieval
    * training recipe reaches for).
    *
    * Scale shape: `anchors` must be batch-sized (a training batch's
    * rows, NOT the corpus) — it is broadcast, the corpus side streams
    * through ONE scan scoring |anchors| codegen'd cosines per row, and
    * the per-anchor top-k is a keyed window over |anchors| groups. At
    * 100 TB swap the scan for the ANN candidate paths ([[ivfTopK]] /
    * [[lshTopKFromPostings]]) per anchor and re-rank the union — the
    * exact scan here is the oracle shape. Deterministic
    * (cosine DESC, id) ties.
    * @param anchors frame of (idCol, vecCol, labelCol) anchor rows
    * @return (anchor_id, idCol, labelCol, cosine) */
  def hardNegatives(emb: DataFrame, anchors: DataFrame,
                    idCol: String, vecCol: String, labelCol: String,
                    k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val a = anchors.select(
      col(idCol).as("anchor_id"), col(vecCol).as("__avec"),
      col(labelCol).as("__albl"))
    val w = Window.partitionBy(col("anchor_id"))
      .orderBy(col("__cos").desc, col(idCol).asc)
    emb.crossJoin(broadcast(a))
      .filter(col(labelCol) =!= col("__albl") && col(idCol) =!= col("anchor_id"))
      .withColumn("__cos", cosineExpr(vecCol, "__avec"))
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= k)
      .select(col("anchor_id"), col(idCol), col(labelCol),
        round(col("__cos"), 4).as("cosine"))
  }
}
