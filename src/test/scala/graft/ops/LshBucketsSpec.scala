package graft.ops

import graft.SharedSpark
import org.scalatest.funsuite.AnyFunSuite

/** Direct specs for the over-cap candidate guard — the cases the
  * end-to-end LSH specs can't isolate: duplicate bucket rows, id
  * interleaving inside a mixed mega-bucket, and multi-segment
  * stitching. */
class LshBucketsSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  private def edges(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("__id1", "__id2").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  /** Connected-component count over an undirected edge set (test-side
    * union-find — small inputs only). */
  private def components(ids: Set[Long], es: Set[(Long, Long)]): Int = {
    val parent = scala.collection.mutable.Map(ids.map(i => i -> i).toSeq: _*)
    def find(x: Long): Long = { var r = x; while (parent(r) != r) r = parent(r); r }
    es.foreach { case (a, b) =>
      if (ids(a) && ids(b)) parent(find(a)) = find(b)
    }
    ids.map(find).size
  }

  test("duplicate (id, bucket) rows: occupancy counts distinct members, no self-edges") {
    import spark.implicits._
    // 5 distinct ids in one bucket, every row duplicated (the 32-bit
    // band-collision shape) — raw-row occupancy (10) would wrongly
    // exceed a cap of 6; distinct occupancy (5) keeps it all-pairs
    val rows = (0L until 5L).flatMap(i => Seq((i, 77L), (i, 77L)))
    val got = edges(LshBuckets.candidates(rows.toDF("id", "b"), "id", "b", maxBucket = 6))
    val want = (for { i <- 0L until 5L; j <- (i + 1) until 5L } yield (i, j)).toSet
    assert(got == want, s"expected exact all-pairs of 5 ids, got $got")
    assert(!got.exists(e => e._1 == e._2), "no self-edges")
  }

  test("interleaved true cluster in a mixed over-cap bucket stays connected (chainLinks > 1)") {
    import spark.implicits._
    // one mega-bucket of 240 ids; the TRUE cluster is the even ids,
    // interleaved 1:1 with non-members (the fragmentation case a pure
    // successor chain cannot survive: member→interloper edges fail
    // verification and member→member edges never exist). One segment
    // (segmentRows > bucket) makes adjacency deterministic.
    val rows = (0L until 240L).map(i => (i, 5L))
    val cand = edges(LshBuckets.candidates(rows.toDF("id", "b"), "id", "b",
      maxBucket = 16, chainLinks = 3, segmentRows = 100000))
    // simulated exact verification: only member↔member edges survive
    val members = (0L until 240L by 2).toSet
    val verified = cand.filter(e => members(e._1) && members(e._2))
    assert(components(members, verified) == 1,
      s"even-id cluster fragmented: ${components(members, verified)} components")
    // and the candidate set stays linear-ish, not all-pairs
    assert(cand.size < 240 * 6, s"sparse edge set expected, got ${cand.size} edges")
  }

  test("multi-segment over-cap bucket: star stitching keeps one component") {
    import spark.implicits._
    val n = 3000L
    val rows = (0L until n).map(i => (i, 9L))
    val cand = edges(LshBuckets.candidates(rows.toDF("id", "b"), "id", "b",
      maxBucket = 100, chainLinks = 2, segmentRows = 256))
    // a true mega-cluster: every edge passes verification — the whole
    // bucket must be ONE component across all hash-salted segments
    assert(components((0L until n).toSet, cand) == 1, "segments not stitched")
    assert(cand.size < n * 4, s"edge count must stay linear, got ${cand.size}")
    assert(cand.forall(e => e._1 < e._2), "orientation __id1 < __id2")
  }

  test("probe frame decides the guard: over-cap probe triggers it, clean probe skips it") {
    import spark.implicits._
    val n = 200L
    val rows = (0L until n).map(i => (i, 3L))
    val full = rows.toDF("id", "b")
    // over-cap probe (the frame itself): guard triggers → sparse edges
    val guarded = edges(LshBuckets.candidates(full, "id", "b",
      maxBucket = 16, probe = Some(full)))
    assert(guarded.size < n * 4, s"guard should emit sparse edges, got ${guarded.size}")
    assert(components((0L until n).toSet, guarded) == 1, "guarded bucket stays connected")
    // clean probe (a tiny subset): the documented false-clean contract —
    // the plain self-join runs and emits exact all-pairs (correct, just
    // unguarded; acceptable only when the caller's symmetry claim holds)
    val cleanProbe = (0L until 5L).map(i => (i, 99L)).toDF("id", "b")
    val unguarded = edges(LshBuckets.candidates(full, "id", "b",
      maxBucket = 16, probe = Some(cleanProbe)))
    assert(unguarded.size == n * (n - 1) / 2,
      s"clean probe must skip the guard → exact all-pairs, got ${unguarded.size}")
  }

  test("chain redundancy: losing any SINGLE chain edge never detaches a member (≥3-member segments)") {
    import org.apache.spark.sql.functions.{col, lit, pmod, xxhash64}
    import spark.implicits._
    // the claim behind the prefilter-miss mitigation documented on
    // Similarity.cosinePairsLsh / TextDedup.minHashLshPairs: a single
    // dropped borderline chain edge (prefilter miss, ~1e-7) leaves the
    // over-cap bucket connected through the surviving parallel edges.
    // True statement (and the one the scaladoc now makes): with
    // chainLinks = 2 the d1+d2 successor edges of a segment with ≥ 3
    // members form a 2-EDGE-CONNECTED graph — every id-ordered cut is
    // crossed by at least one surviving d2 edge — so removal of ANY one
    // chain edge preserves one component. (The 2-member-segment corner,
    // where the non-min member has exactly one incident chain edge, is
    // documented, not claimed away.)
    val n = 3000L
    val rows = (0L until n).map(i => (i, 9L))
    val cand = edges(LshBuckets.candidates(rows.toDF("id", "b"), "id", "b",
      maxBucket = 100, chainLinks = 2, segmentRows = 256))
    // recompute each id's hash-salted segment with the SAME expression
    // the guard uses (numSegs = 2^ceil(log2(3000/256)) = 16) so chain
    // edges (same segment) separate from star edges (cross segment)
    val segOf = (0L until n).toDF("id")
      .select(col("id"), pmod(xxhash64(col("id")), lit(16L)).as("seg"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val segSizes = segOf.values.groupBy(identity).map(_._2.size)
    assert(segSizes.forall(_ >= 3),
      s"construction must yield ≥3-member segments, got min ${segSizes.min}")
    val chainEdges = cand.filter(e => segOf(e._1) == segOf(e._2))
    assert(chainEdges.nonEmpty)
    val ids = (0L until n).toSet
    chainEdges.foreach { e =>
      assert(components(ids, cand - e) == 1,
        s"single chain-edge loss $e detached a member")
    }
    // and the redundancy is structural: every member touches ≥ 2 edges
    val degree = cand.toSeq.flatMap(e => Seq(e._1, e._2))
      .groupBy(identity).map(_._2.size)
    assert(degree.forall(_ >= 2), "every over-cap member carries ≥2 incident edges")
  }

  test("planted boundary pair inside an over-cap LSH bucket survives the Hamming prefilter") {
    import spark.implicits._
    // end-to-end through Similarity.cosinePairsLsh: a mega-cluster of 60
    // identical vectors (every table's bucket is over an 8-cap → chain
    // edges only) plus ONE member at cosine ≈ 0.905, just above the 0.9
    // threshold — the worst TRUE pair the prefilter must pass. Its
    // expected 128-bit Hamming distance (~36) sits far under the 5σ
    // cutoff (~61), so with the op's fixed seed the boundary member
    // stays attached through its verified chain edges and the component
    // consumers (SemDeDup-style) recover the FULL cluster.
    val dim = 32
    val u = Array.tabulate(dim)(i => if (i == 0) 1.0f else 0.0f)
    val theta = math.acos(0.905)
    val w = Array.tabulate(dim)(i =>
      if (i == 0) math.cos(theta).toFloat
      else if (i == 1) math.sin(theta).toFloat else 0.0f)
    val emb = ((0L until 60L).map(i => (i, u.toSeq)) :+ (60L, w.toSeq))
      .toDF("id", "vec")
    val pairs = Similarity.cosinePairsLsh(emb, "id", "vec",
        threshold = 0.9, maxBucket = 8)
      .select("id_1", "id_2").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    Caches.releaseAll()
    assert(pairs.nonEmpty)
    assert(components((0L until 61L).toSet, pairs) == 1,
      "boundary member detached — prefilter dropped its chain edges")
    assert(pairs.exists(e => e._1 == 60L || e._2 == 60L),
      "no verified edge touches the boundary member")
  }

  test("maxBucket = Int.MaxValue short-circuits to exact all-pairs") {
    import spark.implicits._
    val rows = (0L until 6L).map(i => (i, 1L)) ++ (10L until 13L).map(i => (i, 2L))
    val got = edges(LshBuckets.candidates(rows.toDF("id", "b"), "id", "b", Int.MaxValue))
    val want = (for { i <- 0L until 6L; j <- (i + 1) until 6L } yield (i, j)).toSet ++
      (for { i <- 10L until 13L; j <- (i + 1) until 13L } yield (i, j)).toSet
    assert(got == want)
  }
}
