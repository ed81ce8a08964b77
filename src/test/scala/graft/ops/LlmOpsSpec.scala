package graft.ops

import graft.SharedSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** LLM-pipeline operators over the driver testdata (sf0.001). */
class LlmOpsSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  private lazy val docs =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
  private lazy val emb =
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  private def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("doc_id_1", "doc_id_2").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  // the O(n²) ground truth, computed once for both dedup tests
  private lazy val exactPairs: Set[(Long, Long)] =
    pairSet(TextDedup.exactJaccardPairs(docs, "doc_id", "text"))

  test("minhash-LSH pairs match exact all-pairs Jaccard (recall AND precision)") {
    val lsh = pairSet(TextDedup.minHashLshPairs(docs, "doc_id", "text"))
    assert(exactPairs.nonEmpty, "testdata should contain planted near-dup pairs")
    assert(lsh == exactPairs,
      s"LSH missed ${exactPairs -- lsh}, extra ${lsh -- exactPairs}")
  }

  test("minhash-LSH boilerplate guard: over-cap buckets dropped, planted pairs kept") {
    import spark.implicits._
    // 400 docs all opening with the same 12-token template (the pattern
    // that made band buckets scale-proportional and candidates quadratic
    // at 900k docs), plus body text unique per doc, plus planted
    // near-dup pairs (doc 2k+1 copies doc 2k with a 1-token suffix)
    val template = "begin common preamble text repeated across many documents here now"
    val base = (0 until 400).map { i =>
      val body = (0 until 40).map(w => s"tok${(i.toLong * 31 + w * 7) % 9999}x$i-$w").mkString(" ")
      (i.toLong, s"$template $body")
    }
    val planted = base.collect { case (i, t) if i % 2 == 0 => (i + 1000L, s"$t zz$i") }
    val docs = (base ++ planted).toDF("doc_id", "text")
    // a tiny cap forces the guard to actually trigger on the shared
    // template's buckets; every planted pair must still be found (their
    // buckets mix doc-specific shingle minima → cluster-sized)
    val got = pairSet(TextDedup.minHashLshPairs(docs, "doc_id", "text", maxBucket = 16))
    val want = base.collect { case (i, _) if i % 2 == 0 => (i, i + 1000L) }.toSet
    assert(want.subsetOf(got), s"cap lost planted pairs: ${want -- got}")
    // and the guard must equal the uncapped answer here: extras can only
    // be verified true pairs (exact-Jaccard >= threshold)
    val uncapped = pairSet(TextDedup.minHashLshPairs(docs, "doc_id", "text"))
    assert(got.subsetOf(uncapped), s"cap invented pairs: ${got -- uncapped}")
  }

  test("over-cap TRUE clusters stay fully connected through the chain edges") {
    import spark.implicits._
    // one 120-doc near-identical cluster (every bucket it lands in is
    // over any small cap) + unrelated singletons
    val clusterBase = (0 until 60).map(w => s"cluster body token$w shared").mkString(" ")
    val cluster = (0 until 120).map(i => (i.toLong, s"$clusterBase tail$i"))
    val rest = (0 until 200).map { i =>
      (1000L + i, (0 until 50).map(w => s"solo${i}w$w").mkString(" "))
    }
    val docs = (cluster ++ rest).toDF("doc_id", "text")
    val pairs = TextDedup.minHashLshPairs(docs, "doc_id", "text", maxBucket = 16)
    // connected components over the returned pairs must recover the
    // whole cluster as ONE component even though all-pairs enumeration
    // inside the over-cap buckets was degraded to chains
    val cc = TextDedup.connectedComponents(pairs, "doc_id_1", "doc_id_2")
    val clusters = cc.groupBy("cluster").count().collect()
    assert(clusters.exists(_.getLong(1) == 120),
      s"cluster fragmented: ${clusters.map(_.getLong(1)).sorted.reverse.take(5).mkString(",")}")
    // and semantic-style survivors: identical embeddings (the guaranteed
    // mega-bucket — same bucket in EVERY table) still collapse to one
    // representative through the chain
    val emb = docs.withColumn("embedding",
      expr("transform(sequence(1, 8), i -> CASE WHEN doc_id < 1000 " +
        "THEN cast(1.0 AS float) ELSE cast(hash(doc_id, i) % 100 AS float) END)"))
    val sem = SemanticDedup.semanticDedup(emb, "doc_id", "embedding",
      threshold = 0.999, maxBucket = 16)
    val kept = sem.filter(col("doc_id") < 1000).count()
    assert(kept == 1L, s"identical-embedding mega-cluster should keep 1 survivor, kept $kept")
  }

  test("BandHashes: numHashes/bandRows int keys, child evaluated once per row") {
    import spark.implicits._
    val df = Seq((1L, Array(11L, 22L, 33L, 44L, 55L, 66L, 77L, 88L))).toDF("id", "sig")
    val out = df.select(org.apache.spark.sql.GraftColumnBridge.column(
        graft.expressions.BandHashes(
          org.apache.spark.sql.GraftColumnBridge.expression(col("sig")), 2)).as("b"))
      .selectExpr("size(b) AS n", "b").collect()(0)
    assert(out.getInt(0) == 4)
    // deterministic and band-index-sensitive: same rows in a different
    // band position produce different keys
    val b = out.getSeq[Int](1)
    assert(b.distinct.size == 4, s"band keys should differ across bands: $b")
    val again = df.select(org.apache.spark.sql.GraftColumnBridge.column(
        graft.expressions.BandHashes(
          org.apache.spark.sql.GraftColumnBridge.expression(col("sig")), 2)).as("b"))
      .selectExpr("b").collect()(0).getSeq[Int](0)
    assert(again == b)
  }

  test("PackSigBytes + PackedByteAgreement: exact byte agreement, padding, SWAR counterexample") {
    import spark.implicits._
    import graft.expressions.{PackedByteAgreement, PackSigBytes}
    import org.apache.spark.sql.GraftColumnBridge.{column => gc, expression => ge}
    // 10 slots → 2 packed longs with 6 zero-padding bytes; signatures
    // agree on slots 0-6, differ on 7-9 → agreement = 7 + 6 padding
    val a = (0L until 10L).map(_ * 101L + 7L).toArray
    val b = a.clone(); b(7) += 1; b(8) += 1; b(9) += 1
    val df = Seq((a, b)).toDF("a", "b")
    val packed = df.select(gc(PackSigBytes(ge(col("a")))).as("pa"),
      gc(PackSigBytes(ge(col("b")))).as("pb"))
    val row = packed.selectExpr("size(pa) AS n").collect()(0)
    assert(row.getInt(0) == 2, "10 slots pack into 2 longs")
    val agree = packed.select(gc(PackedByteAgreement(ge(col("pa")), ge(col("pb"))))
      .as("m")).collect()(0).getInt(0)
    assert(agree == 7 + 6, s"7 agreeing slots + 6 padding bytes, got $agree")
    // identical signatures agree everywhere (16 byte positions)
    val full = Seq((a, a)).toDF("a", "b")
      .select(gc(PackedByteAgreement(
        ge(gc(PackSigBytes(ge(col("a"))))),
        ge(gc(PackSigBytes(ge(col("b"))))))).as("m"))
      .collect()(0).getInt(0)
    assert(full == 16, s"identical sigs agree on all 16 byte positions, got $full")
    // the SWAR zero-byte trick's false-positive shape — a 0x01 byte
    // directly above a zero byte — must count exactly, not over-count:
    // packed longs [0x0100] vs [0x0000]: byte0 differs? no — byte0 is
    // 0x00 in both, byte1 is 0x01 vs 0x00. Raw-long agreement via the
    // static method (the codegen'd path is exercised above):
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val swarA = new GenericArrayData(Array(0x0100L))
    val swarB = new GenericArrayData(Array(0x0000L))
    assert(graft.expressions.PackedByteAgreement.compute(swarA, swarB) == 7,
      "bytes: one differing (0x01 vs 0x00), seven equal")
  }

  test("minhash prefilter cutoff math: borderline true pairs pass, random-collision agreement is cut") {
    // the planted near-dup pairs in the sf0.001 fixture sit near the
    // 0.5 threshold — the recall assertion in the all-pairs test above
    // is the end-to-end evidence. This spec pins the CUTOFF value so a
    // refactor can't silently tighten it: numHashes=128, threshold=0.5
    // → p_t ≈ 0.502, E = 64.25, σ ≈ 5.66 → cutoff 35 (5σ below), and a
    // random pair (J ≈ 0.04) expects ≈ 5.6 agreeing slots — far below.
    val pT = 0.5 + 0.5 / 256.0
    val cutoff = math.floor(128 * pT - 5.0 * math.sqrt(128 * pT * (1 - pT))).toInt
    assert(cutoff == 35, s"expected documented cutoff 35, got $cutoff")
    assert(128 * (0.04 + 0.96 / 256.0) < cutoff / 4.0,
      "random-collision expected agreement must sit far below the cutoff")
  }

  test("simhash combo-bucketed pairs find the planted near-dups exactly") {
    val sim = pairSet(TextDedup.simHashPairs(docs, "doc_id", "text"))
    assert(sim == exactPairs,
      s"simhash missed ${exactPairs -- sim}, extra ${sim -- exactPairs}")
  }

  test("stratified sampling is deterministic, rate-accurate, and temperature upsamples rare strata") {
    import spark.implicits._
    val n = 20000
    val df = spark.range(0, n)
      // skewed strata: 90% common, 9% mid, 1% rare
      .withColumn("stratum",
        when(col("id") % 100 < 90, "common")
          .when(col("id") % 100 < 99, "mid")
          .otherwise("rare"))
    val rates = Map("common" -> 0.1, "mid" -> 0.5, "rare" -> 1.0)
    val s1 = Sampling.stratifiedSample(df, "id", "stratum", rates)
    val got = s1.groupBy("stratum").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // rate accuracy within sampling noise
    assert(math.abs(got("common") - 0.1 * 0.9 * n) < 0.9 * n * 0.02, got.toString)
    assert(math.abs(got("mid") - 0.5 * 0.09 * n) < 300, got.toString)
    assert(got("rare") == n / 100, "rate 1.0 must keep every rare row")
    // deterministic: same seed → identical subset
    val again = Sampling.stratifiedSample(df, "id", "stratum", rates)
    assert(s1.exceptAll(again).isEmpty && again.exceptAll(s1).isEmpty)

    // temperature flattening: T=1 preserves proportions; higher T gives
    // the rare stratum a strictly higher keep rate than the common one
    val r1 = Sampling.temperatureRates(df, "stratum", temperature = 1.0, targetRows = 2000)
    val r3 = Sampling.temperatureRates(df, "stratum", temperature = 3.0, targetRows = 2000)
    assert(math.abs(r1("common") - r1("rare")) < 1e-9,
      s"T=1 keeps uniform per-row rates: $r1")
    assert(r3("rare") > r3("common"), s"T=3 must upsample rare strata: $r3")
    val mixed = Sampling.temperatureMix(df, "id", "stratum", 3.0, targetRows = 2000)
    val mTotal = mixed.count()
    assert(math.abs(mTotal - 2000) < 300, s"expected ~2000 rows, got $mTotal")
  }

  test("sequence packing fills bins to the budget, overflowing by at most one doc") {
    val df = spark.range(0, 500)
      .withColumn("toks", (col("id") % 37 + 10).cast("long"))
    val packed = Packing.sequencePack(df, "id", "toks", budget = 100,
      shard = pmod(col("id"), lit(4)))
    assert(packed.count() == 500)
    // (shard, bin_id, n_docs, total_tokens) per bin
    val stats = Packing.binStats(packed, "toks").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val maxTok = 46L // toks ranges 10..46
    stats.groupBy(_._1).foreach { case (shard, bins) =>
      // bins are contiguous from 0 within each shard
      assert(bins.map(_._2).sorted.toSeq == (0L until bins.length),
        s"shard $shard: non-contiguous bins ${bins.map(_._2).sorted.toSeq}")
      // split-at-boundary: a bin overflows by at most its last doc...
      assert(bins.forall(_._4 <= 100 + maxTok),
        s"shard $shard: bin overflow beyond one doc")
      // ...and every non-final bin actually reached the boundary
      val lastBin = bins.map(_._2).max
      assert(bins.filter(_._2 < lastBin).forall(_._4 >= 100 - maxTok),
        s"shard $shard: underfilled non-final bin")
    }
  }

  test("connected components resolve multi-hop chains to the minimum label") {
    import spark.implicits._
    // chain 1-2-3-4-5 (diameter 4 — needs label propagation, not one
    // hop), a triangle 10-11-12, and an isolated edge 20-21
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
      (10L, 11L), (11L, 12L), (10L, 12L), (20L, 21L))
      .toDF("a", "b")
    val cc = TextDedup.connectedComponents(edges, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((1L to 5L).forall(cc(_) == 1L), s"chain broken: $cc")
    assert(Seq(10L, 11L, 12L).forall(cc(_) == 10L))
    assert(cc(20L) == 20L && cc(21L) == 20L)
    graft.ops.Caches.releaseAll()
  }

  test("connected components: pointer jumping resolves a 100-chain in O(log d) rounds") {
    import spark.implicits._
    // worst-case shape for plain propagation: a single chain 1-2-…-100
    // (diameter 99). Pointer doubling must stay within ⌈log2(d)⌉ + 1
    // rounds (the +1 is the round that observes convergence).
    val n = 100
    val edges = (1L until n.toLong).map(i => (i, i + 1)).toDF("a", "b")
    val (cc, rounds) = TextDedup.connectedComponentsWithRounds(edges, "a", "b")
    val labels = cc.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels.size == n && labels.values.forall(_ == 1L), "chain not fully merged")
    val bound = (math.log(n - 1) / math.log(2)).ceil.toInt + 1
    assert(rounds <= bound, s"took $rounds rounds, O(log d) bound is $bound")
    graft.ops.Caches.releaseAll()
  }

  test("dedup clusters: every doc labeled, canonical = min id per near-dup component") {
    val clusters = TextDedup.dedupClusters(docs, "doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(clusters.length == docs.count())
    val byCluster = clusters.groupBy(_._2)
    // canonical is the min id of its cluster, exactly one per cluster
    byCluster.foreach { case (cid, members) =>
      assert(members.map(_._1).min == cid)
      assert(members.count(_._3) == 1)
    }
    // every exact near-dup pair ends up in the same cluster
    val label = clusters.map(c => c._1 -> c._2).toMap
    exactPairs.foreach { case (a, b) =>
      assert(label(a) == label(b), s"pair ($a,$b) split across clusters")
    }
    graft.ops.Caches.releaseAll()
  }

  test("embedding near-dup: LSH pair path finds planted pairs, verified exact") {
    // synthetic corpus: 200 random 64-dim vectors + 10 jittered copies
    // (cosine ≈ 0.99 to their originals) — the planted near-dup pairs
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val baseVecs = Seq.tabulate(200) { i =>
      (i.toLong, Array.fill(64)(rnd.nextGaussian().toFloat))
    }
    val jittered = baseVecs.take(10).map { case (i, v) =>
      (1000L + i, v.map(x => x + 0.05f * rnd.nextGaussian().toFloat))
    }
    val df = (baseVecs ++ jittered).toDF("vec_id", "embedding")

    val exact = Similarity.cosinePairs(df, "vec_id", "embedding", threshold = 0.9)
      .select("vec_id_1", "vec_id_2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.size >= 10, s"expected >=10 planted pairs, got ${exact.size}")

    val lsh = Similarity.cosinePairsLsh(df, "vec_id", "embedding", threshold = 0.9)
      .select("vec_id_1", "vec_id_2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh == exact, s"LSH missed ${exact -- lsh}, extra ${lsh -- exact}")
  }

  test("IVF top-k: probed-cell results are exact-cosine ranked; planted neighbor found") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val baseVecs = Seq.tabulate(300) { i =>
      (i.toLong, Array.fill(64)(rnd.nextGaussian().toFloat))
    }
    // planted query: a jittered copy of vector 7 — its true top-1
    val query = (9007L, baseVecs(7)._2.map(x => x + 0.03f * rnd.nextGaussian().toFloat))
    val df = (baseVecs :+ query).toDF("vec_id", "embedding")

    val ivf = Similarity.ivfTopK(df, "vec_id", "embedding", queryId = 9007L, k = 5)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(ivf.head._1 == 7L,
      s"planted neighbor must rank first, got ${ivf.toSeq}")
    assert(ivf.map(_._2).toSeq == ivf.map(_._2).sorted.reverse.toSeq,
      "results must be cosine-descending")
    // every returned cosine matches the brute-force value exactly
    val bf = Similarity.bruteForceTopK(df, "vec_id", "embedding", 9007L, 300)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    ivf.foreach { case (id, c) => assert(math.abs(bf(id) - c) < 1e-12) }
  }

  test("exact dedup returns one canonical row per distinct text") {
    val out = TextDedup.exactDedup(docs, "doc_id", "text")
    assert(out.count() == out.select("canonical_doc_id").distinct().count())
    assert(out.agg(sum("n_copies")).collect()(0).getLong(0) == docs.count())
  }

  test("text analysis columns are deterministic and well-formed") {
    val a = TextAnalysis.analyze(docs, "text")
    val b = TextAnalysis.analyze(docs, "text")
    assert(a.select("doc_id", "fingerprint", "rolling_hash", "quality", "lang_guess")
      .except(b.select("doc_id", "fingerprint", "rolling_hash", "quality", "lang_guess"))
      .count() == 0)
    val row = a.filter(col("doc_id") === 0)
      .select("n_tokens", "n_words", "quality").collect()(0)
    assert(row.getInt(0) >= row.getInt(1), "BPE-ish tokens >= whitespace words")
    val q = row.getDouble(2)
    assert(q >= 0.0 && q <= 1.0)
    // ratio columns bounded in [0,1]; English prose has some stopwords
    import spark.implicits._
    val ratios = TextAnalysis.analyze(
      Seq((1L, "the cat sat on the mat, and the dog barked!")).toDF("doc_id", "text"), "text")
      .select("stopword_ratio", "punct_ratio").collect()(0)
    assert(ratios.getDouble(0) > 0.2 && ratios.getDouble(0) < 0.6,
      s"stopword ratio off: ${ratios.getDouble(0)}")
    assert(ratios.getDouble(1) > 0.0 && ratios.getDouble(1) < 0.1,
      s"punct ratio off: ${ratios.getDouble(1)}")
    // shuffled word order changes the rolling hash but not the fingerprint
    // of identical text — check rolling hash is order-sensitive
    import spark.implicits._
    val two = Seq((1L, "alpha beta gamma"), (2L, "gamma beta alpha")).toDF("doc_id", "text")
    val hashes = two.select(TextAnalysis.rollingHash("text")).as[Long].collect()
    assert(hashes(0) != hashes(1))
  }

  test("brute-force cosine top-k is ordered and excludes the query") {
    val top = Similarity.bruteForceTopK(emb, "vec_id", "embedding", queryId = 0, k = 10)
      .collect()
    assert(top.length == 10)
    assert(!top.map(_.getLong(0)).contains(0L))
    val sims = top.map(_.getDouble(1))
    assert(sims.zip(sims.tail).forall { case (x, y) => x >= y }, "descending order")
  }

  test("LSH top-k returns exact-cosine-ranked results from probed buckets") {
    val lsh = Similarity.lshTopK(emb, "vec_id", "embedding", queryId = 0, k = 10)
      .collect()
    assert(lsh.nonEmpty && lsh.length <= 10)
    val sims = lsh.map(_.getDouble(1))
    assert(sims.zip(sims.tail).forall { case (x, y) => x >= y })
    // every LSH result's cosine matches the brute-force value for that id
    val brute = Similarity.bruteForceTopK(emb, "vec_id", "embedding", 0, 499)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    lsh.foreach(r => assert(math.abs(brute(r.getLong(0)) - r.getDouble(1)) < 1e-9))
  }

  test("multi-table LSH top-k recovers planted near-neighbors with high recall") {
    import org.apache.spark.sql.functions.{expr, explode}
    val base = emb.select(col("vec_id"),
      expr("transform(embedding, x -> cast(x AS double))").as("v"))
    // 15 graded jittered copies of vector 0 (cosine ≈0.8–0.999), the
    // regime multi-table OR-of-ANDs LSH is designed for — ONE shared
    // definition with the q19/q71/q75 oracle queries
    val staged = graft.SparkEntry.plantNeighbors(base)
    val approx = Similarity.lshTopKMulti(staged, "vec_id", "v", queryId = 0, k = 10)
      .collect()
    assert(approx.length == 10)
    val exact = Similarity.bruteForceTopK(staged, "vec_id", "v", queryId = 0, k = 10)
      .collect().map(_.getLong(0)).toSet
    val overlap = approx.map(_.getLong(0)).count(exact)
    assert(overlap >= 8, s"recall@10 too low: $overlap/10")
    // precision is exact: each returned cosine equals the true cosine
    val sims = approx.map(_.getDouble(1))
    assert(sims.zip(sims.tail).forall { case (x, y) => x >= y }, "descending order")
    assert(sims.head > 0.99, "least-jittered plant must rank first")
  }

  test("PQ top-k: code shape, ADC approximates cosine, planted recall") {
    import org.apache.spark.sql.functions.{expr, explode}
    import org.apache.spark.sql.GraftColumnBridge
    val base = emb.select(col("vec_id"),
      expr("transform(embedding, x -> cast(x AS double))").as("v"))
    // codes: M ints in [0, kCent)
    val book = Similarity.pqTrainCodebook(base, "vec_id", "v", m = 8, kCent = 16)
    assert(book.length == 8 && book.forall(_.length == 16))
    val codes = base.withColumn("c", GraftColumnBridge.column(
        graft.expressions.PqEncode(GraftColumnBridge.expression(col("v")), book)))
      .select("c").collect().map(_.getSeq[Int](0))
    assert(codes.forall(c => c.length == 8 && c.forall(x => x >= 0 && x < 16)))
    // same planted-neighbor protocol as the LSH spec (shared definition)
    val staged = graft.SparkEntry.plantNeighbors(base)
    val approx = Similarity.pqTopK(staged, "vec_id", "v", queryId = 0, k = 10).collect()
    assert(approx.length == 10)
    val exact = Similarity.bruteForceTopK(staged, "vec_id", "v", queryId = 0, k = 10)
      .collect().map(_.getLong(0)).toSet
    val overlap = approx.map(_.getLong(0)).count(exact)
    assert(overlap >= 8, s"PQ recall@10 too low: $overlap/10")
    // returned cosines are EXACT (re-ranked), not ADC approximations
    val brute = Similarity.bruteForceTopK(staged, "vec_id", "v", 0, 600)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    approx.foreach(r =>
      assert(math.abs(brute(r.getLong(0)) - r.getDouble(1)) < 1e-9))
  }

  test("postings-layout LSH and precomputed PQ codes equal the inline paths") {
    import org.apache.spark.sql.functions.expr
    import org.apache.spark.sql.GraftColumnBridge
    val base = emb.select(col("vec_id"),
      expr("transform(embedding, x -> cast(x AS double))").as("v"))
    val staged = graft.SparkEntry.plantNeighbors(base)
    // the 100 TB layout: exploded postings, query prunes by bucket
    val postings = Similarity.lshPostings(staged, "vec_id", "v")
    assert(postings.columns.toSeq == Seq("vec_id", "bucket"))
    val fromPostings = Similarity
      .lshTopKFromPostings(postings, staged, "vec_id", "v", queryId = 0, k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val inline = Similarity
      .lshTopKMulti(staged, "vec_id", "v", queryId = 0, k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(fromPostings == inline,
      "postings-served LSH must return exactly the inline answer")
    // precomputed codes column = what PqEncode computes inline
    val book = Similarity.pqTrainCodebook(staged, "vec_id", "v", m = 8, kCent = 16)
    val coded = Similarity.pqCodes(staged, "v", book)
    val inlineCodes = staged.withColumn("__codes",
      GraftColumnBridge.column(graft.expressions.PqEncode(
        GraftColumnBridge.expression(col("v")), book)))
    assert(coded.select("vec_id", "__codes").exceptAll(
      inlineCodes.select("vec_id", "__codes")).isEmpty)
  }

  test("id-keyed lookup layout: both layout-served ANN paths equal the inline answers") {
    import java.nio.file.Files
    import org.apache.spark.sql.functions.expr
    val base = emb.select(col("vec_id"),
      expr("transform(embedding, x -> cast(x AS double))").as("v"))
    val staged = graft.SparkEntry.plantNeighbors(base)
    val root = Files.createTempDirectory("graft-lookup-eq").toString
    try {
      Similarity.lshPostings(staged, "vec_id", "v").write.parquet(s"$root/p")
      Similarity.writeVectorLookup(staged, "vec_id", s"$root/l", nBuckets = 32)
      val spark = staged.sparkSession
      val postings = spark.read.parquet(s"$root/p")
      val lookup = spark.read.parquet(s"$root/l")
      // LSH: postings probe + pruned candidate fetch ≡ inline multi-table
      val viaLookup = Similarity.lshTopKFromPostingsLookup(
        postings, lookup, "vec_id", "v", queryId = 0, k = 10, nBuckets = 32)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val inline = Similarity
        .lshTopKMulti(staged, "vec_id", "v", queryId = 0, k = 10)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(viaLookup == inline,
        "lookup-served LSH must return exactly the inline answer")
      // PQ: codes-only ADC scan + lookup refine-read ≡ inline pqTopK
      val book = Similarity.pqTrainCodebook(staged, "vec_id", "v", m = 8, kCent = 16)
      Similarity.pqCodes(staged, "v", book).select("vec_id", "__codes")
        .write.parquet(s"$root/c")
      val viaCodes = Similarity.pqTopKFromCodes(
        spark.read.parquet(s"$root/c"), lookup, "vec_id", "v",
        queryId = 0, k = 10, book, nBuckets = 32)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val inlinePq = Similarity.pqTopK(staged, "vec_id", "v", queryId = 0,
        k = 10, trainedCodebook = Some(book))
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(viaCodes == inlinePq,
        "codes+lookup PQ must return exactly the inline answer")
      // the driver-side bucket hash names exactly the buckets the
      // distributed writer produced (pruning correctness depends on it)
      lookup.select("vec_id", "id_bucket").collect().take(50).foreach { r =>
        assert(Similarity.idBucketOf(r.getLong(0), 32) == r.getInt(1),
          s"driver/executor bucket hash mismatch for id ${r.getLong(0)}")
      }
    } finally graft.GraftSession.deleteRec(new java.io.File(root))
  }

  test("IVF+PQ composed top-k: cell pruning + ADC + exact re-rank recovers plants") {
    import org.apache.spark.sql.functions.{expr, explode}
    val base = emb.select(col("vec_id"),
      expr("transform(embedding, x -> cast(x AS double))").as("v"))
    val staged = graft.SparkEntry.plantNeighbors(base)
    val approx = Similarity.ivfPqTopK(staged, "vec_id", "v",
      queryId = 0, k = 10, nProbe = 8).collect()
    assert(approx.length == 10)
    val exact = Similarity.bruteForceTopK(staged, "vec_id", "v", queryId = 0, k = 10)
      .collect().map(_.getLong(0)).toSet
    val overlap = approx.map(_.getLong(0)).count(exact)
    assert(overlap >= 8, s"IVFPQ recall@10 too low: $overlap/10")
    // the composed path must return strictly fewer-or-equal candidates'
    // worth of work than plain PQ — sanity: results are exact cosines
    val sims = approx.map(_.getDouble(1))
    assert(sims.zip(sims.tail).forall { case (x, y) => x >= y })
  }

  test("semantic dedup: planted paraphrase groups collapse to min-id survivors") {
    import org.apache.spark.sql.functions.expr
    val base = emb.select(col("vec_id"),
      expr("transform(embedding, x -> cast(x AS double))").as("v"))
    // plant: two jittered copies of each of vectors 0..9 (cosine ≈0.995)
    val jitA = base.filter(col("vec_id") < 10)
      .select((col("vec_id") + 1000).as("vec_id"),
        expr("transform(v, (x, i) -> x + 0.1 * element_at(v, 1 + ((i + 1) % size(v))))").as("v"))
    val jitB = base.filter(col("vec_id") < 10)
      .select((col("vec_id") + 2000).as("vec_id"),
        expr("transform(v, (x, i) -> x + 0.1 * element_at(v, 1 + ((i + 2) % size(v))))").as("v"))
    val staged = base.unionByName(jitA).unionByName(jitB)
    val total = staged.count()
    val kept = SemanticDedup.semanticDedup(staged, "vec_id", "v", threshold = 0.9)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val dropped = SemanticDedup.dropList(staged, "vec_id", "v", threshold = 0.9)
      .collect().map(_.getLong(0)).toSet
    assert(kept.intersect(dropped).isEmpty)
    assert(kept.size + dropped.size == total)
    // each planted group keeps exactly its original (minimum) id
    (0L until 10L).foreach { i =>
      assert(kept.contains(i), s"original $i must survive")
      assert(!kept.contains(i + 1000) && !kept.contains(i + 2000),
        s"jittered copies of $i must drop")
    }
    graft.ops.Caches.releaseAll()
  }

  test("per-source quota cap: bound respected, deterministic, unbiased subset") {
    val capped = Sampling.perGroupCap(docs, "doc_id", "source", cap = 3)
    val perSrc = capped.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perSrc.values.forall(_ <= 3))
    val full = docs.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // every source with >= 3 docs is capped at exactly 3; smaller kept whole
    full.foreach { case (s, n) =>
      assert(perSrc(s) == math.min(n, 3L), s"source $s: ${perSrc(s)} of $n")
    }
    // deterministic across runs
    val again = Sampling.perGroupCap(docs, "doc_id", "source", cap = 3)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(again == capped.select("doc_id").collect().map(_.getLong(0)).toSet)
    // not the "first cap ids" — the md5 rank mixes the id space
    val firstIds = docs.orderBy("doc_id").limit(60)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(again != firstIds)
  }

  test("length-bucketed batching: width + size bounds hold, waste accounted") {
    val toks = docs.select(col("doc_id"),
      size(split(trim(col("text")), "\\s+")).as("n_tokens"))
    val batched = Packing.lengthBucketBatches(toks, "doc_id", "n_tokens",
      bucketWidth = 16L, batchSize = 8)
    val rows = batched.collect()
    // every doc's bucket matches its token count; every batch ≤ 8 docs
    rows.foreach { r =>
      val (t, b) = (r.getAs[Int]("n_tokens").toLong, r.getAs[Long]("bucket"))
      assert(b == t / 16)
    }
    val sizes = batched.groupBy("bucket", "batch_idx").count().collect()
    assert(sizes.forall(_.getLong(2) <= 8))
    val stats = Packing.paddingStats(batched, "n_tokens").collect()
    stats.foreach { r =>
      assert(r.getAs[Long]("padded_tokens") >= r.getAs[Long]("real_tokens"))
      val w = r.getAs[Double]("waste_pct")
      assert(w >= 0.0 && w < 100.0)
    }
  }

  test("perplexity buckets: per-stratum equal-count tiers ordered by surprisal") {
    val b = TextAnalysis.perplexityBuckets(docs, "doc_id", "text", "lang", buckets = 3)
      .collect()
    assert(b.map(_.getInt(3)).toSet == Set(1, 2, 3))
    // within a stratum: tier counts differ by at most 1, and every tier-1
    // surprisal <= every tier-3 surprisal
    b.groupBy(_.getString(1)).foreach { case (_, rows) =>
      val byTier = rows.groupBy(_.getInt(3)).view.mapValues(_.length)
      if (rows.length >= 3) {
        assert(byTier.values.max - byTier.values.min <= 1)
        val t1max = rows.filter(_.getInt(3) == 1).map(_.getDouble(2)).max
        val t3min = rows.filter(_.getInt(3) == 3).map(_.getDouble(2)).min
        assert(t1max <= t3min)
      }
    }
  }

  test("multimodal stub pipeline: schema, determinism, partition parallelism") {
    import spark.implicits._
    val media = docs.limit(50)
      .select(col("doc_id").as("media_id"),
        col("text").cast("binary").as("blob"),
        struct(lit("fake/raw").as("format"), lit(8).as("width"),
          lit(8).as("height"), lit(1).as("channels")).as("meta"))
      .repartition(4) // prove the pipeline is partition-parallel
    val out = Multimodal.processMedia(media)
    assert(out.rdd.getNumPartitions == 4)
    val row = out.filter(col("media_id") === 0).collect()(0)
    assert(row.getAs[collection.Seq[Int]]("pixels").length == 64)
    assert(row.getAs[collection.Seq[Float]]("features").length == 4)
    assert(row.getAs[collection.Seq[Array[Byte]]]("frames").length == 4)
    assert(row.getAs[collection.Seq[Int]]("pixels_resized").length == 16)
    assert(row.getAs[String]("blob_sha256").length == 64)
    // determinism of the stub decode
    val again = Multimodal.processMedia(media).filter(col("media_id") === 0).collect()(0)
    assert(again.getAs[collection.Seq[Int]]("pixels") ==
      row.getAs[collection.Seq[Int]]("pixels"))

    // mapPartitions batch-decode path: every row decoded, typed output,
    // deterministic, partition count preserved (no shuffle)
    val decoded = Multimodal.decodeBatches(media, batchSize = 16)
    assert(decoded.rdd.getNumPartitions == 4)
    val d = decoded.collect()
    assert(d.length == 50 && d.forall(_.ok) && d.forall(_.features.length == 4))
    val d0 = d.find(_.media_id == 0).get
    assert(d0.codec == "stub", "text blobs have no JVM image reader")
    val d0again = Multimodal.decodeBatches(media, batchSize = 7)
      .collect().find(_.media_id == 0).get
    assert(d0.features.toSeq == d0again.features.toSeq,
      "decode must not depend on batch boundaries")
  }

  test("batch decode uses the real ImageIO codec for PNG blobs") {
    import spark.implicits._
    // render a real 16x16 PNG in memory: left half black, right white
    def png(splitAt: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(16, 16,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 16; x <- 0 until 16)
        img.setRGB(x, y, if (x < splitAt) 0x000000 else 0xFFFFFF)
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", out)
      out.toByteArray
    }
    val media = Seq((1L, png(8)), (2L, png(16)), (3L, "not an image".getBytes("UTF-8")))
      .toDF("media_id", "blob")
    val d = Multimodal.decodeBatches(media).collect().sortBy(_.media_id)
    assert(d.forall(_.ok))
    assert(d(0).codec == "imageio" && d(1).codec == "imageio")
    assert(d(2).codec == "stub")
    // half black / half white: mean ≈ 0.5, min 0, max 1
    assert(math.abs(d(0).features(0) - 0.5f) < 0.01f, d(0).features.mkString(","))
    assert(d(0).features(2) == 0.0f && d(0).features(3) == 1.0f)
    // all black: mean 0, std 0
    assert(d(1).features(0) == 0.0f && d(1).features(1) == 0.0f)
  }

  test("paragraph dedup: cross-doc boilerplate removed first-wins, order kept") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "Alpha beta.\n\nSHARED licence text.\n\nGamma delta."),
      // licence paragraph (case/space variant) first seen in doc 1 → dropped
      (2L, "Epsilon.\n\n  shared LICENCE text.  "),
      // every paragraph seen earlier → the whole document vanishes
      (3L, "shared licence text.\n\nEpsilon."),
      // intra-document repetition: second copy dropped too
      (4L, "Zeta.\n\nZeta.\n\nEta.")
    ).toDF("doc_id", "text")
    val out = TextDedup.paragraphDedup(corpus, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) === "Alpha beta.\n\nSHARED licence text.\n\nGamma delta.")
    assert(out(2L) === "Epsilon.")
    assert(!out.contains(3L), s"doc 3 must vanish entirely: $out")
    assert(out(4L) === "Zeta.\n\nEta.")
    // surviving paragraphs keep their ORIGINAL (un-normalized) text
    assert(out(1L).contains("SHARED licence text."))
  }

  test("unigram surprisal: rare-token docs score high, exact on a tiny corpus") {
    import spark.implicits._
    // corpus tokens: a a a b → p(a)=3/4, p(b)=1/4
    val corpus = Seq((1L, "a a a"), (2L, "b")).toDF("doc_id", "text")
    val out = TextAnalysis.unigramSurprisal(corpus, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out(1L) === (3L, BigDecimal(-math.log(0.75)).setScale(4,
      BigDecimal.RoundingMode.HALF_UP).toDouble))
    assert(out(2L) === (1L, BigDecimal(-math.log(0.25)).setScale(4,
      BigDecimal.RoundingMode.HALF_UP).toDouble))
    assert(out(2L)._2 > out(1L)._2, "rare-token doc must score higher")
  }

  test("unigram surprisal: shuffle-join fallback past the broadcast bound " +
    "matches the broadcast plan") {
    import spark.implicits._
    val corpus = Seq((1L, "a a a b c"), (2L, "b d d"), (3L, "e")).toDF("doc_id", "text")
    def run(bound: Long) =
      TextAnalysis.unigramSurprisal(corpus, "doc_id", "text",
        maxBroadcastVocab = bound)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // vocab here is 5 distinct tokens: bound=1 forces the shuffled join
    assert(run(1L) === run(1000000L))
  }

  test("BM25: tf, idf and length normalization behave; exact on a tiny corpus") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "cat cat dog"),      // two query-term hits, short
      (2L, "cat bird bird bird bird bird"), // one hit, long
      (3L, "dog mouse"),        // one hit of the rarer term
      (4L, "bird bird")         // no query terms → absent
    ).toDF("doc_id", "text")
    val got = Retrieval.bm25TopK(corpus, "doc_id", "text", "cat dog", k = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1))
    assert(got.map(_._1).toSet === Set(1L, 2L, 3L), "doc 4 has no query terms")

    // closed-form replay of the same formula
    val n = 4.0; val avgdl = (3 + 6 + 2 + 2) / 4.0
    def idf(df: Double) = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
    def part(tf: Double, dl: Double, idfV: Double) =
      idfV * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))
    def r4(x: Double) = BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val exp = Map(
      1L -> r4(part(2, 3, idf(2)) + part(1, 3, idf(2))),
      2L -> r4(part(1, 6, idf(2))),
      3L -> r4(part(1, 2, idf(2))))
    got.foreach { case (id, s) => assert(s === exp(id), s"doc $id") }
    // ranking: doc 1 (two hits, short) on top; doc 3 beats doc 2 (shorter)
    assert(got.map(_._1).toSeq === Seq(1L, 3L, 2L))
  }

  test("repeated-span dedup: cross-doc span, intra-doc repeat, case-fold, short docs, full wipe") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "a b c d e f g h"),             // owns the first "a b c d e"
      (2L, "x y a b c d e z"),             // loses the shared 5-token span
      (3L, "p q r s t u p q r s t u"),     // intra-doc: second copy removed
      (4L, "A B C D E"),                   // case-folded full wipe
      (5L, "hello world")                  // < k tokens: untouched
    ).toDF("doc_id", "text")
    val got = TextDedup.repeatedSpanDedup(corpus, "doc_id", "text", k = 5)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got(1L) == (("a b c d e f g h", 8L, 0L)), "first occurrence keeps its span")
    assert(got(2L) == (("x y z", 3L, 5L)), "non-first occurrence loses exactly the span")
    assert(got(3L) == (("p q r s t u", 6L, 6L)), "intra-doc repeat keeps only the first copy")
    assert(got(4L) == (("", 0L, 5L)), "case-insensitive match, original casing elsewhere")
    assert(got(5L) == (("hello world", 2L, 0L)), "short docs pass through")
    // idempotent: a deduped corpus (empty docs dropped, per the contract)
    // has no duplicated spans left
    val again = TextDedup.repeatedSpanDedup(
      TextDedup.repeatedSpanDedup(corpus, "doc_id", "text", k = 5)
        .filter(col("n_kept") > 0).select("doc_id", "text"),
      "doc_id", "text", k = 5)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(again == got.view.mapValues(_._1).toMap - 4L)
  }

  test("quality classifier: separable vocabularies learned exactly, deterministic, scoring map-shaped") {
    import spark.implicits._
    // two disjoint vocabularies: a trained filter must separate them fully
    val hi = (0L until 60L).map(i => (i, s"insight analysis rigorous study method evidence v$i", 1.0))
    val lo = (60L until 120L).map(i => (i, s"click spam free winner prize buy now v$i", 0.0))
    val seed = (hi ++ lo).toDF("doc_id", "text", "label")
    val train = seed.filter($"doc_id" % 2 === 0)
    val eval = seed.filter($"doc_id" % 2 === 1)
    val model = QualityClassifier.train(train, "text", "label")
    val scored = QualityClassifier.score(model, eval, "doc_id", "text")
      .join(eval.select($"doc_id", $"label"), "doc_id")
    val acc = scored
      .agg(avg(when(($"quality_prob" >= 0.5) === ($"label" === 1.0), 1.0)
        .otherwise(0.0))).head().getDouble(0)
    assert(acc == 1.0, s"disjoint vocabularies must separate perfectly, got $acc")
    // deterministic: retraining yields identical probabilities
    val again = QualityClassifier.score(
      QualityClassifier.train(train, "text", "label"), eval, "doc_id", "text")
    val diff = scored.select("doc_id", "quality_prob")
      .join(again.withColumnRenamed("quality_prob", "p2"), "doc_id")
      .agg(max(abs($"quality_prob" - $"p2"))).head().getDouble(0)
    assert(diff == 0.0, s"training must be deterministic, max prob diff $diff")
  }

  test("hard negatives: different-label only, exact cosine order, bound k, anchor excluded") {
    import spark.implicits._
    // anchor (0, [1,0]) label 0; planted same/different-label neighbors
    val corpus = Seq(
      (0L, Array(1f, 0f), 0),    // anchor
      (1L, Array(1f, 0.01f), 0), // nearest of all — but SAME label: excluded
      (2L, Array(1f, 0.1f), 1),  // hardest negative
      (3L, Array(1f, 0.4f), 1),  // second
      (4L, Array(0f, 1f), 2),    // orthogonal: last
      (5L, Array(-1f, 0f), 0)    // same label again: excluded
    ).toDF("vec_id", "embedding", "label")
    val got = Similarity.hardNegatives(corpus,
      corpus.filter($"vec_id" === 0), "vec_id", "embedding", "label", k = 2)
      .orderBy($"cosine".desc).collect()
      .map(r => (r.getLong(1), r.getInt(2)))
    assert(got.toSeq == Seq((2L, 1), (3L, 1)),
      s"expected the two hardest different-label negatives, got ${got.toSeq}")
    // k bounds output per anchor even with more candidates
    val all = Similarity.hardNegatives(corpus,
      corpus.filter($"vec_id" === 0), "vec_id", "embedding", "label", k = 10)
      .collect()
    assert(all.length == 3 && !all.map(_.getLong(1)).contains(1L) &&
      !all.map(_.getLong(1)).contains(5L) && !all.map(_.getLong(1)).contains(0L))
  }

  test("epoch mix: integer copies exact, fractional rate accurate, map-only, deterministic") {
    import spark.implicits._
    val n = 10000
    val df = spark.range(0, n)
      .withColumn("stratum", when(col("id") % 2 === 0, "a").otherwise("b"))
    val mixed = Sampling.epochMix(df, "id", "stratum",
      epochs = Map("a" -> 2.5, "b" -> 0.25))
    val counts = mixed.groupBy("stratum").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // stratum a: every row 2 or 3 times, mean 2.5
    assert(math.abs(counts("a") - 2.5 * n / 2) < n * 0.02, counts.toString)
    val perRow = mixed.filter($"stratum" === "a").groupBy("id").count()
      .select("count").distinct().collect().map(_.getLong(0)).toSet
    assert(perRow == Set(2L, 3L), "2.5 epochs = 2 or 3 copies per row, never else")
    // stratum b: 25% of rows once, copy index always 1
    assert(math.abs(counts("b") - 0.25 * n / 2) < n * 0.02, counts.toString)
    assert(mixed.filter($"stratum" === "b").agg(max("copy")).head().getInt(0) == 1)
    // deterministic across runs
    val again = Sampling.epochMix(df, "id", "stratum", Map("a" -> 2.5, "b" -> 0.25))
    assert(mixed.exceptAll(again).isEmpty && again.exceptAll(mixed).isEmpty)
    // map-only: no exchange in the plan
    val plan = mixed.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"epoch mix must not shuffle:\n$plan")
  }

  test("token chunking: window bounds, overlap, tail rule, map-only plan") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9"), // 10 toks, max 4, ov 1 -> 3 chunks
      (2L, "a b c d e"),                     // 5 toks, max 4, ov 2 -> 2 chunks
      (3L, "x y")                            // under max -> 1 chunk
    ).toDF("doc_id", "text")
    val got = Packing.chunkTokens(corpus, "doc_id", "text", maxTokens = 4, overlap = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> ((r.getString(2), r.getLong(3)))).toMap
    assert(got((1L, 0L)) == (("t0 t1 t2 t3", 4L)))
    assert(got((1L, 1L)) == (("t3 t4 t5 t6", 4L)), "consecutive chunks share `overlap` tokens")
    assert(got((1L, 2L)) == (("t6 t7 t8 t9", 4L)))
    assert(!got.contains((1L, 3L)), "no fully-contained tail chunk")
    assert(got((3L, 0L)) == (("x y", 2L)), "short docs give one short chunk")
    val ov2 = Packing.chunkTokens(corpus.filter($"doc_id" === 2), "doc_id", "text",
      maxTokens = 4, overlap = 2).collect()
      .map(r => r.getLong(1) -> ((r.getString(2), r.getLong(3)))).toMap
    assert(ov2 == Map(0L -> (("a b c d", 4L)), 1L -> (("c d e", 3L))),
      "tail chunk emitted only when it adds tokens; its n_tokens is the remainder")
    // empty / whitespace-only docs: one empty chunk, ZERO tokens (no
    // phantom ""-token), so downstream token budgets stay exact
    val empties = Seq((7L, ""), (8L, "   ")).toDF("doc_id", "text")
    val echunks = Packing.chunkTokens(empties, "doc_id", "text", 4, 1)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2), r.getLong(3))))
    assert(echunks.toMap == Map(7L -> ((0L, "", 0L)), 8L -> ((0L, "", 0L))))
    // map-only: the chunking plan has no exchange
    val plan = Packing.chunkTokens(corpus, "doc_id", "text", 4, 1)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"chunking must not shuffle:\n$plan")
  }

  test("shuffle-shards export: partition of the corpus, contiguous pos, deterministic, seed-sensitive") {
    val n = docs.count()
    val sharded = Sampling.shuffleShards(docs, "doc_id", numShards = 8, seed = 7L)
      .select("doc_id", "shard", "pos").cache()
    try {
      val rows = sharded.collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      // a PARTITION: every row exactly once, shard within bounds
      assert(rows.length.toLong == n)
      assert(rows.map(_._1).distinct.length.toLong == n)
      assert(rows.forall(r => r._2 >= 0 && r._2 < 8))
      // pos is contiguous 0..size-1 within each shard (a loader can seek)
      rows.groupBy(_._2).foreach { case (shard, g) =>
        assert(g.map(_._3).sorted.toSeq == (0L until g.length.toLong),
          s"shard $shard positions not contiguous")
      }
      // md5 key spreads uniformly: no shard hogs the corpus
      val sizes = rows.groupBy(_._2).values.map(_.length)
      assert(sizes.max < 2 * (n / 8 + 1).toInt, s"skewed shards: $sizes")
      // deterministic: the same seed replays the identical permutation
      val again = Sampling.shuffleShards(docs, "doc_id", numShards = 8, seed = 7L)
        .select("doc_id", "shard", "pos").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      assert(again.sortBy(_._1).toSeq == rows.sortBy(_._1).toSeq)
      // a different seed is a different permutation
      val other = Sampling.shuffleShards(docs, "doc_id", numShards = 8, seed = 8L)
        .select("doc_id", "shard", "pos").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      assert(other.sortBy(_._1).toSeq != rows.sortBy(_._1).toSeq)
      // and NOT id order: the hash mixes the id space within shards
      val shard0 = rows.filter(_._2 == 0).sortBy(_._3).map(_._1).toSeq
      assert(shard0 != shard0.sorted, "in-shard order must be shuffled, not id order")
    } finally { sharded.unpersist(): Unit }
  }
}
