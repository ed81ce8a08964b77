package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expressions for the dedup sketches (SURVEY.md §7.6).
  *
  * The SQL higher-order-function formulations of these signatures are
  * interpreted per lambda step and allocate an array per fold element —
  * measured ~20 s for 5000 docs (SimHash) and ~15 s (MinHash) at sf0.1.
  * These expressions run the same math as a tight JVM loop inside
  * whole-stage codegen (`doGenCode` emits a static call), cutting the
  * signature stage to milliseconds and keeping the surrounding
  * projection codegen'd.
  */

/** 64-bit SimHash signature of an array<bigint> of feature hashes:
  * bit b of the result = sign of Σ_features (±1 by feature-hash bit b). */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_simhash64 requires array<bigint>, got ${other.sql}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash64"

  override def nullSafeEval(input: Any): Any =
    SimHash64.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.SimHash64.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {
  /** Static so generated code can call it. */
  def compute(arr: ArrayData): Long = {
    val counts = new Array[Int](64)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val h = arr.getLong(i)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      sig = (sig << 1) | (if (counts(b) >= 0) 1L else 0L)
      b += 1
    }
    sig
  }
}

/** Distinct word n-gram shingle HASHES of a text column in one call:
  * lowercase, whitespace-tokenize, xxhash64 each token, hash-combine
  * every run of `n` consecutive token hashes, dedup. Replaces a
  * split/transform/sequence/array_distinct HOF tree whose interpreted
  * evaluation AND Janino compilation dominated the sketch pipelines'
  * first-run cost. Texts shorter than `n` tokens yield an empty array. */
case class HashedShingles(child: Expression, n: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case org.apache.spark.sql.types.StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_hashed_shingles requires string, got ${other.sql}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_hashed_shingles"

  override def nullSafeEval(input: Any): Any =
    HashedShingles.compute(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.HashedShingles.compute($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): HashedShingles =
    copy(child = newChild)
}

object HashedShingles {
  import org.apache.spark.sql.catalyst.expressions.XXH64
  import org.apache.spark.unsafe.types.UTF8String

  private val Seed = 42L

  /** Static so generated code can call it. */
  def compute(text: UTF8String, n: Int): ArrayData = {
    val s = text.toString.trim.toLowerCase
    if (s.isEmpty) return new GenericArrayData(Array.emptyLongArray)
    val words = s.split("\\s+")
    if (words.length < n) return new GenericArrayData(Array.emptyLongArray)
    // per-word hash, then combine n consecutive word hashes per shingle
    val wh = new Array[Long](words.length)
    var i = 0
    while (i < words.length) {
      val b = words(i).getBytes("UTF-8")
      wh(i) = XXH64.hashUnsafeBytes(b, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, b.length, Seed)
      i += 1
    }
    val out = new Array[Long](words.length - n + 1)
    i = 0
    while (i < out.length) {
      var h = Seed
      var k = 0
      while (k < n) { h = XXH64.hashLong(wh(i + k), h); k += 1 }
      out(i) = h
      i += 1
    }
    // distinct (order-preserving; shingle sets are small)
    val seen = new java.util.HashSet[java.lang.Long](out.length * 2)
    val dedup = new Array[Long](out.length)
    var m = 0
    i = 0
    while (i < out.length) {
      if (seen.add(out(i))) { dedup(m) = out(i); m += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(dedup, m))
  }
}

/** POSITIONAL k-gram hashes of a token array: lowercase + xxhash64
  * each token, then seed-chain every run of `k` consecutive token
  * hashes — `out(i)` is the hash of tokens `i..i+k-1`. Unlike
  * [[HashedShingles]] (which takes raw text, dedups, and drops
  * positions — the sketch shape), this keeps one slot PER POSITION so
  * span dedup can map a duplicated gram back to the exact token range
  * it covers. The output length equals the input length; the last
  * `k−1` slots hold partial folds (fewer than k tokens remain) and
  * must be cut by the caller's `pos <= n−k` filter. Taking the
  * ALREADY-SPLIT token array (not raw text) keeps tokenization and
  * position numbering exactly the caller's own, so the reassembly
  * zip_with can never misalign. Replaces k−1 chained zip_with HOFs
  * whose interpreted, boxing evaluation measured ~2× the whole
  * operator at 30k docs. Null tokens (not produced by split+filter,
  * but legal in the type) hash as the empty string. */
case class GramHashes(child: Expression, k: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.StringType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_gram_hashes requires array<string>, got ${other.sql}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_gram_hashes"

  override def nullSafeEval(input: Any): Any =
    GramHashes.compute(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.GramHashes.compute($c, $k);")

  override protected def withNewChildInternal(newChild: Expression): GramHashes =
    copy(child = newChild)
}

object GramHashes {
  import org.apache.spark.sql.catalyst.expressions.XXH64

  private val Seed = 42L

  /** Static so generated code can call it. */
  def compute(toks: ArrayData, k: Int): ArrayData = {
    val n = toks.numElements()
    val th = new Array[Long](n)
    var i = 0
    while (i < n) {
      val t = toks.getUTF8String(i)
      th(i) =
        if (t == null) XXH64.hashUTF8String(
          org.apache.spark.unsafe.types.UTF8String.EMPTY_UTF8, Seed)
        else XXH64.hashUTF8String(t.toLowerCase, Seed)
      i += 1
    }
    val out = new Array[Long](n)
    i = 0
    while (i < n) {
      var h = Seed
      var j = 0
      while (j < k && i + j < n) { h = XXH64.hashLong(th(i + j), h); j += 1 }
      out(i) = h
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Span-coverage flags for repeated-span dedup: given the SORTED
  * 0-based start positions of duplicated k-grams in a document of `n`
  * tokens, `out(p)` = whether token p lies inside any span
  * [s, s+k-1]. One two-pointer pass (O(n + starts)): the running
  * maximum start ≤ p covers p iff it is ≥ p−k+1 — the same running-
  * max-of-span-end rule the former id-keyed window computed, now per
  * DOCUMENT ROW instead of per exploded token row. That window was an
  * exchange + sort of the entire (id, pos) position stream (~1.2B
  * narrow rows at 9M docs) followed by a corpus-wide collect_list
  * re-aggregation; this expression replaces both with a join of the
  * per-doc sorted starts (∝ duplicated positions only) back onto the
  * cached token frame. Unsorted starts would silently under-cover —
  * callers must sort_array first. */
case class SpanCoverage(starts: Expression, n: Expression, k: Int)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def left: Expression = starts
  override def right: Expression = n
  override def checkInputDataTypes(): TypeCheckResult =
    (starts.dataType, n.dataType) match {
      case (ArrayType(org.apache.spark.sql.types.IntegerType, _),
            org.apache.spark.sql.types.IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_span_coverage requires (array<int>, int), got $other")
    }
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.BooleanType, containsNull = false)
  override def prettyName: String = "graft_span_coverage"

  override def nullSafeEval(startsV: Any, nV: Any): Any =
    SpanCoverage.compute(
      startsV.asInstanceOf[ArrayData], nV.asInstanceOf[Int], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, nn) =>
      s"${ev.value} = graft.expressions.SpanCoverage.compute($s, $nn, $k);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SpanCoverage =
    copy(starts = newLeft, n = newRight)
}

object SpanCoverage {
  /** Static so generated code can call it. */
  def compute(starts: ArrayData, n: Int, k: Int): ArrayData = {
    val out = new Array[Boolean](n)
    val m = starts.numElements()
    var ptr = 0
    var lastStart = Int.MinValue
    var p = 0
    while (p < n) {
      while (ptr < m && starts.getInt(ptr) <= p) {
        lastStart = starts.getInt(ptr) // sorted: each is the max so far
        ptr += 1
      }
      out(p) = lastStart >= p - k + 1
      p += 1
    }
    new GenericArrayData(out)
  }
}

/** Cosine similarity of two array<float|double> columns as one codegen'd
  * JVM loop. The zip_with + aggregate SQL formulation it replaces is
  * interpreted per element — at 12.5M candidate pairs × 64 dims that
  * measured ~66 s; this runs it in ~2 s. */
case class CosineSim(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  private def okType(dt: DataType): Boolean = dt match {
    case ArrayType(org.apache.spark.sql.types.FloatType, _) |
         ArrayType(org.apache.spark.sql.types.DoubleType, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): TypeCheckResult =
    if (okType(left.dataType) && okType(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_cosine requires array<float|double>, got ${left.dataType.sql}, ${right.dataType.sql}")

  override def dataType: DataType = org.apache.spark.sql.types.DoubleType
  override def prettyName: String = "graft_cosine"

  private def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(org.apache.spark.sql.types.FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(l: Any, r: Any): Any =
    CosineSim.compute(l.asInstanceOf[ArrayData], isFloat(left),
      r.asInstanceOf[ArrayData], isFloat(right))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) =>
      s"${ev.value} = graft.expressions.CosineSim.compute($l, ${isFloat(left)}, $r, ${isFloat(right)});")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}

object CosineSim {
  /** Static so generated code can call it. */
  def compute(a: ArrayData, aFloat: Boolean, b: ArrayData, bFloat: Boolean): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }
}

/** Random-hyperplane LSH bucket keys for an embedding column
  * (array<float> or array<double>): `tables` independent signatures of
  * `bits` sign-bits each, every signature hashed with its table index
  * into one bucket key — the classic OR-of-ANDs construction. Two
  * vectors are candidates when ANY table's full signature matches.
  * Plane components are drawn from a seeded per-plane generator and
  * cached per (dim, planes, seed). */
case class RandProjBuckets(child: Expression, tables: Int, bits: Int, seed: Long)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.FloatType, _) |
         ArrayType(org.apache.spark.sql.types.DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_randproj_buckets requires array<float|double>, got ${other.sql}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_randproj_buckets"

  private lazy val isFloat = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(input: Any): Any =
    RandProjBuckets.compute(input.asInstanceOf[ArrayData], isFloat, tables, bits, seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.RandProjBuckets.compute($c, $isFloat, $tables, $bits, ${seed}L);")

  override protected def withNewChildInternal(newChild: Expression): RandProjBuckets =
    copy(child = newChild)
}

object RandProjBuckets {
  import org.apache.spark.sql.catalyst.expressions.XXH64

  private val planeCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int, Long), Array[Array[Double]]]()

  /** `n` unit-free random planes of `dim` components, seeded per plane. */
  def planes(dim: Int, n: Int, seed: Long): Array[Array[Double]] =
    planeCache.computeIfAbsent((dim, n, seed), { _ =>
      Array.tabulate(n) { p =>
        val rnd = new java.util.Random(seed * 1315423911L + p)
        Array.fill(dim)(rnd.nextGaussian())
      }
    })

  /** Static so generated code can call it. */
  def compute(arr: ArrayData, isFloat: Boolean, tables: Int, bits: Int, seed: Long): ArrayData = {
    val dim = arr.numElements()
    val v = new Array[Double](dim)
    var i = 0
    while (i < dim) {
      v(i) = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
      i += 1
    }
    val ps = planes(dim, tables * bits, seed)
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var sig = 0L
      var b = 0
      while (b < bits) {
        val plane = ps(t * bits + b)
        var dot = 0.0
        i = 0
        while (i < dim) { dot += v(i) * plane(i); i += 1 }
        sig = (sig << 1) | (if (dot >= 0) 1L else 0L)
        b += 1
      }
      out(t) = XXH64.hashLong(sig, seed + t)
      t += 1
    }
    new GenericArrayData(out)
  }
}

/** RAW `planes`-bit random-hyperplane signature of an embedding column,
  * packed into one long (bit b = sign of dot(vec, plane_b)) — the
  * single-table building block behind [[RandProjBuckets]], exposed
  * unhashed so callers can Hamming-multiprobe neighboring buckets
  * (flip bits of the query signature). Shares the same seeded plane
  * cache. */
case class RandProjSig(child: Expression, planes: Int, seed: Long)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.FloatType, _) |
         ArrayType(org.apache.spark.sql.types.DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_randproj_sig requires array<float|double>, got ${other.sql}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_randproj_sig"

  private lazy val isFloat = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(input: Any): Any =
    RandProjSig.compute(input.asInstanceOf[ArrayData], isFloat, planes, seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.RandProjSig.compute($c, $isFloat, $planes, ${seed}L);")

  override protected def withNewChildInternal(newChild: Expression): RandProjSig =
    copy(child = newChild)
}

object RandProjSig {
  /** Static so generated code can call it. */
  def compute(arr: ArrayData, isFloat: Boolean, planes: Int, seed: Long): Long = {
    val dim = arr.numElements()
    val v = new Array[Double](dim)
    var i = 0
    while (i < dim) {
      v(i) = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
      i += 1
    }
    val ps = RandProjBuckets.planes(dim, planes, seed)
    var sig = 0L
    var b = 0
    while (b < planes) {
      val plane = ps(b)
      var dot = 0.0
      i = 0
      while (i < dim) { dot += v(i) * plane(i); i += 1 }
      sig = (sig << 1) | (if (dot >= 0) 1L else 0L)
      b += 1
    }
    sig
  }
}

/** Index of the nearest (by cosine) centroid for an embedding column —
  * the IVF assignment step. The centroid matrix rides in the expression
  * (serialized with the plan; K × dim doubles, driver-bounded). */
case class NearestCentroid(child: Expression, centroids: Seq[Seq[Double]])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.FloatType, _) |
         ArrayType(org.apache.spark.sql.types.DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_nearest_centroid requires array<float|double>, got ${other.sql}")
  }
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def prettyName: String = "graft_nearest_centroid"

  private lazy val isFloat = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.FloatType, _) => true
    case _ => false
  }
  @transient private lazy val matrix: Array[Array[Double]] =
    centroids.map(_.toArray).toArray

  override def nullSafeEval(input: Any): Any =
    NearestCentroid.compute(input.asInstanceOf[ArrayData], isFloat, matrix)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mRef = ctx.addReferenceObj("centroidMatrix", matrix, "double[][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.NearestCentroid.compute($c, $isFloat, $mRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroid =
    copy(child = newChild)
}

object NearestCentroid {
  /** Static so generated code can call it. */
  def compute(arr: ArrayData, isFloat: Boolean, centroids: Array[Array[Double]]): Int = {
    val dim = arr.numElements()
    val v = new Array[Double](dim)
    var norm = 0.0
    var i = 0
    while (i < dim) {
      v(i) = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
      norm += v(i) * v(i)
      i += 1
    }
    var best = 0
    var bestSim = Double.NegativeInfinity
    var c = 0
    while (c < centroids.length) {
      val cv = centroids(c)
      var dot = 0.0
      var cn = 0.0
      i = 0
      val n = math.min(dim, cv.length)
      while (i < n) { dot += v(i) * cv(i); cn += cv(i) * cv(i); i += 1 }
      val sim = dot / (math.sqrt(norm) * math.sqrt(cn))
      if (sim > bestSim) { bestSim = sim; best = c }
      c += 1
    }
    best
  }
}

/** MinHash signature of an array<bigint> of shingle hashes: element i =
  * min over shingles of h_i(x) = (a_i·x + b_i) mod p, p = 2³¹-1, with
  * (a_i, b_i) drawn from a seeded generator — value-identical to the SQL
  * formulation it replaces (same coefficients, same wrap-around + floorMod
  * semantics). Callers filter empty shingle arrays out first (an empty
  * input would yield Long.MaxValue per slot). */
case class MinHashSig(child: Expression, numHashes: Int, seed: Long)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_minhash_sig requires array<bigint>, got ${other.sql}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash_sig"

  override def nullSafeEval(input: Any): Any =
    MinHashSig.compute(input.asInstanceOf[ArrayData], numHashes, seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.MinHashSig.compute($c, $numHashes, ${seed}L);")

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {
  val Prime = 2147483647L // 2^31 - 1

  private val coeffCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Long), (Array[Long], Array[Long])]()

  /** Seeded (a_i, b_i) pairs — the exact generation the SQL variant used. */
  def coefficients(numHashes: Int, seed: Long): (Array[Long], Array[Long]) =
    coeffCache.computeIfAbsent((numHashes, seed), { _ =>
      val rnd = new scala.util.Random(seed)
      val as = new Array[Long](numHashes)
      val bs = new Array[Long](numHashes)
      var i = 0
      while (i < numHashes) {
        as(i) = 1L + rnd.nextLong().abs % (Prime - 1)
        bs(i) = rnd.nextLong().abs % Prime
        i += 1
      }
      (as, bs)
    })

  /** Static so generated code can call it. */
  def compute(arr: ArrayData, numHashes: Int, seed: Long): ArrayData = {
    val (as, bs) = coefficients(numHashes, seed)
    val mins = new Array[Long](numHashes)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val h = arr.getLong(i)
      var k = 0
      while (k < numHashes) {
        val v = java.lang.Math.floorMod(as(k) * h + bs(k), Prime)
        if (v < mins(k)) mins(k) = v
        k += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }
}

/** LSH band hashes of a minhash signature: the signature is cut into
  * `numElements/bandRows` consecutive bands and each band's rows are
  * mixed (with the band index) into one 32-bit bucket key.
  *
  * Exists as a native expression because the SQL formulation —
  * `transform(sequence(0, b-1), b -> hash(b, slice(sig, ...)))` — is a
  * higher-order function: Catalyst inlines the full signature expression
  * into the lambda body (CollapseProject) and evaluates it INTERPRETED
  * once PER BAND, recomputing the shingle + minhash pipeline 64× per row
  * (thread-dump verified; the 30× ScaleBench run spent its whole budget
  * there). A UnaryExpression evaluates its child exactly once and keeps
  * the projection inside whole-stage codegen.
  *
  * The mix is a xor/multiply avalanche (splitmix64 finalizer) seeded
  * with the band index, so distinct bands collide only at 32-bit-random
  * rates. Band key VALUES differ from the old `hash(b, slice(...))`
  * formulation — candidate sets shift at random-collision rate only;
  * the operator's exact-Jaccard verification makes the output
  * value-identical. */
case class BandHashes(child: Expression, bandRows: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_band_hashes requires array<bigint>, got ${other.sql}")
  }
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.IntegerType, containsNull = false)
  override def prettyName: String = "graft_band_hashes"

  override def nullSafeEval(input: Any): Any =
    BandHashes.compute(input.asInstanceOf[ArrayData], bandRows)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.BandHashes.compute($c, $bandRows);")

  override protected def withNewChildInternal(newChild: Expression): BandHashes =
    copy(child = newChild)
}

object BandHashes {
  private def mix64(z0: Long): Long = {
    var z = z0
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Static so generated code can call it. */
  def compute(sig: ArrayData, bandRows: Int): ArrayData = {
    val numBands = sig.numElements() / bandRows
    val out = new Array[Int](numBands)
    var b = 0
    while (b < numBands) {
      var h = mix64(0x9e3779b97f4a7c15L + b)
      var r = 0
      while (r < bandRows) {
        h = mix64(h ^ sig.getLong(b * bandRows + r))
        r += 1
      }
      out(b) = (h ^ (h >>> 32)).toInt
      b += 1
    }
    new GenericArrayData(out)
  }
}

/** MinHash signature packed to ONE BYTE PER SLOT: slot i's value is
  * avalanche-mixed (splitmix64 finalizer) and its low byte lands in
  * byte (i mod 8) of output long (i / 8) — a 128-slot signature
  * becomes 16 longs (128 bytes), 8× narrower than the raw
  * array<bigint> signature it summarizes.
  *
  * Exists for the estimated-Jaccard prefilter in
  * [[graft.ops.TextDedup.minHashLshPairs]]: the prefilter joins carry
  * one packed signature per candidate side, and byte agreement
  * (via [[PackedByteAgreement]]) estimates slot agreement — two slots
  * that truly agree always map to equal bytes; two DIFFERING slots
  * false-agree at 1/256 per slot (the mix makes that rate hold even
  * for numerically close minhash values), a bias the prefilter cutoff
  * accounts for. */
case class PackSigBytes(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_pack_sig_bytes requires array<bigint>, got ${other.sql}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_pack_sig_bytes"

  override def nullSafeEval(input: Any): Any =
    PackSigBytes.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.PackSigBytes.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): PackSigBytes =
    copy(child = newChild)
}

object PackSigBytes {
  private def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Static so generated code can call it. */
  def compute(sig: ArrayData): ArrayData = {
    val n = sig.numElements()
    val out = new Array[Long]((n + 7) / 8)
    var i = 0
    while (i < n) {
      val b = mix64(sig.getLong(i)) & 0xFFL
      out(i >>> 3) |= b << ((i & 7) << 3)
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Count of EQUAL BYTE POSITIONS between two byte-packed signatures
  * (outputs of [[PackSigBytes]]) — the slot-agreement count the
  * estimated-Jaccard prefilter thresholds on. An exact per-byte loop,
  * NOT the SWAR zero-byte trick ((v-0x01…)&~v&0x80…), which
  * over-counts: a 0x01 byte directly above a zero byte absorbs the
  * subtraction borrow and flags as zero too. Arrays of unequal length
  * compare over the shorter prefix (callers produce fixed-width
  * signatures, so lengths always match in practice). */
case class PackedByteAgreement(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  private def okType(dt: DataType): Boolean = dt match {
    case ArrayType(LongType, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): TypeCheckResult =
    if (okType(left.dataType) && okType(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_packed_byte_agreement requires array<bigint>, got ${left.dataType.sql}, ${right.dataType.sql}")

  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def prettyName: String = "graft_packed_byte_agreement"

  override def nullSafeEval(l: Any, r: Any): Any =
    PackedByteAgreement.compute(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) =>
      s"${ev.value} = graft.expressions.PackedByteAgreement.compute($l, $r);")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): PackedByteAgreement =
    copy(left = newLeft, right = newRight)
}

object PackedByteAgreement {
  /** Static so generated code can call it. */
  def compute(a: ArrayData, b: ArrayData): Int = {
    val n = math.min(a.numElements(), b.numElements())
    var agree = 0
    var i = 0
    while (i < n) {
      var x = a.getLong(i)
      var y = b.getLong(i)
      var k = 0
      while (k < 8) {
        if ((x & 0xFFL) == (y & 0xFFL)) agree += 1
        x >>>= 8
        y >>>= 8
        k += 1
      }
      i += 1
    }
    agree
  }
}
