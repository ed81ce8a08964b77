package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Native Catalyst expressions for product-quantized (PQ) similarity
  * search (SURVEY.md §7.6 family) — the FAISS-style compressed ANN scan:
  * vectors are L2-normalized and split into M contiguous sub-vectors;
  * each sub-vector is replaced by the index of its nearest sub-codebook
  * centroid (M small ints per vector instead of `dim` floats), and a
  * query scores a code row by summing M lookup-table entries built once
  * from the query vector (asymmetric distance computation).
  *
  * Both steps are map-only, codegen'd tight loops; the codebook
  * (M × K × dim/M doubles) and the per-query LUT (M × K doubles) ride
  * in the expression via `addReferenceObj` — bounded driver/plan state,
  * exactly like [[NearestCentroid]].
  */

/** PQ code assignment: array<float|double> → array<int> of length M.
  * Input is L2-normalized internally so inner product ≡ cosine; each
  * sub-vector takes the index of the sub-centroid with minimal L2
  * distance (the standard PQ assignment rule). */
case class PqEncode(child: Expression, codebook: Seq[Seq[Seq[Double]]])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.FloatType, _) |
         ArrayType(org.apache.spark.sql.types.DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_pq_encode requires array<float|double>, got ${other.sql}")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_pq_encode"

  private lazy val isFloat = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.FloatType, _) => true
    case _ => false
  }
  @transient private lazy val book: Array[Array[Array[Double]]] =
    codebook.map(_.map(_.toArray).toArray).toArray

  override def nullSafeEval(input: Any): Any =
    PqEncode.compute(input.asInstanceOf[ArrayData], isFloat, book)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bRef = ctx.addReferenceObj("pqCodebook", book, "double[][][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.PqEncode.compute($c, $isFloat, $bRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

object PqEncode {
  /** L2-normalize `arr` into a double array (zero vector stays zero). */
  private[expressions] def normalized(arr: ArrayData, isFloat: Boolean): Array[Double] = {
    val dim = arr.numElements()
    val v = new Array[Double](dim)
    var norm = 0.0
    var i = 0
    while (i < dim) {
      v(i) = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
      norm += v(i) * v(i)
      i += 1
    }
    if (norm > 0) {
      val inv = 1.0 / math.sqrt(norm)
      i = 0
      while (i < dim) { v(i) *= inv; i += 1 }
    }
    v
  }

  /** Static so generated code can call it. */
  def compute(arr: ArrayData, isFloat: Boolean,
              book: Array[Array[Array[Double]]]): ArrayData = {
    val v = normalized(arr, isFloat)
    val m = book.length
    val dsub = if (m == 0) 0 else v.length / m
    val codes = new Array[Int](m)
    var s = 0
    while (s < m) {
      val cents = book(s)
      val off = s * dsub
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < cents.length) {
        val cv = cents(c)
        var d = 0.0
        var i = 0
        val n = math.min(dsub, cv.length)
        while (i < n) { val t = v(off + i) - cv(i); d += t * t; i += 1 }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      codes(s) = best
      s += 1
    }
    new GenericArrayData(codes)
  }
}

/** ADC score of a PQ code row against a per-query lookup table:
  * Σ_s lut(s)(code(s)) — with `lut(s)(c) = q_sub(s) · centroid(s)(c)`
  * this approximates the inner product of the normalized vectors
  * (≡ cosine). One array index + add per subspace, fully codegen'd. */
case class PqAdcScore(child: Expression, lut: Seq[Seq[Double]])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_pq_adc requires array<int> codes, got ${other.sql}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_pq_adc"

  @transient private lazy val table: Array[Array[Double]] =
    lut.map(_.toArray).toArray

  override def nullSafeEval(input: Any): Any =
    PqAdcScore.compute(input.asInstanceOf[ArrayData], table)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tRef = ctx.addReferenceObj("pqLut", table, "double[][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.PqAdcScore.compute($c, $tRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): PqAdcScore =
    copy(child = newChild)
}

object PqAdcScore {
  /** Static so generated code can call it. */
  def compute(codes: ArrayData, lut: Array[Array[Double]]): Double = {
    var score = 0.0
    var s = 0
    val m = math.min(codes.numElements(), lut.length)
    while (s < m) {
      score += lut(s)(codes.getInt(s))
      s += 1
    }
    score
  }
}
