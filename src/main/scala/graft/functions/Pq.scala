package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Product quantization (PQ) for vector search: vectors are split into `m`
  * subvectors, each quantized against its own small centroid codebook, so a
  * d-dim float vector stores as m small codes (here ints; 1 byte each at
  * k ≤ 256 in a binary layout) — the classic billion-vector memory/IO
  * reduction that pairs with the IVF coarse partitioner (graft.functions.
  * Ivf). Queries score candidates with asymmetric distance (ADC): one
  * m × k lookup table per query, then each candidate costs m array reads —
  * no float vectors are touched at scan time. The reference has no vector
  * search; this is prompt-mandated beyond-parity surface.
  */
object Pq {

  /** Train m sub-codebooks of ≤k centroids over a driver-side sample
    * (same bounded-sample posture as Ivf.kmeans: train on thousands,
    * encode billions). Requires dim % m == 0. */
  def train(sample: Array[Array[Double]], m: Int,
            k: Int): Array[Array[Array[Double]]] = {
    require(sample.nonEmpty, "pq train needs a non-empty sample")
    val dim = sample.head.length
    require(dim % m == 0, s"dim $dim must split into $m equal subvectors")
    val sub = dim / m
    Array.tabulate(m) { j =>
      Ivf.kmeans(
        sample.map(v => java.util.Arrays.copyOfRange(v, j * sub, (j + 1) * sub)), k)
    }
  }

  /** The m nearest-centroid codes of one vector. */
  def encode(v: ArrayData, isFloat: Boolean,
             books: Array[Array[Array[Double]]]): Array[Int] = {
    val arr = Ivf.toDoubles(v, isFloat)
    val m = books.length
    val sub = arr.length / m
    Array.tabulate(m) { j =>
      Ivf.nearest(
        java.util.Arrays.copyOfRange(arr, j * sub, (j + 1) * sub), books(j))
    }
  }

  private def l2sq(a: Array[Double], b: Array[Double]): Double = {
    var d = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { val t = a(i) - b(i); d += t * t; i += 1 }
    d
  }

  /** Asymmetric-distance table of one query: per subvector, squared L2 from
    * the query slice to every centroid. Computed ONCE per query. */
  def adcTable(q: Array[Double],
               books: Array[Array[Array[Double]]]): Array[Array[Double]] = {
    val m = books.length
    val sub = q.length / m
    Array.tabulate(m) { j =>
      val slice = java.util.Arrays.copyOfRange(q, j * sub, (j + 1) * sub)
      books(j).map(c => l2sq(slice, c))
    }
  }

  /** ADC distance of one code vector: m table lookups. */
  def adcScore(codes: ArrayData, table: Array[Array[Double]]): Double = {
    var s = 0.0
    var j = 0
    while (j < table.length) { s += table(j)(codes.getInt(j)); j += 1 }
    s
  }
}

/** array<float|double> → array<int>: the m PQ codes of a vector. The
  * codebooks ship via addReferenceObj (never plan literals — the
  * HyperplaneBuckets lesson: codegen cost must not scale with constants). */
case class PqEncode(child: Expression,
    books: Array[Array[Array[Double]]]) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_pq_encode expects array<float|double>, got ${t.simpleString}")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(Pq.encode(input.asInstanceOf[ArrayData], isFloat, books))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bRef = ctx.addReferenceObj("pqBooks", books, "double[][][]")
    defineCodeGen(ctx, ev, c =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.Pq.encode($c, $isFloat, $bRef))")
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)

  override def prettyName: String = "graft_pq_encode"

  override def equals(other: Any): Boolean = other match {
    case PqEncode(c, b) => c == child && java.util.Arrays.deepEquals(
      b.asInstanceOf[Array[AnyRef]], books.asInstanceOf[Array[AnyRef]])
    case _ => false
  }
  override def hashCode(): Int = 31 * child.hashCode() + books.length
}

/** array<int> (PQ codes) → double: asymmetric distance against one query's
  * precomputed lookup table. */
case class PqAdcScore(child: Expression,
    table: Array[Array[Double]]) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_pq_adc expects array<int>, got ${t.simpleString}")
  }

  override def dataType: DataType = DoubleType

  override def nullSafeEval(input: Any): Any =
    Pq.adcScore(input.asInstanceOf[ArrayData], table)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tRef = ctx.addReferenceObj("pqAdcTable", table, "double[][]")
    defineCodeGen(ctx, ev, c => s"graft.functions.Pq.adcScore($c, $tRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): PqAdcScore =
    copy(child = newChild)

  override def prettyName: String = "graft_pq_adc"

  override def equals(other: Any): Boolean = other match {
    case PqAdcScore(c, t) => c == child && java.util.Arrays.deepEquals(
      t.asInstanceOf[Array[AnyRef]], table.asInstanceOf[Array[AnyRef]])
    case _ => false
  }
  override def hashCode(): Int = 31 * child.hashCode() + table.length
}
