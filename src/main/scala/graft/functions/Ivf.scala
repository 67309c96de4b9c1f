package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** IVF (inverted-file) coarse quantization for ANN: a small driver-trained
  * centroid codebook partitions the vector space; vectors shuffle/bucket by
  * nearest centroid and queries probe only the nProbe nearest cells — the
  * classic Faiss-style scale path (reference has no vector search at all;
  * this is prompt-mandated beyond-parity surface).
  */
object Ivf {

  /** Plain Lloyd k-means over a (small, driver-side) sample: deterministic
    * init from the (deterministically ordered) sample, fixed iteration
    * count — the codebook trainer. Runs on a bounded sample regardless of
    * table size (the 100 TB posture: train on thousands, assign to
    * billions).
    */
  def kmeans(sample: Array[Array[Double]], k: Int,
             iters: Int = 10): Array[Array[Double]] = {
    require(sample.nonEmpty, "kmeans needs a non-empty sample")
    val dim = sample.head.length
    // if the sample is smaller than k we simply train fewer centroids
    val centroids = Array.tabulate(math.min(k, sample.length))(i => sample(i).clone())
    var it = 0
    while (it < iters) {
      val sums = Array.fill(centroids.length, dim)(0.0)
      val counts = new Array[Int](centroids.length)
      sample.foreach { v =>
        val c = nearest(v, centroids)
        counts(c) += 1
        var i = 0
        while (i < dim) { sums(c)(i) += v(i); i += 1 }
      }
      var c = 0
      while (c < centroids.length) {
        if (counts(c) > 0) {
          var i = 0
          while (i < dim) { centroids(c)(i) = sums(c)(i) / counts(c); i += 1 }
        }
        c += 1
      }
      it += 1
    }
    centroids
  }

  def nearest(v: Array[Double], centroids: Array[Array[Double]]): Int = {
    var best = 0
    var bestD = Double.MaxValue
    var c = 0
    while (c < centroids.length) {
      val d = l2sq(v, centroids(c))
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  private def l2sq(v: Array[Double], c: Array[Double]): Double = {
    var d = 0.0
    var i = 0
    val n = math.min(v.length, c.length)
    while (i < n) { val t = v(i) - c(i); d += t * t; i += 1 }
    d
  }

  /** nProbe nearest centroid ids for one vector (ascending L2 distance). */
  def probeCells(v: ArrayData, isFloat: Boolean,
                 centroids: Array[Array[Double]], nProbe: Int): Array[Int] = {
    val arr = toDoubles(v, isFloat)
    val dists = centroids.indices.map(c => (l2sq(arr, centroids(c)), c))
    dists.sortBy(_._1).take(math.min(nProbe, centroids.length)).map(_._2).toArray
  }

  def toDoubles(v: ArrayData, isFloat: Boolean): Array[Double] = {
    val n = v.numElements()
    val out = new Array[Double](n)
    var i = 0
    while (i < n) {
      out(i) = if (v.isNullAt(i)) 0.0
        else if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
      i += 1
    }
    out
  }
}

/** array<float|double> → array<int> of the nProbe nearest centroid ids.
  * The codebook ships inside the expression (addReferenceObj), NOT as plan
  * literals — same lesson as HyperplaneBuckets: plan-literal constants make
  * codegen cost scale with codebook size.
  */
case class NearestCentroids(child: Expression,
    centroids: Array[Array[Double]], nProbe: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"nearest_centroids expects array<float|double>, got ${t.simpleString}")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(Ivf.probeCells(
      input.asInstanceOf[ArrayData], isFloat, centroids, nProbe))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("ivfCentroids", centroids, "double[][]")
    defineCodeGen(ctx, ev, c =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.Ivf.probeCells($c, $isFloat, $cRef, $nProbe))")
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroids =
    copy(child = newChild)

  override def prettyName: String = "graft_nearest_centroids"

  // Array equality is referential on Expression.equals; make structurally
  // identical codebooks compare equal so plan canonicalization behaves
  override def equals(other: Any): Boolean = other match {
    case NearestCentroids(c, cents, p) =>
      c == child && p == nProbe &&
        java.util.Arrays.deepEquals(
          cents.asInstanceOf[Array[AnyRef]], centroids.asInstanceOf[Array[AnyRef]])
    case _ => false
  }
  override def hashCode(): Int =
    31 * child.hashCode() + nProbe
}
