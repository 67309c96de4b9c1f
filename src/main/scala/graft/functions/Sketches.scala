package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Codegen'd sketching primitives over pre-hashed token arrays (array<long>).
  * Both are single-pass per row and whole-stage-codegen friendly — the
  * map-side half of the cluster-scale dedup plans; candidate generation then
  * shuffles on (band, hash) / signature keys. The interpreted
  * higher-order-function formulations these replace re-evaluated one lambda
  * per (element × permutation), dominating the dedup benchmarks.
  */
object Sketches {
  /** xxhash64 of a long with seed — shared by eval and generated code. */
  def rehash(v: Long, seed: Long): Long = XXH64.hashLong(v, seed)

  /** MinHash signature minimum for permutation p over hashes hs. */
  def bandHashes(hs: ArrayData, nBands: Int, rowsPerBand: Int): Array[Long] = {
    val n = hs.numElements()
    val out = new Array[Long](nBands)
    var b = 0
    while (b < nBands) {
      var acc = b.toLong // band seed
      var r = 0
      while (r < rowsPerBand) {
        val p = b * rowsPerBand + r + 1
        var min = Long.MaxValue
        var i = 0
        while (i < n) {
          val h = rehash(hs.getLong(i), p)
          if (h < min) min = h
          i += 1
        }
        acc = rehash(min, acc)
        r += 1
      }
      out(b) = acc
      b += 1
    }
    out
  }

  /** Common-element count of two SORTED long arrays (two-pointer merge):
    * the verification kernel of the dedup pair joins. ~|a|+|b| long
    * comparisons per pair, vs array_intersect's per-row hash-set build. */
  def sortedIntersectCount(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var c = 0
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }

  def simhash(hs: ArrayData): Long = {
    val n = hs.numElements()
    var sig = 0L
    var bit = 0
    while (bit < 64) {
      var s = 0L
      var i = 0
      while (i < n) {
        s += (if (((hs.getLong(i) >>> bit) & 1L) == 1L) 1L else -1L)
        i += 1
      }
      if (s > 0) sig |= (1L << bit)
      bit += 1
    }
    sig
  }
}

/** array<long> token hashes → array<long> of nBands LSH band hashes
  * (each band chains rowsPerBand permutation minima). */
case class MinHashBands(child: Expression, nBands: Int, rowsPerBand: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"minhash_bands expects array<bigint>, got ${t.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      Sketches.bandHashes(input.asInstanceOf[ArrayData], nBands, rowsPerBand))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.Sketches.bandHashes($c, $nBands, $rowsPerBand))")

  override protected def withNewChildInternal(newChild: Expression): MinHashBands =
    copy(child = newChild)

  override def prettyName: String = "graft_minhash_bands"
}

/** (sorted array<long>, sorted array<long>) → int common-element count.
  * Inputs MUST be sorted ascending (callers sort once per set at build time,
  * never per pair). */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"sorted_intersect_count expects (array<bigint>, array<bigint>), " +
          s"got (${l.simpleString}, ${r.simpleString})")
    }

  override def dataType: DataType = IntegerType

  override def nullSafeEval(a: Any, b: Any): Any =
    Sketches.sortedIntersectCount(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.Sketches.sortedIntersectCount($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_sorted_intersect_count"
}

/** array<long> token hashes → 64-bit SimHash. */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"simhash64 expects array<bigint>, got ${t.simpleString}")
  }

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    Sketches.simhash(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Sketches.simhash($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)

  override def prettyName: String = "graft_simhash64"
}
