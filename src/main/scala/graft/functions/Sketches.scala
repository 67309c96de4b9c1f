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

  /** Sorted distinct xxhash64 values of all word n-grams (space-joined) of a
    * word array — one tight loop per row, replacing an explode + two window
    * passes (n=3 shingles) or an interpreted per-word lambda (n=1). Hash
    * values equal Spark's `xxhash64(concat_ws(' ', ...))` (same seed 42), so
    * results are byte-compatible with the SQL formulation. Sorted output
    * feeds SortedIntersectCount verification with no per-pair sort.
    */
  def ngramHashes(words: ArrayData, n: Int): Array[Long] = {
    val nw = words.numElements()
    if (nw < n) return Array.emptyLongArray
    val sp = org.apache.spark.unsafe.types.UTF8String.fromString(" ")
    val tmp = new Array[Long](nw - n + 1)
    var m = 0 // grams actually emitted (grams touching a null word are skipped)
    var i = 0
    while (i <= nw - n) {
      var g = words.getUTF8String(i)
      var j = 1
      while (j < n && g != null) {
        val next = words.getUTF8String(i + j)
        g = if (next == null) null
          else org.apache.spark.unsafe.types.UTF8String.concat(g, sp, next)
        j += 1
      }
      if (g != null) {
        tmp(m) = XXH64.hashUnsafeBytes(g.getBaseObject, g.getBaseOffset, g.numBytes, 42L)
        m += 1
      }
      i += 1
    }
    if (m == 0) return Array.emptyLongArray
    java.util.Arrays.sort(tmp, 0, m)
    var w = 1
    var r = 1
    while (r < m) {
      if (tmp(r) != tmp(r - 1)) { tmp(w) = tmp(r); w += 1 }
      r += 1
    }
    // fast path: no nulls and no duplicate grams -> return the array as-is
    if (w == m && m == tmp.length) tmp else java.util.Arrays.copyOf(tmp, w)
  }

  /** Seeded hyperplane cache for sign-of-projection LSH: planes live HERE,
    * not as plan literals — embedding L×k×dim constant arrays in the plan
    * made codegen/compile cost scale with the table count and dwarfed the
    * actual math. Generation order matches the original plan-literal
    * formulation, so bucket values are unchanged. */
  private val planeCache = new java.util.concurrent.ConcurrentHashMap[
    (Long, Int, Int, Int), Array[Array[Array[Double]]]]()

  def hyperplanes(seed: Long, nTables: Int, planesPerTable: Int,
                  dim: Int): Array[Array[Array[Double]]] =
    planeCache.computeIfAbsent((seed, nTables, planesPerTable, dim), _ => {
      val rnd = new scala.util.Random(seed)
      Array.fill(nTables, planesPerTable, dim)(rnd.nextDouble() - 0.5)
    })

  /** All L bucket ids (k sign bits each) for one vector, one tight loop. */
  def hyperplaneBuckets(v: ArrayData, isFloat: Boolean, seed: Long,
                        nTables: Int, planesPerTable: Int, dim: Int): Array[Long] = {
    val planes = hyperplanes(seed, nTables, planesPerTable, dim)
    val n = math.min(dim, v.numElements())
    val out = new Array[Long](nTables)
    var t = 0
    while (t < nTables) {
      var bucket = 0L
      var p = 0
      while (p < planesPerTable) {
        val plane = planes(t)(p)
        var acc = 0.0
        var i = 0
        while (i < n) {
          if (!v.isNullAt(i)) {
            val x = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
            acc += x * plane(i)
          }
          i += 1
        }
        if (acc > 0) bucket |= (1L << p)
        p += 1
      }
      out(t) = bucket
      t += 1
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

/** array<string> words → sorted distinct array<long> of word n-gram
  * xxhash64 values (n=3: shingles; n=1: word hashes). */
case class NgramHashes(child: Expression, n: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (n < 1)
      TypeCheckResult.TypeCheckFailure(s"ngram_hashes needs n >= 1, got $n")
    else child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"ngram_hashes expects array<string>, got ${t.simpleString}")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(Sketches.ngramHashes(input.asInstanceOf[ArrayData], n))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.Sketches.ngramHashes($c, $n))")

  override protected def withNewChildInternal(newChild: Expression): NgramHashes =
    copy(child = newChild)

  override def prettyName: String = "graft_ngram_hashes"
}

/** array<float|double> embedding → array<long> of nTables LSH bucket ids
  * (k sign-of-projection bits per table, seeded deterministic hyperplanes
  * held in a process cache, NOT in the plan). */
case class HyperplaneBuckets(child: Expression, nTables: Int,
    planesPerTable: Int, dim: Int, seed: Long) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"hyperplane_buckets expects array<float|double>, got ${t.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(Sketches.hyperplaneBuckets(
      input.asInstanceOf[ArrayData], isFloat, seed, nTables, planesPerTable, dim))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.Sketches.hyperplaneBuckets($c, $isFloat, ${seed}L, " +
        s"$nTables, $planesPerTable, $dim))")

  override protected def withNewChildInternal(newChild: Expression): HyperplaneBuckets =
    copy(child = newChild)

  override def prettyName: String = "graft_hyperplane_buckets"
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
