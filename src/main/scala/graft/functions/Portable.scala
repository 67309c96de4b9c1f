package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Codegen'd single-pass kernels for the PORTABLE (md5-derived) dedup hash
  * family — the family whose every number a DuckDB oracle regenerates
  * bit-for-bit (TextDedup.portableHash60 and friends). The SQL-expression
  * formulations these replace computed the same values through an
  * explode → distinct → wide-aggregate pipeline: two extra shuffles and a
  * 64-aggregate groupBy that dominated q56/q57. Each kernel here is one
  * pass over one row's token array; candidate generation still shuffles on
  * the banded keys, so the cluster-scale plan shape is unchanged.
  *
  * Hash semantics (MUST stay replayable in DuckDB SQL):
  *   h60(s)  = first 15 hex chars of md5(s) as a 60-bit integer
  *             (DuckDB: ('0x' || substring(md5(s), 1, 15))::BIGINT)
  *   gram    = n consecutive words joined with ' '
  *   minhash = min over distinct (h60(gram) mod P) of (a_j·h + b_j) mod P,
  *             P = 2^31−1, a_j/b_j themselves md5-derived (TextDedup.permA/B)
  *   simhash = 60-bit majority-vote signature over distinct h60(word)
  */
object Portable {

  val P: Long = 2147483647L

  /** Per-thread MD5 instance: `MessageDigest.getInstance` walks the
    * security-provider registry and allocates on EVERY call, and the
    * portable kernels hash one value per row (or per gram — millions per
    * task); `reset()` on a cached instance is the documented reuse path
    * and is what the per-call cost is mostly made of avoiding. */
  private val md5Local: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() =>
      java.security.MessageDigest.getInstance("MD5"))

  /** 60-bit portable hash: value of the first 15 hex chars of md5(utf8). */
  def hash60(bytes: Array[Byte]): Long = {
    val md = md5Local.get()
    md.reset()
    val d = md.digest(bytes)
    // 15 hex chars = bytes 0..6 in full (14 chars) + high nibble of byte 7
    var h = 0L
    var b = 0
    while (b < 7) { h = (h << 8) | (d(b) & 0xffL); b += 1 }
    (h << 4) | ((d(7) & 0xf0L) >> 4)
  }

  /** [[hash60]] over a UTF8String's bytes without the toString round trip
    * (the codegen entry for [[PortableHash60]]). */
  def hash60(s: org.apache.spark.unsafe.types.UTF8String): Long =
    hash60(s.getBytes)

  /** Both 60-bit halves of one md5 digest — (hex chars 1..15, 16..30) —
    * for the double-hash family ([[PortableHash60Pair]]): one digest,
    * zero hex-string materialization. */
  def hash60Pair(bytes: Array[Byte]): org.apache.spark.sql.catalyst.expressions.GenericInternalRow = {
    val md = md5Local.get()
    md.reset()
    val d = md.digest(bytes)
    var h1 = 0L
    var b = 0
    while (b < 7) { h1 = (h1 << 8) | (d(b) & 0xffL); b += 1 }
    h1 = (h1 << 4) | ((d(7) & 0xf0L) >> 4)
    var h2 = d(7) & 0x0fL
    b = 8
    while (b < 15) { h2 = (h2 << 8) | (d(b) & 0xffL); b += 1 }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](h1, h2))
  }

  /** Sorted distinct (h60(word n-gram) mod P) values of one token array —
    * the per-row equivalent of TextDedup.portableGramHashes' exploded
    * distinct rows (sorted so SortedIntersectCount verifies with a merge).
    * Null elements are skipped within a gram window, matching the
    * concat_ws semantics of the SQL formulation this replaces (split()
    * output never contains nulls, but the expression's type check admits
    * them, so don't crash on general callers). */
  def gramHashes(words: ArrayData, n: Int): Array[Long] = {
    val len = words.numElements()
    if (len < n) return Array.emptyLongArray
    val set = new java.util.TreeSet[java.lang.Long]()
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i <= len - n) {
      sb.setLength(0)
      var k = 0
      var appended = false
      while (k < n) {
        val w = words.getUTF8String(i + k)
        if (w != null) {
          if (appended) sb.append(' ')
          sb.append(w.toString)
          appended = true
        }
        k += 1
      }
      set.add(hash60(sb.toString.getBytes("UTF-8")) % P)
      i += 1
    }
    val out = new Array[Long](set.size)
    val it = set.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    out
  }

  /** Every k-token window of one token array as (position, FULL 60-bit
    * h60 of the window text) — the q284 anchor family
    * (TextDedup.sharedSpanPairs), computed in one pass per row instead
    * of a transform/sequence lambda over a checkpointed token array (the
    * lambda route needs the checkpoint to dodge CollapseProject's
    * O(tokens²) split() inlining; an expression evaluates split() once
    * by construction, and is stream-safe — no checkpoint). Positions are
    * 0-based; every position is emitted (callers needing min-pos dedup
    * aggregate downstream). Null elements are skipped within a window,
    * matching concat_ws (see [[gramHashes]]). */
  def gramPosHashes(words: ArrayData, n: Int): ArrayData = {
    val len = words.numElements()
    if (len < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](len - n + 1)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i <= len - n) {
      sb.setLength(0)
      var k = 0
      var appended = false
      while (k < n) {
        val w = words.getUTF8String(i + k)
        if (w != null) {
          if (appended) sb.append(' ')
          sb.append(w.toString)
          appended = true
        }
        k += 1
      }
      out(i) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](i, hash60(sb.toString.getBytes("UTF-8"))))
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Dense linear-classifier margin of one token array in ONE pass —
    * the per-row fusion of hashFeatures + weight join + sorted fold
    * (Features.linearScore's plan), bit-for-bit: signed-sum cells per
    * feature index (idx = h60 mod dim, sign = next hash bit; empty and
    * null tokens skipped, exactly the hashFeatures filter), then
    * margin = Σ cell(idx) · weights(idx) folded in ASCENDING idx order
    * from 0.0 — the same doubles in the same order as the table path's
    * array_sort fold, so the two paths agree bit-for-bit and either
    * engine replays both. Returns (n_feat = touched cells, margin). */
  def linearMargin(words: ArrayData, dim: Int,
                   weights: Array[Double]): org.apache.spark.sql.catalyst.expressions.GenericInternalRow = {
    val bits = java.lang.Integer.numberOfTrailingZeros(dim)
    val cells = new java.util.TreeMap[Integer, java.lang.Long]()
    val len = words.numElements()
    var i = 0
    while (i < len) {
      val w = words.getUTF8String(i)
      if (w != null && w.numBytes() > 0) {
        val h = hash60(w.getBytes)
        val idx = (h % dim).toInt
        val sign = if (((h >> bits) & 1L) == 0L) 1L else -1L
        cells.merge(idx, sign, (a, b) => a + b)
      }
      i += 1
    }
    var margin = 0.0
    val it = cells.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      margin += e.getValue.toDouble * weights(e.getKey)
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](cells.size().toLong, margin))
  }

  /** Per-nHashes cache of the md5-derived permutation constants. */
  private val perms =
    new java.util.concurrent.ConcurrentHashMap[Int, (Array[Long], Array[Long])]()

  private def permsFor(nHashes: Int): (Array[Long], Array[Long]) =
    perms.computeIfAbsent(nHashes, n =>
      (Array.tabulate(n)(graft.operators.TextDedup.permA),
        Array.tabulate(n)(graft.operators.TextDedup.permB)))

  /** The nHashes permutation minima over a (distinct) hash array — one pass,
    * the per-row equivalent of the 64-way min() aggregate. */
  def minhashMins(hs: ArrayData, nHashes: Int): Array[Long] = {
    val (pa, pb) = permsFor(nHashes)
    val m = Array.fill(nHashes)(Long.MaxValue)
    val n = hs.numElements()
    var i = 0
    while (i < n) {
      val h = hs.getLong(i)
      var j = 0
      while (j < nHashes) {
        val v = (pa(j) * h + pb(j)) % P
        if (v < m(j)) m(j) = v
        j += 1
      }
      i += 1
    }
    m
  }

  /** 60-bit portable SimHash: one majority vote per bit over the DISTINCT
    * h60 values of the words — per-row equivalent of the exploded
    * 60-aggregate vote pipeline in TextDedup.simhashPairsPortable. */
  def simhash60(words: ArrayData, nBits: Int): Long = {
    val len = words.numElements()
    val set = new java.util.HashSet[java.lang.Long]()
    var i = 0
    while (i < len) {
      val w = words.getUTF8String(i) // null elements skipped (see gramHashes)
      if (w != null) set.add(hash60(w.toString.getBytes("UTF-8")))
      i += 1
    }
    val votes = new Array[Int](nBits)
    val it = set.iterator()
    while (it.hasNext) {
      val h = it.next().longValue()
      var b = 0
      while (b < nBits) {
        if (((h >> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
    }
    var sig = 0L
    var b = 0
    while (b < nBits) { if (votes(b) > 0) sig |= 1L << b; b += 1 }
    sig
  }
}

/** array<string> words → sorted distinct array<long> of portable word
  * n-gram hashes (md5-60bit mod 2^31−1). */
case class PortableNgramHashes(child: Expression, n: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (n < 1)
      TypeCheckResult.TypeCheckFailure(s"portable_ngram_hashes needs n >= 1, got $n")
    else child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"portable_ngram_hashes expects array<string>, got ${t.simpleString}")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(Portable.gramHashes(input.asInstanceOf[ArrayData], n))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.Portable.gramHashes($c, $n))")

  override protected def withNewChildInternal(newChild: Expression): PortableNgramHashes =
    copy(child = newChild)

  override def prettyName: String = "graft_portable_ngram_hashes"
}

/** array<string> words → struct<n_feat:bigint,margin:double>: the dense
  * linear-classifier margin over the portable hashed-feature family in
  * one codegen'd pass per row (no feature explode, no weight join, no
  * fold shuffle — the whole q286 inference plan fused into a
  * projection, which is also what makes it STREAM-SAFE in append mode).
  * Weights ride as a plan reference object, not a literal, so the plan
  * string stays small; bit-for-bit equal to the table path
  * (Features.linearScore) by construction — see Portable.linearMargin. */
case class LinearMargin(child: Expression, dim: Int,
    weights: Array[Double]) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (dim < 2 || (dim & (dim - 1)) != 0 || dim > (1 << 20))
      TypeCheckResult.TypeCheckFailure(
        s"linear_margin needs a power-of-two dim in [2, 2^20], got $dim")
    else if (weights.length != dim)
      TypeCheckResult.TypeCheckFailure(
        s"linear_margin needs exactly dim=$dim weights, got ${weights.length}")
    else child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"linear_margin expects array<string>, got ${t.simpleString}")
    }

  override def dataType: DataType = StructType(Seq(
    StructField("n_feat", LongType, nullable = false),
    StructField("margin", DoubleType, nullable = false)))

  override def nullSafeEval(input: Any): Any =
    Portable.linearMargin(input.asInstanceOf[ArrayData], dim, weights)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val w = ctx.addReferenceObj("linWeights", weights, "double[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.Portable.linearMargin($c, $dim, $w)")
  }

  override protected def withNewChildInternal(newChild: Expression): LinearMargin =
    copy(child = newChild)

  override def prettyName: String = "graft_linear_margin"
}

/** array<string> words → array<struct<p:int,h:bigint>> of EVERY k-token
  * window's (0-based position, full 60-bit md5 hash) — the span-dedup /
  * span-decontamination anchor generator (DuckDB twin: the q284 oracle's
  * list_transform over range with ('0x' || substring(md5(...), 1, 15)));
  * a single-pass expression, so it is stream-safe where the lambda
  * formulation needed a localCheckpoint. */
case class PortableNgramPosHashes(child: Expression, n: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (n < 1)
      TypeCheckResult.TypeCheckFailure(s"portable_ngram_pos_hashes needs n >= 1, got $n")
    else child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"portable_ngram_pos_hashes expects array<string>, got ${t.simpleString}")
    }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("p", IntegerType, nullable = false),
    StructField("h", LongType, nullable = false))), containsNull = false)

  override def nullSafeEval(input: Any): Any =
    Portable.gramPosHashes(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.Portable.gramPosHashes($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): PortableNgramPosHashes =
    copy(child = newChild)

  override def prettyName: String = "graft_portable_ngram_pos_hashes"
}

/** array<long> distinct hashes → array<long> of nHashes portable MinHash
  * permutation minima. */
case class PortableMinHashMins(child: Expression, nHashes: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (nHashes < 1)
      TypeCheckResult.TypeCheckFailure(s"portable_minhash needs nHashes >= 1, got $nHashes")
    else child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"portable_minhash expects array<bigint>, got ${t.simpleString}")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(Portable.minhashMins(input.asInstanceOf[ArrayData], nHashes))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.Portable.minhashMins($c, $nHashes))")

  override protected def withNewChildInternal(newChild: Expression): PortableMinHashMins =
    copy(child = newChild)

  override def prettyName: String = "graft_portable_minhash"
}

/** array<string> words → 60-bit portable SimHash signature (bigint). */
case class PortableSimHash60(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"portable_simhash60 expects array<string>, got ${t.simpleString}")
  }

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    Portable.simhash60(input.asInstanceOf[ArrayData], 60)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.Portable.simhash60($c, 60)")

  override protected def withNewChildInternal(newChild: Expression): PortableSimHash60 =
    copy(child = newChild)

  override def prettyName: String = "graft_portable_simhash60"
}

/** string|binary → 60-bit portable md5-prefix hash (bigint) in ONE
  * codegen call — the kernel form of TextDedup.portableHash60, which the
  * SQL-expression formulation computed as conv(substring(md5(x),1,15),
  * 16,10): a 32-char hex string, a substring copy, and a base-16 parse
  * PER ROW, on the hash every portable operator (CMS, HLL, Bloom, LSH,
  * sampling, splits) evaluates at least once per input row. Values are
  * bit-identical by construction (Portable.hash60 reads the same leading
  * 60 bits of the same digest), so every oracle replays unchanged. */
case class PortableHash60(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"portable_hash60 expects string or binary, got ${t.simpleString}")
  }

  override def dataType: DataType = LongType

  private def isBinary: Boolean = child.dataType == BinaryType

  override def nullSafeEval(input: Any): Any =
    if (isBinary) Portable.hash60(input.asInstanceOf[Array[Byte]])
    else Portable.hash60(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Portable.hash60($c)")

  override protected def withNewChildInternal(newChild: Expression): PortableHash60 =
    copy(child = newChild)

  override def prettyName: String = "graft_portable_hash60"
}

/** string|binary → struct<h1:bigint, h2:bigint>: the Kirsch–Mitzenmacher
  * double-hash pair from ONE md5 digest — h1 = hex chars 1..15 (the
  * portable 60-bit prefix), h2 = hex chars 16..30 — where the SQL-column
  * formulation (Bloom.bits) materialized the hex string once and paid
  * substring+conv twice per row. Values bit-identical to
  * ('0x'||substring(md5(x),1,15))::BIGINT / (…,16,15)::BIGINT. */
case class PortableHash60Pair(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"portable_hash60_pair expects string or binary, got ${t.simpleString}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("h1", LongType, nullable = false),
    StructField("h2", LongType, nullable = false)))

  private def isBinary: Boolean = child.dataType == BinaryType

  override def nullSafeEval(input: Any): Any =
    if (isBinary) Portable.hash60Pair(input.asInstanceOf[Array[Byte]])
    else Portable.hash60Pair(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      if (isBinary) s"graft.functions.Portable.hash60Pair($c)"
      else s"graft.functions.Portable.hash60Pair($c.getBytes())")

  override protected def withNewChildInternal(newChild: Expression): PortableHash60Pair =
    copy(child = newChild)

  override def prettyName: String = "graft_portable_hash60_pair"
}
