package graft.plans

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.Partitioner
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Worst-case-optimal n-ary equi-join: a Leapfrog Triejoin over a global
  * variable order, distributed in ONE communication round via the
  * Afrati–Ullman "Shares" / HyperCube partitioning scheme.
  *
  * Reference analog: the LFTJ subsystem — `src/joining/join/wcoj/LFTjoin
  * .java:1-423`, `StaticLFTJ.java` (fixed variable order), `LFTJiter.java`
  * (sorted trie iterators) — which upstream keeps disabled at
  * `src/joining/JoinProcessor.java:67-68`. The reference iterates sorted
  * tries inside a single JVM over its buffer pool; re-expressed
  * Spark-first, the per-cell trie iteration is the same algorithm but the
  * data placement is distributed: the available reduce cells form a grid
  * with one dimension per join variable, each input relation is
  * hash-replicated only along the dimensions of the variables it does NOT
  * contain, and every grid cell runs an independent in-memory leapfrog
  * over its fragment. A binding (v1..vk) can only materialize in the
  * single cell whose coordinates match every variable's hash, so the
  * union of cell outputs is exact with no dedup pass. Per-tuple
  * replication is the product of the missing variables' shares — the
  * communication-optimal one-round layout for cyclic queries (triangles,
  * k-cycles) where every binary-join plan materializes an intermediate
  * strictly larger than the AGM output bound. At cluster scale the grid
  * is sized to the executor count and each cell holds 1/share^|vars(R)|
  * of each relation, so per-cell memory shrinks as the grid grows.
  *
  * Semantics: set-semantics over the variable columns (the trie collapses
  * duplicate tuples), i.e. the conjunctive-query model of the reference's
  * LFTJ. Variables are Long-typed; rows with a null variable are dropped.
  */
object Leapfrog {

  /** Joins `rels` — each a (frame, variable-names) pair where the named
    * columns exist in the frame — over the global elimination order
    * `varOrder` (must cover exactly the union of the relations' variables).
    * `shares(v)` is the grid side length for variable `v` (default 1);
    * total cells = product of shares.
    */
  def join(
      spark: SparkSession,
      rels: Seq[(DataFrame, Seq[String])],
      varOrder: Seq[String],
      shares: Map[String, Int]): DataFrame = {
    val vars = varOrder.toArray
    val nVars = vars.length
    val varPos = vars.zipWithIndex.toMap
    require(rels.nonEmpty, "need at least one relation")
    require(rels.flatMap(_._2).toSet == vars.toSet,
      "varOrder must cover exactly the variables of the relations")
    val shareArr = vars.map(v => math.max(1, shares.getOrElse(v, 1)))
    // row-major strides over the grid
    val stride = new Array[Int](nVars)
    var acc = 1
    var d = nVars - 1
    while (d >= 0) { stride(d) = acc; acc *= shareArr(d); d -= 1 }
    val nCells = acc

    // per relation: its variables sorted by global position (= trie attribute
    // order), and the global positions themselves
    val relVarPos: Array[Array[Int]] =
      rels.map(_._2.map(varPos).sorted.toArray).toArray

    val tagged = rels.zipWithIndex.map { case ((df, _), i) =>
      val rvPos = relVarPos(i)
      val rvCols: Array[Column] = rvPos.map(p => col(vars(p)).cast("long"))
      val freeDims = (0 until nVars).filterNot(rvPos.contains).toArray
      val freeShares = freeDims.map(shareArr)
      val nReplicas = freeShares.product
      val localShares = rvPos.map(shareArr)
      val localStrides = rvPos.map(stride)
      df.select(rvCols: _*).na.drop().rdd.flatMap { row =>
        val tup = Array.tabulate(rvPos.length)(j => row.getLong(j))
        var base = 0
        var j = 0
        while (j < tup.length) {
          base += coordOf(tup(j), localShares(j)) * localStrides(j); j += 1
        }
        val out = new Array[(Int, (Int, Array[Long]))](nReplicas)
        val combo = new Array[Int](freeDims.length)
        var r = 0
        while (r < nReplicas) {
          var cid = base
          var f = 0
          while (f < freeDims.length) { cid += combo(f) * stride(freeDims(f)); f += 1 }
          out(r) = (cid, (i, tup))
          var k = freeDims.length - 1
          while (k >= 0) {
            combo(k) += 1
            if (combo(k) < freeShares(k)) k = -1 else { combo(k) = 0; k -= 1 }
          }
          r += 1
        }
        out
      }
    }

    val nRels = rels.length
    val partitioned = spark.sparkContext.union(tagged).partitionBy(
      new Partitioner {
        override def numPartitions: Int = nCells
        override def getPartition(key: Any): Int = key.asInstanceOf[Int]
      })
    val relVarPosLocal = relVarPos // avoid closing over `this`
    val rows = partitioned.mapPartitions { it =>
      val bufs = Array.fill(nRels)(new ArrayBuffer[Array[Long]]())
      it.foreach { case (_, (i, tup)) => bufs(i) += tup }
      if (bufs.exists(_.isEmpty)) Iterator.empty
      else {
        val sorted = bufs.map { b =>
          val arr = b.toArray
          java.util.Arrays.sort(arr, lexOrder)
          arr
        }
        val out = new ArrayBuffer[Row]()
        new CellLFTJ(nVars, relVarPosLocal, sorted)
          .run(b => out += Row(b.toIndexedSeq: _*))
        out.iterator
      }
    }
    val schema = StructType(vars.map(v => StructField(v, LongType, nullable = false)))
    spark.createDataFrame(rows, schema)
  }

  /** Grid coordinate of a value: mixed 64-bit hash mod share, so skewed but
    * distinct keys still spread across the dimension. */
  private def coordOf(v: Long, share: Int): Int =
    if (share == 1) 0
    else java.lang.Math.floorMod(scala.util.hashing.byteswap64(v), share.toLong).toInt

  private val lexOrder: java.util.Comparator[Array[Long]] =
    (x: Array[Long], y: Array[Long]) => {
      var j = 0
      var c = 0
      while (c == 0 && j < x.length) {
        c = java.lang.Long.compare(x(j), y(j)); j += 1
      }
      c
    }

  /** In-memory leapfrog over one grid cell. Each relation's tuples are
    * lexicographically sorted by its variables in global order, so at
    * recursion depth d the values of the next unbound attribute are sorted
    * within the tuple range consistent with the bindings so far — the
    * sorted-trie view the reference builds in `LFTJiter.java` — and the
    * per-depth intersection advances by seeking each lagging relation to
    * the current maximum (galloping replaced by binary search).
    */
  private final class CellLFTJ(
      nVars: Int,
      relVarPos: Array[Array[Int]],
      rels: Array[Array[Array[Long]]]) {

    // participants per depth: (relation index, attribute index in its trie)
    private val parts: Array[Array[(Int, Int)]] =
      Array.tabulate(nVars) { d =>
        relVarPos.zipWithIndex.flatMap { case (ps, i) =>
          val a = ps.indexOf(d)
          if (a >= 0) Some((i, a)) else None
        }
      }

    def run(emit: Array[Long] => Unit): Unit = {
      val lo = new Array[Int](rels.length)
      val hi = rels.map(_.length)
      recurse(0, lo, hi, new Array[Long](nVars), emit)
    }

    /** First index in [from, until) whose attr value is >= target (gt=false)
      * or > target (gt=true). */
    private def seek(rel: Array[Array[Long]], attr: Int, from: Int,
        until: Int, target: Long, gt: Boolean): Int = {
      var a = from
      var b = until
      while (a < b) {
        val m = (a + b) >>> 1
        val v = rel(m)(attr)
        if (v < target || (gt && v == target)) a = m + 1 else b = m
      }
      a
    }

    private def recurse(d: Int, lo: Array[Int], hi: Array[Int],
        binding: Array[Long], emit: Array[Long] => Unit): Unit = {
      if (d == nVars) { emit(binding); return }
      val ps = parts(d)
      val np = ps.length
      val pos = new Array[Int](np)
      val origLo = new Array[Int](np)
      val origHi = new Array[Int](np)
      var k = 0
      var maxV = Long.MinValue
      while (k < np) {
        val (i, a) = ps(k)
        pos(k) = lo(i); origLo(k) = lo(i); origHi(k) = hi(i)
        if (pos(k) >= hi(i)) return
        val v = rels(i)(pos(k))(a)
        if (v > maxV) maxV = v
        k += 1
      }
      var done = false
      while (!done) {
        // sweep every participant up to maxV; repeat until a full sweep
        // leaves all of them equal (standard leapfrog convergence)
        var allEq = true
        k = 0
        while (k < np && !done) {
          val (i, a) = ps(k)
          val p2 = seek(rels(i), a, pos(k), origHi(k), maxV, gt = false)
          if (p2 >= origHi(k)) done = true
          else {
            pos(k) = p2
            val v = rels(i)(p2)(a)
            if (v > maxV) { maxV = v; allEq = false }
          }
          k += 1
        }
        if (!done && allEq) {
          // all participants agree on maxV: bind it, narrow their ranges to
          // the maxV run, recurse, then advance past the run
          binding(d) = maxV
          k = 0
          while (k < np) {
            val (i, a) = ps(k)
            lo(i) = pos(k)
            hi(i) = seek(rels(i), a, pos(k), origHi(k), maxV, gt = true)
            k += 1
          }
          recurse(d + 1, lo, hi, binding, emit)
          k = 0
          while (k < np) {
            val (i, _) = ps(k)
            pos(k) = hi(i)
            lo(i) = origLo(k)
            hi(i) = origHi(k)
            if (pos(k) >= origHi(k)) done = true
            k += 1
          }
          if (!done) {
            maxV = Long.MinValue
            k = 0
            while (k < np) {
              val (i, a) = ps(k)
              val v = rels(i)(pos(k))(a)
              if (v > maxV) maxV = v
              k += 1
            }
          }
        }
      }
    }
  }
}
