package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.types._

/** Composite-key range bucketing against an explicitly sampled boundary
  * array — the deterministic replacement for `repartitionByRange`'s
  * execution-time boundary sampling inside the two-phase rank
  * (operators/Rank.scala). A range exchange samples its own boundaries
  * when the exchange materializes, so two column-pruning-divergent
  * copies of the same subtree may see DIFFERENT partitionings; the rank
  * used to pin one shuffle output with `localCheckpoint`, which at the
  * 100 TB end writes a full copy of every carried column into executor
  * block storage and truncates lineage. Here the boundaries are computed
  * ONCE by a bounded driver-side sample job and ride into this
  * expression as a reference object: the bucket id is a pure
  * deterministic function of the row, so every recomputation — plan
  * subtree duplication, task retry, lost executor — agrees by
  * construction. One codegen'd binary search per row (log₂ buckets
  * comparisons), no materialization, lineage preserved.
  *
  * Boundary semantics: bucket = the first index i with key ≤ bounds(i)
  * under the composite (direction, null-ordering)-aware order, else
  * `bounds.length` — identical to `RangePartitioner.getPartition`'s
  * binary search, so bucket ids are monotone in the sort order, which
  * is the only property the two-phase rank's prefix offsets need.
  */
final class RangeBucketer(val types: Array[DataType],
    val descending: Array[Boolean], val nullsFirst: Array[Boolean],
    val boundaries: Array[Array[Any]]) extends Serializable {

  @transient private lazy val orderings: Array[Ordering[Any]] =
    types.map(t => TypeUtils.getInterpretedOrdering(t))

  /** Composite compare of catalyst-value tuples in the FINAL sort order
    * (direction and null placement applied per field). */
  def compareKeys(a: Array[Any], b: Array[Any]): Int = {
    var i = 0
    while (i < a.length) {
      val x = a(i)
      val y = b(i)
      val c =
        if (x == null && y == null) 0
        else if (x == null) { if (nullsFirst(i)) -1 else 1 }
        else if (y == null) { if (nullsFirst(i)) 1 else -1 }
        else {
          val n = orderings(i).compare(x, y)
          if (descending(i)) -n else n
        }
      if (c != 0) return c
      i += 1
    }
    0
  }

  /** Binary search: first boundary the key sorts ≤, else the last
    * bucket. Called from generated code — one virtual call per row over
    * a ≤ few-hundred-entry array. */
  def bucketOf(key: InternalRow): Int = {
    val k = new Array[Any](types.length)
    var i = 0
    while (i < k.length) {
      k(i) = if (key.isNullAt(i)) null else key.get(i, types(i))
      i += 1
    }
    var lo = 0
    var hi = boundaries.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (compareKeys(k, boundaries(mid)) > 0) lo = mid + 1 else hi = mid
    }
    lo
  }
}

/** struct(orderKeys…) → int bucket id in [0, boundaries.length]. The
  * bucketer (boundary array + per-field order semantics) ships as a plan
  * reference object, never as plan literals — the Ivf/Pq discipline. */
case class RangeBucket(child: Expression, bucketer: RangeBucketer)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case s: StructType if s.fields.length == bucketer.types.length =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"range_bucket expects a struct of ${bucketer.types.length} sort keys, " +
        s"got ${t.simpleString}")
  }

  override def dataType: DataType = IntegerType

  override def nullSafeEval(input: Any): Any =
    bucketer.bucketOf(input.asInstanceOf[InternalRow])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("rangeBucketer", bucketer,
      classOf[RangeBucketer].getName)
    defineCodeGen(ctx, ev, c => s"$ref.bucketOf($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): RangeBucket =
    copy(child = newChild)

  override def prettyName: String = "graft_range_bucket"
}
