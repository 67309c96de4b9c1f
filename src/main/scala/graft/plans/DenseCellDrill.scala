package graft.plans

/** Constrained-memory drill for the lazy cell iterator: streams a
  * complete-tripartite LFTJ cell whose OUTPUT (m³ bindings) is orders of
  * magnitude larger than any heap a spec would grant, while the INPUT
  * (3·m² tuples) is a few megabytes. The pre-round-6 eager design
  * (ArrayBuffer of every output row) dies with OOM here; the streaming
  * iterator completes in O(input) memory. LeapfrogSpec forks this main
  * with -Xmx128m and asserts the printed count.
  *
  * Usage: DenseCellDrill [m]   (default 300 → 27,000,000 bindings)
  */
object DenseCellDrill {
  def main(args: Array[String]): Unit = {
    val m = if (args.nonEmpty) args(0).toInt else 300
    // flat row-major (width 2), already lexicographically sorted
    val cross = new Array[Long](m * m * 2)
    var i = 0
    while (i < m) {
      var j = 0
      while (j < m) {
        cross((i * m + j) * 2) = i.toLong
        cross((i * m + j) * 2 + 1) = j.toLong
        j += 1
      }
      i += 1
    }
    val relVarPos = Array(Array(0, 1), Array(1, 2), Array(0, 2))
    val it = new Leapfrog.CellLFTJ(3, relVarPos, Array(cross, cross, cross))
    var count = 0L
    while (it.hasNext) { it.next(); count += 1 }
    println(s"DRILL_COUNT=$count")
  }
}
