package graft

import graft.sources.Tpch

/** The reference's other shipped workload: its 16 TPC-H SQL files execute
  * VERBATIM over the augmented testdata views, with the UCT rule firing at
  * the multiway queries' main-block widths. Raw TPC-H aggregates sum
  * doubles (partition-order-dependent), so this suite asserts execution +
  * plan width + selective-match rows, not exact hashes — the engine's own
  * TPC-H registry queries (q01…q21) carry the decimal-deterministic oracle
  * versions of the same shapes.
  */
class TpchSpec extends SparkSpec {

  // Widest contiguous scan-block per file (subqueries learn their own
  // orders; lastStats keeps the widest reorder of the statement). q02's main
  // FROM lists 5 relations but its correlated scalar subquery decorrelates
  // into an aggregate join that splits the block — the widest all-scan block
  // Catalyst leaves is 4 (the min-supplycost side), which is what UCT must
  // reorder.
  private val widths = Map("q02" -> 4, "q03" -> 3, "q05" -> 6, "q07" -> 6,
    "q08" -> 8, "q09" -> 6, "q10" -> 4)

  test("all 16 reference TPC-H queries parse, plan, execute; UCT fires at the wide ones") {
    assume(java.nio.file.Files.isDirectory(java.nio.file.Paths.get(Tpch.queriesDir)))
    Tpch.ensure(spark, sf)
    val files = Tpch.queryFiles
    assert(files.size == 16, s"expected the reference's 16 files, found ${files.size}")
    plans.UctJoinReorderRule.clearCache()
    val failures = Seq.newBuilder[String]
    files.foreach { f =>
      val name = f.getFileName.toString
      val base = name.stripSuffix(".sql")
      plans.UctJoinReorderRule.lastStats = None
      try {
        val rows = spark.sql(Tpch.queryText(name)).collect()
        val uct = plans.UctJoinReorderRule.lastStats.map(_.nrRelations).getOrElse(0)
        widths.get(base).foreach { w =>
          if (uct != w) failures += s"$name: UCT fired at $uct, main FROM lists $w"
        }
        // texts whose constants and date windows exist in the testdata must
        // actually produce rows (q10/q12 filter 1994 windows — the testdata
        // starts 1995, so their empties are correct)
        if (Seq("q01", "q03", "q06", "q14", "q18").contains(base)
            && rows.isEmpty)
          failures += s"$name: empty result for a matching filter"
      } catch {
        case e: Exception => failures += s"$name: ${e.getMessage.take(160)}"
      }
    }
    assert(failures.result().isEmpty,
      s"${failures.result().size} of 16 failed:\n${failures.result().mkString("\n")}")
  }

  test("generated partsupp joins both its parents with TPC-H multiplicity") {
    Tpch.ensure(spark, sf)
    val ps = spark.table("partsupp")
    val parts = spark.table("part")
    val supps = spark.table("supplier")
    import org.apache.spark.sql.functions.col
    // every partsupp row joins a real part AND a real supplier
    assert(ps.join(parts, col("ps_partkey") === col("p_partkey"), "left_anti").count() == 0)
    assert(ps.join(supps, col("ps_suppkey") === col("s_suppkey"), "left_anti").count() == 0)
    // ~4 suppliers per part (collisions dedup a few)
    val perPart = ps.groupBy("ps_partkey").count().agg(
      org.apache.spark.sql.functions.avg("count")).head.getDouble(0)
    assert(perPart > 2.5 && perPart <= 4.0, s"avg suppliers/part = $perPart")
  }
}
