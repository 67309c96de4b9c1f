package graft

/** The SQL console facade: command vocabulary + SQL evaluation + error
  * handling (the reference's SkinnerCmd surface).
  */
class ConsoleSpec extends SparkSpec {

  private def eval(line: String): String = Console.eval(spark, sf, line)

  test("console lists tables and registry queries") {
    assert(eval("list").linesIterator.toSeq == Db.tableNames)
    val qs = eval("queries").linesIterator.toSeq
    assert(qs.contains("q01_pricing_summary") && qs.contains("q83_job_wide12"))
  }

  test("console runs SQL and prints a header plus rows") {
    val out = eval("SELECT r_name FROM region ORDER BY r_name;")
    val lines = out.linesIterator.toSeq
    assert(lines.head == "r_name")
    assert(lines.tail == Seq("AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"))
  }

  test("console bench times a registry query and rejects unknown names") {
    assert(eval("bench q06_forecast_revenue").matches(
      "q06_forecast_revenue: 1 rows in \\d+\\.\\d+ s"))
    assert(eval("BENCH q06_forecast_revenue").matches( // commands are case-insensitive
      "q06_forecast_revenue: 1 rows in \\d+\\.\\d+ s"))
    assert(eval("bench nope").contains("unknown query"))
  }

  test("console explain shows a plan; SQL errors are reported, not thrown") {
    val plan = eval("explain SELECT count(*) FROM region")
    assert(plan.contains("Aggregate") || plan.contains("HashAggregate"))
    assert(eval("SELECT bogus FROM region").startsWith("error:"))
  }
}
