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

  test("console exec runs a multi-statement SQL file") {
    val f = java.nio.file.Files.createTempFile("graft_exec", ".sql")
    java.nio.file.Files.writeString(f,
      "SELECT count(*) AS n FROM region;\nSELECT min(n_name) AS m FROM nation;")
    val out = eval(s"exec $f")
    assert(out.contains("n\n5"), s"unexpected exec output:\n$out")
    assert(out.contains("m\nNATION_0"), s"unexpected exec output:\n$out")
  }

  test("console bench over a query directory writes a per-query CSV") {
    val qdir = java.nio.file.Files.createTempDirectory("graft_qdir")
    java.nio.file.Files.writeString(qdir.resolve("a_count.sql"),
      "SELECT count(*) FROM region;")
    java.nio.file.Files.writeString(qdir.resolve("b_join.sql"),
      "SELECT count(*) FROM nation, region WHERE n_regionkey = r_regionkey")
    val out = qdir.resolve("bench.csv")
    assert(eval(s"bench $qdir $out").contains("2 query timings"))
    val lines = scala.io.Source.fromFile(out.toString).getLines().toSeq
    assert(lines.head == "Query,Millis,Rows")
    assert(lines.exists(_.startsWith("a_count.sql,")))
    assert(lines.exists(_.startsWith("b_join.sql,")))
  }

  test("console explain shows a plan; SQL errors are reported, not thrown") {
    val plan = eval("explain SELECT count(*) FROM region")
    assert(plan.contains("Aggregate") || plan.contains("HashAggregate"))
    assert(eval("SELECT bogus FROM region").startsWith("error:"))
  }

  test("console index buckets a table; same-key join over it has no shuffle") {
    Db(spark, sf).registerAll()
    val msg = eval("index nation n_nationkey")
    assert(msg.contains("nation_by_n_nationkey"), msg)
    val t = spark.table("nation_by_n_nationkey")
    assert(t.count() == 25)
    // joining two scans of the bucketed table on the bucket key needs no
    // shuffle exchange on either side — the "index" is the co-located
    // layout (broadcast disabled so the planner actually uses the buckets)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = t.join(spark.table("nation_by_n_nationkey").select(
        org.apache.spark.sql.functions.col("n_nationkey").as("k"),
        org.apache.spark.sql.functions.col("n_name").as("m")),
        org.apache.spark.sql.functions.col("n_nationkey") ===
          org.apache.spark.sql.functions.col("k"))
      assert(joined.count() == 25)
      assert(!joined.queryExecution.executedPlan.toString
        .contains("Exchange hashpartitioning"),
        "bucketed self-join must not shuffle")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("console compress rewrites a table zstd-compressed and rebinds the view") {
    Db(spark, sf).registerAll()
    val msg = eval("compress region")
    assert(msg.contains("compressed region") && msg.contains("bytes"), msg)
    assert(eval("SELECT count(*) AS n FROM region").contains("5"),
      "the rebound view must still serve the data")
    val part = new java.io.File(s"${Scratch.root}/compressed/region")
      .listFiles.filter(_.getName.endsWith(".parquet"))
    assert(part.nonEmpty && part.forall(_.getName.contains("zstd")),
      s"expected zstd part files, got ${part.map(_.getName).toSeq}")
  }

  test("statement split honors ';' inside string literals and quoted identifiers") {
    assert(Console.splitStatements("SELECT ';' AS a; SELECT 'x;''y;' AS b")
      .map(_.trim) == Seq("SELECT ';' AS a", "SELECT 'x;''y;' AS b"))
    assert(Console.splitStatements("""SELECT 1 AS "a;b"; SELECT 2""")
      .map(_.trim) == Seq("""SELECT 1 AS "a;b"""", "SELECT 2"))
    // and a literal containing ';' survives end-to-end through exec
    val f = java.nio.file.Files.createTempFile("graft_split", ".sql")
    java.nio.file.Files.writeString(f, "SELECT ';x' AS s;\nSELECT count(*) AS n FROM region;")
    val out = eval(s"exec $f")
    assert(out.contains(";x"), s"literal ';' broke the split:\n$out")
    assert(out.contains("n\n5"), s"second statement lost:\n$out")
  }
}
