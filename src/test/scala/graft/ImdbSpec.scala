package graft

import graft.sources.Imdb

/** The reference's actual workload: all 113 join-order-benchmark SQL files
  * from /root/reference/imdb/queries must parse, plan, execute through the
  * engine's SQL facade over the synthesized IMDB fixture — and the UCT rule
  * must fire at each query's full relation width (the reference's identity
  * is exactly this corpus, widths 4–17).
  */
class ImdbSpec extends SparkSpec {

  test("all 113 reference IMDB queries parse, plan, execute; UCT fires at full width") {
    assume(java.nio.file.Files.isDirectory(java.nio.file.Paths.get(Imdb.queriesDir)))
    Imdb.ensure(spark)
    val files = Imdb.queryFiles
    assert(files.size == 113, s"expected the reference's 113 files, found ${files.size}")
    // learned orders are cached per plan — a query another suite already ran
    // would be a cache hit and report no stats; the sweep wants fresh fires
    plans.UctJoinReorderRule.clearCache()
    val failures = Seq.newBuilder[String]
    files.foreach { f =>
      val name = f.getFileName.toString
      val text = Imdb.queryText(name)
      val width = Imdb.relationCount(text)
      plans.UctJoinReorderRule.lastStats = None
      try {
        val rows = spark.sql(text).collect()
        // every JOB query is a single-row global MIN aggregate
        if (rows.length != 1) failures += s"$name: ${rows.length} rows"
        val uctWidth = plans.UctJoinReorderRule.lastStats.map(_.nrRelations).getOrElse(0)
        if (width >= 3 && uctWidth != width)
          failures += s"$name: UCT fired at width $uctWidth, FROM lists $width relations"
      } catch {
        case e: Exception => failures += s"$name: ${e.getMessage.take(160)}"
      }
    }
    assert(failures.result().isEmpty,
      s"${failures.result().size} of 113 failed:\n${failures.result().mkString("\n")}")
  }

  test("the four CORRECTNESS picks return non-trivial (non-NULL) results") {
    assume(java.nio.file.Files.isDirectory(java.nio.file.Paths.get(Imdb.queriesDir)))
    Imdb.ensure(spark)
    for (file <- Seq("06d.sql", "10a.sql", "17a.sql", "33c.sql")) {
      val row = spark.sql(Imdb.queryText(file)).collect().head
      assert((0 until row.length).exists(i => !row.isNullAt(i)),
        s"$file joined to an empty result — fixture density regressed")
    }
  }

  test("registry entries hash-verify EVERY reference JOB file exactly once") {
    assume(java.nio.file.Files.isDirectory(java.nio.file.Paths.get(Imdb.queriesDir)))
    val entries = graft.queries.ImdbQueries.all
    // files claimed by the individual entries (name suffix <-> file) and by
    // the composite oracles ('NNx.sql' AS qfile markers in the shipped SQL)
    val individual = entries.filter(_.name.contains("_imdb_"))
      .map(q => q.name.split("_imdb_")(1) + ".sql")
    val composite = entries.filter(_.name.contains("_job_batch"))
      .flatMap(q => "'(\\w+\\.sql)' AS qfile".r
        .findAllMatchIn(q.sql.getOrElse("")).map(_.group(1)).toSeq)
    val covered = individual ++ composite
    assert(covered.distinct.size == covered.size,
      "a JOB file is verified by more than one registry entry")
    val allFiles = Imdb.queryFiles.map(_.getFileName.toString).toSet
    assert(covered.toSet == allFiles,
      s"coverage mismatch: missing ${allFiles -- covered.toSet}, " +
        s"extra ${covered.toSet -- allFiles}")
  }
}
