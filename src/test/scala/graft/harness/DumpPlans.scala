package graft

/** Scratch: dump `.explain("formatted")` for named registry queries to
  * files (the plans/rNN/<query>_{before,after}.txt artifacts the
  * optimization rounds commit). Usage:
  *   tools/run.sh graft.DumpPlans <sfDir> <outDir> <suffix> <query...>
  */
object DumpPlans {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, suffix, rest @ _*) = args: @unchecked
    val spark = GraftSession.create()
    queries.OperatorGates.ensureFixtures(spark, sfDir)
    if (rest.exists(_.startsWith("q1"))) {
      sources.Imdb.ensure(spark)
      sources.Tpch.ensure(spark, sfDir)
    }
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    rest.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(outDir, s"${name}_$suffix.txt"), plan)
      System.err.println(s"wrote $outDir/${name}_$suffix.txt")
    }
    spark.stop()
  }
}
