package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Storage-layout operators: multi-dimensional clustering for scan pruning
  * and small-file compaction — the file-layout hygiene a 100 TB corpus
  * needs before any of the query-side pruning (parquet min/max row-group
  * stats, partition filters) can bite. The reference's single-node engine
  * gets the same effect from its in-memory positional indexes
  * (src/indexing/Index.java); on a distributed object store the index IS
  * the file layout.
  *
  * Z-ordering: interleaving the bits of two quantized dimensions gives
  * every output file a bounded min/max box in BOTH dimensions, so a range
  * predicate on either (or both) prunes most files from the listing alone
  * — where a linear sort bounds only its leading column. All math is
  * built-in bitwise/shift expressions (whole-stage codegen, no UDF).
  */
object Layout {

  /** Spread the low 16 bits of `x` to even bit positions (Morton magic
    * masks, the classic O(log bits) shift/mask cascade). */
  private def spread16(x: Column): Column = {
    var v = x.cast("long")
    v = (v.bitwiseOR(shiftleft(v, 8))).bitwiseAND(lit(0x00FF00FFL))
    v = (v.bitwiseOR(shiftleft(v, 4))).bitwiseAND(lit(0x0F0F0F0FL))
    v = (v.bitwiseOR(shiftleft(v, 2))).bitwiseAND(lit(0x33333333L))
    v = (v.bitwiseOR(shiftleft(v, 1))).bitwiseAND(lit(0x55555555L))
    v
  }

  /** Morton (Z-order) value of two columns quantized to 16-bit ranks over
    * [lo, hi]. Monotone in each dimension; nearby (a,b) pairs land on
    * nearby z values, which is what bounds each output file's min/max box. */
  def zValue(a: Column, aLo: Column, aHi: Column,
             b: Column, bLo: Column, bHi: Column): Column = {
    def quant(c: Column, lo: Column, hi: Column): Column =
      // denominator in double: hi - lo + 1 in long arithmetic overflows for
      // extreme column ranges (hi ~ Long.MaxValue, lo < 0)
      least(lit(65535), greatest(lit(0),
        floor((c.cast("double") - lo.cast("double"))
            / (hi.cast("double") - lo.cast("double") + 1d) * 65536)
          .cast("long"))).cast("int")
    spread16(quant(a, aLo, aHi))
      .bitwiseOR(shiftleft(spread16(quant(b, bLo, bHi)), 1))
  }

  /** Write `df` z-order-clustered on two numeric columns into `nFiles`
    * range partitions of contiguous z runs. One extra aggregate pass
    * computes the quantization bounds; the write itself is one
    * range-shuffle — both scale linearly. */
  def writeZOrdered(df: DataFrame, colA: String, colB: String, path: String,
                    nFiles: Int): Unit = {
    val Array(r) = df.agg(
      min(col(colA)).cast("long"), max(col(colA)).cast("long"),
      min(col(colB)).cast("long"), max(col(colB)).cast("long")).collect()
    if (r.isNullAt(0) || r.isNullAt(2)) {
      // empty input (or all-null cluster column): no bounds to quantize —
      // write the empty frame rather than dereferencing a null aggregate
      df.write.mode("overwrite").parquet(path)
      return
    }
    val z = zValue(
      col(colA), lit(r.getLong(0)), lit(r.getLong(1)),
      col(colB), lit(r.getLong(2)), lit(r.getLong(3)))
    df.withColumn("__z", z)
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }

  /** Per-file min/max boxes of two columns — the same statistics a parquet
    * footer carries, surfaced as a DataFrame for pruning analysis/specs. */
  def fileBoxes(spark: SparkSession, path: String,
                colA: String, colB: String): DataFrame =
    spark.read.parquet(path)
      .groupBy(input_file_name().as("file"))
      .agg(min(col(colA)).as("a_min"), max(col(colA)).as("a_max"),
           min(col(colB)).as("b_min"), max(col(colB)).as("b_max"))

  /** Rewrite a parquet directory into files of ~`targetBytes` each — the
    * small-file compaction every long-running ingest needs (row-group and
    * footer overhead, listing cost, and task-scheduling overhead all scale
    * with file COUNT, not bytes). Returns the compacted frame. */
  def compact(spark: SparkSession, inPath: String, outPath: String,
              targetBytes: Long): DataFrame = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(inPath), spark.sparkContext.hadoopConfiguration)
    val bytes = fs.getContentSummary(
      new org.apache.hadoop.fs.Path(inPath)).getLength
    val nFiles = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
    spark.read.parquet(inPath)
      .repartition(nFiles)
      .write.mode("overwrite").parquet(outPath)
    spark.read.parquet(outPath)
  }
}
