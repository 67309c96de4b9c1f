package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** ORC source/sink — second columnar interchange format next to parquet
  * (beyond-parity: the reference's only column store is its Java-serialized
  * buffer files, /root/reference/src/buffer/BufferManager.java:78-174).
  * Schema-on-read mirrors the Csv/Json surface; ORC keeps predicate-pushdown
  * and column-pruning behavior at scale via its own stripe statistics.
  */
object Orc {

  def load(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  def load(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).orc(path)

  def save(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)
}
