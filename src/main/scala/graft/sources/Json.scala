package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** JSONL source/sink — the training-data interchange format (one JSON object
  * per line). Mirrors the Csv surface: explicit schema on read (no schema
  * inference pass at scale), partition-parallel, standard JSON escaping so
  * arbitrary document text round-trips byte-exactly. Beyond-parity vs the
  * reference (CSV only, /root/reference/src/diskio/LoadCSV.java).
  */
object Json {

  def load(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  def save(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)
}
