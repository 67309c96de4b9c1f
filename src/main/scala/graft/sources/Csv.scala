package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** CSV source/sink mirroring the reference's loader semantics
  * (/root/reference/src/diskio/LoadCSV.java:96-185: explicit schema, a
  * configurable null-representation string, separator) on Spark's native
  * reader — schema-on-read, no 2-pass line counting, partition-parallel.
  */
object Csv {

  def load(spark: SparkSession, path: String, schema: StructType,
           separator: String = ",", nullRepresentation: String = ""): DataFrame =
    spark.read
      .schema(schema)
      .option("sep", separator)
      .option("nullValue", nullRepresentation)
      .option("timestampNTZFormat", "yyyy-MM-dd HH:mm:ss")
      .csv(path)

  def save(df: DataFrame, path: String,
           separator: String = ",", nullRepresentation: String = ""): Unit =
    df.write.mode("overwrite")
      .option("sep", separator)
      .option("nullValue", nullRepresentation)
      .csv(path)
}
