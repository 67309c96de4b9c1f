package graft.queries

import graft.Db
import graft.operators.Multimodal
import org.apache.spark.sql.functions.col

/** Multimodal-column pipeline surface. The decode step is a deterministic
  * stub (see graft.operators.Multimodal); the oracle checks the full Spark
  * plumbing end-to-end because the stub's arithmetic is reproducible in SQL.
  */
object Media {

  val all: Seq[Q] = Seq(
    Q("q70_multimodal_features", Some("""
      SELECT doc_id, 'text/plain' AS media_type,
        CAST(strlen(text) AS INT) AS n_bytes,
        CAST(16 + strlen(text) % 64 AS INT) AS width,
        CAST(16 + (strlen(text) * 7) % 64 AS INT) AS height,
        CAST(1 + strlen(text) % 8 AS INT) AS n_frames,
        (strlen(text) % 1000) / 997.0 AS feature_mean
      FROM documents ORDER BY doc_id"""),
      (s, dir) => Multimodal
        .extractFeatures(Multimodal.mediaFromDocuments(s, Db(s, dir).documents))
        .toDF().orderBy("doc_id"))
  )
}
