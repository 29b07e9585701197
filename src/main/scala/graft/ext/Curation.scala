package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The end-to-end curation flow a pretraining-data pipeline runs over
  * a raw document corpus, composed from this library's operators into
  * ONE declarative plan (Catalyst fuses the projections; the only
  * shuffle is the dedup groupBy and the keep-list join):
  *
  *   language-ID → lexical quality score → exact-dedup keep list →
  *   filter (target langs, min quality, dedup survivor) →
  *   deterministic train/val/test assignment.
  *
  * Every stage is individually oracle-checked; `curated` is the
  * composition, oracle-checked as a whole (ExtOracle.curated). */
object Curation {

  def curated(docs: DataFrame, minQuality: Double = 0.5): DataFrame = {
    // langId and quality are both pure per-row projections — compute
    // them in ONE pass over the corpus (no join between them; Catalyst
    // fuses the two withColumns into a single projection). The only
    // joins left are against the dedup keep list, the only shuffles
    // the dedup groupBy — the minimum this flow can do.
    val perRow = TextAnalysis.withQuality(TextAnalysis.langId(docs))
      .select(col("doc_id"), col("lang_pred"), col("lang_conf"), col("quality"))
    val keepers = Dedup.exact(docs).select(col("keep_id").as("doc_id"))
    val kept = perRow
      .join(keepers, "doc_id") // inner join = survives dedup
      .where(col("lang_pred") =!= "zh" && col("quality") >= minQuality)
    Sampling.assignSplit(kept, "doc_id")
      .select("doc_id", "lang_pred", "quality", "split")
  }
}
