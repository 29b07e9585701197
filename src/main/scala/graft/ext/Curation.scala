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

  /** The FULL pretraining-corpus build — every curation tier this
    * library implements, composed into one declarative plan:
    *
    *   per-row lang-ID + lexical quality (one fused projection) →
    *   corpus-LM quality (`TextAnalysis.lmQuality`) →
    *   repetition score → exact-dedup keep list →
    *   SEMANTIC dedup over the embedding table (SemDeDup losers
    *   anti-joined; docs without an embedding pass through) →
    *   threshold filters → leakage-safe split (near-dup clusters
    *   move between splits atomically).
    *
    * Cost anatomy at 100 TB: two corpus-wide shuffles from lmQuality
    * (tok-freq agg + per-doc rollup), one from the exact-dedup
    * groupBy, the shingle explode feeding the split's pair graph, and
    * the cell-partitioned semantic self-join over the (much smaller)
    * embedding table; every filter and score is otherwise fused into
    * scan-side projections, and the loser/keeper join sides are dup
    * slivers — broadcast lookups, never corpus-wide shuffles. */
  def pretrainingCorpus(docs: DataFrame, emb: DataFrame,
      minQuality: Double = 0.5, minMeanLogProb: Double = -4.0,
      maxRepetition: Double = 0.5): DataFrame = {
    val perRow = TextAnalysis.withQuality(TextAnalysis.langId(docs))
      .select(col("doc_id"), col("lang_pred"), col("quality"))
    val lm = TextAnalysis.lmQuality(docs).select(col("doc_id"), col("mean_logprob"))
    val rep = TextAnalysis.repetitionScore(docs).select(col("doc_id"), col("repetition"))
    val keepers = Dedup.exact(docs).select(col("keep_id").as("doc_id"))
    val semLosers = Similarity.semanticDupLosers(emb)
      .select(col("vec_id").as("doc_id"))
    val split = Sampling.leakageSafeSplit(docs, Dedup.ngramJaccardPairs(docs))
      .select(col("doc_id"), col("split"))
    perRow
      .join(lm, "doc_id").join(rep, "doc_id").join(split, "doc_id")
      .join(keepers, Seq("doc_id"), "left_semi")
      .join(semLosers, Seq("doc_id"), "left_anti")
      .where(col("quality") >= minQuality &&
        col("mean_logprob") >= minMeanLogProb &&
        col("repetition") <= maxRepetition)
      .select("doc_id", "lang_pred", "quality", "mean_logprob",
        "repetition", "split")
  }
}
