package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fixed-size sketch aggregations — the sub-linear state versions of
  * exact answers that stop scaling: each is partial-aggregatable
  * (constant-size state per task, merged associatively), so at 100 TB
  * the shuffle carries kilobytes of sketch instead of the keyspace.
  * Companions to `TextAnalysis.vocabSize` (HLL); each op's exact twin
  * runs at test scale and ScaleOpsSpec bounds the estimation error.
  *
  *  - `tokenCountMin`: Count-Min point frequencies for a set of probe
  *    tokens (heavy-hitter monitoring without a token->count shuffle).
  *  - `approxQuantiles`: KLL-style rank sketch (Spark's
  *    `approx_percentile`) for latency/length distribution cutoffs —
  *    e.g. the token-length p99 used to pick a truncation limit.
  */
object Sketches {

  /** Estimated frequencies of `probes` from ONE Count-Min pass over
    * the token stream. eps/confidence size the sketch (state =
    * O(1/eps · ln(1/confidence)) counters regardless of corpus size);
    * estimates are upper-biased: est >= true, est <= true + eps·N with
    * prob >= confidence. */
  def tokenCountMin(docs: DataFrame, probes: Seq[String],
      eps: Double = 0.001, confidence: Double = 0.99): DataFrame = {
    val tokens = docs.select(
      explode(split(trim(col("text")), "\\s+")).as("token"))
    val sketch = tokens.stat.countMinSketch(
      col("token"), eps, confidence, seed = 42)
    val rows = probes.map(p => (p, sketch.estimateCount(p)))
    docs.sparkSession.createDataFrame(rows).toDF("token", "est_freq")
  }

  /** Approximate quantiles of a numeric column (one pass, mergeable
    * rank-sketch state). `accuracy` trades state for rank error
    * 1/accuracy. */
  def approxQuantiles(df: DataFrame, valueCol: Column,
      quantiles: Seq[Double], accuracy: Int = 10000): DataFrame =
    df.agg(percentile_approx(valueCol,
      array(quantiles.map(lit): _*), lit(accuracy)).as("q"))
}
