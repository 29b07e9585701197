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

  /** Per-source distinct-token cardinality via a KMV (k-minimum-values)
    * sketch — the vocabulary-size dashboard number computed WITHOUT a
    * vocabulary-wide exchange: the native `kmv_sketch` aggregate
    * (graft.functions.KmvSketch, a TypedImperativeAggregate) keeps the
    * k smallest distinct `polyhash64(token)` values per source with
    * constant mergeable state, so map-side partials carry k longs per
    * source and the shuffle is |sources|·k longs at ANY corpus scale.
    * Estimate = (k−1)·2⁶⁴ / kth_min (exact when a source holds < k
    * distinct hashes). Deterministic — the k minima of a fixed hash
    * are a pure function of the data — hence oracle-checkable: DuckDB
    * reproduces the same minima with a rank window at test scale, and
    * the estimate is one fixed double expression from exact integer
    * inputs (correctly-rounded unsigned→double on both engines).
    * Returns (source, n_kept, kth_hash, est_distinct). */
  def kmvCardinality(docs: DataFrame, k: Int = 16): DataFrame = {
    // polyhash64 alone is not uniform in the HIGH bits for short
    // tokens (the estimator reads order statistics of the full 2⁶⁴
    // range), so finalize with the Fibonacci multiply mod 2⁶⁴ — the
    // same golden-constant mixing the MinHash affine family uses.
    // Java long multiplication wraps ≡ mod 2⁶⁴.
    val gold = lit(-7046029254386353131L) // 11400714819323198485 as signed
    val h = docs.select(col("source"),
        explode(split(trim(col("text")), "\\s+")).as("tok"))
      .select(col("source"),
        (graft.functions.PolyHash64.polyhash64(col("tok")) * gold).as("h"))
    h.groupBy(col("source"))
      .agg(graft.functions.KmvSketch.kmvSketch(col("h"), k).as("mins"))
      .select(col("source"), size(col("mins")).cast("long").as("n_kept"),
        element_at(col("mins"), size(col("mins"))).as("kth_hash"))
      .withColumn("est_distinct",
        when(col("n_kept") < k, col("n_kept").cast("double"))
          .otherwise(
            (lit((k - 1).toDouble) * lit(18446744073709551616.0)) /
              graft.functions.UnsignedToDouble.unsignedToDouble(col("kth_hash"))))
  }
}
