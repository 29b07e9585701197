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

  /** Point token frequencies from the NATIVE Count-Min aggregate
    * (`graft.functions.CmsSketch`) — the engine-checkable counterpart
    * to `tokenCountMin` (which rides `df.stat.countMinSketch`, a
    * driver-side object with engine-opaque seeds): the whole
    * depth×width counter matrix is one mergeable aggregate with
    * CONSTANT state (32 KB at 4×1024), built in a single
    * map-combinable pass, and every estimate is exact integer
    * arithmetic the oracle recomputes bucket by bucket. Output per
    * probe token: the CMS estimate (upper-biased: est ≥ true), the
    * exact count (probe-proportional — the honesty column), and the
    * collision overestimate.
    *
    * Scale shape: ONE 1-row sketch aggregate over the token-instance
    * stream (state constant, shuffle = one matrix per partial);
    * probe hashing is a |probes|-row projection; exact counts filter
    * to the probe set SCAN-SIDE (probe-proportional, never
    * vocabulary-proportional — the bm25TopK rule). */
  def cmsTokenFreq(docs: DataFrame, probes: Seq[String],
      depth: Int = 4, width: Int = 1024): DataFrame = {
    import org.apache.spark.sql.functions.{broadcast => bc}
    require(probes.nonEmpty)
    val toks = docs.select(
      explode(split(trim(col("text")), "\\s+")).as("token"))
    val m = toks
      .select(graft.functions.PolyHash64.polyhash64(col("token")).as("h"))
      .agg(graft.functions.CmsSketch.cmsSketch(col("h"), depth, width)
        .as("m"))
    val exact = toks.where(col("token").isin(probes.distinct: _*))
      .groupBy(col("token")).agg(count(lit(1)).as("exact_freq"))
    val spark = docs.sparkSession
    import spark.implicits._
    val probeDf = probes.distinct.toDF("token")
      .select(col("token"),
        graft.functions.PolyHash64.polyhash64(col("token")).as("h"))
    val cells = (0 until depth).map { i =>
      element_at(col("m"),
        lit(i * width + 1) +
          ((col("h") * (2L * i + 1L) + lit(i.toLong * graft.functions.CmsSketch.GOLD))
            .bitwiseAND(width - 1L)).cast("int"))
    }
    probeDf.crossJoin(bc(m))
      .select(col("token"), least(cells: _*).as("est_freq"))
      .join(exact, Seq("token"), "left")
      .select(col("token"), col("est_freq"),
        coalesce(col("exact_freq"), lit(0L)).as("exact_freq"))
      .withColumn("overestimate", col("est_freq") - col("exact_freq"))
  }

  /** KMV join-cardinality estimation — the pre-shuffle planner number:
    * distinct-key counts per side, key-set Jaccard, and the estimated
    * distinct-key INTERSECTION of a join, all from two constant-size
    * sketches (k minima of the Fibonacci-mixed key hash per side, one
    * map-combinable aggregate each). At 100 TB this is how you decide
    * broadcast-vs-shuffle or flag a blowup join BEFORE paying the
    * exchange: the sketches cost one narrow scan per side and merge by
    * taking minima-of-minima — the Beyer et al. (PODS'07) KMV set-
    * operation estimators.
    *
    *   est_distinct   = (k−1)·2⁶⁴ / kth_min        (exact below k)
    *   est_jaccard    = |topk(A∪B) ∩ A ∩ B| / |topk(A∪B)|
    *   est_intersection = est_jaccard · est_union
    *
    * Determinism: the k minima of a fixed hash are a pure function of
    * the data (no rand, no HLL bias) — every number here is
    * oracle-checked exactly. Unsigned ordering of the merged sketch
    * rides the sign-bit flip (x ⊕ 2⁶³ preserves unsigned order in the
    * signed domain); the twin sorts native HUGEINTs.
    *
    * Scale shape: two map-combinable 1-row sketch aggregates (state =
    * k longs each), then pure array expressions on a 1×1 crossJoin —
    * nothing after the scans is data-proportional. */
  def joinCardinalityEstimate(left: DataFrame, leftKey: String,
      right: DataFrame, rightKey: String, k: Int = 256): DataFrame = {
    val gold = lit(-7046029254386353131L) // 11400714819323198485 signed
    val MIN = lit(Long.MinValue)
    def sketch(df: DataFrame, key: String, as: String): DataFrame =
      df.select((col(key).cast("long") * gold).as("h"))
        .agg(graft.functions.KmvSketch.kmvSketch(col("h"), k).as(as))
    val merged = sketch(left, leftKey, "la")
      .crossJoin(sketch(right, rightKey, "lb"))
      .withColumn("mu", slice(array_sort(array_distinct(
        transform(concat(col("la"), col("lb")), x => x.bitwiseXOR(MIN)))),
        1, k))
      .withColumn("n_union_topk", size(col("mu")).cast("long"))
      .withColumn("n_common_topk",
        size(filter(col("mu"), x =>
          array_contains(col("la"), x.bitwiseXOR(MIN)) &&
            array_contains(col("lb"), x.bitwiseXOR(MIN)))).cast("long"))
    def est(arr: Column): Column =
      when(size(arr) < k, size(arr).cast("double"))
        .otherwise((lit((k - 1).toDouble) * lit(18446744073709551616.0)) /
          graft.functions.UnsignedToDouble.unsignedToDouble(
            element_at(arr, k)))
    val withEsts = merged
      .withColumn("est_distinct_left", est(col("la")))
      .withColumn("est_distinct_right", est(col("lb")))
      .withColumn("est_union",
        when(col("n_union_topk") < k, col("n_union_topk").cast("double"))
          .otherwise((lit((k - 1).toDouble) * lit(18446744073709551616.0)) /
            graft.functions.UnsignedToDouble.unsignedToDouble(
              element_at(col("mu"), k).bitwiseXOR(MIN))))
      .withColumn("est_jaccard",
        // empty/all-null sides leave the merged sketch empty —
        // jaccard of two empty key sets is 0, not 0/0
        when(col("n_union_topk") === 0L, lit(0.0))
          .otherwise(col("n_common_topk").cast("double")
            / col("n_union_topk").cast("double")))
    withEsts.select(col("est_distinct_left"), col("est_distinct_right"),
      col("n_union_topk"), col("n_common_topk"), col("est_union"),
      col("est_jaccard"),
      (col("est_jaccard") * col("est_union")).as("est_intersection"))
  }
}
