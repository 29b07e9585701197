package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Table profiling — the per-column data-quality report (row/null/
  * distinct counts, min/max) every ingestion pipeline publishes before
  * training jobs trust a new drop.
  *
  * Determinism contract: doubles are quantized to integer cents before
  * min/max (round is monotone, so min∘round = round∘min — and the
  * rendered string avoids engine-specific double formatting, e.g.
  * Java's "1.0E-7" vs C's "1e-07"); everything else renders via the
  * native type's string cast.
  *
  * Scale shape: ONE aggregate pass computes every column's stats
  * (`exact = true` uses exact count-distinct — Spark plans multiple
  * distinct aggregates via Expand, duplicating the scan once per
  * distinct column, fine to ~10 columns; at 100 TB or wide schemas
  * pass `exact = false` for HLL `approx_count_distinct` — fixed-size
  * state, one scan, no Expand). The per-column report rows explode
  * from the single 1-row aggregate — no union-of-aggregates. */
object Profiling {

  def profile(df: DataFrame, cols: Seq[String],
      exact: Boolean = true): DataFrame = {
    require(cols.nonEmpty)
    val aggs = cols.flatMap { c =>
      // Quantize EVERY fractional type (double, float, decimal), not
      // just double: float/decimal min/max would otherwise render via
      // engine-specific string formatting — exactly the cross-engine
      // hazard the quantization exists to avoid. Floats widen to
      // double first (exact). Decimals scale in DECIMAL arithmetic —
      // a cast("double") hop would lose exactness for scale > 2 or
      // magnitudes past 2^53/100, re-opening the parity gap for wide
      // decimals; round() on a decimal stays exact at scale 0.
      val dt = df.schema(c).dataType
      val isDecimal = dt.isInstanceOf[org.apache.spark.sql.types.DecimalType]
      val isBinaryFloat = dt == org.apache.spark.sql.types.DoubleType ||
        dt == org.apache.spark.sql.types.FloatType
      val v =
        if (isDecimal) round(col(c) * 100).cast("long")
        else if (isBinaryFloat) round(col(c).cast("double") * 100).cast("long")
        else col(c)
      Seq(
        count(col(c)).as(s"__cnt_$c"),
        (if (exact) countDistinct(col(c))
         else approx_count_distinct(col(c))).as(s"__dst_$c"),
        min(v).cast("string").as(s"__min_$c"),
        max(v).cast("string").as(s"__max_$c"))
    } :+ count(lit(1)).as("__n")
    val one = df.agg(aggs.head, aggs.tail: _*)
    one.select(explode(array(cols.map { c =>
      struct(lit(c).as("col_name"),
        col("__n").as("n_rows"),
        (col("__n") - col(s"__cnt_$c")).as("n_null"),
        col(s"__dst_$c").as("n_distinct"),
        col(s"__min_$c").as("min_s"),
        col(s"__max_$c").as("max_s"))
    }: _*)).as("r")).select(col("r.col_name"), col("r.n_rows"),
      col("r.n_null"), col("r.n_distinct"), col("r.min_s"), col("r.max_s"))
  }

  /** Corpus snapshot diff — row-level change audit between two corpus
    * versions: added / removed / changed / unchanged per key, with
    * "changed" decided on the payload's sha256 (32-byte compare, not
    * document bodies). The versioning primitive behind "what did
    * yesterday's crawl replace?" reviews and incremental downstream
    * invalidation.
    *
    * Scale shape: payloads hash in the scan projection; the diff is
    * ONE full-outer join on the key carrying (key, digest) rows
    * only. */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame,
      key: String = "doc_id", payload: String = "text"): DataFrame = {
    // presence comes from explicit side flags, NOT from the digest's
    // nullness: sha2(NULL payload) is NULL, so a matched key whose OLD
    // body was NULL would otherwise mislabel as "added"; the digest
    // compare is null-safe (<=>) so NULL→NULL is unchanged and
    // NULL→body is changed
    val o = oldDf.select(col(key), sha2(col(payload), 256).as("__oh"),
      lit(1).as("__ol"))
    val n = newDf.select(col(key), sha2(col(payload), 256).as("__nh"),
      lit(1).as("__nl"))
    o.join(n, Seq(key), "full_outer")
      .select(col(key),
        when(col("__ol").isNull, "added")
          .when(col("__nl").isNull, "removed")
          .when(not(col("__oh") <=> col("__nh")), "changed")
          .otherwise("unchanged").as("status"))
  }

  /** Cross-table referential audit — does every document have an
    * embedding, and vice versa? One full-outer join on the key, one
    * aggregate: distinct keys on each side, matched keys, and the
    * orphan counts that signal a broken ingest (an embedding job that
    * silently skipped a shard shows up as left_only > 0). Keys are
    * compared DISTINCT (duplicates are a per-table profile concern,
    * not a referential one).
    *
    * Scale shape: two distinct projections (map-side combinable) and
    * one key-partitioned full-outer join, then a 1-row aggregate. */
  def referentialAudit(left: DataFrame, leftKey: String,
      right: DataFrame, rightKey: String): DataFrame = {
    val l = left.select(col(leftKey).as("__k")).distinct()
      .withColumn("__l", lit(1))
    val r = right.select(col(rightKey).as("__k")).distinct()
      .withColumn("__r", lit(1))
    l.join(r, Seq("__k"), "full_outer")
      .agg(
        coalesce(sum(col("__l")), lit(0L)).cast("long").as("n_left_keys"),
        coalesce(sum(col("__r")), lit(0L)).cast("long").as("n_right_keys"),
        coalesce(sum(when(col("__l").isNotNull && col("__r").isNotNull, 1L)
          .otherwise(0L)), lit(0L)).as("n_matched"),
        coalesce(sum(when(col("__r").isNull, 1L).otherwise(0L)), lit(0L))
          .as("n_left_only"),
        coalesce(sum(when(col("__l").isNull, 1L).otherwise(0L)), lit(0L))
          .as("n_right_only"))
  }

  /** Equi-depth histogram — `bins` buckets holding ~equal row counts
    * with their value ranges: the distribution summary feature
    * engineering and optimizer statistics both want (equi-WIDTH bins
    * collapse under heavy tails; equi-depth adapts resolution to the
    * mass). Boundary values are the exact weighted percentiles of the
    * integer-cents-quantized values (the Profiling money rule), bin
    * assignment counts boundaries strictly below the value — ties land
    * deterministically in the lowest eligible bin on both engines.
    *
    * Scale shape: values collapse to (cents, freq) counts first
    * (map-side combinable, state = |distinct values|); boundaries are
    * ONE 1-row exact-percentile aggregate over that table, broadcast;
    * binning is a scan-side HOF over the boundary array; the final
    * rollup is |bins| rows. */
  def equiDepthHistogram(df: DataFrame, valueCol: String,
      bins: Int = 10): DataFrame = {
    require(bins >= 2, "need at least two bins")
    val counts = df
      .select(round(col(valueCol).cast("double") * 100).cast("long").as("cv"))
      .groupBy(col("cv")).agg(count(lit(1)).as("__f"))
    val fracs = (1 until bins).map(i => i.toDouble / bins)
    val bounds = counts.agg(
      expr(s"percentile(cv, array(${fracs.mkString(", ")}), __f)").as("__b"))
    counts.crossJoin(broadcast(bounds))
      .select(col("cv"), col("__f"),
        aggregate(col("__b"), lit(0),
          (acc, b) => acc + when(col("cv").cast("double") > b, 1)
            .otherwise(0)).cast("long").as("bin"))
      .groupBy(col("bin"))
      .agg(sum(col("__f")).as("n_rows"),
        min(col("cv")).as("min_cents"), max(col("cv")).as("max_cents"))
  }

  /** k-anonymity audit — the re-identification risk report for a
    * table about to be released or joined into training data: rows
    * whose quasi-identifier combination (`quasiCols`) is shared by
    * fewer than `k` rows sit in an equivalence class small enough to
    * single a person out (the governance complement to
    * `TextAnalysis.scrubPii`, which handles direct identifiers —
    * quasi-identifiers leak through combinations, not columns).
    * One summary row: class counts, the smallest class, and how many
    * rows are at risk.
    *
    * Scale shape: one map-side-combinable groupBy on the
    * quasi-identifier key, then a 1-row rollup of the class-size
    * table — state bounded by distinct quasi-identifier combinations,
    * never row count. */
  def kAnonymity(df: DataFrame, quasiCols: Seq[String],
      k: Int = 5): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier")
    df.groupBy(quasiCols.map(col): _*).agg(count(lit(1)).as("n_rows"))
      .agg(count(lit(1)).as("n_classes"),
        sum(col("n_rows")).as("n_rows_total"),
        min(col("n_rows")).as("min_class_size"),
        sum(when(col("n_rows") < k, 1L).otherwise(0L))
          .as("n_small_classes"),
        sum(when(col("n_rows") < k, col("n_rows")).otherwise(0L))
          .as("n_rows_at_risk"))
      .withColumn("at_risk_rate",
        col("n_rows_at_risk").cast("double")
          / col("n_rows_total").cast("double"))
  }

  /** PSI drift — the population-stability index between the first and
    * second time-halves of a value stream, the production-ML
    * distribution-shift monitor (PSI < 0.1 stable, 0.1–0.25 drifting,
    * > 0.25 shifted — the thresholds every model-monitoring runbook
    * quotes): equi-depth bins are learned on the REFERENCE half and
    * applied to both, per-bin shares compared as
    * Σ (p_cur − p_ref)·ln(p_cur/p_ref). Complements `eventAnomaly`
    * (volume spikes) with VALUE-distribution movement — a payment
    * processor that silently changes units fires here first.
    *
    * Determinism: the time split is integer-µs midpoint arithmetic;
    * bin boundaries are the exact weighted percentiles of the
    * reference half's integer-cents counts; shares use add-1
    * smoothing ((n+1)/(N+bins) — empty current bins must not produce
    * ln 0); the log factor is quantized round(ln·10⁶) per bin and the
    * contribution is a fixed double product. Returns per-bin rows —
    * Σ psi_contrib IS the PSI.
    *
    * Scale shape: values collapse to (cents, is_ref) counts
    * (map-combinable); boundaries are ONE 1-row percentile aggregate
    * over the reference slice of that table, broadcast; binning is a
    * scan-side HOF; the rollup is |bins| rows. */
  def psiDrift(df: DataFrame, valueCol: String = "value",
      tsCol: String = "ts", bins: Int = 10): DataFrame = {
    require(bins >= 2)
    val base = df.select(
      round(col(valueCol).cast("double") * 100).cast("long").as("cv"),
      unix_micros(col(tsCol).cast("timestamp")).as("us"))
    val mid = base.agg(expr("(min(us) + max(us)) div 2").as("mid"))
    val counts = base.crossJoin(broadcast(mid))
      .select(col("cv"), (col("us") < col("mid")).as("is_ref"))
      .groupBy(col("cv"), col("is_ref")).agg(count(lit(1)).as("__f"))
    val fracs = (1 until bins).map(i => i.toDouble / bins)
    val bounds = counts.where(col("is_ref"))
      .agg(expr(s"percentile(cv, array(${fracs.mkString(", ")}), __f)")
        .as("__b"))
    // Heavy ties in the reference half can duplicate percentile
    // boundaries, leaving some of the `bins` bins with no rows from
    // EITHER half — those bins still owe their add-1 smoothing term
    // (the standard smoothed PSI sums over the full bin domain), so
    // materialize 0..bins-1 and left-join the observed counts in.
    val domain = df.sparkSession.range(bins).select(col("id").as("bin"))
    val binned = domain.join(
      counts.crossJoin(broadcast(bounds))
        .select(col("is_ref"), col("__f"),
          aggregate(col("__b"), lit(0),
            (acc, b) => acc + when(col("cv").cast("double") > b, 1)
              .otherwise(0)).cast("long").as("bin"))
        .groupBy(col("bin"))
        .agg(sum(when(col("is_ref"), col("__f")).otherwise(0L)).as("n_ref0"),
          sum(when(!col("is_ref"), col("__f")).otherwise(0L)).as("n_cur0")),
      Seq("bin"), "left")
      .select(col("bin"), coalesce(col("n_ref0"), lit(0L)).as("n_ref"),
        coalesce(col("n_cur0"), lit(0L)).as("n_cur"))
    val tots = binned.agg(sum(col("n_ref")).as("t_ref"),
      sum(col("n_cur")).as("t_cur"))
    binned.crossJoin(broadcast(tots))
      .withColumn("p_ref",
        (col("n_ref") + 1L).cast("double")
          / (col("t_ref") + bins.toLong).cast("double"))
      .withColumn("p_cur",
        (col("n_cur") + 1L).cast("double")
          / (col("t_cur") + bins.toLong).cast("double"))
      .select(col("bin"), col("n_ref"), col("n_cur"),
        col("p_ref"), col("p_cur"),
        ((col("p_cur") - col("p_ref"))
          * (round(log(col("p_cur") / col("p_ref")) * 1000000)
            .cast("long").cast("double") / 1000000)).as("psi_contrib"))
  }

  /** Hourly event-volume anomaly score — per (event_type, hour) count
    * z-scored against the event type's own hourly distribution: the
    * ingestion-health dashboard that catches a stuck producer (z ≪ 0)
    * or a replay storm / bot burst (z ≫ 0) BEFORE the corrupted window
    * reaches a training snapshot. `threshold` flags |z| beyond it.
    *
    * Determinism: moment sums are exact decimal(38) integers (count²
    * brushes int64 at 100 TB hourly volumes); mean and variance are
    * the fixed-association double expressions `embeddingDimStats`
    * pins, and z divides attributes already computed — every engine
    * evaluates the identical op sequence. Zero variance (a perfectly
    * constant volume) yields NULL z, never a division blow-up.
    *
    * Scale shape: one map-side-combinable (type, hour) count; the
    * per-type moment rollup is |types| rows broadcast back; the score
    * join is narrow. Nothing holds per-event state past the first
    * aggregate. */
  def eventAnomaly(events: DataFrame, threshold: Double = 3.0): DataFrame =
    anomalyFromCounts(events
      .select(col("event_type"), date_trunc("hour", col("ts")).as("hour"))
      .groupBy(col("event_type"), col("hour"))
      .agg(count(lit(1)).as("n_events")), threshold)

  /** The scoring stage of `eventAnomaly`, exposed for pre-aggregated
    * count tables — in particular the watermark-released output of the
    * streaming windowed rollup (`EventStream.runWindowed`), which
    * makes the anomaly dashboard a pure READ-side composition over the
    * stream's exactly-once window dump: same z per window whether the
    * counts arrived in one batch or forty micro-batches. Input schema
    * (event_type, hour, n_events). */
  def anomalyFromCounts(hourly: DataFrame,
      threshold: Double = 3.0): DataFrame = {
    val stats = hourly.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_hours"),
        sum(col("n_events").cast("decimal(38,0)")).as("s1"),
        sum((col("n_events").cast("decimal(38,0)")
          * col("n_events").cast("decimal(38,0)"))).as("s2"))
    hourly.join(broadcast(stats), "event_type")
      .withColumn("mean_events",
        col("s1").cast("double") / col("n_hours").cast("double"))
      .withColumn("var_events",
        (col("s2").cast("double") - col("s1").cast("double")
          * col("s1").cast("double") / col("n_hours").cast("double"))
          / col("n_hours").cast("double"))
      .withColumn("z",
        when(col("var_events") === 0.0, lit(null).cast("double"))
          .otherwise((col("n_events").cast("double") - col("mean_events"))
            / sqrt(col("var_events"))))
      .select(col("event_type"), col("hour"), col("n_events"),
        col("n_hours"), col("mean_events"), col("var_events"), col("z"),
        coalesce(abs(col("z")) > threshold, lit(false)).as("is_anomaly"))
  }
}
