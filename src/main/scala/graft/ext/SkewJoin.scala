package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Manual salt-based skew-join — the fallback for when AQE's runtime
  * skew splitting can't apply (e.g. the skewed side feeds a window/
  * aggregation that pins its partitioning, or a deliberately disabled
  * AQE). A hot key that would pin one reducer is spread over `salts`
  * partitions:
  *
  *   left  (large, skewed): + salt = per-row round-robin counter
  *   right (smaller):       × exploded to every salt value
  *   join on (key, salt)    — same rows out as the unsalted join.
  *
  * Cost model: the right side is replicated `salts`× (so pick salts ≈
  * skew factor, not 1000); the left side's hot key now hashes to
  * `salts` different reducers. Result-identical to a plain inner
  * equi-join — SkewJoinSpec asserts exactly that. At 100 TB prefer
  * AQE's `skewJoin.enabled` first; this is the explicit-control path. */
object SkewJoin {

  /** Per-row round-robin salt (partition-local counter): spreads even
    * IDENTICAL duplicate rows under a hot key across all salt buckets
    * (a row-content hash sends them all to one bucket — defeating the
    * salting exactly when skew comes from repeated rows) and never
    * fails analysis on a column type a hash rejects (e.g. map). Salt
    * values are routing-only: the join output is the same multiset for
    * ANY salt assignment, so layout-dependence here is harmless. */
  private def saltCol(salts: Int) =
    pmod(monotonically_increasing_id(), lit(salts.toLong))

  def saltedInner(left: DataFrame, right: DataFrame, key: String,
      salts: Int = 8): DataFrame = {
    val l = left.withColumn("__salt", saltCol(salts))
    val r = right.withColumn("__salt",
      explode(sequence(lit(0L), lit(salts - 1L))))
    l.join(r, Seq(key, "__salt")).drop("__salt")
  }

  /** Hot-key-targeted salted join: detect the actually-hot keys first
    * (one exact map-side-combinable groupBy over the key column — at
    * 100 TB substitute a sample), then salt ONLY those. Cold keys join
    * untouched (salt 0, no replication), so on uniform data this costs
    * one narrow pre-pass over a plain join, while a hot key still
    * spreads over `salts` reducers and the right side replicates only
    * its hot rows — `salts`× cheaper replication than blanket salting
    * when hot keys are a sliver of the keyspace (the usual case).
    * A key is hot when its row count exceeds `skewFactor` × the mean
    * rows-per-key. Result-identical to a plain inner equi-join. */
  def saltedInnerHotKeys(left: DataFrame, right: DataFrame, key: String,
      salts: Int = 8, skewFactor: Double = 4.0,
      maxHotKeys: Int = 10000, sampleFraction: Double = 1.0): DataFrame = {
    // One aggregated pass over the key column; the counts frame is tiny
    // (|distinct keys| rows) and cached across its two actions. Hot
    // keys land on the driver as literals — by definition there are few
    // of them (capped at maxHotKeys, keeping the hottest), so the plan
    // carries a small IN-set instead of re-running the counts subquery
    // on both join inputs.
    //
    // `sampleFraction < 1` detects hot keys from a sample instead of a
    // full scan — the 100 TB posture: a key hot enough to matter (many
    // × the mean) is overwhelmingly likely to look hot in a 1-10%
    // sample, and misclassification is harmless either way (salting is
    // result-invariant; a missed borderline key just stays on the AQE
    // fallback path). Mean-per-key scales out of the estimate, so the
    // threshold needs no correction.
    val probe =
      if (sampleFraction >= 1.0) left
      else left.sample(withReplacement = false, sampleFraction, seed = 42L)
    val counts = probe.groupBy(col(key)).agg(count(lit(1)).as("__kn")).cache()
    val hotKeys =
      try {
        val meanPerKey = // null on an empty left → no hot keys
          Option(counts.agg(avg(col("__kn"))).head().get(0))
            .fold(Double.MaxValue)(_.asInstanceOf[Double])
        counts.where(col("__kn") > lit(meanPerKey * skewFactor))
          .orderBy(col("__kn").desc).limit(maxHotKeys)
          .select(col(key)).collect().map(_.get(0)).toSeq
      } finally counts.unpersist()
    if (hotKeys.isEmpty) {
      // uniform data: zero overhead beyond the pre-pass
      left.join(right, Seq(key))
    } else if (hotKeys.size <= inlineHotKeyLimit) {
      // few hot keys: a compact IN-literal predicate, no extra join
      val isHot = col(key).isin(hotKeys: _*)
      val l = left.withColumn("__salt",
        when(isHot, saltCol(salts)).otherwise(lit(0L)))
      val r = right.withColumn("__salt", explode(when(isHot,
        sequence(lit(0L), lit(salts - 1L))).otherwise(array(lit(0L)))))
      l.join(r, Seq(key, "__salt")).drop("__salt")
    } else {
      // many hot keys: a thousands-element IN literal bloats the plan
      // and evaluates as a linear scan per row — mark hotness with a
      // broadcast hash join against the (bounded) hot-key frame instead.
      import scala.jdk.CollectionConverters._
      val keyField = left.schema(key)
      val hotDf = left.sparkSession.createDataFrame(
        hotKeys.map(k => org.apache.spark.sql.Row(k)).asJava,
        org.apache.spark.sql.types.StructType(Seq(keyField)))
      val flag = broadcast(hotDf.withColumn("__hot", lit(true)))
      val l = left.join(flag, Seq(key), "left")
        .withColumn("__salt",
          when(col("__hot").isNotNull, saltCol(salts)).otherwise(lit(0L)))
        .drop("__hot")
      val r = right.join(flag, Seq(key), "left")
        .withColumn("__salt", explode(when(col("__hot").isNotNull,
          sequence(lit(0L), lit(salts - 1L))).otherwise(array(lit(0L)))))
        .drop("__hot")
      l.join(r, Seq(key, "__salt")).drop("__salt")
    }
  }

  /** Above this many hot keys the IN-literal plan is replaced by a
    * broadcast join against the hot-key frame. */
  private val inlineHotKeyLimit = 100

  /** Join-key skew report — the pre-flight diagnostic behind
    * `saltedInnerHotKeys`' detection pass, exposed as a table: the
    * top-`topK` hottest key values with their row share and skew
    * ratio vs the mean key. Read it BEFORE a 100 TB join to size the
    * salt factor (skew_vs_mean ≈ how many reducers the hot key needs)
    * or to decide the key needs filtering instead of salting.
    *
    * Scale shape: one map-side-combinable key count, a 1-row total
    * broadcast, TakeOrderedAndProject for the top-k. Exact integer
    * counts; share/skew are single double divisions. */
  def skewReport(df: DataFrame, key: String, topK: Int = 10): DataFrame = {
    val counts = df.groupBy(col(key).cast("string").as("key_value"))
      .agg(count(lit(1)).as("n_rows"))
    val tot = counts.agg(sum(col("n_rows")).as("t"),
      count(lit(1)).as("n_keys"))
    counts.crossJoin(broadcast(tot))
      .select(col("key_value"), col("n_rows"), col("n_keys"),
        (col("n_rows").cast("double") / col("t").cast("double")).as("share"),
        (col("n_rows").cast("double")
          / (col("t").cast("double") / col("n_keys").cast("double")))
          .as("skew_vs_mean"))
      .orderBy(col("n_rows").desc, col("key_value").asc)
      .limit(topK)
  }
}
