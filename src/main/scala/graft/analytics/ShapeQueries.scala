package graft.analytics

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-shape queries over the driver's TPC-H-ish tables — the
  * reference query shapes re-targeted at the 600k-row lineitem /
  * 150k-row orders / 100k-row events (sf0.1) so the bench exercises
  * real shuffle/join/window volume (the pin pipeline tops out at 150k
  * rows). FIXTURES.md §B documents the role mapping.
  *
  * Oracle-parity arithmetic: money/measure doubles are quantized to
  * integer cents with `round(x*100)` — the product x*100 is the same
  * IEEE double in every engine and round-half-away-from-zero agrees
  * between Java's BigDecimal HALF_UP (on shortest-repr) and C round(),
  * so the resulting longs are bit-identical. Sums then accumulate
  * exactly in integers (order-independent) and convert to double once
  * at the end — fully deterministic across engines, unlike summing
  * raw doubles (order-sensitive) or double→DECIMAL casts (engine-
  * specific rounding paths).
  *
  * Scale posture per query is noted inline; `.explain` checked: scans
  * carry PushedFilters + pruned ReadSchema, dimension joins broadcast,
  * aggregates are partial+final hash aggregates.
  */
object ShapeQueries {

  /** Integer-cents quantization (see class doc). */
  private def cents(c: Column): Column = round(c * 100).cast("long")

  def lineitem(s: SparkSession, dir: String): DataFrame = s.read.parquet(s"$dir/lineitem.parquet")
  def orders(s: SparkSession, dir: String): DataFrame = s.read.parquet(s"$dir/orders.parquet")
  def customer(s: SparkSession, dir: String): DataFrame = s.read.parquet(s"$dir/customer.parquet")
  def nation(s: SparkSession, dir: String): DataFrame = s.read.parquet(s"$dir/nation.parquet")
  def events(s: SparkSession, dir: String): DataFrame = s.read.parquet(s"$dir/events.parquet")

  /** Pricing-summary aggregate (TPC-H Q1 shape): filter → sums/counts
    * per flag pair. One partial+final hash agg over the filtered scan;
    * the shipdate filter reaches the parquet reader (PushedFilters). */
  def aggPricing(s: SparkSession, dir: String): DataFrame =
    lineitem(s, dir)
      .where(col("l_shipdate") <= to_timestamp(lit("1998-09-02 00:00:00")))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        (sum(cents(col("l_quantity"))).cast("double") / 100).as("sum_qty"),
        (sum(cents(col("l_extendedprice"))).cast("double") / 100).as("sum_base_price"),
        // ep·(1−disc) in exact integer space: ep_cents · (100 − disc_cents) / 10000
        (sum(cents(col("l_extendedprice")) * (lit(100L) - cents(col("l_discount"))))
          .cast("double") / 10000).as("sum_disc_price"),
        count("*").as("count_order"))

  /** Revenue per nation (3-way join shape): lineitem ⋈ orders shuffles
    * on orderkey; customer and nation are broadcast — no shuffle for
    * the dimension side at any scale. */
  def revenueByNation(s: SparkSession, dir: String): DataFrame =
    lineitem(s, dir)
      .join(orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(customer(s, dir)), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(
        (sum(cents(col("l_extendedprice")) * (lit(100L) - cents(col("l_discount"))))
          .cast("double") / 10000).as("revenue"),
        count("*").as("n_items"))

  /** Top-k customers by order value (sort+limit shape →
    * TakeOrderedAndProject, never a global sort at scale). */
  def topCustomers(s: SparkSession, dir: String, k: Int = 20): DataFrame =
    orders(s, dir)
      .groupBy(col("o_custkey"))
      .agg((sum(cents(col("o_totalprice"))).cast("double") / 100).as("total_spent"),
        count("*").as("n_orders"))
      .orderBy(col("total_spent").desc, col("o_custkey").asc)
      .limit(k)

  /** Event-stream hourly rollup (streaming-equivalent batch shape):
    * epoch-hour bucketing + per-type counts + JSON field extraction
    * (regexp, not a JSON UDF — stays in codegen). `ts` arrives as
    * TIMESTAMP_NTZ (parquet timestamp[us]); under the UTC session,
    * unix_micros(cast(..)) equals DuckDB's epoch_us and integer `div`
    * keeps the bucket exact. */
  def eventsHourly(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .select(
        expr("unix_micros(cast(ts as timestamp)) div 3600000000")
          .cast("long").as("hour_bucket"),
        col("event_type"),
        cents(col("value")).as("value_cents"),
        regexp_extract(col("props"), "\"k\": (\\d+)", 1).cast("long").as("k_val"))
      .groupBy(col("hour_bucket"), col("event_type"))
      .agg(count("*").as("n_events"),
        (sum(col("value_cents")).cast("double") / 100).as("sum_value"),
        sum(col("k_val")).as("sum_k"))

  /** Batch gap-sessionization (gaps-and-islands): a session = a run of
    * one user's events with < 30 min between neighbours. lag() marks
    * session starts, a running sum numbers them, groupBy folds each —
    * two window passes and one aggregation over a single shuffle on
    * user_id (the window partition key and the grouping key align, so
    * AQE plans one exchange). This is the batch twin of
    * streaming.EventStream.sessionize (which emits the same sessions
    * incrementally from flatMapGroupsWithState); time rides as exact
    * integer MICROseconds (the fixture's native timestamp[us]
    * precision — both engines see identical values). */
  def sessionizeBatch(s: SparkSession, dir: String,
      gapUs: Long = 1800L * 1000000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byTime = Window.partitionBy(col("user_id"))
      .orderBy(col("tus").asc, col("event_id").asc)
    events(s, dir)
      .select(col("user_id"), col("event_id"), col("value"),
        expr("unix_micros(cast(ts as timestamp))").as("tus"))
      .withColumn("new_sess",
        when(col("tus") - lag(col("tus"), 1).over(byTime) > gapUs, 1).otherwise(0))
      .withColumn("sess_no", sum(col("new_sess")).over(
        byTime.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("sess_no"))
      .agg(min(col("tus")).as("session_start_us"),
        max(col("tus")).as("session_end_us"),
        count("*").as("n_events"),
        (sum(cents(col("value"))).cast("double") / 100).as("sum_value"))
  }

  /** Per-user top purchases: window shape over a high-cardinality key
    * — shuffles once on user_id. `value` passes through unmodified
    * (no arithmetic → raw-parquet parity). */
  def userTopEvents(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("value").desc,
      col("event_id").asc)
    events(s, dir)
      .where(col("event_type") === "purchase")
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= 3)
      .select(col("user_id"), col("rk"), col("event_id"), col("value"))
  }

  /** Ordered conversion funnel — users progressing stage₀ → stage₁ →
    * … where each stage's event must occur AT OR AFTER the user's
    * earliest previous-stage event (the time-ordering is what
    * distinguishes a funnel from mere event-type membership). Emits
    * one row per stage: users reaching it + conversion vs the prior
    * stage.
    *
    * Scale shape: one type-filtered scan (filter pushed to parquet) +
    * one user_id groupBy per stage, then a left-join chain over the
    * shrinking per-stage user frames and ONE final aggregate (counts
    * of non-null stage timestamps) exploded into the report rows — no
    * union-of-counts, no window over all events. */
  def eventFunnel(s: SparkSession, dir: String,
      stages: Seq[String] = Seq("view", "click", "purchase")): DataFrame = {
    require(stages.nonEmpty)
    val ev = events(s, dir)
    val frames = stages.zipWithIndex.map { case (st, i) =>
      if (i == 0)
        ev.where(col("event_type") === st)
          .groupBy(col("user_id")).agg(min(col("ts")).as("t0"))
      else null // filled below, needs the previous frame
    }.toArray
    for (i <- 1 until stages.length)
      frames(i) = ev.where(col("event_type") === stages(i))
        .join(frames(i - 1).select(col("user_id"), col(s"t${i - 1}")), "user_id")
        .where(col("ts") >= col(s"t${i - 1}"))
        .groupBy(col("user_id")).agg(min(col("ts")).as(s"t$i"))
    val joined = frames.zipWithIndex.drop(1).foldLeft(frames(0)) {
      case (acc, (f, _)) => acc.join(f, Seq("user_id"), "left")
    }
    val aggs = stages.indices.map(i => count(col(s"t$i")).as(s"n$i"))
    val one = joined.agg(aggs.head, aggs.tail: _*)
    one.select(explode(array(stages.zipWithIndex.map { case (st, i) =>
      struct(lit(i).as("stage"), lit(st).as("stage_name"),
        col(s"n$i").as("n_users"),
        (if (i == 0) lit(1.0)
         else col(s"n$i").cast("double") / col(s"n${i - 1}").cast("double"))
          .as("conversion"))
    }: _*)).as("r")).select(col("r.stage"), col("r.stage_name"),
      col("r.n_users"), col("r.conversion"))
  }

  /** Retention cohort matrix — users grouped by first-activity day,
    * counted on each later active day (offset in days): the standard
    * product-analytics retention triangle. Distinct (user, day)
    * activity first, so a user's many same-day events count once.
    *
    * Scale shape: one distinct on (user_id, day) — map-side
    * combinable — one user_id groupBy for cohort days, a join back on
    * user_id (the same key both aggregations partitioned by →
    * exchange reuse), and a tiny (cohort, offset) rollup. */
  def retentionCohorts(s: SparkSession, dir: String,
      maxOffsetDays: Int = 7): DataFrame = {
    // the fixture's ts is TIMESTAMP_NTZ at µs precision — day buckets
    // are exact integer floor-division over epoch-µs, UTC-epoch-aligned
    // on both engines (DuckDB twin: epoch_ns(ts) // 86400000000000)
    val ev = events(s, dir).select(col("user_id"),
      expr("unix_micros(cast(ts as timestamp)) div 86400000000").as("day"))
    val firstDay = ev.groupBy(col("user_id")).agg(min(col("day")).as("cohort"))
    val activeDays = ev.distinct()
    activeDays.join(firstDay, "user_id")
      .select(col("cohort"), (col("day") - col("cohort")).as("day_offset"))
      .where(col("day_offset") <= maxOffsetDays)
      .groupBy(col("cohort"), col("day_offset"))
      .agg(count(lit(1)).as("n_users"))
      .select(
        date_add(to_date(lit("1970-01-01")), col("cohort").cast("int"))
          .cast("string").as("cohort_day"),
        col("day_offset"), col("n_users"))
  }

  /** User-journey transition matrix — counts and probabilities of
    * consecutive event-type transitions within each user's stream (the
    * first-order Markov view of behavior: where `eventFunnel` checks
    * ONE prescribed path, this surfaces every path actually taken and
    * its mass — the dashboard that discovers the funnels worth
    * defining).
    *
    * Determinism: successor via a lag window ordered (ts, event_id) —
    * the sessionization tie-break; probabilities are single double
    * divisions of exact counts.
    *
    * Scale shape: the lag window partitions by user (millions of
    * independent partitions, each a user's stream — never global);
    * the matrix rollup is map-side-combinable on |types|² keys; row
    * totals come from a window over that |types|²-row ROLLUP, not the
    * events. */
  def eventTransitions(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    val pairs = events(s, dir)
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type").as("from_type"))
      .withColumn("to_type", lead(col("from_type"), 1).over(w))
      .where(col("to_type").isNotNull)
      .groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n_transitions"))
    val tw = Window.partitionBy(col("from_type"))
    pairs
      .withColumn("p_transition",
        col("n_transitions").cast("double")
          / sum(col("n_transitions")).over(tw).cast("double"))
  }
}
