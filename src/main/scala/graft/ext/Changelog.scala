package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Changelog (upsert-stream) compaction: latest state per key — the
  * CDC/merge primitive behind every "current state of X" table (the
  * batch analog of a Delta MERGE / compacted Kafka topic).
  *
  * Shape: `max_by(payload, (ts, tieBreak))` per key — ONE aggregation
  * that partial-aggregates map-side (each task keeps a single running
  * struct per key), so the shuffle carries one row per (task, key)
  * instead of the full changelog. A `row_number() = 1` window computes
  * the same answer but must shuffle and SORT every row of every key —
  * strictly worse at 100 TB; the `max_by` form is also the one that
  * keeps working as a streaming aggregation. Ties on ts resolve to the
  * greatest `tieBreak` (struct comparison is lexicographic), making
  * the result deterministic for engine-vs-oracle hash equality. */
object Changelog {

  /** Compact to the latest row per `keys`, ordering by (`ts`,
    * `tieBreak`). Output columns: keys first, then the remaining
    * columns in input order. */
  def latestByKey(df: DataFrame, keys: Seq[String], ts: String,
      tieBreak: String): DataFrame = {
    val payload = df.columns.filterNot(keys.contains)
    df.groupBy(keys.map(col): _*)
      .agg(max_by(struct(payload.map(col): _*),
        struct(col(ts), col(tieBreak))).as("__latest"))
      .select(keys.map(col) ++ payload.map(p => col(s"__latest.$p").as(p)): _*)
  }
}
