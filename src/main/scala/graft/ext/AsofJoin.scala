package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-time (as-of) join — for every left row, the LATEST right
  * row at or before its timestamp within the same keys. The canonical
  * time-series/feature-store enrichment ("state of X as of this
  * event") that Spark has no built-in for; the reference stack would
  * reach for a range join here.
  *
  * Plan shape (the 100 TB design): tag both inputs, align them with
  * `unionByName` (missing columns null-fill), then one window pass —
  * partition by the join keys, order by (ts, side, tie-break), and
  * carry the right payload forward with a running
  * `last(payload, ignoreNulls)`. Left rows read the most recent
  * payload at or before their timestamp because right rows sort BEFORE
  * left rows at equal ts. Cost: ONE hash shuffle per input on the join
  * keys + a per-partition sort — no inequality theta-join (which Spark
  * plans as a nested-loop) and no point-in-interval row explosion;
  * state per partition is a single payload struct. AsofJoinSpec pins
  * the single-exchange plan.
  *
  * Determinism: right-side ties on (keys, ts) are broken by the
  * greatest `tieBreak` column (the window sees them in `__tb` order,
  * so the running `last` keeps the max) — required for
  * engine-vs-oracle hash equality; DuckDB's ASOF JOIN picks an
  * arbitrary row on exact ties, so its twin pre-ranks by the same
  * tie-break. */
object AsofJoin {

  /** Left as-of join. `payload` maps right-side columns to output
    * names (renaming avoids collisions with left columns — both sides
    * of an events self-join carry `event_id`). Left rows with no
    * right row at or before them get null payloads. */
  def asofJoin(left: DataFrame, right: DataFrame, on: Seq[String],
      tsCol: String, payload: Seq[(String, String)],
      tieBreak: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // a NULL-ts right row must match NOTHING (SQL: r.ts <= l.ts is
    // never true for NULL) — unfiltered it would sort FIRST in the
    // window (nulls-first ordering) and its payload would leak into
    // every left row as "the state since forever"
    val rSel = right.where(col(tsCol).isNotNull).select(
      on.map(col) ++ Seq(col(tsCol), lit(0).as("__side"),
        col(tieBreak).as("__tb"),
        struct(payload.map { case (src, out) => col(src).as(out) }: _*)
          .as("__p")): _*)
    val lSel = left.withColumn("__side", lit(1))
    val w = Window.partitionBy(on.map(col): _*)
      .orderBy(col(tsCol).asc, col("__side").asc, col("__tb").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lSel.unionByName(rSel, allowMissingColumns = true)
      .withColumn("__asof", last(col("__p"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
      .select(left.columns.map(col) ++
        payload.map { case (_, out) => col(s"__asof.$out").as(out) }: _*)
  }
}
