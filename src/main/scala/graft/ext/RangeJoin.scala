package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval-containment (range) join — left rows with a point column
  * joined to right rows with [start, end) interval columns. Spark
  * plans a raw `ts >= start AND ts < end` join as a nested-loop
  * (broadcast or cartesian) — quadratic at scale. The classic
  * distributed shape instead:
  *
  *   1. bucket the point side by `ts div bucketWidth` (each point is
  *      in exactly ONE bucket);
  *   2. explode the interval side to every bucket it overlaps
  *      (`sequence(start div W, (end-1) div W)` — typically 1-2 rows
  *      for intervals comparable to the bucket width);
  *   3. hash equi-join on the bucket + residual containment filter.
  *
  * Each matching (point, interval) pair meets in exactly one bucket
  * (the point's), so no distinct pass is needed. Cost: one hash
  * shuffle per side on a well-distributed integer key + interval
  * replication by ceil(len/W); pick `bucketWidth` near the typical
  * interval length to keep replication O(1). All arithmetic is exact
  * integer `div` — no double rounding at bucket edges.
  *
  * Degenerate intervals (end <= start, i.e. empty [start,end)) are
  * dropped up front: Spark's `sequence(a, b)` would otherwise count
  * DOWN for b < a and explode them to spurious buckets. */
object RangeJoin {

  def intervalJoin(left: DataFrame, tsCol: String, right: DataFrame,
      startCol: String, endCol: String, bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    val lb = left.withColumn("__bucket", expr(s"`$tsCol` div ${bucketWidth}L"))
    val rb = right
      .where(col(endCol) > col(startCol))
      .withColumn("__bucket", explode(expr(
        s"sequence(`$startCol` div ${bucketWidth}L, (`$endCol` - 1) div ${bucketWidth}L)")))
    lb.join(rb, "__bucket")
      .where(col(tsCol) >= col(startCol) && col(tsCol) < col(endCol))
      .drop("__bucket")
  }
}
