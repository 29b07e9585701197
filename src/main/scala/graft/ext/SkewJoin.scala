package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Manual salt-based skew-join — the fallback for when AQE's runtime
  * skew splitting can't apply (e.g. the skewed side feeds a window/
  * aggregation that pins its partitioning, or a deliberately disabled
  * AQE). A hot key that would pin one reducer is spread over `salts`
  * partitions:
  *
  *   left  (large, skewed): + salt = pmod(xxhash64(id-ish), salts)
  *   right (smaller):       × exploded to every salt value
  *   join on (key, salt)    — same rows out as the unsalted join.
  *
  * Cost model: the right side is replicated `salts`× (so pick salts ≈
  * skew factor, not 1000); the left side's hot key now hashes to
  * `salts` different reducers. Result-identical to a plain inner
  * equi-join — SkewJoinSpec asserts exactly that. At 100 TB prefer
  * AQE's `skewJoin.enabled` first; this is the explicit-control path. */
object SkewJoin {

  def saltedInner(left: DataFrame, right: DataFrame, key: String,
      salts: Int = 8): DataFrame = {
    // Salt from the whole left row (monotonic id is partitioning-
    // dependent; hashing payload columns keeps the salt stable and
    // spreads identical keys as long as other columns vary).
    val saltCol = pmod(xxhash64(left.columns.map(col).toIndexedSeq: _*),
      lit(salts.toLong))
    val l = left.withColumn("__salt", saltCol)
    val r = right.withColumn("__salt",
      explode(sequence(lit(0L), lit(salts - 1L))))
    l.join(r, Seq(key, "__salt")).drop("__salt")
  }
}
