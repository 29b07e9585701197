package graft.ext

import org.apache.spark.sql.DataFrame

/** Eager, plan-keyed pinning of a shared intermediate (r18).
  *
  * The round-18 profiling showed two failure modes for "shared"
  * subtrees: (1) Catalyst merges agg-over-agg chains so consumers get
  * independent full pipelines (ReusedExchange never fires), and (2) a
  * LAZY persist()/cache() does not dedup under AQE — consumer shuffle
  * stages are submitted concurrently, race the cold cache before any
  * partition lands, and each recomputes the upstream pipeline.
  *
  * `Pin.eager` persists and immediately materializes, so every
  * consumer — including concurrently-submitted AQE stages — reads the
  * one materialized copy. Unlike `localCheckpoint()` it stays
  * plan-keyed in the CacheManager: a later invocation that builds the
  * canonically-equal frame (same fixture, same operator) substitutes
  * the already-materialized relation instead of recomputing — the
  * warm-path behavior the lazy persists already had, now with the
  * cold path fixed too.
  *
  * Use ONLY on lightweight proxies (counts-collapsed tables,
  * signatures, thumbnails, assignments — guide §8 "decide with small
  * rows"), never on corpus payloads. */
object Pin {
  def eager(df: DataFrame): DataFrame = {
    df.persist()
    df.count()
    df
  }
}
