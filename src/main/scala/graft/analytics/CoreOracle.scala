package graft.analytics

/** Reference-surface, analytics, streaming, as-of/range, layout and
  * multimodal oracle twins (+ the shared deterministic ORDER BY
  * helper).
  *
  * Carved out of the former monolithic ExtOracle object (round 8);
  * mixed back into `ExtOracle`, whose name every gate entry keeps
  * using. Parity rules in the ExtOracle scaladoc. */
trait CoreOracle {

  protected def ord(cols: String*): String =
    cols.map(c => s"$c ASC NULLS FIRST").mkString("ORDER BY ", ", ", "")

  val aggPricing: String = s"""
SELECT l_returnflag, l_linestatus,
  CAST(SUM(CAST(round(l_quantity*100) AS BIGINT)) AS DOUBLE)/100 AS sum_qty,
  CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT)) AS DOUBLE)/100 AS sum_base_price,
  CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT) *
       (100 - CAST(round(l_discount*100) AS BIGINT))) AS DOUBLE)/10000 AS sum_disc_price,
  CAST(COUNT(*) AS BIGINT) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
${ord("l_returnflag", "l_linestatus")}""".trim

  val revenueByNation: String = s"""
SELECT n_name,
  CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT) *
       (100 - CAST(round(l_discount*100) AS BIGINT))) AS DOUBLE)/10000 AS revenue,
  CAST(COUNT(*) AS BIGINT) AS n_items
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
${ord("n_name")}""".trim

  val topCustomers: String = s"""
SELECT o_custkey,
  CAST(SUM(CAST(round(o_totalprice*100) AS BIGINT)) AS DOUBLE)/100 AS total_spent,
  CAST(COUNT(*) AS BIGINT) AS n_orders
FROM orders
GROUP BY o_custkey
ORDER BY total_spent DESC, o_custkey ASC
LIMIT 20""".trim

  /** Twin of the zorder_scan entry: the same two-dimensional predicate
    * + rollup straight off the source table — the z-ordered copy must
    * answer it identically. */
  val zorderScan: String = s"""
SELECT event_type,
  CAST(COUNT(*) AS BIGINT) AS n_events,
  CAST(SUM(CAST(round(value*100) AS BIGINT)) AS DOUBLE)/100 AS sum_value
FROM events
WHERE user_id BETWEEN 3 AND 11
  AND CAST(floor(epoch(ts)) AS BIGINT) BETWEEN 1704499200 AND 1705103999
GROUP BY event_type
${ord("event_type")}""".trim

  /** Twin of the date_partition_scan entry: one calendar day's rollup
    * straight off the source table (the partitioned copy must answer
    * it identically; Spark derives event_date in UTC from ts nanos,
    * DuckDB's naive timestamps are the same instants). */
  val datePartitionScan: String = s"""
SELECT event_type,
  CAST(COUNT(*) AS BIGINT) AS n_events,
  CAST(SUM(CAST(round(value*100) AS BIGINT)) AS DOUBLE)/100 AS sum_value
FROM events
WHERE strftime(ts, '%Y-%m-%d') = '2024-01-05'
GROUP BY event_type
${ord("event_type")}""".trim

  val eventsHourly: String = s"""
SELECT CAST(floor(epoch(ts)/3600) AS BIGINT) AS hour_bucket, event_type,
  CAST(COUNT(*) AS BIGINT) AS n_events,
  CAST(SUM(CAST(round(value*100) AS BIGINT)) AS DOUBLE)/100 AS sum_value,
  CAST(SUM(TRY_CAST(regexp_extract(props, '"k": (\\d+)', 1) AS BIGINT)) AS BIGINT) AS sum_k
FROM events
GROUP BY hour_bucket, event_type
${ord("hour_bucket", "event_type")}""".trim

  val sessionizeBatch: String = s"""
WITH e AS (
  SELECT user_id, event_id, epoch_us(ts) AS tus, value FROM events),
g AS (
  SELECT *, CASE WHEN tus - lag(tus) OVER (
      PARTITION BY user_id ORDER BY tus ASC, event_id ASC) > 1800000000
    THEN 1 ELSE 0 END AS new_sess
  FROM e),
s AS (
  SELECT *, SUM(new_sess) OVER (
      PARTITION BY user_id ORDER BY tus ASC, event_id ASC
      ROWS UNBOUNDED PRECEDING) AS sess_no
  FROM g)
SELECT user_id, CAST(sess_no AS BIGINT) AS sess_no,
  MIN(tus) AS session_start_us, MAX(tus) AS session_end_us,
  CAST(COUNT(*) AS BIGINT) AS n_events,
  CAST(SUM(CAST(round(value*100) AS BIGINT)) AS DOUBLE)/100 AS sum_value
FROM s
GROUP BY user_id, sess_no
${ord("user_id", "sess_no")}""".trim

  /** Twin of the streaming windowed rollup: append mode only releases
    * a window once the watermark (max event time − 30 min lateness)
    * passes its end, so the oracle applies the same cutoff. */
  val streamEventsHourly: String = s"""
WITH wm AS (SELECT max(ts) - INTERVAL 30 MINUTE AS w FROM events)
SELECT CAST(date_trunc('hour', ts) AS VARCHAR) AS window_start, event_type,
  CAST(COUNT(*) AS BIGINT) AS n_events,
  CAST(SUM(CAST(round(value*100) AS BIGINT)) AS DOUBLE)/100 AS sum_value
FROM events, wm
WHERE date_trunc('hour', ts) + INTERVAL 1 HOUR <= wm.w
GROUP BY 1, 2
${ord("window_start", "event_type")}""".trim

  /** Twin of EventStream.kmvUsersPartials→Compact (k=64): per (hour
    * window, event_type), the KMV distinct-user minima over the
    * Fibonacci-mixed user_id (split 32-bit multiply keeps the product
    * inside HUGEINT). No watermark cutoff — the partials path is
    * stateless, every window appears; the minima-of-minima merge is
    * associative, so one global pass here equals the micro-batched
    * stream. Estimate = 63·2⁶⁴ / 64th-min, exact below k. */
  val streamKmvUsers: String = {
    val pow64 = "CAST('18446744073709551616' AS HUGEINT)"
    val pow32 = "CAST(4294967296 AS HUGEINT)"
    val half = "CAST('9223372036854775808' AS HUGEINT)"
    s"""
WITH skuu AS (
  SELECT DISTINCT date_trunc('hour', ts) AS ws, event_type,
    ((CAST(user_id AS HUGEINT) * 2135587861) % $pow64
     + ((CAST(user_id AS HUGEINT) * 2654435769) % $pow32) * $pow32)
      % $pow64 AS u
  FROM events),
skrk AS (
  SELECT ws, event_type, u,
    row_number() OVER (PARTITION BY ws, event_type ORDER BY u ASC) AS r,
    COUNT(*) OVER (PARTITION BY ws, event_type) AS nd
  FROM skuu),
sksel AS (SELECT ws, event_type, u, nd FROM skrk WHERE r = LEAST(nd, 64))
SELECT CAST(ws AS VARCHAR) AS window_start, event_type,
  LEAST(nd, 64) AS n_kept,
  CAST(CASE WHEN u >= $half THEN u - $pow64 ELSE u END AS BIGINT) AS kth_hash,
  CASE WHEN nd < 64 THEN CAST(LEAST(nd, 64) AS DOUBLE)
       ELSE (CAST(63 AS DOUBLE) * CAST('18446744073709551616' AS DOUBLE))
            / CAST(u AS DOUBLE) END AS est_distinct
FROM sksel
${ord("window_start", "event_type")}""".trim
  }

  /** Twin of EventStream.slidingWindowedAgg (1 h / 15 min): each event
    * fans out to its 4 covering window starts (integer µs floor
    * arithmetic — Spark's window() is epoch-aligned the same way);
    * watermark cutoff on window END as in streamEventsHourly. */
  val streamEventsSliding: String = s"""
WITH wm AS (SELECT epoch_us(max(ts)) - 1800000000 AS wus FROM events),
fan AS (
  SELECT event_type, value,
    (epoch_us(ts) // 900000000) * 900000000 - k.k * 900000000 AS sus
  FROM events, (SELECT unnest(generate_series(0, 3)) AS k) k)
SELECT CAST(make_timestamp(sus) AS VARCHAR) AS window_start, event_type,
  CAST(COUNT(*) AS BIGINT) AS n_events,
  CAST(SUM(CAST(round(value*100) AS BIGINT)) AS DOUBLE)/100 AS sum_value
FROM fan, wm
WHERE sus + 3600000000 <= wm.wus
GROUP BY 1, 2
${ord("window_start", "event_type")}""".trim

  /** Stream-static enrichment rollup: watermark cutoff as in
    * streamEventsHourly, events joined to the customer dim. */
  val streamEventsEnriched: String = s"""
WITH wm AS (SELECT max(ts) - INTERVAL 30 MINUTE AS w FROM events)
SELECT CAST(date_trunc('hour', ts) AS VARCHAR) AS window_start,
  c_mktsegment AS segment,
  CAST(COUNT(*) AS BIGINT) AS n_events,
  CAST(SUM(CAST(round(value*100) AS BIGINT)) AS DOUBLE)/100 AS sum_value
FROM events JOIN customer ON user_id = c_custkey, wm
WHERE date_trunc('hour', ts) + INTERVAL 1 HOUR <= wm.w
GROUP BY 1, 2
${ord("window_start", "segment")}""".trim

  /** Twin of AsofJoin on the purchase self-enrichment: DuckDB's native
    * ASOF LEFT JOIN, with the right side pre-ranked to the max-event_id
    * row per (user_id, ts) — DuckDB picks arbitrarily on exact ts ties,
    * the engine deterministically keeps the greatest tie-break. */
  val asofLastPurchase: String = s"""
WITH r AS (
  SELECT user_id, ts, event_id AS purchase_id, value AS purchase_value
  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, ts
          ORDER BY event_id DESC) AS rk
        FROM events WHERE event_type = 'purchase') WHERE rk = 1)
SELECT l.event_id, l.user_id, r.purchase_id, r.purchase_value
FROM events l ASOF LEFT JOIN r
  ON l.user_id = r.user_id AND l.ts >= r.ts
${ord("event_id")}""".trim

  /** Twin of RangeJoin.intervalJoin on the campaign rollup: the plain
    * inequality join DuckDB handles natively (its IEJoin) — equality
    * proves the bucket-explode+equi-join decomposition is containment-
    * exact, including bucket-edge points (integer µs math both sides;
    * the parquet nano timestamps arrive as BIGINT nanos in Spark and
    * µs-truncated TIMESTAMPs here — same truncation). */
  val rangeJoinCampaigns: String = s"""
WITH iv AS (
  SELECT c_custkey AS interval_id,
    1704067200000000 + (c_custkey * 7919 % 720) * 3600000000 AS start_us,
    1704067200000000 + (c_custkey * 7919 % 720) * 3600000000
      + (c_custkey % 12 + 1) * 3600000000 AS end_us
  FROM customer),
e AS (SELECT event_id, epoch_us(ts) AS ts_us, value FROM events)
SELECT iv.interval_id,
  CAST(COUNT(*) AS BIGINT) AS n_events,
  CAST(SUM(CAST(round(value*100) AS BIGINT)) AS DOUBLE)/100 AS sum_value
FROM e JOIN iv ON e.ts_us >= iv.start_us AND e.ts_us < iv.end_us
GROUP BY iv.interval_id
${ord("interval_id", "n_events", "sum_value")}""".trim

  /** Twin of Changelog.latestByKey: last event per user by
    * (ts, event_id) — the oracle uses the window formulation the
    * engine deliberately avoids (see Changelog scaladoc). */
  val latestUserEvent: String = s"""
SELECT user_id, ts_us, event_id, event_type, value FROM (
  SELECT user_id, epoch_us(ts) AS ts_us, event_id, event_type, value,
    ROW_NUMBER() OVER (PARTITION BY user_id
      ORDER BY epoch_us(ts) DESC, event_id DESC) AS rk
  FROM events) WHERE rk = 1
${ord("user_id")}""".trim

  /** Twin of the streaming exact-dedup entry: the injected duplicates
    * collapse back to the duplicate-free events table. */
  val streamDedupEvents: String = s"""
SELECT event_id, epoch_us(ts) AS ts_us, user_id, event_type, value
FROM events
${ord("event_id")}""".trim

  /** Twin of the flatMapGroupsWithState sessionizer: batch gaps-and-
    * islands sessions (µs-exact, integer-cents sums — the stream state
    * carries the identical arithmetic) plus the stream's emit rule: a
    * non-last session is closed by a later event and always emits; a
    * user's last session emits only if the final watermark (max event
    * ms − 10 min lateness) strictly passed its event-time timeout
    * (session end ms + 30 min gap). */
  val streamSessionize: String = s"""
WITH e AS (
  SELECT user_id, event_id, epoch_us(ts) AS tus,
    CAST(round(value*100) AS BIGINT) AS cents
  FROM events),
g AS (
  SELECT *, CASE WHEN tus - lag(tus) OVER (
      PARTITION BY user_id ORDER BY tus ASC, event_id ASC) > 1800000000
    THEN 1 ELSE 0 END AS new_sess
  FROM e),
s AS (
  SELECT *, SUM(new_sess) OVER (
      PARTITION BY user_id ORDER BY tus ASC, event_id ASC
      ROWS UNBOUNDED PRECEDING) AS sess_no
  FROM g),
sess AS (
  SELECT user_id, sess_no, MIN(tus) AS start_us, MAX(tus) AS end_us,
    CAST(COUNT(*) AS INT) AS n_events,
    CAST(SUM(cents) AS DOUBLE)/100 AS sum_value
  FROM s GROUP BY user_id, sess_no),
wm AS (SELECT MAX(tus) // 1000 - 600000 AS w_ms FROM e),
lastno AS (SELECT user_id, MAX(sess_no) AS last_no FROM sess GROUP BY user_id)
SELECT sess.user_id, start_us, end_us, n_events, sum_value
FROM sess JOIN lastno USING (user_id), wm
WHERE sess.sess_no < lastno.last_no
   OR end_us // 1000 + 1800000 < wm.w_ms
${ord("user_id", "start_us")}""".trim

  /** Twin of the stream-stream attribution join: the batch interval
    * join over the same events (purchases ⋈ same-user views within the
    * preceding hour, boundaries inclusive as in the stream). */
  val streamAttribution: String = s"""
SELECT p.event_id AS purchase_id, v.event_id AS view_id,
  p.user_id, epoch_us(p.ts) AS p_ts_us, epoch_us(v.ts) AS v_ts_us, p.value
FROM events p JOIN events v
  ON p.user_id = v.user_id
  AND v.ts <= p.ts AND p.ts <= v.ts + INTERVAL 1 HOUR
WHERE p.event_type = 'purchase' AND v.event_type = 'view'
${ord("purchase_id", "view_id")}""".trim

  /** Twin of streaming.CorpusStream.dedupVsIndex over the %5 slice:
    * the streaming anti-join must equal the batch text anti-join. */
  val streamDedupVsCorpus: String = s"""
SELECT doc_id, lang, source FROM documents
WHERE doc_id % 5 = 0
  AND text NOT IN (SELECT text FROM documents WHERE doc_id % 5 <> 0)
${ord("doc_id")}""".trim

  /** Twin of ext.Profiling.snapshotDiff over the derived next version
    * (drop %7, change %5-of-remaining, re-add %11 under +100000 ids):
    * same sha256 change rule, same full-outer statuses. */
  val snapshotDiff: String = s"""
WITH oldc AS (SELECT doc_id, sha256(text) AS oh FROM documents),
newc AS (
  SELECT doc_id,
    sha256(CASE WHEN doc_id % 5 = 0 THEN text || ' v2' ELSE text END) AS nh
  FROM documents WHERE doc_id % 7 <> 0
  UNION ALL
  SELECT doc_id + 100000, sha256(text) FROM documents WHERE doc_id % 11 = 0)
SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
  CASE WHEN o.doc_id IS NULL THEN 'added'
       WHEN n.doc_id IS NULL THEN 'removed'
       WHEN o.oh IS DISTINCT FROM n.nh THEN 'changed'
       ELSE 'unchanged' END AS status
FROM oldc o FULL OUTER JOIN newc n ON o.doc_id = n.doc_id
${ord("doc_id")}""".trim

  /** Twin of TextAnalysis.qualityTiers: same quality expression,
    * quantile_cont list cutoffs ≡ Spark percentile(array). */

  /** Twin of ext.Profiling.referentialAudit(documents.doc_id ↔
    * embeddings.vec_id): distinct keys each side, full-outer match. */
  val referentialAudit: String = s"""
WITH l AS (SELECT DISTINCT doc_id AS k FROM documents),
r AS (SELECT DISTINCT vec_id AS k FROM embeddings),
j AS (
  SELECT l.k AS lk, r.k AS rk FROM l FULL OUTER JOIN r ON l.k = r.k)
SELECT
  CAST(COUNT(lk) AS BIGINT) AS n_left_keys,
  CAST(COUNT(rk) AS BIGINT) AS n_right_keys,
  CAST(SUM(CASE WHEN lk IS NOT NULL AND rk IS NOT NULL THEN 1 ELSE 0 END)
    AS BIGINT) AS n_matched,
  CAST(SUM(CASE WHEN rk IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_left_only,
  CAST(SUM(CASE WHEN lk IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_right_only
FROM j""".trim

  /** Twin of streaming.CorpusStream.runShapeFilter: the gopherRules
    * shape signals + filter, as the batch SQL. */
  val streamQualityFilter: String = s"""
WITH sig AS (
  SELECT doc_id, text, string_split_regex(trim(text), '\\s+') AS w
  FROM documents),
s AS (
  SELECT doc_id,
    CAST(len(w) AS INT) AS n_words,
    CAST(length(array_to_string(w, '')) AS DOUBLE) / CAST(len(w) AS DOUBLE)
      AS mean_word_len,
    CAST(len(regexp_extract_all(text, '#|\\.\\.\\.')) AS DOUBLE) /
      CAST(len(w) AS DOUBLE) AS symbol_ratio,
    CAST(len(list_filter(w, x -> regexp_matches(x, '[A-Za-z]'))) AS DOUBLE) /
      CAST(len(w) AS DOUBLE) AS frac_alpha_words
  FROM sig)
SELECT doc_id, n_words, mean_word_len, frac_alpha_words FROM s
WHERE n_words BETWEEN 20 AND 100000
  AND mean_word_len BETWEEN 3.0 AND 10.0
  AND symbol_ratio <= 0.1 AND frac_alpha_words >= 0.8
${ord("doc_id")}""".trim

  /** Twin of ext.Profiling.profile over events: per-column stats
    * unioned; ts renders as epoch µs (the fixture's timestamp[us],
    * epoch_us here ≡ unix_micros on the Spark side under UTC), value
    * as integer cents — engine-neutral strings. */
  val profileEvents: String = {
    def row(c: String, minMax: String) = s"""
SELECT '$c' AS col_name, CAST(COUNT(*) AS BIGINT) AS n_rows,
  CAST(COUNT(*) - COUNT($c) AS BIGINT) AS n_null,
  CAST(COUNT(DISTINCT $c) AS BIGINT) AS n_distinct,
  CAST(MIN($minMax) AS VARCHAR) AS min_s,
  CAST(MAX($minMax) AS VARCHAR) AS max_s
FROM events"""
    Seq(
      row("event_id", "event_id"),
      row("ts", "epoch_us(ts)"),
      row("user_id", "user_id"),
      row("event_type", "event_type"),
      row("value", "CAST(round(value*100) AS BIGINT)"),
      row("props", "props"))
      .mkString("", "\nUNION ALL", s"\n${ord("col_name")}").trim
  }

  /** Twin of ShapeQueries.eventFunnel (view→click→purchase): same
    * earliest-previous-stage ordering rule, same left-join counts. */
  val eventFunnel: String = s"""
WITH f0 AS (
  SELECT user_id, MIN(ts) AS t0 FROM events
  WHERE event_type = 'view' GROUP BY user_id),
f1 AS (
  SELECT e.user_id, MIN(e.ts) AS t1 FROM events e JOIN f0 USING (user_id)
  WHERE e.event_type = 'click' AND e.ts >= f0.t0 GROUP BY e.user_id),
f2 AS (
  SELECT e.user_id, MIN(e.ts) AS t2 FROM events e JOIN f1 USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts >= f1.t1 GROUP BY e.user_id),
one AS (
  SELECT COUNT(f0.t0) AS n0, COUNT(f1.t1) AS n1, COUNT(f2.t2) AS n2
  FROM f0 LEFT JOIN f1 USING (user_id) LEFT JOIN f2 USING (user_id))
SELECT 0 AS stage, 'view' AS stage_name, CAST(n0 AS BIGINT) AS n_users,
  1.0 AS conversion FROM one
UNION ALL SELECT 1, 'click', CAST(n1 AS BIGINT),
  CAST(n1 AS DOUBLE) / CAST(n0 AS DOUBLE) FROM one
UNION ALL SELECT 2, 'purchase', CAST(n2 AS BIGINT),
  CAST(n2 AS DOUBLE) / CAST(n1 AS DOUBLE) FROM one
ORDER BY stage""".trim

  /** Twin of ShapeQueries.retentionCohorts: identical integer
    * epoch→day floor division (Spark: unix_micros // 86400000000;
    * DuckDB: epoch_ns // 86400000000000 — same integer day at the
    * fixture's µs precision), distinct (user, day), offsets ≤ 7. */
  val retentionCohorts: String = s"""
WITH ev AS (
  SELECT user_id, epoch_ns(ts) // 86400000000000 AS day FROM events),
fd AS (SELECT user_id, MIN(day) AS cohort FROM ev GROUP BY user_id),
ad AS (SELECT DISTINCT user_id, day FROM ev),
j AS (
  SELECT fd.cohort, ad.day - fd.cohort AS day_offset
  FROM ad JOIN fd USING (user_id))
SELECT CAST(DATE '1970-01-01' + CAST(cohort AS INT) AS VARCHAR) AS cohort_day,
  day_offset, CAST(COUNT(*) AS BIGINT) AS n_users
FROM j WHERE day_offset <= 7 GROUP BY cohort, day_offset
${ord("cohort_day", "day_offset")}""".trim

  val userTopEvents: String = s"""
SELECT user_id, rk, event_id, value FROM (
  SELECT user_id, event_id, value,
    ROW_NUMBER() OVER (PARTITION BY user_id
      ORDER BY value DESC NULLS LAST, event_id ASC) AS rk
  FROM events WHERE event_type = 'purchase')
WHERE rk <= 3
${ord("user_id", "rk")}""".trim

  // ---- text analysis -----------------------------------------------

  /** Twin of the salted skew join: salts cancel out, so the oracle is
    * the PLAIN join+aggregate — equality proves salting is
    * result-invariant. */
  val saltedJoinRevenue: String = s"""
SELECT o_orderstatus,
  CAST(COUNT(*) AS BIGINT) AS n_items,
  CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT)) AS DOUBLE)/100 AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderstatus
${ord("o_orderstatus")}""".trim

  /** Frame sampling over the fixture assets (media = UTF-8 text bytes,
    * 64-byte frames, every 4th kept): kept = ceil(floor(bytes/64)/4),
    * pure integer arithmetic on strlen (DuckDB strlen = byte length). */
  val multimodalFrames: String = s"""
SELECT doc_id AS asset_id,
  CAST((strlen(text) // 64 + 3) // 4 AS BIGINT) AS n_frames,
  CAST(((strlen(text) // 64 + 3) // 4) * 64 AS BIGINT) AS frame_bytes
FROM documents
WHERE strlen(text) >= 64
${ord("asset_id")}""".trim

  /** Twin of Multimodal.pipeline on the fixture assets (media = UTF-8
    * text bytes, pure ASCII in the testdata, so ord(char) == byte):
    * mean_luma = byte sum / byte count, one exact IEEE division both
    * sides — bit-identical without rounding. */
  val multimodalFeatures: String = s"""
WITH a AS (
  SELECT doc_id AS asset_id,
    ['png','jpeg','webp'][CAST(doc_id % 3 + 1 AS INT)] AS format,
    CAST(strlen(text) AS INT) AS n_bytes,
    text, CAST(strlen(text) AS BIGINT) AS len
  FROM documents),
ix AS (SELECT asset_id, unnest(generate_series(1, len)) AS i FROM a),
s AS (
  SELECT ix.asset_id, SUM(ord(substring(a.text, CAST(ix.i AS INT), 1))) AS luma
  FROM ix JOIN a USING (asset_id)
  GROUP BY ix.asset_id)
SELECT a.asset_id, a.format, a.n_bytes,
  CASE WHEN a.len = 0 THEN 0.0
       ELSE CAST(s.luma AS DOUBLE) / CAST(a.len AS DOUBLE) END AS mean_luma
FROM a LEFT JOIN s USING (asset_id)
${ord("asset_id")}""".trim

  /** Shared CTE chain for the resize-based twins: the full 8×8 box
    * filter (source box [x0,x1)×[y0,y1) per output cell, floor-mean,
    * boxes overlap when a source dim < 8) through per-cell values
    * `cellv` (asset_id, ox, oy, cv). `multimodalResize` and the
    * perceptual-hash dedup twin splice it; `src` names the input
    * relation (documents, or an injected-variant CTE). */
  protected def resizeCellChain(src: String = "documents",
      wExpr: String = "CAST(n_chars % 640 + 16 AS BIGINT)"): String = s"""
a AS (
  SELECT doc_id AS asset_id, text,
    CAST(strlen(text) AS BIGINT) AS len,
    ['png','jpeg','webp'][CAST(doc_id % 3 + 1 AS INT)] AS format,
    $wExpr AS w
  FROM $src),
d AS (SELECT *, greatest((len + w - 1) // w, 1) AS h FROM a),
boxes AS (
  SELECT asset_id, text, len, w, ox, oy,
    ox * w // 8 AS x0, greatest((ox + 1) * w // 8, ox * w // 8 + 1) AS x1,
    oy * h // 8 AS y0, greatest((oy + 1) * h // 8, oy * h // 8 + 1) AS y1
  FROM (SELECT *, unnest(generate_series(0, 7)) AS ox FROM d),
       (SELECT unnest(generate_series(0, 7)) AS oy)),
pxy AS (
  SELECT asset_id, text, len, w, ox, oy, x0, x1,
    unnest(generate_series(y0, y1 - 1)) AS y
  FROM boxes),
pix AS (
  SELECT asset_id, ox, oy,
    ord(substring(text, CAST(y * w + unnest(generate_series(x0, x1 - 1)) + 1 AS INT), 1)) AS v,
    y * w + unnest(generate_series(x0, x1 - 1)) AS i, len
  FROM pxy),
cellv AS (
  SELECT asset_id, ox, oy, SUM(v) // COUNT(*) AS cv
  FROM pix WHERE i < len GROUP BY asset_id, ox, oy)""".trim

  /** Twin of Multimodal.resizeSummary: the shared box-filter chain +
    * the byte sum of the resized payload — content-pinning,
    * engine-portable. */
  val multimodalResize: String = s"""
WITH ${resizeCellChain()},
sums AS (SELECT asset_id, CAST(SUM(cv) AS BIGINT) AS luma_sum FROM cellv GROUP BY asset_id)
SELECT a.asset_id, a.format, CAST(8 AS INT) AS width, CAST(8 AS INT) AS height,
  CAST(64 AS INT) AS n_bytes, CAST(COALESCE(s.luma_sum, 0) AS BIGINT) AS luma_sum
FROM a LEFT JOIN sums s USING (asset_id)
${ord("asset_id")}""".trim

  /** Twin of Multimodal.imageDupCandidates(maxHamming=3): the shared
    * box-filter chain, aHash bits via the exact integer comparison
    * cv·64 > Σcv (missing cells are zero bytes — they can never
    * exceed the mean, identically on both sides), 64-bit value
    * assembled in HUGEINT, identical hashes collapsed to min-id
    * representative groups BEFORE the join (the quadratic-mass
    * collapse), re-signed BIGINT xor, the simhash twin's 16-bit-chunk
    * blocking, group sizes joined back. */
  val imageDupCandidates: String = {
    val pow64 = "CAST('18446744073709551616' AS HUGEINT)"
    val half = "CAST('9223372036854775808' AS HUGEINT)"
    s"""
WITH RECURSIVE
idocs AS (
  SELECT doc_id, text, n_chars FROM documents
  UNION ALL
  SELECT doc_id + 1000000,
    upper(substring(text, 1, 12)) || substring(text, 13) AS text,
    n_chars
  FROM documents),
${resizeCellChain("idocs", "CAST(32 AS BIGINT)")},
tw(kk, p) AS (SELECT 0, CAST(1 AS HUGEINT)
  UNION ALL SELECT kk + 1, p * 2 FROM tw WHERE kk < 63),
p2l AS MATERIALIZED (SELECT list(p ORDER BY kk) AS twos FROM tw),
tot AS (SELECT asset_id, CAST(SUM(cv) AS BIGINT) AS s
  FROM cellv GROUP BY asset_id),
hv AS (
  SELECT c.asset_id,
    SUM(CASE WHEN c.cv * 64 > t.s
        THEN p2l.twos[CAST(c.oy * 8 + c.ox AS INT) + 1]
        ELSE CAST(0 AS HUGEINT) END) AS hu
  FROM cellv c JOIN tot t USING (asset_id), p2l
  GROUP BY c.asset_id),
grp AS (
  SELECT hu, MIN(asset_id) AS rep_id, CAST(COUNT(*) AS BIGINT) AS n_members
  FROM hv GROUP BY hu),
sh AS (SELECT rep_id, n_members, hu,
  CAST(CASE WHEN hu >= $half THEN hu - $pow64 ELSE hu END AS BIGINT) AS sig
  FROM grp),
chunked AS (
  SELECT rep_id, sig, t.c AS chunk_no,
    CAST((hu // p2l.twos[t.c * 16 + 1]) % 65536 AS BIGINT) AS chunk
  FROM sh, generate_series(0, 3) t(c), p2l),
cand AS (
  SELECT DISTINCT a.rep_id AS a_id, b.rep_id AS b_id,
    a.sig AS sa, b.sig AS sb
  FROM chunked a JOIN chunked b
    ON a.chunk_no = b.chunk_no AND a.chunk = b.chunk
      AND a.rep_id < b.rep_id)
SELECT c.a_id, c.b_id, CAST(bit_count(xor(c.sa, c.sb)) AS INT) AS hamming,
  ga.n_members AS n_a, gb.n_members AS n_b
FROM cand c
JOIN grp ga ON ga.rep_id = c.a_id
JOIN grp gb ON gb.rep_id = c.b_id
WHERE bit_count(xor(c.sa, c.sb)) <= 3
${ord("a_id", "b_id")}""".trim
  }

  /** Twin of the `txlog_time_travel` entry: the engine builds a
    * transactional table (v0 overwrite = even ids, v1 append = odd
    * ids, v2 overwrite = ids%97) and reads all three versions back;
    * the expected content of each version is pure set algebra on
    * `documents`, so the oracle needs no log at all — which is the
    * point: the log must be invisible in the data. */
  val txlogTimeTravel: String = s"""
SELECT CAST(0 AS BIGINT) AS version, doc_id, lang, source, n_chars
FROM documents WHERE doc_id % 2 = 0
UNION ALL
SELECT CAST(1 AS BIGINT), doc_id, lang, source, n_chars FROM documents
UNION ALL
SELECT CAST(2 AS BIGINT), doc_id, lang, source, n_chars
FROM documents WHERE doc_id % 97 = 0
${ord("version", "doc_id")}""".trim

  /** Twin of `txlog_rowops`: the engine's copy-on-write delete /
    * update / upsert sequence expressed as pure set algebra on the
    * source table — the log machinery (file rewrites, remove actions,
    * tombstones) must be invisible in the data. Order of operations
    * mirrors the entry: two deletes, then the update over survivors,
    * then a whole-row upsert by key whose source rows carry ORIGINAL
    * lang/source (taken from `documents` before any update) and
    * n_chars = -1 — re-inserting even previously deleted keys. NULL
    * handling matches SQL row ops: a NULL predicate keeps the row
    * (DELETE), and NULL keys never match (upsert inserts them). */
  val txlogRowOps: String = s"""
WITH survivors AS (
  SELECT doc_id, lang,
    CASE WHEN source = 'src1' THEN 'src1-clean' ELSE source END AS source,
    n_chars
  FROM documents
  WHERE NOT COALESCE(doc_id BETWEEN 100 AND 199, FALSE)
    AND NOT COALESCE(lang = 'de', FALSE)
),
src AS (
  SELECT doc_id, lang, source, CAST(-1 AS BIGINT) AS n_chars
  FROM documents WHERE doc_id % 50 = 0
)
SELECT doc_id, lang, source, n_chars FROM survivors u
WHERE NOT EXISTS (SELECT 1 FROM src WHERE src.doc_id = u.doc_id)
UNION ALL
SELECT doc_id, lang, source, n_chars FROM src
${ord("doc_id", "lang", "source", "n_chars")}""".trim

  /** Twin of `txlog_incremental_agg`: the engine materializes a
    * per-lang aggregate at a mark version and maintains it from the
    * NET change feed (append of doc_id >= 400, delete of [100, 199],
    * whole-row upsert of doc_id % 50 = 0 with n_chars = -1); the twin
    * recomputes the same aggregate over the FINAL table state built
    * from the source rows — incremental maintenance must be exact. */
  val txlogIncrementalAgg: String = s"""
WITH final AS (
  SELECT doc_id, lang,
    CASE WHEN doc_id % 50 = 0 THEN CAST(-1 AS BIGINT) ELSE n_chars END
      AS n_chars
  FROM documents
  WHERE NOT COALESCE(doc_id BETWEEN 100 AND 199, FALSE)
     OR COALESCE(doc_id % 50 = 0, FALSE)
)
SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_rows,
  CAST(SUM(n_chars) AS BIGINT) AS sum_chars
FROM final GROUP BY lang
${ord("lang", "n_rows", "sum_chars")}""".trim

  /** Twin of `txlog_schema_evolve`: rows written before the n_chars
    * column existed carry NULL for it; rows written after carry their
    * value — the evolved schema must be the union, resolved from the
    * log, never by merging footers. */
  val txlogSchemaEvolve: String = s"""
SELECT doc_id, lang, CAST(NULL AS BIGINT) AS n_chars
FROM documents WHERE doc_id < 250
UNION ALL
SELECT doc_id, lang, n_chars FROM documents WHERE doc_id >= 250
${ord("doc_id", "lang", "n_chars")}""".trim

  /** Twin of `txlog_changes`: the net change feed over a window
    * holding one append (doc_id >= 300) and one range delete
    * ([50, 99], whose rows carry the PRE-window src2→patched update) —
    * rebuilt as two arms straight off the source table. Everything
    * else the file-granular feed surfaces (rewrite pass-through rows)
    * must have cancelled. */
  val txlogChanges: String = s"""
SELECT doc_id, lang, source, n_chars, 'insert' AS _change_type
FROM documents WHERE doc_id >= 300
UNION ALL
SELECT doc_id, lang,
  CASE WHEN source = 'src2' THEN 'patched' ELSE source END AS source,
  n_chars, 'delete' AS _change_type
FROM documents WHERE doc_id BETWEEN 50 AND 99
${ord("doc_id", "lang", "source", "n_chars", "_change_type")}""".trim

  /** Twin of `txlog_catalog_skipping`: the pruned catalog read must
    * equal the plain filter — data skipping is an optimization, never
    * a filter. */
  val catalogSkipping: String = s"""
SELECT doc_id, lang, source, n_chars FROM documents
WHERE doc_id BETWEEN 100 AND 199 AND lang IS NOT NULL
${ord("doc_id", "lang", "source", "n_chars")}""".trim

  /** Twin of `txlog_catalog_replace`: the replaced table ('now' arm,
    * doc_id ∈ [300, 499] under the new shape) beside its
    * time-traveled pre-replace version ('v0' arm, doc_id < 200) —
    * both rebuilt straight off the source table. */
  val catalogReplace: String = s"""
SELECT doc_id, upper(lang) AS lang_up, n_chars, 'now' AS at
FROM documents WHERE doc_id BETWEEN 300 AND 499
UNION ALL
SELECT doc_id, upper(lang) AS lang_up, n_chars, 'v0' AS at
FROM documents WHERE doc_id < 200
${ord("doc_id", "lang_up", "n_chars", "at")}""".trim

  /** Twin of `stream_cdf_catalog`: the CDF stream over a scripted
    * merge-on-read sequence — snapshot-as-inserts at v0 (doc_id <
    * 300, pre-DML values), the dv DELETE's exact pre-image rows at
    * v1 ([50, 99]), the dv UPDATE's delete+insert pair at v2 (src2
    * rows NOT already deleted — the scan reads through v1's mask),
    * and the plain append at v3 — every arm reconstructed straight
    * off the source table with its literal commit version. */
  val streamCdfCatalog: String = s"""
SELECT doc_id, lang, source, n_chars,
  'insert' AS _change_type, CAST(0 AS BIGINT) AS _commit_version
FROM documents WHERE doc_id < 300
UNION ALL
SELECT doc_id, lang, source, n_chars,
  'delete' AS _change_type, CAST(1 AS BIGINT) AS _commit_version
FROM documents WHERE doc_id BETWEEN 50 AND 99
UNION ALL
SELECT doc_id, lang, source, n_chars,
  'delete' AS _change_type, CAST(2 AS BIGINT) AS _commit_version
FROM documents
WHERE doc_id < 300 AND source = 'src2' AND doc_id NOT BETWEEN 50 AND 99
UNION ALL
SELECT doc_id, lang, 'patched' AS source, n_chars,
  'insert' AS _change_type, CAST(2 AS BIGINT) AS _commit_version
FROM documents
WHERE doc_id < 300 AND source = 'src2' AND doc_id NOT BETWEEN 50 AND 99
UNION ALL
SELECT doc_id, lang, source, n_chars,
  'insert' AS _change_type, CAST(3 AS BIGINT) AS _commit_version
FROM documents WHERE doc_id >= 300
${ord("doc_id", "lang", "source", "n_chars", "_change_type",
      "_commit_version")}""".trim

  /** Twin of `stream_cdf_mv`: the streaming materialized view —
    * maintained incrementally from the catalog change feed, never
    * recomputed — must equal this full recompute over the final
    * logical table state (v0 docs < 300, minus the dv-deleted
    * [50, 99], plus the appended doc_id >= 300; the mid-stream
    * source-patch UPDATE nets to zero inside every group). */
  val streamCdfMv: String = s"""
SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_rows,
  CAST(SUM(n_chars) AS BIGINT) AS sum_chars
FROM documents
WHERE (doc_id < 300 AND doc_id NOT BETWEEN 50 AND 99) OR doc_id >= 300
GROUP BY lang
${ord("lang", "n_rows", "sum_chars")}""".trim

  /** Twin of `stream_catalog_tail`: a startingVersion=2 stream over
    * (v0: doc_id%3=0, v1: %3=1, v2: %3=2) consumes EXACTLY the v2
    * slice — no snapshot, no v1. */
  val streamCatalogTail: String = s"""
SELECT doc_id, lang, source, n_chars FROM documents WHERE doc_id % 3 = 2
${ord("doc_id")}""".trim

  /** Twin of `stream_txlog_upsert`: the CDC convergence contract —
    * after three revision waves (rev 1 re-emits every 5th doc with
    * n_chars+1000, rev 2 every 25th with n_chars+2000, both bumping
    * the ORIGINAL value) the table holds exactly the latest revision
    * per key. A NULL doc_id never matches an upsert key, so such a
    * row would survive as its rev-0 insert — which is also what the
    * CASE yields (NULL % k is NULL → ELSE arm). */
  val streamTxlogUpsert: String = s"""
SELECT doc_id, lang, source,
  CASE WHEN doc_id % 25 = 0 THEN n_chars + 2000
       WHEN doc_id % 5 = 0 THEN n_chars + 1000
       ELSE n_chars END AS n_chars,
  CAST(CASE WHEN doc_id % 25 = 0 THEN 2
       WHEN doc_id % 5 = 0 THEN 1 ELSE 0 END AS BIGINT) AS rev
FROM documents
${ord("doc_id", "lang", "source", "n_chars", "rev")}""".trim

  /** Twin of `stream_txlog_ingest`: exactly-once ingest of the full
    * docs stream — the snapshot must hold every doc exactly once. */
  val streamTxlogIngest: String = s"""
SELECT doc_id, lang, source FROM documents
${ord("doc_id")}""".trim

  /** Twin of `json_robust_scan`: the id rule alone decides each arm —
    * every 7th doc's line is truncated (always malformed), the rest
    * parse whole. Quarantine rows carry no parsed fields. */
  val jsonRobustScan: String = s"""
SELECT 'main' AS arm, doc_id, lang, source, n_chars
FROM documents WHERE doc_id % 7 <> 0
UNION ALL
SELECT 'quarantine' AS arm, CAST(NULL AS BIGINT) AS doc_id,
  CAST(NULL AS VARCHAR) AS lang, CAST(NULL AS VARCHAR) AS source,
  CAST(NULL AS BIGINT) AS n_chars
FROM documents WHERE doc_id % 7 = 0
${ord("arm", "doc_id")}""".trim

  /** Twin of `txlog_incremental_curation`: a from-scratch recompute
    * over the FINAL bronze state — every doc except the retention
    * window, src3 texts patched with ' zz' — through the quality
    * formula, kept at >= 0.675. The engine side maintained its curated
    * table INCREMENTALLY from the net change feed (re-score + upsert +
    * MERGE-delete); equality proves the increment exact. */
  val txlogIncrementalCuration: String = s"""
WITH base AS (
  SELECT doc_id, lang,
    CASE WHEN source = 'src3' THEN text || ' zz' ELSE text END AS text
  FROM documents WHERE NOT (doc_id BETWEEN 50 AND 99)),
t AS (
  SELECT doc_id, lang,
    CAST(len(string_split_regex(trim(text), '\\s+')) AS DOUBLE) AS n_tok,
    CAST(len(list_distinct(string_split_regex(trim(text), '\\s+'))) AS DOUBLE) AS n_uniq,
    CAST(length(text) AS DOUBLE) AS n_chars
  FROM base),
q AS (
  SELECT doc_id, lang,
    round((n_uniq / n_tok) * 0.5 + least(n_tok / 64.0, 1.0) * 0.3
      + (CASE WHEN ((n_chars - (n_tok - 1)) / n_tok) BETWEEN 3.0 AND 9.0
              THEN 1.0 ELSE 0.5 END) * 0.2, 6) AS quality
  FROM t)
SELECT doc_id, lang, quality FROM q WHERE quality >= 0.675
${ord("doc_id")}""".trim

  /** Twin of `txlog_multi_prune`: the three-predicate conjunctive
    * lookup (user range AND time range AND type IN-set) straight off
    * the source table — the z-ordered TxLog copy with multi-column
    * stats skipping must answer it identically. */
  val txlogMultiPrune: String = s"""
SELECT event_type,
  CAST(COUNT(*) AS BIGINT) AS n_events,
  CAST(SUM(CAST(round(value*100) AS BIGINT)) AS DOUBLE)/100 AS sum_value
FROM events
WHERE user_id BETWEEN 3 AND 11
  AND CAST(floor(epoch(ts)) AS BIGINT) BETWEEN 1704499200 AND 1705103999
  AND event_type IN ('click', 'view')
GROUP BY event_type
${ord("event_type")}""".trim

  /** Twin of `txlog_expectations`: per-row expectation verdicts
    * re-derived from the source table — a row fails an expectation
    * when its predicate is not TRUE (NULL counts as failure, CHECK
    * semantics); failed names join with commas in name order
    * ('long_doc' < 'not_src0'). */
  val txlogExpectations: String = s"""
WITH v AS (
  SELECT doc_id, lang, source, n_chars,
    rtrim(concat(
      CASE WHEN NOT coalesce(n_chars >= 120, false)
        THEN 'long_doc,' ELSE '' END,
      CASE WHEN NOT coalesce(source <> 'src0', false)
        THEN 'not_src0,' ELSE '' END), ',') AS viol
  FROM documents)
SELECT CASE WHEN viol = '' THEN 'main' ELSE 'quarantine' END AS arm,
  doc_id, lang, source, n_chars, viol AS _violation
FROM v
${ord("arm", "doc_id")}""".trim

  /** Twin of `stream_txlog_source`: snapshot-then-tail consumption of
    * the whole table with a filter — exactly-once across the two
    * drains means the union is one filtered copy of every doc. */
  val streamTxlogSource: String = s"""
SELECT doc_id, lang, source, n_chars FROM documents
WHERE n_chars >= 100
${ord("doc_id")}""".trim

  /** Twin of `stream_mapped_source`: the consumer of a RENAMED
    * (column-mapped) stream-source table sees the logical name and
    * exactly one copy of every qualifying row across two drains —
    * the physical-name indirection is invisible. */
  val streamMappedSource: String = s"""
SELECT doc_id, lang, source, n_chars AS chars FROM documents
WHERE n_chars >= 100 AND doc_id % 3 IN (0, 1)
${ord("doc_id")}""".trim

  /** Twin of `txlog_catalog_history`: the scripted commit sequence —
    * overwrite (4 files), append (2), metadata-only DDL (0),
    * checkpoint re-referencing the 6 live files — as hand-computed
    * constants; every commit records a schema, and the in-commit
    * timestamps gate as positive + monotone. */
  val txlogCatalogHistory: String = s"""
SELECT * FROM (VALUES
  (CAST(0 AS BIGINT), 'overwrite', CAST(-1 AS BIGINT),
   CAST(4 AS BIGINT), CAST(0 AS BIGINT), true, true),
  (CAST(1 AS BIGINT), 'append', CAST(-1 AS BIGINT),
   CAST(2 AS BIGINT), CAST(0 AS BIGINT), true, true),
  (CAST(2 AS BIGINT), 'append', CAST(-1 AS BIGINT),
   CAST(0 AS BIGINT), CAST(0 AS BIGINT), true, true),
  (CAST(3 AS BIGINT), 'overwrite', CAST(-1 AS BIGINT),
   CAST(6 AS BIGINT), CAST(0 AS BIGINT), true, true))
  AS h(version, mode, batch_id, n_adds, n_removes, schema_recorded,
       ts_monotone)
${ord("version")}""".trim

  /** Twin of `stream_txlog_multihop`: the bronze→silver hop run twice
    * over a growing bronze table — the silver snapshot must be exactly
    * one transformed copy of every qualifying row. */
  val streamTxlogMultihop: String = s"""
SELECT doc_id, lang, source, n_chars, upper(lang) AS lang_up
FROM documents WHERE n_chars >= 100
${ord("doc_id")}""".trim

  /** Byte `idx0` (0-based) of a UTF-8 string, via its hex dump: the
    * engine side reads `text.getBytes(UTF_8)` while DuckDB's
    * `ord(substring(...))` indexes CHARACTERS — they only agree on
    * pure-ASCII text. `hex(encode(text))` is the byte sequence, so
    * parsing two hex digits is a true byte accessor and the decode
    * twins stay correct even if a future fixture grows non-ASCII
    * docs. `hx` must name a `hex(encode(text))` column. */
  protected def hexByteAt(hx: String, idx0: String): String =
    s"""(16 * (position(substring($hx, CAST(2 * ($idx0) + 1 AS INT), 1)
      IN '0123456789ABCDEF') - 1)
    + (position(substring($hx, CAST(2 * ($idx0) + 2 AS INT), 1)
      IN '0123456789ABCDEF') - 1))"""

  /** Twin of Multimodal.decodeStats — the REAL-codec gate entry. The
    * engine synthesizes a deterministic image per doc (width 32, pixel
    * i: r = text byte at i mod len, g = (r+x) mod 256, b = (r+y) mod
    * 256), serializes it through a genuine container (BMP for even
    * ids, PPM for odd), PARSES the container back, and emits exact
    * integer luma statistics; this twin re-derives the decoded pixels
    * from first principles, so any stride/padding/row-order/channel-
    * order defect in either codec direction hash-fails. `luma_wsum`
    * is position-weighted (Σ (i+1)·luma_i in top-down row-major
    * order) — a bottom-up flip cannot cancel out of it. */
  val multimodalDecode: String = s"""
WITH a AS (
  SELECT doc_id AS asset_id, hex(encode(text)) AS hx,
    CAST(strlen(text) AS BIGINT) AS len,
    CASE WHEN doc_id % 2 = 0 THEN 'bmp' ELSE 'ppm' END AS format
  FROM documents WHERE strlen(text) > 0),
d AS (SELECT *, greatest((len + 31) // 32, 1) AS h FROM a),
ix AS (SELECT asset_id, len, hx, h,
  unnest(generate_series(0, 32 * h - 1)) AS i FROM d),
lum AS (
  SELECT asset_id, i,
    (299 * bi + 587 * ((bi + (i % 32)) % 256)
     + 114 * ((bi + (i // 32)) % 256)) // 1000 AS l
  FROM (SELECT asset_id, i,
          ${hexByteAt("hx", "i % len")} AS bi
        FROM ix)),
s AS (SELECT asset_id, SUM(l) AS ls, SUM((i + 1) * l) AS ws
  FROM lum GROUP BY asset_id)
SELECT d.asset_id, d.format, CAST(32 AS INT) AS width,
  CAST(d.h AS INT) AS height, CAST(32 * d.h AS BIGINT) AS n_px,
  CAST(s.ls AS BIGINT) AS luma_sum, CAST(s.ws AS BIGINT) AS luma_wsum
FROM d JOIN s USING (asset_id)
${ord("asset_id")}""".trim

  /** Twin of Multimodal.decodeStatsRobust — the dirty-corpus tier:
    * three containers by doc_id mod 3 (bmp/ppm/pgm; the grayscale P5
    * round trip is luma-exact so the stats formula is format-free),
    * deterministic corruption by doc_id mod 7 (0 = truncate at half —
    * the raster requirement always exceeds half the container, so the
    * decode ALWAYS fails; 1 = corrupted magic byte). Malformed rows
    * carry ok = false and NULL stats — the twin derives ok purely
    * from the id rule, which is exactly the determinism contract the
    * permissive tier must honor. */
  val multimodalDecodeRobust: String = s"""
WITH a AS (
  SELECT doc_id AS asset_id, hex(encode(text)) AS hx,
    CAST(strlen(text) AS BIGINT) AS len,
    ['bmp','ppm','pgm'][CAST(doc_id % 3 + 1 AS INT)] AS format,
    (doc_id % 7) NOT IN (0, 1) AS ok
  FROM documents WHERE strlen(text) > 0),
d AS (SELECT *, greatest((len + 31) // 32, 1) AS h FROM a),
ix AS (SELECT asset_id, len, hx, h,
  unnest(generate_series(0, 32 * h - 1)) AS i FROM d WHERE ok),
lum AS (
  SELECT asset_id, i,
    (299 * bi + 587 * ((bi + (i % 32)) % 256)
     + 114 * ((bi + (i // 32)) % 256)) // 1000 AS l
  FROM (SELECT asset_id, i,
          ${hexByteAt("hx", "i % len")} AS bi
        FROM ix)),
s AS (SELECT asset_id, SUM(l) AS ls, SUM((i + 1) * l) AS ws
  FROM lum GROUP BY asset_id)
SELECT d.asset_id, d.format, d.ok,
  CASE WHEN d.ok THEN CAST(32 AS INT) END AS width,
  CASE WHEN d.ok THEN CAST(d.h AS INT) END AS height,
  CASE WHEN d.ok THEN CAST(32 * d.h AS BIGINT) END AS n_px,
  CAST(s.ls AS BIGINT) AS luma_sum, CAST(s.ws AS BIGINT) AS luma_wsum
FROM d LEFT JOIN s USING (asset_id)
${ord("asset_id")}""".trim

  /** Twin of `Multimodal.decodeStatsImageIo` — the compressed-container
    * tier (PNG for even ids, JPEG for odd, corruption by the mod-7
    * rule). The PNG arm is LOSSLESS, so its exact `luma_sum` is
    * re-derived from the text formula exactly as the robust twin does;
    * the JPEG arm is lossy, so the twin predicts only the shape columns
    * and the engine-computed tolerance verdict `luma_close` = TRUE
    * (JPEG preserves the image mean far inside the ±4 band — a codec
    * channel/row-order defect shifts it out). Corrupted rows are
    * ok = false with all-NULL stats, derived purely from the id rule. */
  val multimodalDecodeImageIo: String = s"""
WITH a AS (
  SELECT doc_id AS asset_id, hex(encode(text)) AS hx,
    CAST(strlen(text) AS BIGINT) AS len,
    CASE WHEN doc_id % 2 = 0 THEN 'png' ELSE 'jpeg' END AS format,
    (doc_id % 7) NOT IN (0, 1) AS ok
  FROM documents WHERE strlen(text) > 0),
d AS (SELECT *, greatest((len + 31) // 32, 1) AS h FROM a),
ix AS (SELECT asset_id, len, hx, h,
  unnest(generate_series(0, 32 * h - 1)) AS i
  FROM d WHERE ok AND format = 'png'),
lum AS (
  SELECT asset_id, i,
    (299 * bi + 587 * ((bi + (i % 32)) % 256)
     + 114 * ((bi + (i // 32)) % 256)) // 1000 AS l
  FROM (SELECT asset_id, i,
          ${hexByteAt("hx", "i % len")} AS bi
        FROM ix)),
s AS (SELECT asset_id, SUM(l) AS ls FROM lum GROUP BY asset_id)
SELECT d.asset_id, d.format, d.ok,
  CASE WHEN d.ok THEN CAST(32 AS INT) END AS width,
  CASE WHEN d.ok THEN CAST(d.h AS INT) END AS height,
  CASE WHEN d.ok THEN CAST(32 * d.h AS BIGINT) END AS n_px,
  CAST(s.ls AS BIGINT) AS luma_sum,
  CASE WHEN d.ok THEN TRUE END AS luma_close
FROM d LEFT JOIN s USING (asset_id)
${ord("asset_id")}""".trim

  /** Twin of `Multimodal.audioStats` — the PCM WAV tier: the engine
    * synthesizes a deterministic waveform per doc (2·len frames, mono
    * for even ids / interleaved stereo for odd; sample at frame i,
    * channel c = ((byte(i mod len)·257 + i·31 + c·8191) mod 65536) −
    * 32768), serializes through a REAL RIFF/WAVE container, decodes it
    * back and emits exact integer statistics of the DECODED
    * interleaved stream; this twin re-derives those statistics from
    * the formula alone, so any chunk-walk, endianness or interleaving
    * defect in either codec direction hash-fails. Corruption by the
    * mod-7 rule (truncate-at-half always cuts the data chunk; magic
    * corruption defeats the RIFF check) → ok = false, NULL stats. */
  val multimodalAudioStats: String = s"""
WITH a AS (
  SELECT doc_id AS asset_id, hex(encode(text)) AS hx,
    CAST(strlen(text) AS BIGINT) AS len,
    CAST(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 2 END AS INT) AS channels_exp,
    (doc_id % 7) NOT IN (0, 1) AS ok
  FROM documents WHERE strlen(text) > 0),
ix AS (SELECT asset_id, len, hx, channels_exp,
  unnest(generate_series(0, 2 * len * channels_exp - 1)) AS j
  FROM a WHERE ok),
smp AS (
  SELECT asset_id, j,
    ((bi * 257 + (j // channels_exp) * 31 + (j % channels_exp) * 8191)
      % 65536) - 32768 AS s
  FROM (SELECT asset_id, j, channels_exp,
          ${hexByteAt("hx", "(j // channels_exp) % len")} AS bi
        FROM ix)),
lg AS (SELECT asset_id, j, s,
  lag(s) OVER (PARTITION BY asset_id ORDER BY j) AS prev FROM smp),
agg AS (SELECT asset_id, SUM(s) AS amp, SUM(abs(s)) AS ab,
  MAX(abs(s)) AS mx,
  SUM(CASE WHEN prev IS NOT NULL AND ((s < 0) <> (prev < 0))
      THEN 1 ELSE 0 END) AS zc
  FROM lg GROUP BY asset_id)
SELECT a.asset_id, a.channels_exp, a.ok,
  CASE WHEN a.ok THEN a.channels_exp END AS channels,
  CASE WHEN a.ok THEN CAST(16000 AS INT) END AS sample_rate,
  CASE WHEN a.ok THEN CAST(2 * a.len * a.channels_exp AS BIGINT) END
    AS n_samples,
  CAST(agg.amp AS BIGINT) AS amp_sum,
  CAST(agg.ab AS BIGINT) AS abs_sum,
  CAST(agg.mx AS INT) AS max_abs,
  CAST(agg.zc AS BIGINT) AS zero_cross
FROM a LEFT JOIN agg USING (asset_id)
${ord("asset_id")}""".trim

  /** Twin of `Multimodal.audioFrameEnergy`: per-window Σ s² over the
    * decoded interleaved stream (non-overlapping 256-sample windows,
    * full windows only) — the frame-level feature pass re-derived from
    * the waveform formula. Clean encode: no corruption arm here (the
    * windowing is the subject; the dirty path is audio stats). */
  val audioFrameEnergy: String = s"""
WITH a AS (
  SELECT doc_id AS asset_id, hex(encode(text)) AS hx,
    CAST(strlen(text) AS BIGINT) AS len,
    CAST(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 2 END AS INT) AS channels_exp
  FROM documents WHERE strlen(text) > 0),
ix AS (SELECT asset_id, len, hx, channels_exp,
  unnest(generate_series(0,
    ((2 * len * channels_exp) // 256) * 256 - 1)) AS j
  FROM a WHERE 2 * len * channels_exp >= 256),
smp AS (
  SELECT asset_id, j,
    ((bi * 257 + (j // channels_exp) * 31 + (j % channels_exp) * 8191)
      % 65536) - 32768 AS s
  FROM (SELECT asset_id, j, channels_exp,
          ${hexByteAt("hx", "(j // channels_exp) % len")} AS bi
        FROM ix))
SELECT asset_id, CAST(j // 256 AS INT) AS frame_idx,
  CAST(SUM(CAST(s AS BIGINT) * s) AS BIGINT) AS energy
FROM smp GROUP BY asset_id, frame_idx
${ord("asset_id", "frame_idx")}""".trim

  /** Twin of `Multimodal.videoFrameLuma` — the multi-frame (video)
    * tier: per doc, 4 + (len mod 5) grayscale frames; frame f pixel
    * i = (byte((i + 13·f) mod len) + 7·f) mod 256; every second frame
    * sampled; the twin re-derives each sampled frame's exact luma sum
    * from the formula — frame order, frame count and palette fidelity
    * through the REAL animated-GIF container must all be right. */
  val videoFrameLuma: String = s"""
WITH a AS (
  SELECT doc_id AS asset_id, hex(encode(text)) AS hx,
    CAST(strlen(text) AS BIGINT) AS len,
    CAST(4 + strlen(text) % 5 AS INT) AS n_frames
  FROM documents WHERE strlen(text) > 0),
fr AS (SELECT asset_id, hx, len, n_frames,
  unnest(generate_series(0, n_frames - 1)) AS f FROM a),
ix AS (SELECT asset_id, hx, len, n_frames, f,
  unnest(generate_series(0, 255)) AS i FROM fr WHERE f % 2 = 0),
g AS (SELECT asset_id, f, n_frames,
  (${hexByteAt("hx", "(i + 13 * f) % len")} + 7 * f) % 256 AS gv
  FROM ix)
SELECT asset_id, CAST(f AS INT) AS frame_no, n_frames,
  CAST(32 AS INT) AS width, CAST(8 AS INT) AS height,
  CAST(SUM(gv) AS BIGINT) AS luma_sum
FROM g GROUP BY asset_id, f, n_frames
${ord("asset_id", "frame_no")}""".trim

  /** Twin of `Multimodal.multimodalManifest` — one row per document
    * joining all three modality formulas: the image tier's luma sum
    * (format-free: the mod-3 containers are luma-equivalent), the
    * audio tier's Σ|s|, and the video tier's frame counts; each arm
    * carries its own mod-7 quarantine NULLs. Composing the chains in
    * one query pins that the tiers' id rules stay CONSISTENT across
    * the manifest join. */
  val multimodalManifest: String = s"""
WITH a AS (
  SELECT doc_id AS asset_id, hex(encode(text)) AS hx,
    CAST(strlen(text) AS BIGINT) AS len,
    (doc_id % 7) NOT IN (0, 1) AS ok,
    CAST(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 2 END AS INT) AS ch
  FROM documents WHERE strlen(text) > 0),
d AS (SELECT *, greatest((len + 31) // 32, 1) AS h FROM a),
iix AS (SELECT asset_id, len, hx,
  unnest(generate_series(0, 32 * h - 1)) AS i FROM d WHERE ok),
ilum AS (
  SELECT asset_id,
    (299 * bi + 587 * ((bi + (i % 32)) % 256)
     + 114 * ((bi + (i // 32)) % 256)) // 1000 AS l
  FROM (SELECT asset_id, i, ${hexByteAt("hx", "i % len")} AS bi FROM iix)),
isum AS (SELECT asset_id, SUM(l) AS ls FROM ilum GROUP BY asset_id),
aix AS (SELECT asset_id, len, hx, ch,
  unnest(generate_series(0, 2 * len * ch - 1)) AS j FROM a WHERE ok),
asmp AS (
  SELECT asset_id,
    ((bi * 257 + (j // ch) * 31 + (j % ch) * 8191) % 65536) - 32768 AS s
  FROM (SELECT asset_id, j, ch,
          ${hexByteAt("hx", "(j // ch) % len")} AS bi FROM aix)),
asum AS (SELECT asset_id, SUM(abs(s)) AS ab FROM asmp GROUP BY asset_id)
SELECT a.asset_id, a.ok AS img_ok,
  CAST(isum.ls AS BIGINT) AS img_luma_sum,
  a.ok AS aud_ok, CAST(asum.ab AS BIGINT) AS aud_abs_sum,
  CAST(4 + a.len % 5 AS INT) AS n_frames,
  CAST((4 + a.len % 5 + 1) // 2 AS INT) AS n_sampled
FROM a LEFT JOIN isum USING (asset_id) LEFT JOIN asum USING (asset_id)
${ord("asset_id")}""".trim

  /** Twin of `txlog_restore`: after the bad append + bad patch are
    * rolled back by one restore commit, the snapshot is exactly v0's
    * content — the good slice of the source table, untouched. The
    * restore machinery (metadata-only overwrite, carried stats) must
    * be invisible in the data. */
  val txlogRestore: String = s"""
SELECT doc_id, lang, source, n_chars FROM documents WHERE doc_id < 400
${ord("doc_id", "lang", "source", "n_chars")}""".trim

  /** Twin of `txlog_sql_snapshot` — the SQL-on-TxLog surface: per-lang
    * rollups over the registered LATEST view (after the range delete)
    * and the time-travel view pinned at v1 (the full pre-delete
    * table), answered from the source table alone: the log, the COW
    * delete rewrite, and the temp-view machinery must all be invisible
    * in the data. */
  val txlogSqlSnapshot: String = s"""
WITH now_t AS (
  SELECT lang, n_chars FROM documents
  WHERE NOT COALESCE(doc_id BETWEEN 100 AND 299, FALSE))
SELECT lang, COUNT(*) AS n_docs,
  CAST(SUM(n_chars) AS BIGINT) AS sum_chars, 'now' AS at
FROM now_t GROUP BY lang
UNION ALL
SELECT lang, COUNT(*) AS n_docs,
  CAST(SUM(n_chars) AS BIGINT) AS sum_chars, 'v1' AS at
FROM documents GROUP BY lang
${ord("at", "lang")}""".trim

  /** Twin of `txlog_catalog_dml`: the pure-SQL DML lifecycle through
    * the DSv2 catalog (DELETE FROM a doc_id range, INSERT INTO shifted
    * copies of doc_id < 50, read now + VERSION AS OF 0) replayed as
    * set algebra on the source table — the catalog, the V1Write
    * bridge, and the COW delete must all be invisible in the data.
    * DELETE keeps NULL-predicate rows (SQL semantics). */
  val txlogCatalogDml: String = s"""
WITH now_t AS (
  SELECT doc_id, lang, source, n_chars FROM documents
  WHERE NOT COALESCE(doc_id BETWEEN 100 AND 299, FALSE)
  UNION ALL
  SELECT doc_id + 100000, lang, 'sql-insert', n_chars
  FROM documents WHERE doc_id < 50)
SELECT doc_id, lang, source, n_chars, 'now' AS at FROM now_t
UNION ALL
SELECT doc_id, lang, source, n_chars, 'v0' AS at FROM documents
${ord("doc_id", "lang", "source", "n_chars", "at")}""".trim

  /** Twin of `txlog_catalog_rowlevel`: the SQL row-level DML
    * lifecycle — UPDATE a doc_id band, MERGE (matched-odd delete,
    * matched update, not-matched insert of +900000-shifted copies),
    * then a subquery DELETE — replayed as set algebra on the source
    * table. MERGE matched-ness is join-based (NULL keys never match);
    * DELETE keeps NULL-predicate rows; both mirrored with COALESCE. */
  val txlogCatalogRowLevel: String = s"""
WITH upd AS (
  SELECT doc_id, lang, source,
    CASE WHEN COALESCE(doc_id BETWEEN 100 AND 199, FALSE)
         THEN n_chars + 1000000 ELSE n_chars END AS n_chars
  FROM documents),
merged AS (
  SELECT doc_id,
    CASE WHEN COALESCE(doc_id < 80, FALSE) THEN 'merged' ELSE lang END
      AS lang,
    source, n_chars
  FROM upd
  WHERE NOT COALESCE(doc_id < 80 AND doc_id % 2 = 1, FALSE)
  UNION ALL
  SELECT doc_id + 900000, lang, 'merge-insert', n_chars
  FROM documents WHERE doc_id < 20),
final_t AS (
  SELECT * FROM merged
  WHERE NOT COALESCE(doc_id IN
    (SELECT doc_id FROM documents WHERE doc_id BETWEEN 300 AND 349),
    FALSE))
SELECT doc_id, lang, source, n_chars, 'now' AS at FROM final_t
UNION ALL
SELECT doc_id, lang, source, n_chars, 'v0' AS at FROM documents
${ord("doc_id", "lang", "source", "n_chars", "at")}""".trim

  /** Twin of `txlog_catalog_ctas`: CTAS of doc_id < 400, ALTER ADD
    * note (NULL-filled), an INSERT of +100000-shifted rows carrying
    * note='ins', then MERGE WITH SCHEMA EVOLUTION updating the
    * [50,59] band with note='m' AND auto-adding tag='tagged' (NULL
    * everywhere else); 'v1' time-travels to the original
    * three-column CTAS shape (note/tag padded NULL by the entry). */
  val txlogCatalogCtas: String = s"""
WITH ctas AS (
  SELECT doc_id, lang, n_chars FROM documents WHERE doc_id < 400),
now_t AS (
  SELECT doc_id, lang, n_chars,
    CASE WHEN COALESCE(doc_id BETWEEN 50 AND 59, FALSE)
         THEN 'm' ELSE NULL END AS note,
    CASE WHEN COALESCE(doc_id BETWEEN 50 AND 59, FALSE)
         THEN 'tagged' ELSE NULL END AS tag
  FROM ctas
  UNION ALL
  SELECT doc_id + 100000, lang, n_chars, 'ins', NULL
  FROM documents WHERE doc_id < 30)
SELECT doc_id, lang, n_chars, note, tag, 'now' AS at FROM now_t
UNION ALL
SELECT doc_id, lang, n_chars, CAST(NULL AS VARCHAR) AS note,
  CAST(NULL AS VARCHAR) AS tag, 'v1' AS at FROM ctas
${ord("doc_id", "lang", "n_chars", "note", "tag", "at")}""".trim

  /** Twin of `txlog_catalog_masked_read`: a vectored DELETE of a
    * doc_id band + a vectored UPDATE (source→'mor-upd' below 50)
    * leave the table merge-on-read masked; the SQL catalog serves it
    * straight through (now + a range slice + VERSION AS OF 1 between
    * the two dv commits) — masks, the per-file skip cursor, and the
    * update's re-landed rows must all be invisible next to plain set
    * algebra on the source. */
  val txlogCatalogMaskedRead: String = s"""
WITH masked AS (
  SELECT doc_id, lang,
    CASE WHEN COALESCE(doc_id < 50, FALSE) THEN 'mor-upd' ELSE source END
      AS source,
    n_chars
  FROM documents
  WHERE NOT COALESCE(doc_id BETWEEN 100 AND 299, FALSE)),
v1 AS (
  SELECT doc_id, lang, source, n_chars FROM documents
  WHERE NOT COALESCE(doc_id BETWEEN 100 AND 299, FALSE))
SELECT doc_id, lang, source, n_chars, 'now' AS at FROM masked
UNION ALL
SELECT doc_id, lang, source, n_chars, 'rng' AS at FROM masked
WHERE COALESCE(doc_id BETWEEN 300 AND 399, FALSE)
UNION ALL
SELECT doc_id, lang, source, n_chars, 'v1' AS at FROM v1
${ord("doc_id", "lang", "source", "n_chars", "at")}""".trim

  /** Twin of `txlog_column_mapping`: rename n_chars→chars + drop
    * source are metadata-only, so 'now' = the original rows under the
    * new names with source NULL; the post-mapping append carries
    * +700000-shifted rows (chars+1, source NULL — written before the
    * re-add); the evolve re-add carries +800000-shifted rows with
    * source='readd' while every OLDER file reads the re-added column
    * as NULL (fresh physical name — no resurrection); 'pruned' = the
    * shifted range; 'v0' time-travels to the original names. */
  val txlogColumnMapping: String = s"""
WITH now_t AS (
  SELECT doc_id, lang, n_chars AS chars, CAST(NULL AS VARCHAR) AS source
  FROM documents
  UNION ALL
  SELECT doc_id + 700000, lang, n_chars + 1, CAST(NULL AS VARCHAR)
  FROM documents WHERE doc_id < 30
  UNION ALL
  SELECT doc_id + 800000, lang, n_chars, 'readd'
  FROM documents WHERE doc_id < 10)
SELECT doc_id, lang, chars, source, 'now' AS at FROM now_t
UNION ALL
SELECT doc_id, lang, chars, source, 'pruned' AS at FROM now_t
WHERE doc_id >= 700000
UNION ALL
SELECT doc_id, lang, n_chars AS chars, source, 'v0' AS at FROM documents
${ord("doc_id", "lang", "chars", "source", "at")}""".trim

  /** Twin of `txlog_clone`: after the zero-copy clone the two tables
    * diverge — the source appends +700000-shifted copies, the clone
    * range-deletes [100,199]; the clone's v0 still serves the cloned
    * snapshot. The clone machinery (hard links, carried stats) must
    * be invisible in the data. */
  val txlogClone: String = s"""
SELECT doc_id, lang, source, n_chars, 'src' AS at FROM documents
UNION ALL
SELECT doc_id + 700000, lang, 'post-clone', n_chars, 'src' AS at
FROM documents WHERE doc_id < 20
UNION ALL
SELECT doc_id, lang, source, n_chars, 'dst' AS at FROM documents
WHERE NOT COALESCE(doc_id BETWEEN 100 AND 199, FALSE)
UNION ALL
SELECT doc_id, lang, source, n_chars, 'dst_v0' AS at FROM documents
${ord("doc_id", "lang", "source", "n_chars", "at")}""".trim

  /** Twin of `txlog_sql_maintenance`: the CALL-procedure lifecycle
    * (zorder → clone → rename n_chars→chars → drop source → catalog
    * DELETE on the mapped clone → optimize → checkpoint → vacuum)
    * must be invisible — the source arm unchanged, the clone arm
    * renamed/narrowed minus the deleted band. */
  val txlogSqlMaintenance: String = s"""
SELECT doc_id, lang, source, n_chars AS chars, 'src' AS at
FROM documents
UNION ALL
SELECT doc_id, lang, CAST(NULL AS VARCHAR) AS source,
  n_chars AS chars, 'dst' AS at
FROM documents
WHERE NOT COALESCE(doc_id BETWEEN 100 AND 199, FALSE)
${ord("doc_id", "lang", "source", "chars", "at")}""".trim

  /** Twin of `txlog_generated`: the write computed the omitted
    * generated column, so every row carries n_chars // 100; the 'sel'
    * arm is the pruned range read on it. */
  val txlogGenerated: String = s"""
WITH now_t AS (
  SELECT doc_id, lang, n_chars, n_chars // 100 AS chars_h FROM documents
  UNION ALL
  SELECT doc_id + 600000, lang, n_chars, n_chars // 100
  FROM documents WHERE doc_id < 40)
SELECT doc_id, lang, n_chars, chars_h, 'all' AS at FROM now_t
UNION ALL
SELECT doc_id, lang, n_chars, chars_h, 'sel' AS at FROM now_t
WHERE chars_h BETWEEN 3 AND 5
${ord("doc_id", "lang", "n_chars", "chars_h", "at")}""".trim

  /** Twin of `txlog_bloom_prune`: the bloom-pruned point lookup must
    * equal the plain set-algebra answer — the index is an
    * optimization, never a filter. */
  val txlogBloomPrune: String = s"""
WITH now_t AS (
  SELECT doc_id, lang, source, n_chars FROM documents
  UNION ALL
  SELECT doc_id + 900000, lang, source, n_chars
  FROM documents WHERE doc_id < 10)
SELECT doc_id, lang, source, n_chars, 'all' AS at FROM now_t
UNION ALL
SELECT doc_id, lang, source, n_chars, 'hit' AS at FROM now_t
WHERE doc_id IN (7, 111, 900003)
${ord("doc_id", "lang", "source", "n_chars", "at")}""".trim

  /** Twin of `stream_txlog_fanin`: two exactly-once streams carrying
    * the even and odd halves into one table, each drained twice —
    * the union must hold exactly one copy of every source row. */
  val txlogFanin: String = s"""
SELECT doc_id, lang, source, n_chars FROM documents
${ord("doc_id", "lang", "source", "n_chars")}""".trim

  /** Twin of `txlog_optimize_range`: a deletion-vector delete of
    * [100, 199] followed by a range-scoped compaction — both are
    * invisible in the data, so the twin is the source table minus the
    * deleted range. */
  val txlogOptimizeRange: String = s"""
SELECT doc_id, lang, source, n_chars FROM documents
WHERE NOT COALESCE(doc_id BETWEEN 100 AND 199, FALSE)
${ord("doc_id", "lang", "source", "n_chars")}""".trim

  /** Box-filter cell chain over the DECODED synthetic image's luma
    * pixels (the real-codec analogue of `resizeCellChain`): width 32,
    * height ceil(len/32), pixel value = integer ITU-601 luma of the
    * synthImage channels, wrap-around indexing so the full rectangle
    * is covered (no missing cells — every output cell has >= 1
    * pixel). */
  protected def lumaCellChain(src: String = "documents"): String = s"""
a AS (
  SELECT doc_id AS asset_id, hex(encode(text)) AS hx,
    CAST(strlen(text) AS BIGINT) AS len, CAST(32 AS BIGINT) AS w
  FROM $src WHERE strlen(text) > 0),
d AS (SELECT *, greatest((len + 31) // 32, 1) AS h FROM a),
boxes AS (
  SELECT asset_id, hx, len, w, ox, oy,
    ox * w // 8 AS x0, greatest((ox + 1) * w // 8, ox * w // 8 + 1) AS x1,
    oy * h // 8 AS y0, greatest((oy + 1) * h // 8, oy * h // 8 + 1) AS y1
  FROM (SELECT *, unnest(generate_series(0, 7)) AS ox FROM d),
       (SELECT unnest(generate_series(0, 7)) AS oy)),
pxy AS (
  SELECT asset_id, hx, len, ox, oy, x0, x1,
    unnest(generate_series(y0, y1 - 1)) AS y
  FROM boxes),
pxi AS (
  SELECT asset_id, hx, len, ox, oy, y,
    unnest(generate_series(x0, x1 - 1)) AS x
  FROM pxy),
lpx AS (
  SELECT asset_id, ox, oy,
    (299 * bi + 587 * ((bi + x) % 256) + 114 * ((bi + y) % 256)) // 1000 AS v
  FROM (SELECT asset_id, ox, oy, x, y,
          ${hexByteAt("hx", "(y * 32 + x) % len")} AS bi
        FROM pxi)),
cellv AS (
  SELECT asset_id, ox, oy, SUM(v) // COUNT(*) AS cv
  FROM lpx GROUP BY asset_id, ox, oy)""".trim

  /** Twin of Multimodal.decodedDupCandidates(maxHamming=3): the aHash
    * chain of `imageDupCandidates`, but over REAL decoded pixel bytes
    * (synthesize → BMP/PPM serialize → parse → luma) instead of raw
    * text bytes. Same injected near-variants, same identical-hash
    * group collapse, same 16-bit-chunk blocking — only the pixel
    * source differs, so equality proves the decode chain end-to-end
    * at pair granularity too. */
  val imageDupDecoded: String = {
    val pow64 = "CAST('18446744073709551616' AS HUGEINT)"
    val half = "CAST('9223372036854775808' AS HUGEINT)"
    s"""
WITH RECURSIVE
idocs AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000,
    upper(substring(text, 1, 12)) || substring(text, 13) AS text
  FROM documents),
${lumaCellChain("idocs")},
tw(kk, p) AS (SELECT 0, CAST(1 AS HUGEINT)
  UNION ALL SELECT kk + 1, p * 2 FROM tw WHERE kk < 63),
p2l AS MATERIALIZED (SELECT list(p ORDER BY kk) AS twos FROM tw),
tot AS (SELECT asset_id, CAST(SUM(cv) AS BIGINT) AS s
  FROM cellv GROUP BY asset_id),
hv AS (
  SELECT c.asset_id,
    SUM(CASE WHEN c.cv * 64 > t.s
        THEN p2l.twos[CAST(c.oy * 8 + c.ox AS INT) + 1]
        ELSE CAST(0 AS HUGEINT) END) AS hu
  FROM cellv c JOIN tot t USING (asset_id), p2l
  GROUP BY c.asset_id),
grp AS (
  SELECT hu, MIN(asset_id) AS rep_id, CAST(COUNT(*) AS BIGINT) AS n_members
  FROM hv GROUP BY hu),
sh AS (SELECT rep_id, n_members, hu,
  CAST(CASE WHEN hu >= $half THEN hu - $pow64 ELSE hu END AS BIGINT) AS sig
  FROM grp),
chunked AS (
  SELECT rep_id, sig, t.c AS chunk_no,
    CAST((hu // p2l.twos[t.c * 16 + 1]) % 65536 AS BIGINT) AS chunk
  FROM sh, generate_series(0, 3) t(c), p2l),
cand AS (
  SELECT DISTINCT a.rep_id AS a_id, b.rep_id AS b_id,
    a.sig AS sa, b.sig AS sb
  FROM chunked a JOIN chunked b
    ON a.chunk_no = b.chunk_no AND a.chunk = b.chunk
      AND a.rep_id < b.rep_id)
SELECT c.a_id, c.b_id, CAST(bit_count(xor(c.sa, c.sb)) AS INT) AS hamming,
  ga.n_members AS n_a, gb.n_members AS n_b
FROM cand c
JOIN grp ga ON ga.rep_id = c.a_id
JOIN grp gb ON gb.rep_id = c.b_id
WHERE bit_count(xor(c.sa, c.sb)) <= 3
${ord("a_id", "b_id")}""".trim
  }

  /** Twin of Multimodal.imageDupVerified(maxHamming=3, maxSumDiff=
    * 1024) over the injected-variant fixture: the box-filter chain,
    * per-asset FULL 64-cell thumbnail lists (missing cells zero),
    * per-asset aHash, identical-hash group collapse, the LINEAR
    * member-vs-rep verification audit, chunk blocking over group
    * representatives, and rep-vs-rep cell verification with the
    * integer threshold. */
  val imageDupVerified: String = {
    val pow64 = "CAST('18446744073709551616' AS HUGEINT)"
    val half = "CAST('9223372036854775808' AS HUGEINT)"
    s"""
WITH RECURSIVE
idocs AS (
  SELECT doc_id, text, n_chars FROM documents
  UNION ALL
  SELECT doc_id + 1000000,
    upper(substring(text, 1, 12)) || substring(text, 13) AS text,
    n_chars
  FROM documents),
${resizeCellChain("idocs", "CAST(32 AS BIGINT)")},
tw(kk, p) AS (SELECT 0, CAST(1 AS HUGEINT)
  UNION ALL SELECT kk + 1, p * 2 FROM tw WHERE kk < 63),
p2l AS MATERIALIZED (SELECT list(p ORDER BY kk) AS twos FROM tw),
allc AS (
  SELECT a.asset_id, t1.ox, t2.oy
  FROM a, generate_series(0, 7) t1(ox), generate_series(0, 7) t2(oy)),
tbl AS (
  SELECT ac.asset_id,
    list(COALESCE(c.cv, 0) ORDER BY ac.oy * 8 + ac.ox) AS tb
  FROM allc ac LEFT JOIN cellv c
    ON c.asset_id = ac.asset_id AND c.ox = ac.ox AND c.oy = ac.oy
  GROUP BY ac.asset_id),
ahv AS (
  SELECT asset_id, tb,
    COALESCE(list_sum(list_transform(generate_series(1, 64),
      i -> CASE WHEN tb[i] * 64 > list_sum(tb)
           THEN p2l.twos[i] ELSE CAST(0 AS HUGEINT) END)),
      CAST(0 AS HUGEINT)) AS hu
  FROM tbl, p2l),
vgrp AS (
  SELECT hu, MIN(asset_id) AS rep_id, CAST(COUNT(*) AS BIGINT) AS n_members
  FROM ahv GROUP BY hu),
vrep AS (
  SELECT g.rep_id, g.hu, g.n_members, t.tb AS rtb
  FROM vgrp g JOIN tbl t ON t.asset_id = g.rep_id),
vaud AS (
  SELECT g.rep_id, MIN(g.n_members) AS n_members,
    CAST(SUM(CASE WHEN list_sum(list_transform(list_zip(m.tb, r.rtb),
      p -> abs(p[1] - p[2]))) <= 1024 THEN 1 ELSE 0 END) AS BIGINT)
      AS n_verified
  FROM ahv m JOIN vgrp g ON m.hu = g.hu JOIN vrep r ON r.rep_id = g.rep_id
  GROUP BY g.rep_id),
vsh AS (
  SELECT rep_id, hu, rtb,
    CAST(CASE WHEN hu >= $half THEN hu - $pow64 ELSE hu END AS BIGINT) AS sig
  FROM vrep),
vchunk AS (
  SELECT rep_id, sig, rtb, t.c AS chunk_no,
    CAST((hu // p2l.twos[t.c * 16 + 1]) % 65536 AS BIGINT) AS chunk
  FROM vsh, generate_series(0, 3) t(c), p2l),
vcand AS (
  SELECT DISTINCT a.rep_id AS a_id, b.rep_id AS b_id,
    a.sig AS sa, b.sig AS sb, a.rtb AS ta, b.rtb AS tbb
  FROM vchunk a JOIN vchunk b
    ON a.chunk_no = b.chunk_no AND a.chunk = b.chunk
      AND a.rep_id < b.rep_id),
vfin AS (
  SELECT c.a_id, c.b_id,
    CAST(bit_count(xor(c.sa, c.sb)) AS INT) AS hamming,
    CAST(list_sum(list_transform(list_zip(c.ta, c.tbb),
      p -> abs(p[1] - p[2]))) AS BIGINT) AS sum_abs_diff,
    aa.n_members AS n_a, aa.n_verified AS n_a_verified,
    ab.n_members AS n_b, ab.n_verified AS n_b_verified
  FROM vcand c
  JOIN vaud aa ON aa.rep_id = c.a_id
  JOIN vaud ab ON ab.rep_id = c.b_id
  WHERE bit_count(xor(c.sa, c.sb)) <= 3)
SELECT a_id, b_id, hamming, sum_abs_diff,
  n_a, n_a_verified, n_b, n_b_verified
FROM vfin WHERE sum_abs_diff <= 1024
${ord("a_id", "b_id")}""".trim
  }

  /** Twin of Profiling.equiDepthHistogram(events.value, 10): integer-
    * cents counts, exact quantile_cont boundaries (the pin_q6
    * interpolation contract against Spark's weighted percentile),
    * strictly-greater boundary counting, |bins|-row rollup. */
  val equiDepthHistogram: String = {
    val fracs = (1 until 10).map(i => i.toDouble / 10).mkString(", ")
    s"""
WITH q AS (SELECT CAST(round(value*100) AS BIGINT) AS cv FROM events),
qb AS (SELECT quantile_cont(cv, [$fracs]) AS qs FROM q),
qa AS (
  SELECT cv, CAST(list_sum(list_transform(qb.qs,
    x -> CASE WHEN CAST(cv AS DOUBLE) > x THEN 1 ELSE 0 END))
    AS BIGINT) AS bin
  FROM q, qb)
SELECT bin, CAST(COUNT(*) AS BIGINT) AS n_rows,
  MIN(cv) AS min_cents, MAX(cv) AS max_cents
FROM qa GROUP BY bin
${ord("bin")}""".trim
  }

  /** Twin of Profiling.psiDrift(events.value, 10 bins): integer-µs
    * midpoint split, reference-half quantile_cont boundaries (the
    * pin_q6 interpolation contract), strictly-greater binning, add-1
    * smoothed shares, quantized-log PSI contributions. */
  val psiDrift: String = {
    val fracs = (1 until 10).map(i => i.toDouble / 10).mkString(", ")
    s"""
WITH pb AS (
  SELECT CAST(round(value*100) AS BIGINT) AS cv, epoch_us(ts) AS us
  FROM events),
pm AS (SELECT (MIN(us) + MAX(us)) // 2 AS mid FROM pb),
pc AS (
  SELECT cv, (us < pm.mid) AS is_ref, CAST(COUNT(*) AS BIGINT) AS f
  FROM pb, pm GROUP BY cv, (us < pm.mid)),
pqe AS (
  SELECT quantile_cont(cv, [$fracs]) AS qs
  FROM pb, pm WHERE us < pm.mid),
pa AS (
  SELECT is_ref, f,
    CAST(list_sum(list_transform(pqe.qs,
      x -> CASE WHEN CAST(cv AS DOUBLE) > x THEN 1 ELSE 0 END))
      AS BIGINT) AS bin
  FROM pc, pqe),
pg0 AS (
  SELECT bin,
    CAST(SUM(CASE WHEN is_ref THEN f ELSE 0 END) AS BIGINT) AS n_ref,
    CAST(SUM(CASE WHEN NOT is_ref THEN f ELSE 0 END) AS BIGINT) AS n_cur
  FROM pa GROUP BY bin),
pg AS (
  -- full bin domain: tied boundaries can starve a bin of rows from
  -- both halves; its add-1 smoothing term still belongs in the PSI
  SELECT d.bin, COALESCE(pg0.n_ref, 0) AS n_ref,
    COALESCE(pg0.n_cur, 0) AS n_cur
  FROM (SELECT CAST(range AS BIGINT) AS bin FROM range(10)) d
  LEFT JOIN pg0 ON d.bin = pg0.bin),
pt AS (SELECT CAST(SUM(n_ref) AS BIGINT) AS t_ref,
  CAST(SUM(n_cur) AS BIGINT) AS t_cur FROM pg),
pp AS (
  SELECT bin, n_ref, n_cur,
    CAST(n_ref + 1 AS DOUBLE) / CAST(pt.t_ref + 10 AS DOUBLE) AS p_ref,
    CAST(n_cur + 1 AS DOUBLE) / CAST(pt.t_cur + 10 AS DOUBLE) AS p_cur
  FROM pg, pt)
SELECT bin, n_ref, n_cur, p_ref, p_cur,
  (p_cur - p_ref) *
    (CAST(CAST(round(ln(p_cur / p_ref) * 1000000) AS BIGINT) AS DOUBLE)
      / 1000000) AS psi_contrib
FROM pp
${ord("bin")}""".trim
  }

  /** Twin of SkewJoin.skewReport(events, event_type, 10): key counts,
    * 1-row totals, identical share/skew double divisions, top-10
    * (n_rows DESC, key ASC). */
  val skewReport: String = s"""
WITH c AS (
  SELECT CAST(event_type AS VARCHAR) AS key_value,
    CAST(COUNT(*) AS BIGINT) AS n_rows
  FROM events GROUP BY event_type),
t AS (SELECT CAST(SUM(n_rows) AS BIGINT) AS t,
  CAST(COUNT(*) AS BIGINT) AS n_keys FROM c),
r AS (
  SELECT key_value, n_rows, t.n_keys,
    CAST(n_rows AS DOUBLE) / CAST(t.t AS DOUBLE) AS share,
    CAST(n_rows AS DOUBLE)
      / (CAST(t.t AS DOUBLE) / CAST(t.n_keys AS DOUBLE)) AS skew_vs_mean
  FROM c, t ORDER BY n_rows DESC, key_value ASC LIMIT 10)
SELECT key_value, n_rows, n_keys, share, skew_vs_mean FROM r
${ord("key_value")}""".trim

  /** Twin of Sketches.joinCardinalityEstimate(orders.o_custkey ×
    * customer.c_custkey, k=256): per-side KMV minima over the split-
    * multiply Fibonacci mix (native HUGEINT unsigned order — the
    * engine's sign-bit-flip trick is unnecessary here), Beyer et al.
    * union/Jaccard/intersection estimators as the identical double
    * expressions. */
  val joinCardinality: String = {
    val pow64 = "CAST('18446744073709551616' AS HUGEINT)"
    val pow32 = "CAST(4294967296 AS HUGEINT)"
    def mix(key: String) =
      s"""((CAST($key AS HUGEINT) * 2135587861) % $pow64
     + ((CAST($key AS HUGEINT) * 2654435769) % $pow32) * $pow32) % $pow64"""
    s"""
WITH la0 AS (SELECT DISTINCT ${mix("o_custkey")} AS u FROM orders),
lar AS (SELECT u, row_number() OVER (ORDER BY u ASC) AS r FROM la0),
la AS (SELECT list(u ORDER BY u) AS l FROM lar WHERE r <= 256),
lb0 AS (SELECT DISTINCT ${mix("c_custkey")} AS u FROM customer),
lbr AS (SELECT u, row_number() OVER (ORDER BY u ASC) AS r FROM lb0),
lb AS (SELECT list(u ORDER BY u) AS l FROM lbr WHERE r <= 256),
mu0 AS (
  SELECT DISTINCT u FROM (
    SELECT unnest(l) AS u FROM la UNION ALL SELECT unnest(l) AS u FROM lb)),
mur AS (SELECT u, row_number() OVER (ORDER BY u ASC) AS r FROM mu0),
mu AS (SELECT list(u ORDER BY u) AS l FROM mur WHERE r <= 256),
mc AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS c
  FROM mur, la, lb
  WHERE mur.r <= 256 AND list_contains(la.l, mur.u)
    AND list_contains(lb.l, mur.u))
SELECT
  CASE WHEN len(la.l) < 256 THEN CAST(len(la.l) AS DOUBLE)
       ELSE 255.0 * CAST('18446744073709551616' AS DOUBLE)
            / CAST(la.l[256] AS DOUBLE) END AS est_distinct_left,
  CASE WHEN len(lb.l) < 256 THEN CAST(len(lb.l) AS DOUBLE)
       ELSE 255.0 * CAST('18446744073709551616' AS DOUBLE)
            / CAST(lb.l[256] AS DOUBLE) END AS est_distinct_right,
  CAST(len(mu.l) AS BIGINT) AS n_union_topk,
  mc.c AS n_common_topk,
  CASE WHEN len(mu.l) < 256 THEN CAST(len(mu.l) AS DOUBLE)
       ELSE 255.0 * CAST('18446744073709551616' AS DOUBLE)
            / CAST(mu.l[256] AS DOUBLE) END AS est_union,
  CASE WHEN len(mu.l) = 0 THEN 0.0
       ELSE CAST(mc.c AS DOUBLE) / CAST(len(mu.l) AS DOUBLE)
  END AS est_jaccard,
  (CASE WHEN len(mu.l) = 0 THEN 0.0
        ELSE CAST(mc.c AS DOUBLE) / CAST(len(mu.l) AS DOUBLE) END) *
    (CASE WHEN len(mu.l) < 256 THEN CAST(len(mu.l) AS DOUBLE)
          ELSE 255.0 * CAST('18446744073709551616' AS DOUBLE)
               / CAST(mu.l[256] AS DOUBLE) END) AS est_intersection
FROM la, lb, mu, mc""".trim
  }

  /** Twin of ShapeQueries.eventTransitions: per-user lead window with
    * the (ts, event_id) sessionization tie-break, |types|² rollup,
    * probability over the rollup's row totals. */
  val eventTransitions: String = s"""
WITH pr AS (
  SELECT event_type AS from_type,
    LEAD(event_type) OVER (
      PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS to_type
  FROM events),
m AS (
  SELECT from_type, to_type, CAST(COUNT(*) AS BIGINT) AS n_transitions
  FROM pr WHERE to_type IS NOT NULL GROUP BY from_type, to_type)
SELECT from_type, to_type, n_transitions,
  CAST(n_transitions AS DOUBLE) /
    CAST(SUM(n_transitions) OVER (PARTITION BY from_type) AS DOUBLE)
    AS p_transition
FROM m
${ord("from_type", "to_type")}""".trim

  /** Twin of Profiling.kAnonymity(events, (event_type, day), k=5):
    * quasi-identifier class sizes, 1-row risk rollup. */
  val kAnonymity: String = s"""
WITH cls AS (
  SELECT event_type, date_trunc('day', ts) AS day,
    CAST(COUNT(*) AS BIGINT) AS n_rows
  FROM events GROUP BY event_type, date_trunc('day', ts))
SELECT CAST(COUNT(*) AS BIGINT) AS n_classes,
  CAST(SUM(n_rows) AS BIGINT) AS n_rows_total,
  MIN(n_rows) AS min_class_size,
  CAST(SUM(CASE WHEN n_rows < 5 THEN 1 ELSE 0 END) AS BIGINT)
    AS n_small_classes,
  CAST(SUM(CASE WHEN n_rows < 5 THEN n_rows ELSE 0 END) AS BIGINT)
    AS n_rows_at_risk,
  CAST(SUM(CASE WHEN n_rows < 5 THEN n_rows ELSE 0 END) AS DOUBLE)
    / CAST(SUM(n_rows) AS DOUBLE) AS at_risk_rate
FROM cls""".trim

  /** Shared scoring tail for the anomaly twins: per-type HUGEINT
    * moment sums (the decimal(38) twin), mean/var as the
    * embeddingDimStats fixed double expressions, z over the computed
    * attributes, NULL at zero variance; expects a CTE `hourly`
    * (event_type, hour, n_events) upstream. */
  protected lazy val anomalyTail: String = s"""
st AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_hours,
    SUM(CAST(n_events AS HUGEINT)) AS s1,
    SUM(CAST(n_events AS HUGEINT) * CAST(n_events AS HUGEINT)) AS s2
  FROM hourly GROUP BY event_type),
j AS (
  SELECT h.event_type, h.hour, h.n_events, st.n_hours,
    CAST(st.s1 AS DOUBLE) / CAST(st.n_hours AS DOUBLE) AS mean_events,
    (CAST(st.s2 AS DOUBLE) - CAST(st.s1 AS DOUBLE) * CAST(st.s1 AS DOUBLE)
       / CAST(st.n_hours AS DOUBLE)) / CAST(st.n_hours AS DOUBLE)
      AS var_events
  FROM hourly h JOIN st USING (event_type)),
z AS (
  SELECT *, CASE WHEN var_events = 0.0 THEN NULL
    ELSE (CAST(n_events AS DOUBLE) - mean_events) / sqrt(var_events) END AS z
  FROM j)
SELECT event_type, CAST(hour AS VARCHAR) AS hour_str, n_events, n_hours,
  mean_events, var_events, z,
  COALESCE(abs(z) > 3.0, FALSE) AS is_anomaly
FROM z
${ord("event_type", "hour_str")}""".trim

  /** Twin of Profiling.eventAnomaly(threshold=3.0) over raw events. */
  val eventAnomaly: String = s"""
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS hour,
    CAST(COUNT(*) AS BIGINT) AS n_events
  FROM events GROUP BY event_type, date_trunc('hour', ts)),
$anomalyTail""".trim

  /** Twin of the streaming-composed anomaly: the SAME scoring tail
    * over the watermark-released hourly windows (the
    * streamEventsHourly cutoff — append mode only emits a window once
    * max(ts) − 30 min passes its end). */
  val streamEventAnomaly: String = s"""
WITH wm AS (SELECT max(ts) - INTERVAL 30 MINUTE AS w FROM events),
hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS hour,
    CAST(COUNT(*) AS BIGINT) AS n_events
  FROM events, wm
  WHERE date_trunc('hour', ts) + INTERVAL 1 HOUR <= wm.w
  GROUP BY event_type, date_trunc('hour', ts)),
$anomalyTail""".trim
}
