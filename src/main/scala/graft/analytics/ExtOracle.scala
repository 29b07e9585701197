package graft.analytics

/** DuckDB oracle twins for the shape queries (ShapeQueries) and the
  * oracle-expressible extension operators (TextAnalysis / Dedup /
  * Similarity). Parity rules as in PinOracle plus:
  *  - integer-cents quantization `round(x*100)` for money/measure
  *    doubles (see ShapeQueries scaladoc for why this is
  *    engine-deterministic);
  *  - embedding math on `round(x*1000)` quantized values — integer-
  *    exact dot products (< 2^53, so even double accumulation is
  *    exact), cosine as the same a/(sqrt·sqrt) expression both sides.
  */
object ExtOracle {

  private def ord(cols: String*): String =
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

  /** Twin of TextAnalysis.sourceScorecard: same quality expression
    * (·10⁶ quantized per doc before the source sum), same shape-rule
    * pass predicate as streamQualityFilter. */
  val sourceScorecard: String = s"""
WITH sig AS (
  SELECT doc_id, source, text,
    string_split_regex(trim(text), '\\s+') AS w,
    string_split_regex(trim(text), '\\s+') AS wq
  FROM documents),
per AS (
  SELECT doc_id, source,
    CAST(round(round((CAST(len(list_distinct(wq)) AS DOUBLE) / CAST(len(wq) AS DOUBLE)) * 0.5
      + least(CAST(len(wq) AS DOUBLE) / 64.0, 1.0) * 0.3
      + (CASE WHEN ((CAST(length(text) AS DOUBLE) - (CAST(len(wq) AS DOUBLE) - 1))
                    / CAST(len(wq) AS DOUBLE)) BETWEEN 3.0 AND 9.0
              THEN 1.0 ELSE 0.5 END) * 0.2, 6) * 1000000) AS BIGINT) AS q6,
    (len(w) BETWEEN 20 AND 100000
      AND (CAST(length(array_to_string(w, '')) AS DOUBLE) /
           CAST(len(w) AS DOUBLE)) BETWEEN 3.0 AND 10.0
      AND (CAST(len(regexp_extract_all(text, '#|\\.\\.\\.')) AS DOUBLE) /
           CAST(len(w) AS DOUBLE)) <= 0.1
      AND (CAST(len(list_filter(w, x -> regexp_matches(x, '[A-Za-z]'))) AS DOUBLE) /
           CAST(len(w) AS DOUBLE)) >= 0.8) AS shape_pass
  FROM sig)
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(SUM(q6) AS BIGINT) AS sum_q6,
  CAST(SUM(CASE WHEN shape_pass THEN 1 ELSE 0 END) AS BIGINT) AS n_shape_pass,
  CAST(SUM(q6) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) / 1000000 AS mean_quality,
  CAST(SUM(CASE WHEN shape_pass THEN 1 ELSE 0 END) AS DOUBLE) /
    CAST(COUNT(*) AS DOUBLE) AS shape_pass_rate
FROM per GROUP BY source
${ord("source")}""".trim

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
  CASE WHEN o.oh IS NULL THEN 'added'
       WHEN n.nh IS NULL THEN 'removed'
       WHEN o.oh <> n.nh THEN 'changed'
       ELSE 'unchanged' END AS status
FROM oldc o FULL OUTER JOIN newc n ON o.doc_id = n.doc_id
${ord("doc_id")}""".trim

  /** Twin of TextAnalysis.qualityTiers: same quality expression,
    * quantile_cont list cutoffs ≡ Spark percentile(array). */
  /** Twin of TextAnalysis.normalizeText over the decomposed-unicode
    * injection (%3 docs get combining-acute/ring sequences + a tab):
    * DuckDB's nfc_normalize implements the same UAX #15 composition
    * as the engine's native expression; chr(769)/chr(778) are the
    * combining marks the Spark side injects as \\u0301/\\u030a. */
  val normalizeText: String = s"""
WITH injected AS (
  SELECT doc_id,
    CASE WHEN doc_id % 3 = 0
      THEN 'Cafe' || chr(769) || ' ' || chr(9) || ' ' || text
        || '  A' || chr(778)
      ELSE text END AS text
  FROM documents),
n AS (
  SELECT doc_id,
    trim(regexp_replace(lower(nfc_normalize(text)), '\\s+', ' ', 'g'))
      AS text_norm
  FROM injected)
SELECT doc_id, text_norm, CAST(length(text_norm) AS INT) AS n_chars_norm
FROM n
${ord("doc_id")}""".trim

  /** Twin of TextAnalysis.curriculumOrder(phases = 3): same quality
    * expression and tertile cuts (phase 1 = top third), same
    * per-phase Knuth-bucket rank plus phase base offsets — a global
    * contiguous curriculum_rank with no global window. */
  val curriculumOrder: String = s"""
WITH t AS (
  SELECT doc_id,
    CAST(len(string_split_regex(trim(text), '\\s+')) AS DOUBLE) AS n_tok,
    CAST(len(list_distinct(string_split_regex(trim(text), '\\s+'))) AS DOUBLE) AS n_uniq,
    CAST(length(text) AS DOUBLE) AS n_chars
  FROM documents),
q AS (
  SELECT doc_id,
    round((n_uniq / n_tok) * 0.5
      + least(n_tok / 64.0, 1.0) * 0.3
      + (CASE WHEN ((n_chars - (n_tok - 1)) / n_tok) BETWEEN 3.0 AND 9.0
              THEN 1.0 ELSE 0.5 END) * 0.2, 6) AS quality
  FROM t),
c AS (SELECT quantile_cont(quality, [1.0/3, 2.0/3]) AS cuts FROM q),
ph AS (
  SELECT doc_id, quality,
    3 - ((CASE WHEN quality >= cuts[2] THEN 1 ELSE 0 END)
       + (CASE WHEN quality >= cuts[1] THEN 1 ELSE 0 END)) AS phase
  FROM q, c),
off AS (SELECT phase, CAST(COUNT(*) AS BIGINT) AS n FROM ph GROUP BY phase),
base AS (
  SELECT phase, CAST(COALESCE(SUM(n) OVER (ORDER BY phase ASC
    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS b
  FROM off),
rk AS (
  SELECT ph.doc_id, ph.quality, ph.phase,
    base.b + ROW_NUMBER() OVER (PARTITION BY ph.phase
      ORDER BY ((ph.doc_id % 1000003) * 2654435761) % 10000 ASC,
        ph.doc_id ASC) AS curriculum_rank
  FROM ph JOIN base USING (phase))
SELECT doc_id, quality, phase, curriculum_rank FROM rk
${ord("doc_id")}""".trim

  val qualityTiers: String = s"""
WITH t AS (
  SELECT doc_id,
    CAST(len(string_split_regex(trim(text), '\\s+')) AS DOUBLE) AS n_tok,
    CAST(len(list_distinct(string_split_regex(trim(text), '\\s+'))) AS DOUBLE) AS n_uniq,
    CAST(length(text) AS DOUBLE) AS n_chars
  FROM documents),
q AS (
  SELECT doc_id,
    round((n_uniq / n_tok) * 0.5
      + least(n_tok / 64.0, 1.0) * 0.3
      + (CASE WHEN ((n_chars - (n_tok - 1)) / n_tok) BETWEEN 3.0 AND 9.0
              THEN 1.0 ELSE 0.5 END) * 0.2, 6) AS quality
  FROM t),
c AS (SELECT quantile_cont(quality, [0.25, 0.5, 0.75]) AS cuts FROM q)
SELECT doc_id, quality,
  1 + (CASE WHEN quality >= cuts[1] THEN 1 ELSE 0 END)
    + (CASE WHEN quality >= cuts[2] THEN 1 ELSE 0 END)
    + (CASE WHEN quality >= cuts[3] THEN 1 ELSE 0 END) AS tier
FROM q, c
${ord("doc_id")}""".trim

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

  val textStats: String = s"""
SELECT doc_id,
  CAST(len(string_split_regex(trim(text), '\\s+')) AS INT) AS n_tokens,
  CAST(len(list_distinct(string_split_regex(trim(text), '\\s+'))) AS INT) AS n_uniq_tokens,
  CAST(length(text) AS INT) AS n_chars_calc,
  CAST(length(text) - length(replace(text, ' ', '')) AS INT) AS n_spaces,
  CAST(len(list_distinct(string_split_regex(trim(text), '\\s+'))) AS DOUBLE) /
    CAST(len(string_split_regex(trim(text), '\\s+')) AS DOUBLE) AS type_token_ratio,
  CAST(length(text) - (length(text) - length(replace(text, ' ', ''))) AS DOUBLE) /
    CAST(len(string_split_regex(trim(text), '\\s+')) AS DOUBLE) AS mean_token_len
FROM documents
${ord("doc_id")}""".trim

  val bpeTokenCount: String = s"""
SELECT doc_id,
  CAST(len(string_split_regex(trim(text), '\\s+')) AS INT) AS n_ws_tokens,
  CAST(len(regexp_extract_all(text,
    '(''(?:[sdmt]|ll|ve|re))|( ?\\p{L}+)|( ?\\p{N}+)|( ?[^\\s\\p{L}\\p{N}]+)|(\\s+)'))
    AS INT) AS n_bpe_tokens
FROM documents
${ord("doc_id")}""".trim

  /** Twin of TextAnalysis.bpeLearnMerges(nMerges=8): the 8 sequential
    * argmax-merge iterations unrolled as CTE rounds over the word-
    * frequency table — chars joined by chr(31), adjacent-pair counts
    * weighted by word freq, argmax = (pf DESC, lhs ASC, rhs ASC)
    * LIMIT 1 (the window form of the engine's min(struct(-pf, a, b))),
    * literal replace of lhs‖SEP‖rhs (non-overlapping left-to-right in
    * both engines). Assumes ≥ 8 learnable pairs (any real corpus; the
    * engine's early-stop path is spec-covered instead). */
  private val bpeSep = "chr(31)"

  /** The 8-round merge-learning CTE chain (`w0` word frequencies,
    * `b0..b7` per-round argmax pairs, `w1..w8` rewritten vocabs) —
    * shared by the learning twin and the apply twin. */
  private lazy val bpeLearnChain: String = {
    def pairs(w: String): String = s"""
  SELECT syms[k] AS a, syms[k + 1] AS b, SUM(freq) AS pf FROM (
    SELECT syms, freq, unnest(generate_series(1, len(syms) - 1)) AS k
    FROM (SELECT string_split(w, $bpeSep) AS syms, freq FROM $w))
  GROUP BY 1, 2"""
    val roundSql = (0 until 8).map { i =>
      s"""b$i AS (
  SELECT a, b, pf FROM (${pairs(s"w$i")})
  ORDER BY pf DESC, a ASC, b ASC LIMIT 1),
w${i + 1} AS (
  SELECT replace(w, b$i.a || $bpeSep || b$i.b, b$i.a || b$i.b) AS w, freq
  FROM w$i, b$i)"""
    }.mkString(",\n")
    s"""
WITH w0 AS (
  SELECT array_to_string(string_split_regex(tok, ''), $bpeSep) AS w, freq FROM (
    SELECT tok, COUNT(*) AS freq FROM (
      SELECT unnest(string_split_regex(trim(text), '\\s+')) AS tok FROM documents)
    GROUP BY tok)),
$roundSql""".trim
  }

  val bpeMerges: String = {
    val unions = (0 until 8).map(i =>
      s"SELECT ${i + 1} AS merge_rank, a AS lhs, b AS rhs, CAST(pf AS BIGINT) AS pair_freq FROM b$i")
      .mkString("\n  UNION ALL ")
    s"""$bpeLearnChain
SELECT merge_rank, lhs, rhs, pair_freq FROM (
  $unions)
ORDER BY merge_rank""".trim
  }

  /** Twin of bpeLearnMerges(8) ∘ bpeApplyCount: the learning chain's
    * b0..b7 applied in rank order to every document's words, then the
    * per-doc symbol count. */
  val bpeApplyCount: String = {
    val applies = (0 until 8).map(i =>
      s"""a${i + 1} AS (
  SELECT doc_id, replace(w, b$i.a || $bpeSep || b$i.b, b$i.a || b$i.b) AS w
  FROM a$i, b$i)""").mkString(",\n")
    s"""$bpeLearnChain,
a0 AS (
  SELECT doc_id, array_to_string(string_split_regex(tok, ''), $bpeSep) AS w FROM (
    SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS tok
    FROM documents)),
$applies
SELECT doc_id, CAST(SUM(len(string_split(w, $bpeSep))) AS BIGINT) AS n_bpe_symbols
FROM a8 GROUP BY doc_id
${ord("doc_id")}""".trim
  }

  /** Twin of TextAnalysis.vocabSize's exact column. */
  val vocabSize: String = s"""
SELECT CAST(COUNT(DISTINCT token) AS BIGINT) AS exact_vocab FROM (
  SELECT unnest(string_split_regex(trim(text), '\\s+')) AS token
  FROM documents)""".trim

  val tokenFreqTopK: String = s"""
SELECT token, CAST(COUNT(*) AS BIGINT) AS freq FROM (
  SELECT unnest(string_split_regex(trim(text), '\\s+')) AS token FROM documents)
GROUP BY token
ORDER BY freq DESC, token ASC
LIMIT 25""".trim

  val qualityScore: String = s"""
WITH t AS (
  SELECT doc_id,
    CAST(len(string_split_regex(trim(text), '\\s+')) AS DOUBLE) AS n_tok,
    CAST(len(list_distinct(string_split_regex(trim(text), '\\s+'))) AS DOUBLE) AS n_uniq,
    CAST(length(text) AS DOUBLE) AS n_chars
  FROM documents)
SELECT doc_id,
  round((n_uniq / n_tok) * 0.5
    + least(n_tok / 64.0, 1.0) * 0.3
    + (CASE WHEN ((n_chars - (n_tok - 1)) / n_tok) BETWEEN 3.0 AND 9.0
            THEN 1.0 ELSE 0.5 END) * 0.2, 6) AS quality
FROM t
${ord("doc_id")}""".trim

  /** Twin of TextAnalysis.scrubPii over the injected-PII corpus. The
    * regexes are spelled out independently (RE2 dialect; DuckDB
    * regexp_replace needs the explicit 'g' flag Spark applies by
    * default) with the same order: emails, dotted IPv4, strict
    * phones. */
  val piiScrub: String = s"""
WITH inj AS (
  SELECT doc_id,
    CASE WHEN doc_id % 5 = 0 THEN text
      || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com from 10.'
      || CAST(doc_id % 200 AS VARCHAR) || '.' || CAST(doc_id % 250 AS VARCHAR)
      || '.7 tel 555-' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0')
      || '-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
    ELSE text END AS text
  FROM documents)
SELECT doc_id,
  regexp_replace(regexp_replace(regexp_replace(text,
    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
    '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b', '<IP>', 'g'),
    '\\b\\d{3}-\\d{3}-\\d{4}\\b', '<PHONE>', 'g') AS clean_text,
  CAST(len(regexp_extract_all(text,
    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS INT) AS n_emails,
  CAST(len(regexp_extract_all(text,
    '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b')) AS INT) AS n_ips,
  CAST(len(regexp_extract_all(text,
    '\\b\\d{3}-\\d{3}-\\d{4}\\b')) AS INT) AS n_phones
FROM inj
${ord("doc_id")}""".trim

  /** Twin of TextAnalysis.gopherRules: same token/line arrays, same
    * single-division ratios, same rule thresholds. Bullet/ellipsis
    * line predicates use LIKE ('.', '-', '*' are literal in LIKE) to
    * mirror Spark's startsWith/endsWith. */
  val gopherRules: String = s"""
WITH d AS (
  SELECT doc_id,
    string_split_regex(trim(text), '\\s+') AS w,
    string_split_regex(trim(lower(text)), '\\s+') AS tl,
    string_split(text, chr(10)) AS lines,
    CAST(len(regexp_extract_all(text, '#|\\.\\.\\.')) AS INT) AS n_symbols
  FROM documents),
s AS (
  SELECT doc_id,
    CAST(len(w) AS INT) AS n_words,
    CAST(length(array_to_string(w, '')) AS DOUBLE) / CAST(len(w) AS DOUBLE)
      AS mean_word_len,
    CAST(len(list_filter(w, x -> regexp_matches(x, '[A-Za-z]'))) AS DOUBLE) /
      CAST(len(w) AS DOUBLE) AS frac_alpha_words,
    CAST(n_symbols AS DOUBLE) / CAST(len(w) AS DOUBLE) AS symbol_ratio,
    CAST(len(list_filter(lines, l -> trim(l) LIKE '-%' OR trim(l) LIKE '*%'
      OR trim(l) LIKE '•%')) AS DOUBLE) / CAST(len(lines) AS DOUBLE)
      AS frac_bullet_lines,
    CAST(len(list_filter(lines, l -> trim(l) LIKE '%...')) AS DOUBLE) /
      CAST(len(lines) AS DOUBLE) AS frac_ellipsis_lines,
    CAST(len(list_intersect(tl,
      ['the','be','to','of','and','that','have','with'])) AS INT)
      AS n_required_hits
  FROM d)
SELECT *,
  (n_words BETWEEN 50 AND 100000) AND (mean_word_len BETWEEN 3.0 AND 10.0)
    AND symbol_ratio <= 0.1 AND frac_bullet_lines <= 0.9
    AND frac_ellipsis_lines <= 0.3 AND frac_alpha_words >= 0.8
    AND n_required_hits >= 2 AS pass
FROM s
${ord("doc_id")}""".trim

  /** Twin of TextAnalysis.repetitionScore: 1 − distinct/total word
    * 3-grams, clamped shingle boundaries as in the dedup twins. */
  val repetitionScore: String = s"""
WITH ws AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w FROM documents),
shl AS (
  SELECT doc_id, list_transform(
    generate_series(1, greatest(len(w) - 2, 1)),
    i -> array_to_string(list_slice(w, i, i + 2), ' ')) AS sh
  FROM ws)
SELECT doc_id,
  CAST(len(sh) AS INT) AS n_grams,
  CAST(len(list_distinct(sh)) AS INT) AS n_uniq_grams,
  1.0 - CAST(len(list_distinct(sh)) AS DOUBLE) / CAST(len(sh) AS DOUBLE)
    AS repetition
FROM shl
${ord("doc_id")}""".trim

  /** Twin of Indexing.stableRowIds: the offsets-and-local-indices
    * decomposition must equal a plain dense row numbering. */
  val stableRowIds: String = s"""
SELECT doc_id, lang,
  CAST(ROW_NUMBER() OVER (ORDER BY doc_id) - 1 AS BIGINT) AS row_id
FROM documents
${ord("doc_id")}""".trim

  /** Twin of TextAnalysis.lmQuality: same corpus-unigram model, same
    * integer quantization of per-token log-probs before the per-doc
    * sum (exact addition — engine-order-independent). */
  val lmQuality: String = s"""
WITH toks AS (
  SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS tok FROM documents),
freqs AS (
  SELECT tok, CAST(COUNT(*) AS BIGINT) AS tf FROM toks GROUP BY tok),
tot AS (SELECT CAST(SUM(tf) AS BIGINT) AS total FROM freqs),
scored AS (
  SELECT t.doc_id,
    CAST(round(ln(CAST(f.tf AS DOUBLE) / CAST(tot.total AS DOUBLE)) * 1000000) AS BIGINT) AS q
  FROM toks t JOIN freqs f ON t.tok = f.tok, tot)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
  CAST(SUM(q) AS BIGINT) AS sum_q_logprob,
  CAST(SUM(q) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) / 1000000 AS mean_logprob
FROM scored GROUP BY doc_id
${ord("doc_id")}""".trim

  /** Twin of TextAnalysis.dsirWeights (target = lang 'en'): same
    * single-groupBy dual frequency model, same add-one smoothing over
    * the shared vocab, same ·10⁶ per-token quantization before the
    * exact integer per-doc sum. */
  val dsirWeights: String = s"""
WITH toks AS (
  SELECT doc_id, (lang = 'en') AS is_t,
    unnest(string_split_regex(trim(text), '\\s+')) AS tok
  FROM documents),
freqs AS (
  SELECT tok, CAST(COUNT(*) AS BIGINT) AS tf_raw,
    CAST(SUM(CASE WHEN is_t THEN 1 ELSE 0 END) AS BIGINT) AS tf_t
  FROM toks GROUP BY tok),
tot AS (
  SELECT CAST(SUM(tf_raw) AS BIGINT) AS tot_raw,
    CAST(SUM(tf_t) AS BIGINT) AS tot_t,
    CAST(COUNT(*) AS BIGINT) AS vocab
  FROM freqs),
scored AS (
  SELECT t.doc_id,
    CAST(round((ln(CAST(f.tf_t + 1 AS DOUBLE) /
        CAST(tot.tot_t + tot.vocab AS DOUBLE))
      - ln(CAST(f.tf_raw + 1 AS DOUBLE) /
        CAST(tot.tot_raw + tot.vocab AS DOUBLE))) * 1000000) AS BIGINT) AS q
  FROM toks t JOIN freqs f ON t.tok = f.tok, tot)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
  CAST(SUM(q) AS BIGINT) AS sum_q_logratio,
  CAST(SUM(q) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) / 1000000 AS mean_logratio
FROM scored GROUP BY doc_id
${ord("doc_id")}""".trim

  /** Twin of TextAnalysis.bigramLmQualityInterp(λ=0.75): MLE bigram
    * ratio interpolated with the unigram model of the NEXT token —
    * dyadic λ so 0.75/0.25 are the same IEEE doubles both engines. */
  val bigramLmInterp: String = s"""
WITH ws AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w FROM documents),
t AS (SELECT doc_id, unnest(generate_series(1, len(w))) AS i, w FROM ws),
bi AS (
  SELECT doc_id, w[CAST(i AS INT)] AS tok, w[CAST(i + 1 AS INT)] AS next
  FROM t WHERE i < len(w)),
bf AS (
  SELECT tok, next, CAST(COUNT(*) AS BIGINT) AS bf FROM bi GROUP BY tok, next),
cf AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS cf FROM bi GROUP BY tok),
uf AS (
  SELECT u, CAST(COUNT(*) AS BIGINT) AS uf FROM (
    SELECT unnest(string_split_regex(trim(text), '\\s+')) AS u FROM documents)
  GROUP BY u),
tot AS (SELECT CAST(SUM(uf) AS BIGINT) AS total FROM uf),
scored AS (
  SELECT b.doc_id,
    CAST(round(ln(
      0.75 * (CAST(f.bf AS DOUBLE) / CAST(c.cf AS DOUBLE))
      + 0.25 * (CAST(u.uf AS DOUBLE) / CAST(tot.total AS DOUBLE)))
      * 1000000) AS BIGINT) AS q
  FROM bi b
  JOIN bf f ON b.tok = f.tok AND b.next = f.next
  JOIN cf c ON b.tok = c.tok
  JOIN uf u ON b.next = u.u, tot)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
  CAST(SUM(q) AS BIGINT) AS sum_q_logprob,
  CAST(SUM(q) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) / 1000000 AS mean_logprob
FROM scored GROUP BY doc_id
${ord("doc_id")}""".trim

  /** Twin of TextAnalysis.signalCorrelation: the quality, repetition,
    * and unigram-LM chains joined per doc, signals quantized ·10⁶,
    * exact HUGEINT moment sums (≡ Spark's decimal(38) sums), and the
    * same fixed double Pearson combination over per-sum double casts. */
  val signalCorrelation: String = s"""
WITH t AS (
  SELECT doc_id,
    CAST(len(string_split_regex(trim(text), '\\s+')) AS DOUBLE) AS n_tok,
    CAST(len(list_distinct(string_split_regex(trim(text), '\\s+'))) AS DOUBLE) AS n_uniq,
    CAST(length(text) AS DOUBLE) AS n_chars
  FROM documents),
q AS (
  SELECT doc_id,
    round((n_uniq / n_tok) * 0.5
      + least(n_tok / 64.0, 1.0) * 0.3
      + (CASE WHEN ((n_chars - (n_tok - 1)) / n_tok) BETWEEN 3.0 AND 9.0
              THEN 1.0 ELSE 0.5 END) * 0.2, 6) AS quality
  FROM t),
ws AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w FROM documents),
shl AS (
  SELECT doc_id, list_transform(
    generate_series(1, greatest(len(w) - 2, 1)),
    i -> array_to_string(list_slice(w, i, i + 2), ' ')) AS sh
  FROM ws),
rep AS (
  SELECT doc_id,
    1.0 - CAST(len(list_distinct(sh)) AS DOUBLE) / CAST(len(sh) AS DOUBLE)
      AS repetition
  FROM shl),
toks AS (
  SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS tok
  FROM documents),
freqs AS (
  SELECT tok, CAST(COUNT(*) AS BIGINT) AS tf FROM toks GROUP BY tok),
tot AS (SELECT CAST(SUM(tf) AS BIGINT) AS total FROM freqs),
scoredlm AS (
  SELECT t2.doc_id,
    CAST(round(ln(CAST(f.tf AS DOUBLE) / CAST(tot.total AS DOUBLE))
      * 1000000) AS BIGINT) AS q
  FROM toks t2 JOIN freqs f ON t2.tok = f.tok, tot),
lmq AS (
  SELECT doc_id,
    CAST(SUM(q) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) / 1000000 AS mean_logprob
  FROM scoredlm GROUP BY doc_id),
j AS (
  SELECT CAST(round(q.quality * 1000000) AS BIGINT) AS qq,
    CAST(round(l.mean_logprob * 1000000) AS BIGINT) AS ql,
    CAST(round(r.repetition * 1000000) AS BIGINT) AS qr
  FROM q JOIN lmq l USING (doc_id) JOIN rep r USING (doc_id)),
agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
    SUM(qq) AS sxq, SUM(ql) AS syl, SUM(qr) AS sr,
    SUM(qq * qq) AS sxxq, SUM(ql * ql) AS syyl, SUM(qr * qr) AS srr,
    SUM(qq * ql) AS sql_, SUM(qq * qr) AS sqr_, SUM(ql * qr) AS slr_
  FROM j)
SELECT 'quality' AS signal_x, 'lm' AS signal_y, n AS n_docs,
  (CAST(n AS DOUBLE) * CAST(sql_ AS DOUBLE)
    - CAST(sxq AS DOUBLE) * CAST(syl AS DOUBLE))
  / (sqrt(CAST(n AS DOUBLE) * CAST(sxxq AS DOUBLE)
      - CAST(sxq AS DOUBLE) * CAST(sxq AS DOUBLE))
    * sqrt(CAST(n AS DOUBLE) * CAST(syyl AS DOUBLE)
      - CAST(syl AS DOUBLE) * CAST(syl AS DOUBLE))) AS pearson
FROM agg
UNION ALL
SELECT 'quality', 'repetition', n,
  (CAST(n AS DOUBLE) * CAST(sqr_ AS DOUBLE)
    - CAST(sxq AS DOUBLE) * CAST(sr AS DOUBLE))
  / (sqrt(CAST(n AS DOUBLE) * CAST(sxxq AS DOUBLE)
      - CAST(sxq AS DOUBLE) * CAST(sxq AS DOUBLE))
    * sqrt(CAST(n AS DOUBLE) * CAST(srr AS DOUBLE)
      - CAST(sr AS DOUBLE) * CAST(sr AS DOUBLE)))
FROM agg
UNION ALL
SELECT 'lm', 'repetition', n,
  (CAST(n AS DOUBLE) * CAST(slr_ AS DOUBLE)
    - CAST(syl AS DOUBLE) * CAST(sr AS DOUBLE))
  / (sqrt(CAST(n AS DOUBLE) * CAST(syyl AS DOUBLE)
      - CAST(syl AS DOUBLE) * CAST(syl AS DOUBLE))
    * sqrt(CAST(n AS DOUBLE) * CAST(srr AS DOUBLE)
      - CAST(sr AS DOUBLE) * CAST(sr AS DOUBLE)))
FROM agg
${ord("signal_x", "signal_y")}""".trim

  /** Twin of TextAnalysis.spanCorruption(spanLen=3, stride=20): same
    * Knuth offset, complete-span gate with an explicit negative guard
    * (DuckDB `//` truncates toward zero — a phantom span otherwise
    * appears exactly when no span fits), per-position CASE rebuilt in
    * doc order, ordered string_agg for both output sequences. */
  val spanCorruption: String = s"""
WITH ws AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w FROM documents),
b AS (
  SELECT doc_id, w, CAST(len(w) AS INT) AS n,
    CAST(((doc_id % 1000003) * 2654435761) % 20 AS INT) AS off
  FROM ws),
b2 AS (
  -- explicit no-fit guard: DuckDB's // TRUNCATES toward zero, so a
  -- negative remaining-length would round UP to a phantom span
  SELECT *, CAST(CASE WHEN n - off - 3 >= 0
    THEN (n - off - 3) // 20 + 1 ELSE 0 END AS INT) AS n_spans
  FROM b),
pos AS (
  SELECT doc_id, off, n_spans, w,
    CAST(unnest(generate_series(0, n - 1)) AS INT) AS i
  FROM b2),
ct AS (
  SELECT doc_id, i,
    CASE
      WHEN NOT (i >= off AND (i - off) % 20 < 3
        AND (i - off) // 20 < n_spans) THEN w[i + 1]
      WHEN (i - off) % 20 = 0
        THEN '<extra_id_' || CAST((i - off) // 20 AS VARCHAR) || '>'
      ELSE NULL END AS t
  FROM pos),
corr AS (
  SELECT doc_id, string_agg(t, ' ' ORDER BY i) AS corrupted
  FROM ct WHERE t IS NOT NULL GROUP BY doc_id),
sp AS (
  SELECT doc_id, off, w, CAST(unnest(generate_series(0, n_spans - 1)) AS INT) AS k
  FROM b2 WHERE n_spans > 0),
tg0 AS (
  SELECT doc_id, k,
    '<extra_id_' || CAST(k AS VARCHAR) || '>' || ' ' ||
      array_to_string(list_slice(w, off + k*20 + 1, off + k*20 + 3), ' ') AS seg
  FROM sp),
tg AS (
  SELECT doc_id, string_agg(seg, ' ' ORDER BY k) AS targets
  FROM tg0 GROUP BY doc_id)
SELECT b2.doc_id, b2.n AS n_tokens, b2.n_spans,
  COALESCE(corr.corrupted, '') AS corrupted,
  COALESCE(tg.targets, '') AS targets
FROM b2 LEFT JOIN corr USING (doc_id) LEFT JOIN tg USING (doc_id)
${ord("doc_id")}""".trim

  /** Twin of TextAnalysis.dsirSelect(lang='en', frac=0.5): the
    * dsirWeights chain + the exact median cutoff (quantile_cont ≡
    * Spark percentile) + the keep filter. */
  val dsirSelect: String = s"""
WITH toks AS (
  SELECT doc_id, (lang = 'en') AS is_t,
    unnest(string_split_regex(trim(text), '\\s+')) AS tok
  FROM documents),
freqs AS (
  SELECT tok, CAST(COUNT(*) AS BIGINT) AS tf_raw,
    CAST(SUM(CASE WHEN is_t THEN 1 ELSE 0 END) AS BIGINT) AS tf_t
  FROM toks GROUP BY tok),
tot AS (
  SELECT CAST(SUM(tf_raw) AS BIGINT) AS tot_raw,
    CAST(SUM(tf_t) AS BIGINT) AS tot_t,
    CAST(COUNT(*) AS BIGINT) AS vocab
  FROM freqs),
scored AS (
  SELECT t.doc_id,
    CAST(round((ln(CAST(f.tf_t + 1 AS DOUBLE) /
        CAST(tot.tot_t + tot.vocab AS DOUBLE))
      - ln(CAST(f.tf_raw + 1 AS DOUBLE) /
        CAST(tot.tot_raw + tot.vocab AS DOUBLE))) * 1000000) AS BIGINT) AS q
  FROM toks t JOIN freqs f ON t.tok = f.tok, tot),
w AS (
  SELECT doc_id,
    CAST(SUM(q) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) / 1000000 AS mean_logratio
  FROM scored GROUP BY doc_id),
c AS (SELECT quantile_cont(mean_logratio, 0.5) AS cut FROM w)
SELECT doc_id, mean_logratio FROM w, c WHERE mean_logratio >= cut
${ord("doc_id")}""".trim

  /** Twin of TextAnalysis.tokenizerFertility: same BPE-regex token
    * count as bpeTokenCount, per-language rollup, one division. */
  val tokenizerFertility: String = s"""
WITH t AS (
  SELECT lang,
    CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS ws,
    CAST(len(regexp_extract_all(text,
      '(''(?:[sdmt]|ll|ve|re))|( ?\\p{L}+)|( ?\\p{N}+)|( ?[^\\s\\p{L}\\p{N}]+)|(\\s+)'))
      AS BIGINT) AS bpe
  FROM documents)
SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(SUM(ws) AS BIGINT) AS n_ws_tokens,
  CAST(SUM(bpe) AS BIGINT) AS n_bpe_tokens,
  CAST(SUM(bpe) AS DOUBLE) / CAST(SUM(ws) AS DOUBLE) AS fertility
FROM t GROUP BY lang
${ord("lang")}""".trim

  /** Twin of TextAnalysis.contrastiveCrops(w=10): same Knuth-bucket
    * crop starts (second stream keyed on doc_id·31+7), inclusive
    * list_slice ≡ Spark slice(start, 10). */
  val contrastiveCrops: String = s"""
WITH ws AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w FROM documents),
t AS (SELECT doc_id, w, len(w) - 10 + 1 AS m FROM ws WHERE len(w) >= 10),
s AS (
  SELECT doc_id, w,
    CAST(((doc_id % 1000003) * 2654435761) % m + 1 AS INT) AS a_start,
    CAST((((doc_id * 31 + 7) % 1000003) * 2654435761) % m + 1 AS INT) AS b_start
  FROM t)
SELECT doc_id, a_start, b_start,
  array_to_string(list_slice(w, a_start, a_start + 9), ' ') AS span_a,
  array_to_string(list_slice(w, b_start, b_start + 9), ' ') AS span_b
FROM s
${ord("doc_id")}""".trim

  /** Twin of TextAnalysis.bigramLmQuality: bigram instances from
    * array adjacency (≡ Spark's per-doc lead window), MLE conditional
    * log-probs quantized before the per-doc sum. */
  val bigramLmQuality: String = s"""
WITH ws AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w FROM documents),
t AS (SELECT doc_id, unnest(generate_series(1, len(w))) AS i, w FROM ws),
bi AS (
  SELECT doc_id, w[CAST(i AS INT)] AS tok, w[CAST(i + 1 AS INT)] AS next
  FROM t WHERE i < len(w)),
bf AS (
  SELECT tok, next, CAST(COUNT(*) AS BIGINT) AS bf FROM bi GROUP BY tok, next),
cf AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS cf FROM bi GROUP BY tok),
scored AS (
  SELECT b.doc_id,
    CAST(round(ln(CAST(f.bf AS DOUBLE) / CAST(c.cf AS DOUBLE)) * 1000000)
      AS BIGINT) AS q
  FROM bi b
  JOIN bf f ON b.tok = f.tok AND b.next = f.next
  JOIN cf c ON b.tok = c.tok)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
  CAST(SUM(q) AS BIGINT) AS sum_q_logprob,
  CAST(SUM(q) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) / 1000000 AS mean_logprob
FROM scored GROUP BY doc_id
${ord("doc_id")}""".trim

  /** Twin of TextAnalysis.bigramLmQualityPruned(minCount=3): the
    * bigram model frequency-floored at 3, pruned occurrences backed
    * off to count 1 via LEFT JOIN + COALESCE. */
  val bigramLmPruned: String = s"""
WITH ws AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w FROM documents),
t AS (SELECT doc_id, unnest(generate_series(1, len(w))) AS i, w FROM ws),
bi AS (
  SELECT doc_id, w[CAST(i AS INT)] AS tok, w[CAST(i + 1 AS INT)] AS next
  FROM t WHERE i < len(w)),
bf AS (
  SELECT tok, next, CAST(COUNT(*) AS BIGINT) AS bf FROM bi
  GROUP BY tok, next HAVING COUNT(*) >= 3),
cf AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS cf FROM bi GROUP BY tok),
scored AS (
  SELECT b.doc_id,
    CAST(round(ln(CAST(COALESCE(f.bf, 1) AS DOUBLE) / CAST(c.cf AS DOUBLE))
      * 1000000) AS BIGINT) AS q
  FROM bi b
  LEFT JOIN bf f ON b.tok = f.tok AND b.next = f.next
  JOIN cf c ON b.tok = c.tok)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
  CAST(SUM(q) AS BIGINT) AS sum_q_logprob,
  CAST(SUM(q) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) / 1000000 AS mean_logprob
FROM scored GROUP BY doc_id
${ord("doc_id")}""".trim

  // ---- language ID / curation --------------------------------------

  /** Stopword-profile language ID. Spark's argmax is `greatest` over
    * (score, lang) structs — max score, ties to the LARGER lang string;
    * DuckDB lacks struct greatest, so the twin unions the four
    * per-language scores and ranks (score DESC, lang DESC). */
  private val langScores: String = {
    val stops = Map(
      "en" -> Seq("the", "and", "of", "to", "a", "in", "is", "it", "you", "that"),
      "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "es", "se", "no"),
      "de" -> Seq("der", "die", "und", "das", "ist", "du", "ich", "nicht", "ein", "mit"),
      "fr" -> Seq("le", "la", "de", "et", "un", "est", "que", "je", "ne", "pas"))
    stops.toSeq.sortBy(_._1).map { case (l, ws) =>
      val lst = ws.map(w => s"'$w'").mkString("[", ", ", "]")
      s"""SELECT doc_id, '$l' AS lang,
  CAST(len(list_intersect(string_split_regex(trim(lower(text)), '\\s+'), $lst)) AS DOUBLE) /
    CAST(len(string_split_regex(trim(lower(text)), '\\s+')) AS DOUBLE) AS score
FROM documents"""
    }.mkString("\nUNION ALL\n")
  }

  private val langIdCore: String = s"""
scored AS ($langScores),
best AS (
  SELECT doc_id, lang, score FROM (
    SELECT doc_id, lang, score,
      ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score DESC, lang DESC) AS rk
    FROM scored) WHERE rk = 1),
lang_pred_t AS (
  SELECT d.doc_id,
    CASE WHEN length(regexp_replace(d.text, '[^\\x{4e00}-\\x{9fff}]', '', 'g')) > 0
         THEN 'zh' ELSE b.lang END AS lang_pred,
    CASE WHEN length(regexp_replace(d.text, '[^\\x{4e00}-\\x{9fff}]', '', 'g')) > 0
         THEN 1.0 ELSE round(b.score, 6) END AS lang_conf
  FROM documents d JOIN best b USING (doc_id))"""

  val langId: String = s"""
WITH $langIdCore
SELECT doc_id, lang_pred, lang_conf FROM lang_pred_t
${ord("doc_id")}""".trim

  /** Composition twin of ext.Curation.curated (lang-ID ∘ quality ∘
    * exact-dedup keep list ∘ split assignment). */
  val curated: String = s"""
WITH $langIdCore,
q AS (
  SELECT doc_id,
    round((n_uniq / n_tok) * 0.5 + least(n_tok / 64.0, 1.0) * 0.3
      + (CASE WHEN ((n_chars - (n_tok - 1)) / n_tok) BETWEEN 3.0 AND 9.0
              THEN 1.0 ELSE 0.5 END) * 0.2, 6) AS quality
  FROM (
    SELECT doc_id,
      CAST(len(string_split_regex(trim(text), '\\s+')) AS DOUBLE) AS n_tok,
      CAST(len(list_distinct(string_split_regex(trim(text), '\\s+'))) AS DOUBLE) AS n_uniq,
      CAST(length(text) AS DOUBLE) AS n_chars
    FROM documents)),
keepers AS (
  SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY sha256(text))
SELECT l.doc_id, l.lang_pred, q.quality,
  CASE WHEN ((l.doc_id % 1000003) * 2654435761) % 100 < 80 THEN 'train'
       WHEN ((l.doc_id % 1000003) * 2654435761) % 100 < 90 THEN 'val'
       ELSE 'test' END AS split
FROM lang_pred_t l
JOIN q USING (doc_id)
JOIN keepers USING (doc_id)
WHERE l.lang_pred <> 'zh' AND q.quality >= 0.5
${ord("doc_id")}""".trim

  // ---- sampling / splitting ---------------------------------------

  /** Knuth multiplicative bucket — identical integer arithmetic to
    * graft.ext.Sampling.bucket. */
  private def bkt(m: Long): String = s"((doc_id % 1000003) * 2654435761) % $m"

  val trainTestSplit: String = s"""
SELECT doc_id,
  CASE WHEN ${bkt(100)} < 80 THEN 'train'
       WHEN ${bkt(100)} < 90 THEN 'val'
       ELSE 'test' END AS split
FROM documents
${ord("doc_id")}""".trim

  val stratifiedSample: String = s"""
SELECT doc_id, lang FROM documents
WHERE CAST(${bkt(10000)} AS DOUBLE) <
  CASE lang WHEN 'en' THEN 5000.0 WHEN 'de' THEN 2500.0
            WHEN 'fr' THEN 1000.0 ELSE 0.0 END
${ord("doc_id")}""".trim

  /** Twin of Sampling.mixtureSample(source, 5:3:2): same per-group
    * counts, same exact-integer n_out floor, same pure-int64 keep rule
    * — no floating point on either side. */
  val mixtureSample: String = s"""
WITH w AS (
  SELECT 'src0' AS source, 5 AS wt UNION ALL
  SELECT 'src1', 3 UNION ALL
  SELECT 'src2', 2),
counts AS (
  SELECT d.source, CAST(COUNT(*) AS BIGINT) AS n,
    CAST(COALESCE(MIN(w.wt), 0) AS BIGINT) AS wt
  FROM documents d LEFT JOIN w ON d.source = w.source
  GROUP BY d.source),
nout AS (SELECT MIN((n * 10) // wt) AS n_out FROM counts WHERE wt > 0)
SELECT d.doc_id, d.source
FROM documents d JOIN counts c ON d.source = c.source, nout
WHERE c.wt > 0
  AND ${bkt(10000)} * 10 * c.n < 10000 * c.wt * nout.n_out
${ord("doc_id")}""".trim

  /** Twin of Sampling.budgetMix(src0:6, src1:3, src2:1, budget 3000):
    * the waterfill unrolled to 3 rounds (fixpoint for 3 sources —
    * rounds past the last saturation recompute identical tentative
    * allocations), then the per-source Knuth-bucket-ordered inclusive
    * prefix-sum cut. All int64 (// is DuckDB integer floor-div). */
  val budgetMix: String = s"""
WITH tok AS (
  SELECT doc_id, source,
    CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS nt
  FROM documents WHERE source IN ('src0', 'src1', 'src2')),
sup AS (
  SELECT source, CAST(SUM(nt) AS BIGINT) AS s,
    CAST(CASE source WHEN 'src0' THEN 6 WHEN 'src1' THEN 3 ELSE 1 END
      AS BIGINT) AS wt
  FROM tok GROUP BY source),
a1 AS (SELECT SUM(wt) AS wsum FROM sup),
t1 AS (
  SELECT sup.*, ((3000 * wt) // a1.wsum >= s) AS sat
  FROM sup, a1),
g1 AS (
  SELECT COALESCE(SUM(CASE WHEN sat THEN s END), 0) AS taken,
    COALESCE(SUM(CASE WHEN NOT sat THEN wt END), 0) AS wsum FROM t1),
t2 AS (
  SELECT t1.source, t1.s, t1.wt,
    t1.sat AS sat1,
    (NOT t1.sat AND
      ((3000 - g1.taken) * t1.wt) // NULLIF(g1.wsum, 0) >= t1.s) AS sat
  FROM t1, g1),
g2 AS (
  SELECT COALESCE(SUM(CASE WHEN sat1 OR sat THEN s END), 0) AS taken,
    COALESCE(SUM(CASE WHEN NOT (sat1 OR sat) THEN wt END), 0) AS wsum FROM t2),
alloc AS (
  SELECT t2.source,
    CASE WHEN t2.sat1 OR t2.sat THEN t2.s
         ELSE ((3000 - g2.taken) * t2.wt) // NULLIF(g2.wsum, 0) END AS a
  FROM t2, g2),
ordered AS (
  SELECT doc_id, source, nt,
    SUM(nt) OVER (PARTITION BY source
      ORDER BY ${bkt(10000)} ASC, doc_id ASC
      ROWS UNBOUNDED PRECEDING) AS cum
  FROM tok)
SELECT o.doc_id, o.source, o.nt AS n_tokens
FROM ordered o JOIN alloc USING (source)
WHERE o.cum <= alloc.a
${ord("doc_id")}""".trim

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

  /** Twin of Multimodal.resizeSummary: recomputes the whole 8×8 box
    * filter (source box [x0,x1)×[y0,y1) per output cell, floor-mean,
    * boxes overlap when a source dim < 8) in SQL and checks the byte
    * sum of the resized payload — content-pinning, engine-portable. */
  val multimodalResize: String = s"""
WITH a AS (
  SELECT doc_id AS asset_id, text,
    CAST(strlen(text) AS BIGINT) AS len,
    ['png','jpeg','webp'][CAST(doc_id % 3 + 1 AS INT)] AS format,
    CAST(n_chars % 640 + 16 AS BIGINT) AS w
  FROM documents),
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
  FROM pix WHERE i < len GROUP BY asset_id, ox, oy),
sums AS (SELECT asset_id, CAST(SUM(cv) AS BIGINT) AS luma_sum FROM cellv GROUP BY asset_id)
SELECT a.asset_id, a.format, CAST(8 AS INT) AS width, CAST(8 AS INT) AS height,
  CAST(64 AS INT) AS n_bytes, CAST(COALESCE(s.luma_sum, 0) AS BIGINT) AS luma_sum
FROM a LEFT JOIN sums s USING (asset_id)
${ord("asset_id")}""".trim

  /** Bucketed GPT-style shard packing: shard = exclusive prefix sum of
    * tokens within the id-mod bucket, integer-divided by the budget. */
  val packShards: String = s"""
WITH t AS (
  SELECT doc_id,
    CAST(len(string_split_regex(trim(text), '\\s+')) AS INT) AS n_tokens,
    doc_id % 8 AS pack_bucket
  FROM documents)
SELECT doc_id, n_tokens, pack_bucket,
  CAST((SUM(n_tokens) OVER (PARTITION BY pack_bucket ORDER BY doc_id
          ROWS UNBOUNDED PRECEDING) - n_tokens) // 2048 AS BIGINT)
    AS shard_in_bucket
FROM t
${ord("doc_id")}""".trim

  /** Twin of Sampling.packingReport over the pack_shards assignment:
    * per-shard fills, 1-row report with quantile_cont quartiles. */
  val packingReport: String = s"""
WITH t AS (
  SELECT doc_id,
    CAST(len(string_split_regex(trim(text), '\\s+')) AS INT) AS n_tokens,
    doc_id % 8 AS pack_bucket
  FROM documents),
shards AS (
  SELECT doc_id, n_tokens, pack_bucket,
    CAST((SUM(n_tokens) OVER (PARTITION BY pack_bucket ORDER BY doc_id
            ROWS UNBOUNDED PRECEDING) - n_tokens) // 2048 AS BIGINT)
      AS shard_in_bucket
  FROM t),
fills AS (
  SELECT pack_bucket, shard_in_bucket,
    CAST(SUM(n_tokens) AS BIGINT) AS fill
  FROM shards GROUP BY pack_bucket, shard_in_bucket),
rep AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_shards,
    CAST(SUM(fill) AS BIGINT) AS total_tokens,
    CAST(SUM(fill) AS DOUBLE) / (CAST(COUNT(*) AS DOUBLE) * 2048) AS mean_fill,
    quantile_cont(CAST(fill AS DOUBLE) / 2048, 0.25) AS p25_fill,
    quantile_cont(CAST(fill AS DOUBLE) / 2048, 0.5) AS p50_fill,
    quantile_cont(CAST(fill AS DOUBLE) / 2048, 0.75) AS p75_fill
  FROM fills)
SELECT n_shards, total_tokens, mean_fill, p25_fill, p50_fill, p75_fill,
  1.0 - mean_fill AS waste_frac
FROM rep""".trim

  /** Overlapping 32-token windows advancing by 24 (overlap 8);
    * list_slice clamps the tail, short docs are one chunk. */
  val chunkDocs: String = s"""
WITH ws AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w FROM documents),
n AS (
  SELECT doc_id, w,
    greatest(1, CAST(ceil((len(w) - 8) / 24.0) AS BIGINT)) AS nch
  FROM ws),
x AS (
  SELECT doc_id, w, unnest(generate_series(1, nch)) AS k FROM n)
SELECT doc_id, CAST(k - 1 AS INT) AS chunk_no,
  array_to_string(list_slice(w, (k-1)*24 + 1, (k-1)*24 + 32), ' ') AS chunk_text,
  CAST(least(32, len(w) - (k-1)*24) AS INT) AS n_chunk_tokens
FROM x
${ord("doc_id", "chunk_no")}""".trim

  /** Contamination check: fraction of each doc's 8-token shingles that
    * appear in the doc_id%97 benchmark subset's shingle set. */
  val decontaminate: String = s"""
WITH ws AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w FROM documents),
shl AS (
  -- slice-based shingles: clamped at the end, so a doc with fewer than
  -- 8 tokens yields ONE shingle of the available tokens — byte-for-byte
  -- the engine's concat_ws/HashedShingles boundary semantics
  SELECT doc_id, list_distinct(list_transform(
    generate_series(1, greatest(len(w) - 7, 1)),
    i -> array_to_string(list_slice(w, i, i + 7), ' '))) AS sh
  FROM ws),
bench AS (
  SELECT DISTINCT unnest(sh) AS s FROM shl WHERE doc_id % 97 = 0),
sized AS (
  SELECT doc_id, len(sh) AS n_sh, unnest(sh) AS s FROM shl)
SELECT sized.doc_id, CAST(MIN(sized.n_sh) AS INT) AS n_sh,
  CAST(COUNT(*) AS BIGINT) AS n_contaminated,
  CAST(COUNT(*) AS DOUBLE) / CAST(MIN(sized.n_sh) AS DOUBLE) AS contamination
FROM sized JOIN bench ON sized.s = bench.s
GROUP BY sized.doc_id
${ord("doc_id", "n_sh", "n_contaminated", "contamination")}""".trim

  /** Twin of Dedup.spanDupScore: doc-frequency over the same
    * clamped w=8 distinct shingles (computed on shingle STRINGS — the
    * engine counts 64-bit shingle hashes, and counts agree as long as
    * hashing is collision-free on the corpus, which the hash-match
    * itself verifies). */
  val spanDupScore: String = s"""
WITH ws AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w FROM documents),
shl AS (
  SELECT doc_id, list_distinct(list_transform(
    generate_series(1, greatest(len(w) - 7, 1)),
    i -> array_to_string(list_slice(w, i, i + 7), ' '))) AS sh
  FROM ws),
sized AS (
  SELECT doc_id, len(sh) AS n_sh, unnest(sh) AS s FROM shl),
dfreq AS (
  SELECT s, CAST(COUNT(*) AS BIGINT) AS df FROM sized GROUP BY s)
SELECT sized.doc_id, CAST(MIN(sized.n_sh) AS INT) AS n_sh,
  CAST(SUM(CASE WHEN dfreq.df > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared,
  CAST(SUM(CASE WHEN dfreq.df > 1 THEN 1 ELSE 0 END) AS DOUBLE) /
    CAST(MIN(sized.n_sh) AS DOUBLE) AS span_dup
FROM sized JOIN dfreq ON sized.s = dfreq.s
GROUP BY sized.doc_id
${ord("doc_id")}""".trim

  /** Twin of Dedup.noveltyScore: first-occurrence (min doc_id) per
    * distinct clamped w=8 shingle, per-doc novel fraction. */
  val noveltyScore: String = s"""
WITH ws AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w FROM documents),
shl AS (
  SELECT doc_id, list_distinct(list_transform(
    generate_series(1, greatest(len(w) - 7, 1)),
    i -> array_to_string(list_slice(w, i, i + 7), ' '))) AS sh
  FROM ws),
sized AS (
  SELECT doc_id, len(sh) AS n_sh, unnest(sh) AS s FROM shl),
firsts AS (
  SELECT s, MIN(doc_id) AS first_doc FROM sized GROUP BY s)
SELECT sized.doc_id, CAST(MIN(sized.n_sh) AS INT) AS n_sh,
  CAST(SUM(CASE WHEN firsts.first_doc = sized.doc_id THEN 1 ELSE 0 END)
    AS BIGINT) AS n_novel,
  CAST(SUM(CASE WHEN firsts.first_doc = sized.doc_id THEN 1 ELSE 0 END)
    AS DOUBLE) / CAST(MIN(sized.n_sh) AS DOUBLE) AS novelty
FROM sized JOIN firsts ON sized.s = firsts.s
GROUP BY sized.doc_id
${ord("doc_id")}""".trim

  /** Twin of Dedup.substringDedup (w=8): same per-start window
    * strings (grouped by text — the engine groups by xxhash64, same
    * classes), first-occurrence rule via a window, same w-token
    * sliding coverage, position-ordered rebuild. */
  val substringDedup: String = s"""
WITH ws AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w FROM documents),
st AS (
  SELECT doc_id, unnest(generate_series(0, greatest(len(w) - 8, 0))) AS p, w
  FROM ws),
sh AS (
  SELECT doc_id, CAST(p AS INT) AS pos,
    array_to_string(list_slice(w, CAST(p AS INT) + 1, CAST(p AS INT) + 8), ' ') AS s
  FROM st),
marked AS (
  SELECT doc_id, pos,
    (COUNT(*) OVER (PARTITION BY s) > 1 AND
     ROW_NUMBER() OVER (PARTITION BY s ORDER BY doc_id, pos) > 1) AS dup
  FROM sh),
tok AS (SELECT doc_id, unnest(generate_series(1, len(w))) AS i, w FROM ws),
tok2 AS (
  SELECT doc_id, CAST(i - 1 AS INT) AS pos, w[CAST(i AS INT)] AS tok FROM tok),
fl AS (
  SELECT t.doc_id, t.pos, t.tok, COALESCE(m.d, 0) AS dupf
  FROM tok2 t LEFT JOIN
    (SELECT doc_id, pos, 1 AS d FROM marked WHERE dup) m
    ON t.doc_id = m.doc_id AND t.pos = m.pos),
cov AS (
  SELECT doc_id, pos, tok,
    MAX(dupf) OVER (PARTITION BY doc_id ORDER BY pos
      ROWS BETWEEN 7 PRECEDING AND CURRENT ROW) AS cov
  FROM fl)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
  CAST(SUM(CASE WHEN cov = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_tokens_kept,
  COALESCE(string_agg(CASE WHEN cov = 0 THEN tok END, ' ' ORDER BY pos), '')
    AS text_dedup
FROM cov GROUP BY doc_id
${ord("doc_id")}""".trim

  /** Connected components over the portable-MinHash pair graph via a
    * recursive closure (UNION-distinct fixpoint terminates on cycles);
    * cluster label = min reachable doc_id. Round 6: the cluster gate
    * consumer rides the sketch tier (see minhashKeyedChain's rationale);
    * the unused `keyed` CTE is harmless. */
  val dedupClusters: String = s"""$minhashKeyedChain
SELECT id AS doc_id, MIN(r) AS cluster_id,
  (id = MIN(r)) AS is_keeper
FROM mh_reach GROUP BY id
${ord("doc_id")}""".trim

  /** Composition twin of Curation.pretrainingCorpus — every curation
    * tier in one statement: the portable-MinHash closure/split chain of
    * leakageSafeSplit (round 6: the split feeder rides the sketch tier,
    * like the gate's other split/fold/cluster consumers) + langIdCore +
    * lexical quality + quantized corpus-LM score + repetition +
    * sha-dedup keepers + the SemDeDup loser closure over embeddings
    * (CTE names s-/lm_-prefixed to avoid collisions). Docs without an
    * embedding row pass the semantic filter (NOT IN over vec-id
    * losers). */
  val pretrainingCorpus: String = s"""$minhashKeyedChain,
$langIdCore,
q AS (
  SELECT doc_id,
    round((n_uniq / n_tok) * 0.5 + least(n_tok / 64.0, 1.0) * 0.3
      + (CASE WHEN ((n_chars - (n_tok - 1)) / n_tok) BETWEEN 3.0 AND 9.0
              THEN 1.0 ELSE 0.5 END) * 0.2, 6) AS quality
  FROM (
    SELECT doc_id,
      CAST(len(string_split_regex(trim(text), '\\s+')) AS DOUBLE) AS n_tok,
      CAST(len(list_distinct(string_split_regex(trim(text), '\\s+'))) AS DOUBLE) AS n_uniq,
      CAST(length(text) AS DOUBLE) AS n_chars
    FROM documents)),
lm_toks AS (
  SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS tok FROM documents),
lm_freqs AS (
  SELECT tok, CAST(COUNT(*) AS BIGINT) AS tf FROM lm_toks GROUP BY tok),
lm_tot AS (SELECT CAST(SUM(tf) AS BIGINT) AS total FROM lm_freqs),
lm_scored AS (
  SELECT t.doc_id,
    CAST(round(ln(CAST(f.tf AS DOUBLE) / CAST(lm_tot.total AS DOUBLE)) * 1000000) AS BIGINT) AS lq
  FROM lm_toks t JOIN lm_freqs f ON t.tok = f.tok, lm_tot),
lm AS (
  SELECT doc_id, CAST(SUM(lq) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) / 1000000 AS mean_logprob
  FROM lm_scored GROUP BY doc_id),
rep AS (
  SELECT doc_id,
    1.0 - CAST(len(list_distinct(sh)) AS DOUBLE) / CAST(len(sh) AS DOUBLE) AS repetition
  FROM (
    SELECT doc_id, list_transform(
      generate_series(1, greatest(len(string_split_regex(trim(text), '\\s+')) - 2, 1)),
      i -> array_to_string(list_slice(string_split_regex(trim(text), '\\s+'), i, i + 2), ' ')) AS sh
    FROM documents)),
keepers AS (
  SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY sha256(text)),
se AS (SELECT vec_id, list_transform(embedding, x -> round(CAST(x AS DOUBLE)*1000)) AS sq FROM embeddings),
scents AS (SELECT vec_id AS cent_id, sq AS cq FROM se WHERE vec_id % 50 = 0),
scos AS (
  SELECT se.vec_id, se.sq, c.cent_id,
    list_dot_product(se.sq, c.cq) /
      (sqrt(list_dot_product(se.sq, se.sq)) * sqrt(list_dot_product(c.cq, c.cq))) AS cs
  FROM se, scents c),
sassign AS (
  SELECT vec_id, cent_id AS cell, sq FROM (
    SELECT vec_id, cent_id, sq,
      ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cs DESC, cent_id ASC) AS rk
    FROM scos) WHERE rk = 1),
spairs AS (
  SELECT a.vec_id AS a_id, b.vec_id AS b_id
  FROM sassign a JOIN sassign b ON a.cell = b.cell AND a.vec_id < b.vec_id
  WHERE list_dot_product(a.sq, b.sq) /
      (sqrt(list_dot_product(a.sq, a.sq)) * sqrt(list_dot_product(b.sq, b.sq))) >= 0.4),
sedges AS (
  SELECT a_id AS id, b_id AS nbr FROM spairs
  UNION SELECT b_id, a_id FROM spairs),
sreach(id, r) AS (
  SELECT DISTINCT id, id FROM sedges
  UNION
  SELECT e2.id, sreach.r FROM sedges e2 JOIN sreach ON e2.nbr = sreach.id),
slosers AS (
  SELECT id FROM sreach GROUP BY id HAVING id <> MIN(r))
SELECT d.doc_id, l.lang_pred, q.quality, lm.mean_logprob, rep.repetition,
  CASE WHEN ((keyed.k % 1000003) * 2654435761) % 100 < 80 THEN 'train'
       WHEN ((keyed.k % 1000003) * 2654435761) % 100 < 90 THEN 'val'
       ELSE 'test' END AS split
FROM documents d
JOIN lang_pred_t l USING (doc_id)
JOIN q USING (doc_id)
JOIN lm USING (doc_id)
JOIN rep USING (doc_id)
JOIN keyed USING (doc_id)
WHERE d.doc_id IN (SELECT doc_id FROM keepers)
  AND d.doc_id NOT IN (SELECT id FROM slosers)
  AND q.quality >= 0.5 AND lm.mean_logprob >= -4.0 AND rep.repetition <= 0.5
${ord("doc_id")}""".trim

  /** Twin of Sampling.leakageSafeSplit over minhashLshPairsPortable:
    * same recursive-closure clusters as dedupClusters, split bucket
    * hashed on COALESCE(cluster_id, doc_id) so whole clusters split
    * atomically. */
  val leakageSafeSplit: String = s"""$minhashKeyedChain
SELECT doc_id,
  CASE WHEN ((k % 1000003) * 2654435761) % 100 < 80 THEN 'train'
       WHEN ((k % 1000003) * 2654435761) % 100 < 90 THEN 'val'
       ELSE 'test' END AS split
FROM keyed
${ord("doc_id")}""".trim

  /** Twin of Sampling.splitLeakageAudit over assignSplit + the
    * MinHash-portable pair tier: per unordered split combination, the
    * near-dup pair count and the leak flag. */
  val splitLeakageAudit: String = s"""$minhashAgreeChain,
lp AS (SELECT a_id, b_id FROM agree WHERE CAST(n_agree AS DOUBLE) / 32 >= 0.5),
sp AS (
  SELECT doc_id,
    CASE WHEN ((doc_id % 1000003) * 2654435761) % 100 < 80 THEN 'train'
         WHEN ((doc_id % 1000003) * 2654435761) % 100 < 90 THEN 'val'
         ELSE 'test' END AS split
  FROM documents),
j AS (
  SELECT least(sa.split, sb.split) AS split_x,
    greatest(sa.split, sb.split) AS split_y
  FROM lp
  JOIN sp sa ON sa.doc_id = lp.a_id
  JOIN sp sb ON sb.doc_id = lp.b_id)
SELECT split_x, split_y, CAST(COUNT(*) AS BIGINT) AS n_pairs,
  split_x <> split_y AS leaky
FROM j GROUP BY split_x, split_y
${ord("split_x", "split_y")}""".trim

  /** Same audit over the cluster-keyed safe split: every pair lands
    * same-split by construction, so no row may have leaky = true. */
  val splitLeakageAuditSafe: String = s"""$minhashKeyedChain,
sp AS (
  SELECT doc_id,
    CASE WHEN ((k % 1000003) * 2654435761) % 100 < 80 THEN 'train'
         WHEN ((k % 1000003) * 2654435761) % 100 < 90 THEN 'val'
         ELSE 'test' END AS split
  FROM keyed),
j AS (
  SELECT least(sa.split, sb.split) AS split_x,
    greatest(sa.split, sb.split) AS split_y
  FROM mh_pairs lp
  JOIN sp sa ON sa.doc_id = lp.a_id
  JOIN sp sb ON sb.doc_id = lp.b_id)
SELECT split_x, split_y, CAST(COUNT(*) AS BIGINT) AS n_pairs,
  split_x <> split_y AS leaky
FROM j GROUP BY split_x, split_y
${ord("split_x", "split_y")}""".trim

  /** Twin of Sampling.leakageSafeKfold (k=5): the leakageSafeSplit
    * closure/keying chain with the fold bucket as the final select. */
  val kfoldSplit: String = s"""$minhashKeyedChain
SELECT doc_id,
  CAST(((k % 1000003) * 2654435761) % 5 AS INT) AS fold
FROM keyed
${ord("doc_id")}""".trim

  /** Twin of TextAnalysis.c4Clean over the same derived corpus the
    * gate entry builds (10-token lines, (doc_id+i)%4 punctuation rule,
    * injected javascript/lorem lines): same line predicates, same
    * page-level drops. */
  val c4Clean: String = s"""
WITH w AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w FROM documents),
ml AS (
  SELECT doc_id,
    array_to_string(list_transform(
      generate_series(1, greatest(CAST(ceil(len(w)/10.0) AS INT), 1)),
      i -> array_to_string(list_slice(w, (i-1)*10+1, (i-1)*10+10), ' ') ||
           CASE WHEN (doc_id + i) % 4 = 0 THEN '' ELSE '.' END),
      chr(10))
    || CASE WHEN doc_id % 89 = 0
         THEN chr(10) || 'please enable javascript to view this page.'
         ELSE '' END
    || CASE WHEN doc_id % 97 = 0
         THEN chr(10) || 'lorem ipsum dolor sit amet consectetur adipiscing elit.'
         ELSE '' END AS text
  FROM w),
l AS (SELECT doc_id, text, string_split(text, chr(10)) AS lines FROM ml),
k AS (
  SELECT doc_id, text, CAST(len(lines) AS INT) AS n_lines,
    list_filter(lines, l -> regexp_matches(trim(l), '[.!?"'']$$')
      AND len(string_split_regex(trim(l), '\\s+')) >= 5
      AND NOT contains(lower(l), 'javascript')
      AND NOT contains(l, '{') AND NOT contains(l, '}')) AS kept
  FROM l)
SELECT doc_id, n_lines, CAST(len(kept) AS INT) AS n_lines_kept,
  array_to_string(kept, chr(10)) AS text_clean
FROM k
WHERE NOT contains(lower(text), 'lorem ipsum') AND len(kept) >= 3
${ord("doc_id")}""".trim

  /** Twin of Dedup.lineDedup over the derived 10-token-line corpus:
    * same line derivation, first occurrence by (doc_id, ord) via a
    * window (Spark's min(struct) argmin — same classes, grouping by
    * the line string instead of its sha256), ordered reassembly. */
  val lineDedup: String = s"""
WITH w AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w FROM documents),
ml AS (
  SELECT doc_id,
    array_to_string(list_transform(
      generate_series(1, greatest(CAST(ceil(len(w)/10.0) AS INT), 1)),
      i -> array_to_string(list_slice(w, (i-1)*10+1, (i-1)*10+10), ' ')),
      chr(10)) AS text
  FROM w),
l AS (SELECT doc_id, string_split(text, chr(10)) AS ls FROM ml),
ex AS (SELECT doc_id, unnest(generate_series(1, len(ls))) AS i, ls FROM l),
lines AS (
  SELECT doc_id, CAST(i - 1 AS INT) AS ord, ls[CAST(i AS INT)] AS line FROM ex),
marked AS (
  SELECT doc_id, ord, line,
    ROW_NUMBER() OVER (PARTITION BY line ORDER BY doc_id, ord) AS rn
  FROM lines)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_lines,
  CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_lines_kept,
  COALESCE(string_agg(CASE WHEN rn = 1 THEN line END, chr(10) ORDER BY ord), '')
    AS text_dedup
FROM marked GROUP BY doc_id
${ord("doc_id")}""".trim

  /** Twin of Dedup.boilerplateStrip(maxDocFrac=0.003) over the derived
    * 10-token-line corpus: document frequency counts distinct docs per
    * line (grouping by the line string — Spark groups by its sha256,
    * identical modulo collisions as in lineDedup), keep rule one IEEE
    * multiply + compare. */
  val boilerplateStrip: String = s"""
WITH w AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w FROM documents),
ml AS (
  SELECT doc_id,
    array_to_string(list_transform(
      generate_series(1, greatest(CAST(ceil(len(w)/10.0) AS INT), 1)),
      i -> array_to_string(list_slice(w, (i-1)*10+1, (i-1)*10+10), ' ')),
      chr(10)) AS text
  FROM w),
l AS (SELECT doc_id, string_split(text, chr(10)) AS ls FROM ml),
ex AS (SELECT doc_id, unnest(generate_series(1, len(ls))) AS i, ls FROM l),
lines AS (
  SELECT doc_id, CAST(i - 1 AS INT) AS ord, ls[CAST(i AS INT)] AS line FROM ex),
nd AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_total FROM documents),
df AS (
  SELECT line, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
  FROM lines GROUP BY line),
marked AS (
  SELECT x.doc_id, x.ord, x.line,
    (CAST(f.df AS DOUBLE) <= 0.003 * nd.n_total) AS kept
  FROM lines x JOIN df f ON x.line = f.line CROSS JOIN nd)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_lines,
  CAST(SUM(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_lines_kept,
  COALESCE(string_agg(CASE WHEN kept THEN line END, chr(10) ORDER BY ord), '')
    AS text_clean
FROM marked GROUP BY doc_id
${ord("doc_id")}""".trim

  /** Twin of Dedup.dedupCorpus: documents minus the recursive-closure
    * clusters' non-canonical members (same CTEs as dedupClusters). */
  val dedupCorpus: String = s"""
WITH RECURSIVE
ws AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w FROM documents),
shl AS (
  SELECT doc_id, list_distinct(list_transform(
    generate_series(1, greatest(len(w) - 2, 1)),
    i -> array_to_string(list_slice(w, i, i + 2), ' '))) AS sh
  FROM ws),
sized AS (
  SELECT doc_id, len(sh) AS n_sh, unnest(sh) AS s FROM shl),
pairs0 AS (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id,
    COUNT(*) AS inter, MIN(a.n_sh) AS a_n, MIN(b.n_sh) AS b_n
  FROM sized a JOIN sized b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id),
pairs AS (
  SELECT a_id, b_id FROM pairs0
  WHERE CAST(inter AS DOUBLE) / CAST(a_n + b_n - inter AS DOUBLE) >= 0.5),
edges AS (
  SELECT a_id AS id, b_id AS nbr FROM pairs
  UNION SELECT b_id, a_id FROM pairs),
reach(id, r) AS (
  SELECT DISTINCT id, id FROM edges
  UNION
  SELECT e.id, reach.r FROM edges e JOIN reach ON e.nbr = reach.id),
losers AS (
  SELECT id AS doc_id FROM reach GROUP BY id HAVING id <> MIN(r))
SELECT d.doc_id, d.lang, d.source
FROM documents d LEFT JOIN losers l USING (doc_id)
WHERE l.doc_id IS NULL
${ord("doc_id")}""".trim

  /** Twin of Sampling.packSequences over packShards(budget=2048,
    * nBuckets=8): same bucket/exclusive-prefix-sum/shard arithmetic,
    * members concatenated with string_agg in doc_id order. */
  val packSequences: String = s"""
WITH t AS (
  SELECT doc_id, text,
    CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_tokens
  FROM documents),
c AS (
  SELECT doc_id, text, n_tokens, doc_id % 8 AS pack_bucket,
    SUM(n_tokens) OVER (PARTITION BY doc_id % 8 ORDER BY doc_id
      ROWS UNBOUNDED PRECEDING) - n_tokens AS cum
  FROM t),
s AS (
  SELECT doc_id, text, n_tokens, pack_bucket,
    CAST(floor(cum / 2048) AS BIGINT) AS shard_in_bucket
  FROM c)
SELECT pack_bucket, shard_in_bucket,
  CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
  string_agg(text, ' ' ORDER BY doc_id) AS sequence
FROM s GROUP BY pack_bucket, shard_in_bucket
${ord("pack_bucket", "shard_in_bucket")}""".trim

  // ---- dedup -------------------------------------------------------

  val dedupExact: String = s"""
SELECT sha256(text) AS text_sha,
  MIN(doc_id) AS keep_id,
  CAST(COUNT(*) AS BIGINT) AS n_copies
FROM documents
GROUP BY text_sha
${ord("text_sha")}""".trim

  /** Twin of Dedup.containmentPairs(w=3, 0.8): the jaccard twin's
    * shingle join with asymmetric normalization both directions. */
  val containmentPairs: String = s"""
WITH ws AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w FROM documents),
shl AS (
  SELECT doc_id, list_distinct(list_transform(
    generate_series(1, greatest(len(w) - 2, 1)),
    i -> array_to_string(list_slice(w, i, i + 2), ' '))) AS sh
  FROM ws),
sized AS (
  SELECT doc_id, len(sh) AS n_sh, unnest(sh) AS s FROM shl),
pairs AS (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id,
    COUNT(*) AS inter, MIN(a.n_sh) AS a_n, MIN(b.n_sh) AS b_n
  FROM sized a JOIN sized b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id)
SELECT a_id, b_id,
  CAST(inter AS DOUBLE) / CAST(a_n AS DOUBLE) AS containment_a_in_b,
  CAST(inter AS DOUBLE) / CAST(b_n AS DOUBLE) AS containment_b_in_a
FROM pairs
WHERE GREATEST(CAST(inter AS DOUBLE) / CAST(a_n AS DOUBLE),
  CAST(inter AS DOUBLE) / CAST(b_n AS DOUBLE)) >= 0.8
${ord("a_id", "b_id")}""".trim

  val ngramJaccard: String = s"""
WITH ws AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w FROM documents),
shl AS (
  SELECT doc_id, list_distinct(list_transform(
    generate_series(1, greatest(len(w) - 2, 1)),
    i -> array_to_string(list_slice(w, i, i + 2), ' '))) AS sh
  FROM ws),
sized AS (
  SELECT doc_id, len(sh) AS n_sh, unnest(sh) AS s FROM shl),
pairs AS (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id,
    COUNT(*) AS inter, MIN(a.n_sh) AS a_n, MIN(b.n_sh) AS b_n
  FROM sized a JOIN sized b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id)
SELECT a_id, b_id,
  CAST(inter AS DOUBLE) / CAST(a_n + b_n - inter AS DOUBLE) AS jaccard
FROM pairs
WHERE CAST(inter AS DOUBLE) / CAST(a_n + b_n - inter AS DOUBLE) >= 0.5
${ord("a_id", "b_id")}""".trim

  /** Twin of TextAnalysis.featureHashVectors: the char-level Lehmer
    * polynomial hash rebuilt from a 31^k power table (closed form of
    * the engine's iterative mod — k bounded at 64, far above the
    * fixture's 8-char max token; an oracle limitation only), same
    * bucket histogram, dense assembly via a dims cross join. */
  val featureHashVectors: String = s"""
WITH RECURSIVE pw(k, v) AS (
  SELECT 0, CAST(1 AS BIGINT)
  UNION ALL SELECT k + 1, (v * 31) % 2147483647 FROM pw WHERE k < 64),
pl AS (SELECT list(v ORDER BY k) AS pl FROM pw),
toks AS (
  SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS tok
  FROM documents),
hashed AS (
  SELECT doc_id,
    CASE WHEN length(tok) = 0 THEN 7 ELSE
      ((7 * pl.pl[length(tok) + 1]) % 2147483647 +
       COALESCE(list_sum(list_transform(generate_series(1, length(tok)),
         i -> (ord(tok[i]) * pl.pl[length(tok) - i + 1]) % 2147483647)), 0))
      % 2147483647 END AS h
  FROM toks, pl),
agg AS (
  SELECT doc_id, h % 64 AS b, CAST(COUNT(*) AS BIGINT) AS c
  FROM hashed GROUP BY doc_id, h % 64),
docsn AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens FROM agg GROUP BY doc_id),
dims AS (SELECT unnest(generate_series(0, 63)) AS b),
dense AS (
  SELECT d.doc_id, d.n_tokens, dm.b, COALESCE(a.c, 0) AS c
  FROM docsn d CROSS JOIN dims dm
  LEFT JOIN agg a ON a.doc_id = d.doc_id AND a.b = dm.b)
SELECT doc_id, MIN(n_tokens) AS n_tokens,
  array_to_string(list(c ORDER BY b), ',') AS features_str
FROM dense GROUP BY doc_id
${ord("doc_id")}""".trim

  /** Twin of TextAnalysis.classifierScore(dim=512, threshold=0) with
    * the gate's synthetic dense weight table ((b·48271 + 7) mod 2001 −
    * 1000): unigram + chr(1)-joined adjacent-bigram features, the same
    * Lehmer char hash as featureHashVectors (power-table closed form),
    * exact integer weight sum, one double division for the margin. */
  val classifierScore: String = s"""
WITH RECURSIVE pw(k, v) AS (
  SELECT 0, CAST(1 AS BIGINT)
  UNION ALL SELECT k + 1, (v * 31) % 2147483647 FROM pw WHERE k < 64),
pl AS (SELECT list(v ORDER BY k) AS pl FROM pw),
wt AS (SELECT b AS bucket, (b * 48271 + 7) % 2001 - 1000 AS w
       FROM (SELECT unnest(generate_series(0, 511)) AS b)),
tk AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS ws FROM documents),
fs AS (SELECT doc_id, list_concat(ws, list_transform(
         generate_series(1, len(ws) - 1), i -> ws[i] || chr(1) || ws[i + 1])) AS feats
       FROM tk),
un AS (SELECT doc_id, unnest(feats) AS tok FROM fs),
hashed AS (
  SELECT doc_id,
    (CASE WHEN length(tok) = 0 THEN 7 ELSE
      ((7 * pl.pl[length(tok) + 1]) % 2147483647 +
       COALESCE(list_sum(list_transform(generate_series(1, length(tok)),
         i -> (ord(tok[i]) * pl.pl[length(tok) - i + 1]) % 2147483647)), 0))
      % 2147483647 END) % 512 AS b
  FROM un, pl),
sc AS (
  SELECT doc_id, CAST(COUNT(*) AS INT) AS n_feats, SUM(w.w) AS s
  FROM hashed h JOIN wt w ON h.b = w.bucket GROUP BY doc_id)
SELECT doc_id, n_feats,
  CAST(s AS DOUBLE) / CAST(n_feats AS DOUBLE) AS margin,
  (CAST(s AS DOUBLE) / CAST(n_feats AS DOUBLE)) >= 0.0 AS keep
FROM sc
${ord("doc_id")}""".trim

  /** Twin of Curation.curationFunnel: the same five-stage chain —
    * shape-quality rules, exact dedup (min id per sha256), greedy
    * first-wins near dedup (distinct b_id of ≥0.5 Jaccard pairs),
    * w=8 decontamination vs the doc_id%97 benchmark slice. */
  val curationFunnel: String = s"""
WITH sig AS (
  SELECT doc_id, text, string_split_regex(trim(text), '\\s+') AS w
  FROM documents),
q AS (
  SELECT doc_id FROM sig
  WHERE len(w) BETWEEN 20 AND 100000
    AND (CAST(length(array_to_string(w, '')) AS DOUBLE) /
         CAST(len(w) AS DOUBLE)) BETWEEN 3.0 AND 10.0
    AND (CAST(len(regexp_extract_all(text, '#|\\.\\.\\.')) AS DOUBLE) /
         CAST(len(w) AS DOUBLE)) <= 0.1
    AND (CAST(len(list_filter(w, x -> regexp_matches(x, '[A-Za-z]'))) AS DOUBLE) /
         CAST(len(w) AS DOUBLE)) >= 0.8),
s1 AS (SELECT d.doc_id, d.text FROM documents d JOIN q USING (doc_id)),
e AS (
  SELECT doc_id FROM (
    SELECT doc_id, MIN(doc_id) OVER (PARTITION BY sha256(text)) AS m FROM s1)
  WHERE doc_id = m),
s2 AS (SELECT s1.doc_id, s1.text FROM s1 JOIN e USING (doc_id)),
ws2 AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w FROM s2),
sh2 AS (
  SELECT doc_id, list_distinct(list_transform(
    generate_series(1, greatest(len(w) - 2, 1)),
    i -> array_to_string(list_slice(w, i, i + 2), ' '))) AS sh
  FROM ws2),
sz2 AS (SELECT doc_id, len(sh) AS n_sh, unnest(sh) AS s FROM sh2),
pr AS (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS inter,
    MIN(a.n_sh) AS a_n, MIN(b.n_sh) AS b_n
  FROM sz2 a JOIN sz2 b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id),
nl AS (
  SELECT DISTINCT b_id AS doc_id FROM pr
  WHERE CAST(inter AS DOUBLE) / CAST(a_n + b_n - inter AS DOUBLE) >= 0.5),
s3 AS (SELECT s2.doc_id, s2.text FROM s2
  WHERE doc_id NOT IN (SELECT doc_id FROM nl)),
bs AS (
  SELECT DISTINCT unnest(sh) AS s FROM (
    SELECT list_distinct(list_transform(
      generate_series(1, greatest(len(w) - 7, 1)),
      i -> array_to_string(list_slice(w, i, i + 7), ' '))) AS sh
    FROM (SELECT string_split_regex(trim(text), '\\s+') AS w
      FROM documents WHERE doc_id % 97 = 0))),
w3 AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w FROM s3),
sh3 AS (
  SELECT doc_id, list_distinct(list_transform(
    generate_series(1, greatest(len(w) - 7, 1)),
    i -> array_to_string(list_slice(w, i, i + 7), ' '))) AS sh
  FROM w3),
sz3 AS (SELECT doc_id, len(sh) AS n_sh, unnest(sh) AS s FROM sh3),
cont AS (
  SELECT doc_id FROM (
    SELECT z.doc_id, MIN(z.n_sh) AS n_sh, COUNT(*) AS hits
    FROM sz3 z JOIN bs ON z.s = bs.s GROUP BY z.doc_id)
  WHERE CAST(hits AS DOUBLE) / CAST(n_sh AS DOUBLE) >= 0.2),
s4 AS (SELECT doc_id FROM s3 WHERE doc_id NOT IN (SELECT doc_id FROM cont))
SELECT 0 AS stage, 'raw' AS stage_name,
  CAST((SELECT COUNT(*) FROM documents) AS BIGINT) AS n_docs
UNION ALL SELECT 1, 'quality_rules', CAST((SELECT COUNT(*) FROM s1) AS BIGINT)
UNION ALL SELECT 2, 'exact_dedup', CAST((SELECT COUNT(*) FROM s2) AS BIGINT)
UNION ALL SELECT 3, 'near_dedup', CAST((SELECT COUNT(*) FROM s3) AS BIGINT)
UNION ALL SELECT 4, 'decontaminated', CAST((SELECT COUNT(*) FROM s4) AS BIGINT)
ORDER BY stage""".trim

  /** Twin of Dedup.incrementalDedup (batch = doc_id%5): same shingle
    * join restricted to batch-left pairs, same Jaccard cut, batch
    * survivors via anti-join. */
  val incrementalDedup: String = s"""
WITH ws AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w FROM documents),
shl AS (
  SELECT doc_id, list_distinct(list_transform(
    generate_series(1, greatest(len(w) - 2, 1)),
    i -> array_to_string(list_slice(w, i, i + 2), ' '))) AS sh
  FROM ws),
sized AS (
  SELECT doc_id, len(sh) AS n_sh, unnest(sh) AS s FROM shl),
pairs AS (
  SELECT a.doc_id AS a_id, COUNT(*) AS inter,
    MIN(a.n_sh) AS a_n, MIN(b.n_sh) AS b_n, b.doc_id AS b_id
  FROM sized a JOIN sized b ON a.s = b.s
  WHERE a.doc_id % 5 = 0 AND (b.doc_id % 5 <> 0 OR b.doc_id < a.doc_id)
  GROUP BY a.doc_id, b.doc_id),
losers AS (
  SELECT DISTINCT a_id AS doc_id FROM pairs
  WHERE CAST(inter AS DOUBLE) / CAST(a_n + b_n - inter AS DOUBLE) >= 0.5)
SELECT d.doc_id, d.lang, d.source FROM documents d
WHERE d.doc_id % 5 = 0 AND d.doc_id NOT IN (SELECT doc_id FROM losers)
${ord("doc_id")}""".trim

  /** Twin of TextAnalysis.fingerprint (native PolyHash64): the rolling
    * hash h = h·1000003 + byte (mod 2^64) is composable — h(s) =
    * Σ byte_i · B^(n-i) (mod 2^64) — so the twin sums per-char terms
    * against a power table built by ONE bounded recursion (constant
    * 4096 bound: a data-derived bound would re-evaluate the corpus
    * scan on every recursion step; docs here are ≤ ~600 chars, and the
    * bound is an oracle limitation only, not an engine one). HUGEINT
    * arithmetic carries the mod-2^64 wraparound DuckDB's BIGINT would
    * overflow-check, and the final CASE re-signs the value. */
  val fingerprintDocs: String = s"""
WITH RECURSIVE norm AS (
  SELECT doc_id, regexp_replace(lower(text), '\\s+', ' ', 'g') AS t FROM documents),
pw(k, p) AS (
  SELECT 0, CAST(1 AS HUGEINT)
  UNION ALL
  SELECT k + 1, (p * 1000003) % CAST('18446744073709551616' AS HUGEINT)
  FROM pw WHERE k < 4095),
pl AS MATERIALIZED (SELECT list(p ORDER BY k) AS ps FROM pw),
sums AS (
  SELECT n.doc_id,
    list_sum(list_transform(string_split_regex(n.t, ''),
      (c, i) -> ord(c) * pl.ps[strlen(n.t) - i + 1]))
      % CAST('18446744073709551616' AS HUGEINT) AS h
  FROM norm n, pl)
SELECT doc_id,
  CAST(CASE WHEN h IS NULL THEN 0
            WHEN h >= CAST('9223372036854775808' AS HUGEINT)
            THEN h - CAST('18446744073709551616' AS HUGEINT)
            ELSE h END AS BIGINT) AS fingerprint
FROM sums
${ord("doc_id")}""".trim

  /** Shared CTE chain for the portable-minhash oracles — the full
    * MinHash+LSH pipeline recomputed in SQL: per-shingle polyhash64
    * via the power-sum decomposition (see fingerprintDocs), the
    * Kirsch-Mitzenmacher affine signature family and the seeded band
    * fold in HUGEINT mod-2^64 (re-signed for the MIN comparisons,
    * since Spark mins SIGNED longs), band-bucket candidate join,
    * per-pair signature agreement in CTE `agree`.
    * `minhashPairsPortable` and `dedupCorpusMinhash` concatenate this
    * explicitly (no re-parsing of finished query strings).
    *
    * lazy: the split/fold/cluster oracles above this definition splice
    * it in — a plain val would still be null during their
    * initialization (object vals initialize in declaration order). */
  private lazy val minhashAgreeChain: String = {
    val pow64 = "CAST('18446744073709551616' AS HUGEINT)"
    val half = "CAST('9223372036854775808' AS HUGEINT)"
    val gold = "CAST('11400714819323198485' AS HUGEINT)" // unsigned 2^64 + i-step constant
    def step(acc: String, v: String) = s"(($acc) * 1000003 + $v) % $pow64"
    val fold = List("vs[1]", "vs[2]", "vs[3]", "vs[4]")
      .foldLeft("CAST(band AS HUGEINT)")(step)
    s"""
WITH RECURSIVE
ws AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w FROM documents),
shl AS (SELECT doc_id, list_distinct(list_transform(generate_series(1, greatest(len(w)-2, 1)),
  i -> array_to_string(list_slice(w, i, i+2), ' '))) AS sh FROM ws),
srow AS (SELECT doc_id, unnest(sh) AS s FROM shl),
pw(kk, p) AS (SELECT 0, CAST(1 AS HUGEINT)
  UNION ALL SELECT kk+1, (p*1000003) % $pow64 FROM pw WHERE kk < 255),
pl AS MATERIALIZED (SELECT list(p ORDER BY kk) AS ps FROM pw),
hashes AS (
  SELECT srow.doc_id, srow.s,
    COALESCE(list_sum(list_transform(string_split_regex(srow.s, ''),
      (c, i) -> ord(c) * pl.ps[strlen(srow.s) - i + 1])), 0) % $pow64 AS hu
  FROM srow, pl),
aff AS (
  SELECT h.doc_id, t.i,
    (h.hu * (2*t.i + 1) + t.i * $gold) % $pow64 AS vu
  FROM hashes h, generate_series(0, 31) t(i)),
sigrows AS (
  SELECT doc_id, i,
    MIN(CAST(CASE WHEN vu >= $half THEN vu - $pow64 ELSE vu END AS BIGINT)) AS v
  FROM aff GROUP BY doc_id, i),
bandlists AS (
  SELECT doc_id, i // 4 AS band,
    list(CAST(v AS HUGEINT) + CASE WHEN v < 0 THEN $pow64 ELSE CAST(0 AS HUGEINT) END
         ORDER BY i) AS vs
  FROM sigrows GROUP BY doc_id, i // 4),
bands AS (
  SELECT doc_id, band, $fold AS bucket FROM bandlists),
cand AS (
  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
  FROM bands a JOIN bands b ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id),
agree AS (
  SELECT c.a_id, c.b_id, SUM(CASE WHEN sa.v = sb.v THEN 1 ELSE 0 END) AS n_agree
  FROM cand c
  JOIN sigrows sa ON sa.doc_id = c.a_id
  JOIN sigrows sb ON sb.doc_id = c.b_id AND sb.i = sa.i
  GROUP BY c.a_id, c.b_id)""".trim
  }

  val minhashPairsPortable: String = s"""$minhashAgreeChain
SELECT a_id, b_id, CAST(n_agree AS DOUBLE) / 32 AS est_jaccard
FROM agree WHERE CAST(n_agree AS DOUBLE) / 32 >= 0.5
${ord("a_id", "b_id")}""".trim

  /** minhashAgreeChain + est ≥ 0.5 pairs + recursive component closure
    * + per-doc split key `k` = COALESCE(cluster_id, doc_id) in CTE
    * `keyed` — the MinHash analog of the exact-tier keyed chain. The
    * split/fold/cluster gate consumers ride THIS tier (round-6
    * re-point): ScaleProbe measures the exact shingle self-join as the
    * one super-linear candidate path under growing duplication while
    * MinHash band-buckets stay ~linear, so the sketch tier is the
    * production feeder; the exact chain remains the verification twin
    * via `ngram_jaccard` / `dedup_corpus`. */
  private lazy val minhashKeyedChain: String = s"""$minhashAgreeChain,
mh_pairs AS (
  SELECT a_id, b_id FROM agree WHERE CAST(n_agree AS DOUBLE) / 32 >= 0.5),
mh_edges AS (
  SELECT a_id AS id, b_id AS nbr FROM mh_pairs
  UNION SELECT b_id, a_id FROM mh_pairs),
mh_reach(id, r) AS (
  SELECT DISTINCT id, id FROM mh_edges
  UNION
  SELECT e.id, mh_reach.r FROM mh_edges e JOIN mh_reach ON e.nbr = mh_reach.id),
mh_clusters AS (
  SELECT id AS doc_id, MIN(r) AS cluster_id FROM mh_reach GROUP BY id),
keyed AS (
  SELECT d.doc_id, COALESCE(c.cluster_id, d.doc_id) AS k
  FROM documents d LEFT JOIN mh_clusters c ON d.doc_id = c.doc_id)""".trim

  /** Twin of Dedup.editDistanceVerify over the MinHash-portable pair
    * tier: same candidate chain, then textbook Levenshtein over
    * 200-char trimmed prefixes with the integer dist·100 ≤ maxLen·30
    * filter and one deterministic double `edit_sim` division. */
  val editdistVerify: String = s"""$minhashAgreeChain,
vp AS (SELECT a_id, b_id FROM agree WHERE CAST(n_agree AS DOUBLE) / 32 >= 0.5),
tx AS (
  SELECT doc_id, substr(trim(text), 1, 200) AS t,
    CAST(length(substr(trim(text), 1, 200)) AS INT) AS len
  FROM documents),
ed AS (
  SELECT v.a_id, v.b_id,
    CAST(levenshtein(ta.t, tb.t) AS INT) AS edit_dist,
    ta.len AS a_len, tb.len AS b_len
  FROM vp v
  JOIN tx ta ON ta.doc_id = v.a_id
  JOIN tx tb ON tb.doc_id = v.b_id)
SELECT a_id, b_id, edit_dist, a_len, b_len,
  1.0 - CAST(edit_dist AS DOUBLE) / greatest(a_len, b_len) AS edit_sim
FROM ed
WHERE edit_dist * 100 <= greatest(a_len, b_len) * 30
${ord("a_id", "b_id")}""".trim

  /** Twin of Curation.sourceCap(cap = 10): the shared quality
    * expression, a per-source ROW_NUMBER by (quality DESC, doc_id
    * ASC), keep rank ≤ 10. */
  val sourceCap: String = s"""
WITH t AS (
  SELECT doc_id, source,
    CAST(len(string_split_regex(trim(text), '\\s+')) AS DOUBLE) AS n_tok,
    CAST(len(list_distinct(string_split_regex(trim(text), '\\s+'))) AS DOUBLE) AS n_uniq,
    CAST(length(text) AS DOUBLE) AS n_chars
  FROM documents),
q AS (
  SELECT doc_id, source,
    round((n_uniq / n_tok) * 0.5
      + least(n_tok / 64.0, 1.0) * 0.3
      + (CASE WHEN ((n_chars - (n_tok - 1)) / n_tok) BETWEEN 3.0 AND 9.0
              THEN 1.0 ELSE 0.5 END) * 0.2, 6) AS quality
  FROM t),
rk AS (
  SELECT doc_id, source, quality,
    CAST(ROW_NUMBER() OVER (PARTITION BY source
      ORDER BY quality DESC, doc_id ASC) AS INT) AS source_rank
  FROM q)
SELECT doc_id, source, quality, source_rank FROM rk WHERE source_rank <= 10
${ord("doc_id")}""".trim

  /** Twin of Sampling.shardManifest over the pack_shards assignment:
    * same bucket/shard derivation, rollup + md5 over the id-sorted
    * comma-joined member list (string_agg with ORDER BY ≡ the
    * engine's array_sort-before-hash). */
  val shardManifest: String = s"""
WITH t AS (
  SELECT doc_id,
    CAST(len(string_split_regex(trim(text), '\\s+')) AS INT) AS n_tokens,
    doc_id % 8 AS pack_bucket
  FROM documents),
shards AS (
  SELECT doc_id, n_tokens, pack_bucket,
    CAST((SUM(n_tokens) OVER (PARTITION BY pack_bucket ORDER BY doc_id
            ROWS UNBOUNDED PRECEDING) - n_tokens) // 2048 AS BIGINT)
      AS shard_in_bucket
  FROM t)
SELECT pack_bucket, shard_in_bucket,
  CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
  MIN(doc_id) AS min_id, MAX(doc_id) AS max_id,
  md5(string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id)) AS content_digest
FROM shards
GROUP BY pack_bucket, shard_in_bucket
${ord("pack_bucket", "shard_in_bucket")}""".trim

  /** Twin of Sampling.lengthBatches(batchSize = 32): one global
    * ROW_NUMBER over (n_tokens, knuth-bucket, doc_id) — the same total
    * order the engine reaches via per-(length, bucket) ranks + base
    * offsets — then the per-batch padding rollup. */
  val lengthBatches: String = s"""
WITH t AS (
  SELECT doc_id,
    CAST(len(string_split_regex(trim(text), '\\s+')) AS INT) AS n_tokens
  FROM documents),
rk AS (
  SELECT doc_id, n_tokens,
    ROW_NUMBER() OVER (ORDER BY n_tokens ASC,
      ((doc_id % 1000003) * 2654435761) % 10000 ASC, doc_id ASC) AS r
  FROM t),
b AS (SELECT doc_id, n_tokens, (r - 1) // 32 AS batch_id FROM rk)
SELECT batch_id,
  CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(MAX(n_tokens) AS BIGINT) AS max_tokens,
  CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens,
  CAST(COUNT(*) * MAX(n_tokens) - SUM(n_tokens) AS BIGINT) AS padding
FROM b GROUP BY batch_id
${ord("batch_id")}""".trim

  /** Twin of Sampling.systematicSample(every = 500): the same
    * two-level exclusive token prefix in (knuth-bucket-64, doc_id)
    * order — here one global window, same total order — and the
    * integer span-covers-a-multiple predicate. */
  val systematicSample: String = s"""
WITH t AS (
  SELECT doc_id,
    CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_tokens,
    ((doc_id % 1000003) * 2654435761) % 64 AS b
  FROM documents),
c AS (
  SELECT doc_id, n_tokens,
    CAST(SUM(n_tokens) OVER (ORDER BY b ASC, doc_id ASC
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT)
      AS token_pos
  FROM t),
c0 AS (SELECT doc_id, n_tokens, COALESCE(token_pos, 0) AS token_pos FROM c)
SELECT doc_id, n_tokens, token_pos FROM c0
WHERE token_pos % 500 = 0 OR token_pos % 500 + n_tokens > 500
${ord("doc_id")}""".trim

  /** Twin of Dedup.dedupScorecard over the MinHash pair tier: distinct
    * either-side involvement, per-source rollup, one double division. */
  val dedupScorecard: String = s"""$minhashAgreeChain,
mh_pairs AS (
  SELECT a_id, b_id FROM agree WHERE CAST(n_agree AS DOUBLE) / 32 >= 0.5),
involved AS (
  -- explicit DISTINCT over UNION ALL: inside a WITH RECURSIVE block
  -- this DuckDB version skips cross-arm UNION dedup for this shape
  SELECT DISTINCT doc_id FROM (
    SELECT a_id AS doc_id FROM mh_pairs
    UNION ALL SELECT b_id FROM mh_pairs)),
g AS (
  SELECT d.source, CAST(COUNT(*) AS BIGINT) AS n_docs,
    CAST(COALESCE(SUM(CASE WHEN i.doc_id IS NOT NULL THEN 1 END), 0)
      AS BIGINT) AS n_dup_involved
  FROM documents d LEFT JOIN involved i ON d.doc_id = i.doc_id
  GROUP BY d.source)
SELECT source, n_docs, n_dup_involved,
  CAST(n_dup_involved AS DOUBLE) / CAST(n_docs AS DOUBLE) AS dup_rate
FROM g
${ord("source")}""".trim

  /** Twin of Dedup.dedupCorpusMinhash: the portable-minhash candidate
    * pipeline (same CTE chain as minhashPairsPortable, est ≥ 0.9) +
    * the recursive component closure + the survivor anti-join — the
    * production-scale fuzzy-dedup path verified end-to-end as one
    * statement. */
  val dedupCorpusMinhash: String = s"""$minhashAgreeChain,
mpairs AS (
  SELECT a_id, b_id FROM agree
  WHERE CAST(n_agree AS DOUBLE) / 32 >= 0.9),
edges AS (
  SELECT a_id AS id, b_id AS nbr FROM mpairs
  UNION SELECT b_id, a_id FROM mpairs),
reach(id, r) AS (
  SELECT DISTINCT id, id FROM edges
  UNION
  SELECT e.id, reach.r FROM edges e JOIN reach ON e.nbr = reach.id),
losers AS (
  SELECT id AS doc_id FROM reach GROUP BY id HAVING id <> MIN(r))
SELECT d.doc_id, d.lang, d.source FROM documents d
WHERE d.doc_id NOT IN (SELECT doc_id FROM losers)
${ord("doc_id")}""".trim

  /** Twin of Dedup.simhashPairsPortable — the full SimHash pipeline in
    * SQL: per-token polyhash64 (power-sum), per-bit majority vote over
    * every token instance, fingerprint assembly from a materialized
    * powers-of-two list, 16-bit chunk blocking, Hamming verify via
    * bit_count(xor). */
  val simhashPairsPortable: String = {
    val pow64 = "CAST('18446744073709551616' AS HUGEINT)"
    val half = "CAST('9223372036854775808' AS HUGEINT)"
    s"""
WITH RECURSIVE
pw(kk, p) AS (SELECT 0, CAST(1 AS HUGEINT)
  UNION ALL SELECT kk+1, (p*1000003) % $pow64 FROM pw WHERE kk < 255),
pl AS MATERIALIZED (SELECT list(p ORDER BY kk) AS ps FROM pw),
p2(b, v) AS (SELECT 0, CAST(1 AS HUGEINT)
  UNION ALL SELECT b+1, v*2 FROM p2 WHERE b < 63),
p2l AS MATERIALIZED (SELECT list(v ORDER BY b) AS twos FROM p2),
toks AS (
  SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS t FROM documents),
thash AS (
  SELECT toks.doc_id,
    COALESCE(list_sum(list_transform(string_split_regex(toks.t, ''),
      (c, i) -> ord(c) * pl.ps[strlen(toks.t) - i + 1])), 0) % $pow64 AS hu
  FROM toks, pl),
ntok AS (SELECT doc_id, COUNT(*) AS n FROM thash GROUP BY doc_id),
bits AS (
  SELECT th.doc_id, t.b, SUM((th.hu // p2l.twos[t.b + 1]) % 2) AS cnt
  FROM thash th, generate_series(0, 63) t(b), p2l
  GROUP BY th.doc_id, t.b),
fp AS (
  SELECT bits.doc_id,
    SUM(CASE WHEN bits.cnt * 2 > ntok.n THEN p2l.twos[bits.b + 1]
        ELSE CAST(0 AS HUGEINT) END) AS fpu
  FROM bits JOIN ntok USING (doc_id), p2l
  GROUP BY bits.doc_id),
sh AS (
  SELECT doc_id, fpu,
    CAST(CASE WHEN fpu >= $half THEN fpu - $pow64 ELSE fpu END AS BIGINT) AS simhash
  FROM fp),
chunked AS (
  SELECT doc_id, simhash, t.c AS chunk_no,
    CAST((fpu // p2l.twos[t.c * 16 + 1]) % 65536 AS BIGINT) AS chunk
  FROM sh, generate_series(0, 3) t(c), p2l),
cand AS (
  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id,
    a.simhash AS sa, b.simhash AS sb
  FROM chunked a JOIN chunked b
    ON a.chunk_no = b.chunk_no AND a.chunk = b.chunk AND a.doc_id < b.doc_id)
SELECT a_id, b_id, CAST(bit_count(xor(sa, sb)) AS INT) AS hamming
FROM cand WHERE bit_count(xor(sa, sb)) <= 3
${ord("a_id", "b_id")}""".trim
  }

  // ---- similarity --------------------------------------------------

  private val quantized =
    "SELECT vec_id, list_transform(embedding, x -> round(CAST(x AS DOUBLE)*1000)) AS q FROM embeddings"

  private val quantized2 =
    "SELECT vec_id, label, list_transform(embedding, x -> round(CAST(x AS DOUBLE)*1000)) AS q FROM embeddings"

  /** Twin of Similarity.kmeansAssign(k=8, iters=2): iterations unrolled
    * as CTE chains — same integer sq-L2 (self-dots precomputed), same
    * (d, cluster) argmin tie-break (window form of Spark's
    * min(struct)), same floor(sum/count) centroid components
    * reassembled by dim order. */
  private val kmeansChain: String = {
    val k = 8
    def step(i: Int, cents: String) = s"""
s$i AS (
  SELECT e.vec_id, e.q, e.qq, c.cluster,
    CAST(e.qq - 2*CAST(list_dot_product(e.q, c.cq) AS BIGINT) + c.cqq AS BIGINT) AS d
  FROM ed e, $cents c),
a$i AS (
  SELECT vec_id, q, cluster, d FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d ASC, cluster ASC) AS rk
    FROM s$i) WHERE rk = 1)"""
    def update(i: Int) = s"""
x$i AS (SELECT cluster, unnest(generate_series(1, len(q))) AS dim, q FROM a$i),
u$i AS (
  SELECT cluster, dim,
    CAST(floor(CAST(SUM(q[CAST(dim AS INT)]) AS DOUBLE) /
      CAST(COUNT(*) AS DOUBLE)) AS BIGINT) AS c
  FROM x$i GROUP BY cluster, dim),
c$i AS (SELECT cluster, list(c ORDER BY dim) AS cq FROM u$i GROUP BY cluster),
cd$i AS (SELECT cluster, cq,
  CAST(list_dot_product(cq, cq) AS BIGINT) AS cqq FROM c$i)"""
    s"""
WITH e AS ($quantized),
ed AS (SELECT vec_id, q, CAST(list_dot_product(q, q) AS BIGINT) AS qq FROM e),
c0 AS (SELECT vec_id AS cluster, q AS cq, qq AS cqq FROM ed ORDER BY vec_id LIMIT $k),
${step(1, "c0")},
${update(1)},
${step(2, "cd1")},
${update(2)},
${step(3, "cd2")}""".trim
  }

  val kmeansAssign: String = s"""
$kmeansChain
SELECT vec_id, cluster, d AS dist FROM a3
${ord("vec_id")}""".trim

  /** Twin of Similarity.clusterBalancedSample: the kmeans chain + the
    * per-cluster Knuth-bucket-ordered cap window. */
  val clusterBalancedSample: String = s"""
$kmeansChain,
capped AS (
  SELECT vec_id, cluster,
    ROW_NUMBER() OVER (PARTITION BY cluster
      ORDER BY ((vec_id % 1000003) * 2654435761) % 10000 ASC, vec_id ASC) AS rn
  FROM a3)
SELECT vec_id, cluster FROM capped WHERE rn <= 40
${ord("vec_id")}""".trim

  /** Twin of TextAnalysis.tfidfTopTerms: per-TERM integer-quantized
    * idf, exact int64 scores, (score DESC, tok ASC) top-k window. */
  val tfidfTopTerms: String = s"""
WITH toks AS (
  SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS tok
  FROM documents),
tf AS (
  SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS tf
  FROM toks GROUP BY doc_id, tok),
dfq AS (
  SELECT tok, CAST(COUNT(*) AS BIGINT) AS df
  FROM (SELECT DISTINCT doc_id, tok FROM toks) GROUP BY tok),
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
scored AS (
  SELECT t.doc_id, t.tok, t.tf, d.df,
    t.tf * CAST(round(ln(CAST(n.n_docs AS DOUBLE) / CAST(d.df AS DOUBLE))
      * 1000000) AS BIGINT) AS q_tfidf
  FROM tf t JOIN dfq d ON t.tok = d.tok, n),
rk AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
    ORDER BY q_tfidf DESC, tok ASC) AS rk
  FROM scored)
SELECT doc_id, tok, tf, df, q_tfidf FROM rk WHERE rk <= 5
${ord("doc_id", "tok")}""".trim

  /** Twin of TextAnalysis.bm25TopK for query (spark, merge, vector):
    * the per-term contribution mirrors the engine's double expression
    * association verbatim (left-assoc products, same literals — 2.2 is
    * exactly k1+1 in IEEE doubles), quantized ·10⁶ per term, exact
    * int64 per-doc sum, (score DESC, doc_id ASC) top-10. */
  val bm25TopK: String = s"""
WITH toks AS (
  SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS tok
  FROM documents),
cnts AS (
  SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS tf
  FROM toks GROUP BY doc_id, tok),
dlen AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS dl FROM cnts GROUP BY doc_id),
stats AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(SUM(dl) AS BIGINT) AS total_dl FROM dlen),
qc AS (SELECT * FROM cnts WHERE tok IN ('spark', 'merge', 'vector')),
dfq AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS df FROM qc GROUP BY tok),
scored AS (
  SELECT qc.doc_id,
    CAST(round(ln((CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5)
        / (CAST(df AS DOUBLE) + 0.5) + 1.0)
      * (CAST(tf AS DOUBLE) * 2.2)
      / (CAST(tf AS DOUBLE) + 1.2 * (0.25 + 0.75 * CAST(dl AS DOUBLE)
        * CAST(n_docs AS DOUBLE) / CAST(total_dl AS DOUBLE)))
      * 1000000) AS BIGINT) AS q
  FROM qc JOIN dfq USING (tok) JOIN dlen USING (doc_id), stats),
topk AS (
  SELECT doc_id, CAST(SUM(q) AS BIGINT) AS q_bm25,
    CAST(COUNT(*) AS BIGINT) AS n_terms
  FROM scored GROUP BY doc_id
  ORDER BY q_bm25 DESC, doc_id ASC LIMIT 10)
SELECT doc_id, q_bm25, n_terms FROM topk
${ord("doc_id")}""".trim

  /** Twin of TextAnalysis.bm25MultiTopK for the gate's 3 query sets:
    * identical per-(doc, term) contribution as bm25TopK (same double
    * association, ·10⁶ quantization), computed once over the union
    * vocabulary and fanned to queries by the term join; per-query
    * top-5 via a row_number window with (score DESC, doc_id ASC)
    * ties. query_id cast BIGINT to match the engine's LongType. */
  val bm25Multiquery: String = s"""
WITH toks AS (
  SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS tok
  FROM documents),
cnts AS (
  SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS tf
  FROM toks GROUP BY doc_id, tok),
dlen AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS dl FROM cnts GROUP BY doc_id),
stats AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(SUM(dl) AS BIGINT) AS total_dl FROM dlen),
qt(query_id, tok) AS (VALUES
  (CAST(1 AS BIGINT), 'spark'), (CAST(1 AS BIGINT), 'merge'),
  (CAST(2 AS BIGINT), 'vector'), (CAST(2 AS BIGINT), 'spark'),
  (CAST(3 AS BIGINT), 'merge'), (CAST(3 AS BIGINT), 'vector')),
qc AS (SELECT * FROM cnts WHERE tok IN (SELECT DISTINCT tok FROM qt)),
dfq AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS df FROM qc GROUP BY tok),
scored AS (
  SELECT qc.doc_id, qc.tok,
    CAST(round(ln((CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5)
        / (CAST(df AS DOUBLE) + 0.5) + 1.0)
      * (CAST(tf AS DOUBLE) * 2.2)
      / (CAST(tf AS DOUBLE) + 1.2 * (0.25 + 0.75 * CAST(dl AS DOUBLE)
        * CAST(n_docs AS DOUBLE) / CAST(total_dl AS DOUBLE)))
      * 1000000) AS BIGINT) AS q
  FROM qc JOIN dfq USING (tok) JOIN dlen USING (doc_id), stats),
perq AS (
  SELECT qt.query_id, s.doc_id, CAST(SUM(s.q) AS BIGINT) AS q_bm25,
    CAST(COUNT(*) AS BIGINT) AS n_terms
  FROM scored s JOIN qt ON s.tok = qt.tok
  GROUP BY qt.query_id, s.doc_id),
topk AS (
  SELECT query_id, doc_id, q_bm25, n_terms,
    ROW_NUMBER() OVER (PARTITION BY query_id
      ORDER BY q_bm25 DESC, doc_id ASC) AS rk
  FROM perq)
SELECT query_id, doc_id, q_bm25, n_terms FROM topk WHERE rk <= 5
${ord("query_id", "doc_id")}""".trim

  val annCosineTopK: String = s"""
WITH e AS ($quantized),
qv AS (SELECT q AS qq FROM e WHERE vec_id = 0),
scored AS (
  SELECT e.vec_id,
    list_dot_product(e.q, qv.qq) /
      (sqrt(list_dot_product(e.q, e.q)) * sqrt(list_dot_product(qv.qq, qv.qq)))
      AS cosine_sim
  FROM e, qv
  ORDER BY cosine_sim DESC, vec_id ASC
  LIMIT 10)
SELECT vec_id, cosine_sim FROM scored
${ord("vec_id", "cosine_sim")}""".trim

  /** Twin of Similarity.bruteAllTopK via annTopK(strategy="brute"):
    * exact per-probe top-5 over the full probes × corpus score space,
    * same quantized-cosine double and (cosine DESC, vec_id ASC)
    * tie-break as every other ANN twin. */
  val annBruteBatch: String = s"""
WITH e AS ($quantized),
probes AS (SELECT vec_id AS probe_id, q AS pq FROM e WHERE vec_id % 100 = 0),
scored AS (
  SELECT p.probe_id, e.vec_id,
    list_dot_product(p.pq, e.q) /
      (sqrt(list_dot_product(p.pq, p.pq)) * sqrt(list_dot_product(e.q, e.q)))
      AS cosine_sim
  FROM probes p, e
  WHERE p.probe_id <> e.vec_id),
ranked AS (
  SELECT probe_id, vec_id, cosine_sim,
    ROW_NUMBER() OVER (PARTITION BY probe_id
      ORDER BY cosine_sim DESC, vec_id ASC) AS rk
  FROM scored)
SELECT probe_id, vec_id, cosine_sim FROM ranked WHERE rk <= 5
${ord("probe_id", "vec_id")}""".trim

  /** Twin of Similarity.matryoshkaTopK(k=5, r=10, dims=16): prefix-dim
    * cosine shortlist (q[1:16], same quantized-integer dot), exact
    * full-dim re-rank, same (DESC, id ASC) tie-breaks both stages. */
  val matryoshkaTopK: String = s"""
WITH e AS ($quantized),
ep AS (SELECT vec_id, q[1:16] AS qp FROM e),
pp AS (SELECT vec_id AS probe_id, q[1:16] AS pqp FROM e WHERE vec_id % 100 = 0),
pre AS (
  SELECT p.probe_id, ep.vec_id,
    list_dot_product(p.pqp, ep.qp) /
      (sqrt(list_dot_product(p.pqp, p.pqp)) * sqrt(list_dot_product(ep.qp, ep.qp)))
      AS pre_sim
  FROM pp p, ep WHERE p.probe_id <> ep.vec_id),
short AS (
  SELECT probe_id, vec_id FROM (
    SELECT probe_id, vec_id,
      ROW_NUMBER() OVER (PARTITION BY probe_id
        ORDER BY pre_sim DESC, vec_id ASC) AS rk
    FROM pre) WHERE rk <= 10),
pf AS (SELECT vec_id AS probe_id, q AS pq FROM e WHERE vec_id % 100 = 0),
fr AS (
  SELECT s.probe_id, s.vec_id,
    list_dot_product(pf.pq, e.q) /
      (sqrt(list_dot_product(pf.pq, pf.pq)) * sqrt(list_dot_product(e.q, e.q)))
      AS cosine_sim
  FROM short s
  JOIN e ON e.vec_id = s.vec_id
  JOIN pf ON pf.probe_id = s.probe_id),
ranked AS (
  SELECT probe_id, vec_id, cosine_sim,
    ROW_NUMBER() OVER (PARTITION BY probe_id
      ORDER BY cosine_sim DESC, vec_id ASC) AS rk
  FROM fr)
SELECT probe_id, vec_id, cosine_sim FROM ranked WHERE rk <= 5
${ord("probe_id", "vec_id")}""".trim

  /** Shared IVF probe chain — `cand` is every (probe_id, vec_id, cs)
    * candidate pair in a probe's 3 nearest cells (self excluded), with
    * the engine's two-level argmax (cell assignment, probe cells) and
    * identical (cosine DESC, id ASC) tie-breaks. Consumed by the
    * top-k twin and the band-filtered hard-negative twin. */
  private val ivfCandChain: String = s"""
WITH e AS ($quantized),
cents AS (SELECT vec_id AS cent_id, q AS cq FROM e WHERE vec_id % 50 = 0),
cos_ec AS (
  SELECT e.vec_id, e.q, c.cent_id, c.cq,
    list_dot_product(e.q, c.cq) /
      (sqrt(list_dot_product(e.q, e.q)) * sqrt(list_dot_product(c.cq, c.cq))) AS cs
  FROM e, cents c),
assign AS (
  SELECT vec_id, cent_id AS cell, q FROM (
    SELECT vec_id, cent_id, q,
      ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cs DESC, cent_id ASC) AS rk
    FROM cos_ec) WHERE rk = 1),
probes AS (SELECT vec_id AS probe_id, q AS pq FROM e WHERE vec_id % 100 = 0),
pcells AS (
  SELECT probe_id, pq, cent_id AS cell FROM (
    SELECT p.probe_id, p.pq, c.cent_id,
      ROW_NUMBER() OVER (PARTITION BY p.probe_id ORDER BY
        list_dot_product(p.pq, c.cq) /
          (sqrt(list_dot_product(p.pq, p.pq)) * sqrt(list_dot_product(c.cq, c.cq)))
        DESC, c.cent_id ASC) AS rk
    FROM probes p, cents c) WHERE rk <= 3),
cand AS (
  SELECT pc.probe_id, a.vec_id,
    list_dot_product(pc.pq, a.q) /
      (sqrt(list_dot_product(pc.pq, pc.pq)) * sqrt(list_dot_product(a.q, a.q))) AS cs
  FROM pcells pc JOIN assign a ON pc.cell = a.cell
  WHERE pc.probe_id <> a.vec_id)""".trim

  val ivfTopK: String = s"""
$ivfCandChain,
scored AS (
  SELECT probe_id, vec_id, cs AS cosine_sim,
    ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY cs DESC, vec_id ASC) AS rk
  FROM cand)
SELECT probe_id, vec_id, cosine_sim FROM scored WHERE rk <= 5
${ord("probe_id", "vec_id")}""".trim

  /** Twin of Similarity.hardNegatives: the IVF candidate chain with
    * the [lo, hi) band filter applied BEFORE the per-probe top-k
    * window — the same deterministic quantized-cosine double, so the
    * band edges are identical IEEE compares in both engines. */
  val hardNegatives: String = s"""
$ivfCandChain,
scored AS (
  SELECT probe_id, vec_id, cs AS cosine_sim,
    ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY cs DESC, vec_id ASC) AS rk
  FROM cand WHERE cs >= 0.05 AND cs < 0.35)
SELECT probe_id, vec_id, cosine_sim FROM scored WHERE rk <= 5
${ord("probe_id", "vec_id")}""".trim

  /** Shared CTE chain for the product-quantization twins: quantized
    * vectors sliced into m=4 subspace blocks, codebook = the
    * `vec_id % 50 == 0` seed vectors with dense code = position in
    * vec_id-sorted seed order (the engine's array_sort-position
    * contract), per-(vector, subspace) argmin squared-L2 code with the
    * lowest-code tie-break — the same exact integer arithmetic
    * (`q·q − 2·q·c + c·c` over round(x*1000) values, everything ≪ 2^53
    * so DOUBLE is exact) as the engine's NearestCentroidL2. */
  private val pqChain: String = s"""
WITH e AS ($quantized),
cents AS (
  SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS code, q AS cq
  FROM e WHERE vec_id % 50 = 0),
kb AS (
  SELECT c.code, t.j,
    list_slice(c.cq, t.j * (len(c.cq) // 4) + 1, (t.j + 1) * (len(c.cq) // 4)) AS kblk
  FROM cents c, generate_series(0, 3) t(j)),
cb AS (
  SELECT e.vec_id, t.j,
    list_slice(e.q, t.j * (len(e.q) // 4) + 1, (t.j + 1) * (len(e.q) // 4)) AS blk
  FROM e, generate_series(0, 3) t(j)),
codes AS (
  SELECT vec_id, j, code FROM (
    SELECT cb.vec_id, cb.j, kb.code,
      ROW_NUMBER() OVER (PARTITION BY cb.vec_id, cb.j ORDER BY
        list_dot_product(cb.blk, cb.blk) - 2 * list_dot_product(cb.blk, kb.kblk)
          + list_dot_product(kb.kblk, kb.kblk) ASC, kb.code ASC) AS rk
    FROM cb JOIN kb ON cb.j = kb.j) WHERE rk = 1)""".trim

  /** Twin of Similarity.pqEncode(m=4, centroidMod=50): per-subspace
    * argmin codes, serialized subspace-major like the gate entry's
    * concat_ws. */
  /** Shared CTE chain for the scalar-quantization twins: per-dim
    * min/max over the integer-quantized corpus, then per-vector codes
    * floor((v−lo)·255/(hi−lo)) reassembled in dim order (constant dims
    * encode 0) — identical arithmetic to Similarity.sqEncode. */
  private val sqChain: String = s"""
WITH e AS ($quantized),
dm AS (SELECT vec_id, unnest(generate_series(1, len(q))) AS dim, q FROM e),
dv AS (SELECT vec_id, dim, q[CAST(dim AS INT)] AS v FROM dm),
dims AS (
  SELECT dim, CAST(MIN(v) AS BIGINT) AS lo, CAST(MAX(v) AS BIGINT) AS hi
  FROM dv GROUP BY dim),
cd AS (
  SELECT dv.vec_id, dv.dim,
    CASE WHEN d.hi > d.lo THEN
      CAST(floor(CAST((dv.v - d.lo) * 255 AS DOUBLE)
        / CAST(d.hi - d.lo AS DOUBLE)) AS BIGINT)
    ELSE 0 END AS c
  FROM dv JOIN dims d USING (dim)),
ec AS (SELECT vec_id, list(c ORDER BY dim) AS codes FROM cd GROUP BY vec_id)""".trim

  /** Twin of Similarity.sqEncode (codes serialized like pqEncode). */
  val sqEncode: String = s"""
$sqChain
SELECT vec_id, array_to_string(codes, ',') AS codes FROM ec
${ord("vec_id")}""".trim

  /** Twin of Similarity.sqTopK: symmetric exact-integer code distance,
    * (dist ASC, vec_id ASC) top-5 per probe, self excluded. */
  val sqTopK: String = s"""
$sqChain,
pe AS (SELECT vec_id AS probe_id, codes AS pcodes FROM ec WHERE vec_id % 100 = 0),
scored AS (
  SELECT pe.probe_id, ec.vec_id,
    CAST(list_dot_product(pe.pcodes, pe.pcodes)
      - 2*list_dot_product(pe.pcodes, ec.codes)
      + list_dot_product(ec.codes, ec.codes) AS BIGINT) AS sq_dist
  FROM pe, ec WHERE pe.probe_id <> ec.vec_id),
rk AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY probe_id
    ORDER BY sq_dist ASC, vec_id ASC) AS rk FROM scored)
SELECT probe_id, vec_id, sq_dist FROM rk WHERE rk <= 5
${ord("probe_id", "vec_id")}""".trim

  val pqEncode: String = s"""$pqChain
SELECT vec_id, array_to_string(list(code ORDER BY j), ',') AS codes
FROM codes GROUP BY vec_id
${ord("vec_id")}""".trim

  /** Twin of Similarity.pqTopK(k=5): per-probe per-subspace distance
    * tables against every codebook entry, ADC distance = sum of the
    * code-indexed entries, top-5 by (adist ASC, vec_id ASC). */
  val pqTopK: String = s"""$pqChain,
probes AS (SELECT vec_id AS probe_id, q AS pq FROM e WHERE vec_id % 100 = 0),
pbl AS (
  SELECT p.probe_id, t.j,
    list_slice(p.pq, t.j * (len(p.pq) // 4) + 1, (t.j + 1) * (len(p.pq) // 4)) AS pblk
  FROM probes p, generate_series(0, 3) t(j)),
tab AS (
  SELECT p.probe_id, p.j, k.code,
    list_dot_product(p.pblk, p.pblk) - 2 * list_dot_product(p.pblk, k.kblk)
      + list_dot_product(k.kblk, k.kblk) AS d
  FROM pbl p JOIN kb k ON p.j = k.j),
scored AS (
  SELECT t.probe_id, c.vec_id, CAST(SUM(t.d) AS BIGINT) AS adist
  FROM codes c JOIN tab t ON c.j = t.j AND c.code = t.code
  WHERE t.probe_id <> c.vec_id
  GROUP BY t.probe_id, c.vec_id)
SELECT probe_id, vec_id, adist FROM (
  SELECT probe_id, vec_id, adist,
    ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY adist ASC, vec_id ASC) AS rk
  FROM scored) WHERE rk <= 5
${ord("probe_id", "vec_id")}""".trim

  /** Shared IVF-PQ chain — the pqChain codes + the ivfTopK
    * cell-assignment arithmetic (cosine argmax over the full quantized
    * vectors, cell ids = raw seed vec_ids — unlike the dense PQ codes)
    * + candidate restriction to each probe's 3 nearest cells + the ADC
    * sum, ending at `scored` (probe_id, vec_id, adist). Consumed by
    * the plain top-k twin and the exact-re-rank twin. Lazy: referenced
    * by later vals (object-init-order rule). */
  private lazy val ivfPqChain: String = s"""$pqChain,
icents AS (SELECT vec_id AS cent_id, q AS cq FROM e WHERE vec_id % 50 = 0),
assign AS (
  SELECT vec_id, cent_id AS cell FROM (
    SELECT e.vec_id, c.cent_id,
      ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
        list_dot_product(e.q, c.cq) /
          (sqrt(list_dot_product(e.q, e.q)) * sqrt(list_dot_product(c.cq, c.cq)))
        DESC, c.cent_id ASC) AS rk
    FROM e, icents c) WHERE rk = 1),
probes AS (SELECT vec_id AS probe_id, q AS pq FROM e WHERE vec_id % 100 = 0),
pcells AS (
  SELECT probe_id, cent_id AS cell FROM (
    SELECT p.probe_id, c.cent_id,
      ROW_NUMBER() OVER (PARTITION BY p.probe_id ORDER BY
        list_dot_product(p.pq, c.cq) /
          (sqrt(list_dot_product(p.pq, p.pq)) * sqrt(list_dot_product(c.cq, c.cq)))
        DESC, c.cent_id ASC) AS rk
    FROM probes p, icents c) WHERE rk <= 3),
pbl AS (
  SELECT p.probe_id, t.j,
    list_slice(p.pq, t.j * (len(p.pq) // 4) + 1, (t.j + 1) * (len(p.pq) // 4)) AS pblk
  FROM probes p, generate_series(0, 3) t(j)),
tab AS (
  SELECT p.probe_id, p.j, k.code,
    list_dot_product(p.pblk, p.pblk) - 2 * list_dot_product(p.pblk, k.kblk)
      + list_dot_product(k.kblk, k.kblk) AS d
  FROM pbl p JOIN kb k ON p.j = k.j),
scored AS (
  SELECT t.probe_id, c.vec_id, CAST(SUM(t.d) AS BIGINT) AS adist
  FROM codes c
  JOIN assign a ON a.vec_id = c.vec_id
  JOIN pcells pc ON pc.cell = a.cell
  JOIN tab t ON t.probe_id = pc.probe_id AND t.j = c.j AND t.code = c.code
  WHERE t.probe_id <> c.vec_id
  GROUP BY t.probe_id, c.vec_id)""".trim

  /** Twin of Similarity.ivfPqTopK(k=5, nprobe=3): the shared chain's
    * ADC scores, top-5 by (adist ASC, vec_id ASC). */
  val ivfPqTopK: String = s"""$ivfPqChain
SELECT probe_id, vec_id, adist FROM (
  SELECT probe_id, vec_id, adist,
    ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY adist ASC, vec_id ASC) AS rk
  FROM scored) WHERE rk <= 5
${ord("probe_id", "vec_id")}""".trim

  /** Twin of Similarity.ivfPqRerank(k=5, r=10): the ADC shortlist cut
    * at depth 10 with the (adist ASC, vec_id ASC) tie-break, then the
    * exact quantized cosine over the survivors' FULL vectors — the
    * same dot/(sqrt·sqrt) double arithmetic as the IVF twins — ranked
    * (cosine DESC, vec_id ASC), top-5. */
  val ivfPqRerank: String = s"""$ivfPqChain,
short AS (
  SELECT probe_id, vec_id FROM (
    SELECT probe_id, vec_id,
      ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY adist ASC, vec_id ASC) AS rk
    FROM scored) WHERE rk <= 10),
rer AS (
  SELECT s.probe_id, s.vec_id,
    list_dot_product(p.pq, e.q) /
      (sqrt(list_dot_product(p.pq, p.pq)) * sqrt(list_dot_product(e.q, e.q))) AS cosine_sim
  FROM short s
  JOIN probes p ON p.probe_id = s.probe_id
  JOIN e ON e.vec_id = s.vec_id)
SELECT probe_id, vec_id, cosine_sim FROM (
  SELECT probe_id, vec_id, cosine_sim,
    ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY cosine_sim DESC, vec_id ASC) AS rk
  FROM rer) WHERE rk <= 5
${ord("probe_id", "vec_id")}""".trim

  /** Twin of Similarity.kcenterSample(k=6): the greedy rounds unrolled
    * as CTEs (the bpeMerges pattern) — seed = lowest vec_id, each
    * round's pick = (min-sq-L2-to-selected DESC, vec_id ASC) argmax,
    * distances in the same exact integers as NearestCentroidL2
    * (q·q − 2·q·c + c·c over round(x·1000) values, < 2^53 so DOUBLE
    * arithmetic is exact). */
  val kcenterSample: String = {
    def l2(qa: String, qb: String): String =
      s"CAST(list_dot_product($qa, $qa) - 2 * list_dot_product($qa, $qb)" +
        s" + list_dot_product($qb, $qb) AS BIGINT)"
    val rounds = (1 until 6).map { i =>
      s"""d$i AS (
  SELECT e.vec_id, e.q, MIN(${l2("e.q", "s.q")}) AS d
  FROM e, sel${i - 1} s GROUP BY e.vec_id, e.q),
p$i AS (SELECT vec_id, q, d FROM d$i ORDER BY d DESC, vec_id ASC LIMIT 1),
sel$i AS (SELECT vec_id, q FROM sel${i - 1} UNION ALL SELECT vec_id, q FROM p$i)"""
    }.mkString(",\n")
    val unions = (1 until 6).map(i =>
      s"SELECT ${i + 1} AS sel_rank, vec_id, d AS dist FROM p$i")
      .mkString("\n  UNION ALL ")
    s"""
WITH e AS ($quantized),
sel0 AS (SELECT vec_id, q FROM e ORDER BY vec_id ASC LIMIT 1),
$rounds
SELECT CAST(sel_rank AS BIGINT) AS sel_rank, vec_id, CAST(dist AS BIGINT) AS dist
FROM (
  SELECT 1 AS sel_rank, vec_id, CAST(0 AS BIGINT) AS dist FROM sel0
  UNION ALL $unions)
ORDER BY sel_rank""".trim
  }

  /** Twin of TextAnalysis.qualityPercentileFilter: same quality
    * expression as qualityScore, quantile_cont ≡ Spark percentile. */
  val qualityPercentileFilter: String = s"""
WITH t AS (
  SELECT doc_id,
    CAST(len(string_split_regex(trim(text), '\\s+')) AS DOUBLE) AS n_tok,
    CAST(len(list_distinct(string_split_regex(trim(text), '\\s+'))) AS DOUBLE) AS n_uniq,
    CAST(length(text) AS DOUBLE) AS n_chars
  FROM documents),
q AS (
  SELECT doc_id,
    round((n_uniq / n_tok) * 0.5
      + least(n_tok / 64.0, 1.0) * 0.3
      + (CASE WHEN ((n_chars - (n_tok - 1)) / n_tok) BETWEEN 3.0 AND 9.0
              THEN 1.0 ELSE 0.5 END) * 0.2, 6) AS quality
  FROM t),
c AS (SELECT quantile_cont(quality, 0.25) AS cut FROM q)
SELECT doc_id, quality FROM q, c WHERE quality >= cut
${ord("doc_id")}""".trim

  /** Twin of Similarity.randomProjection: the annLshTopK plane/
    * projection arithmetic, raw sums kept (no sign step), dims
    * reassembled in plane order. The final LEFT JOIN back onto `e`
    * mirrors the engine's empty-embedding guard (all-zero projection
    * row): unnest over generate_series(1, 0) yields no rows, so an
    * empty vector would otherwise vanish from the oracle while the
    * engine keeps it. */
  val rpProject: String = s"""
WITH e AS ($quantized),
ed AS (SELECT vec_id, q, unnest(generate_series(1, len(q))) AS i FROM e),
proj AS (
  SELECT vec_id, p,
    SUM(q[CAST(i AS INT)] *
        ((((((p*131071 + (i-1)*524287 + 17) % 2147483647) * 48271)
           % 2147483647 * 48271) % 2147483647) % 2001 - 1000)) AS proj
  FROM (SELECT *, unnest(generate_series(0, 7)) AS p FROM ed)
  GROUP BY vec_id, p),
pl AS (
  SELECT vec_id,
    array_to_string(list(CAST(proj AS BIGINT) ORDER BY p), ',') AS proj_str
  FROM proj GROUP BY vec_id)
SELECT e.vec_id, COALESCE(pl.proj_str, '0,0,0,0,0,0,0,0') AS proj_str
FROM e LEFT JOIN pl USING (vec_id)
${ord("vec_id")}""".trim

  /** End-to-end twin of Similarity.lshTopK: the Lehmer-LCG hyperplanes
    * are portable integer arithmetic (every intermediate < 2^47, exact
    * in doubles too), so DuckDB reproduces sketch bits, buckets, the
    * bucket-local candidate join, exact cosine re-rank and the top-k
    * window — full hash-match coverage for the LSH ANN path. */
  val annLshTopK: String = s"""
WITH e AS ($quantized),
ed AS (SELECT vec_id, q, unnest(generate_series(1, len(q))) AS i FROM e),
proj AS (
  SELECT vec_id, p,
    SUM(q[CAST(i AS INT)] *
        ((((((p*131071 + (i-1)*524287 + 17) % 2147483647) * 48271)
           % 2147483647 * 48271) % 2147483647) % 2001 - 1000)) AS proj
  FROM (SELECT *, unnest(generate_series(0, 7)) AS p FROM ed)
  GROUP BY vec_id, p),
buckets AS (
  SELECT vec_id,
    SUM(CASE WHEN proj >= 0 THEN (CAST(1 AS BIGINT) << CAST(p AS INT))
        ELSE 0 END) AS bucket
  FROM proj GROUP BY vec_id),
cand AS (
  SELECT pb.vec_id AS probe_id, bb.vec_id
  FROM buckets pb JOIN buckets bb ON pb.bucket = bb.bucket
  WHERE pb.vec_id % 100 = 0 AND pb.vec_id <> bb.vec_id),
scored AS (
  SELECT c.probe_id, c.vec_id,
    list_dot_product(pe.q, be.q) /
      (sqrt(list_dot_product(pe.q, pe.q)) * sqrt(list_dot_product(be.q, be.q)))
      AS cosine_sim
  FROM cand c
  JOIN e pe ON pe.vec_id = c.probe_id
  JOIN e be ON be.vec_id = c.vec_id),
topk AS (
  SELECT probe_id, vec_id, cosine_sim,
    ROW_NUMBER() OVER (PARTITION BY probe_id
      ORDER BY cosine_sim DESC, vec_id ASC) AS rk
  FROM scored)
SELECT probe_id, vec_id, cosine_sim FROM topk WHERE rk <= 5
${ord("probe_id", "vec_id")}""".trim

  /** Twin of Similarity.labelCentroids: per-(label, dim) exact integer
    * sums over the quantized embeddings; the mean is the same single
    * IEEE division both sides. */
  val embeddingCentroids: String = s"""
WITH e AS ($quantized2),
x AS (
  SELECT e2.label, e2.q, unnest(generate_series(1, len(e2.q))) AS i FROM e e2)
SELECT label, CAST(i - 1 AS INT) AS dim,
  CAST(SUM(CAST(q[CAST(i AS INT)] AS BIGINT)) AS BIGINT) AS sum_q,
  CAST(COUNT(*) AS BIGINT) AS n_vecs,
  CAST(SUM(CAST(q[CAST(i AS INT)] AS BIGINT)) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
    AS mean_q
FROM x
GROUP BY label, dim
${ord("label", "dim")}""".trim

  /** Twin of Similarity.semanticDedup: identical IVF cell assignment
    * (same argmax + tie-break as ivfTopK), within-cell ≥-threshold
    * cosine pairs, transitive closure via the same recursive-CTE
    * reachability as dedupClusters, anti-join of the non-canonical
    * members. */
  val semanticDedup: String = s"""
WITH RECURSIVE
e AS ($quantized),
cents AS (SELECT vec_id AS cent_id, q AS cq FROM e WHERE vec_id % 50 = 0),
cos_ec AS (
  SELECT e.vec_id, e.q, c.cent_id,
    list_dot_product(e.q, c.cq) /
      (sqrt(list_dot_product(e.q, e.q)) * sqrt(list_dot_product(c.cq, c.cq))) AS cs
  FROM e, cents c),
assign AS (
  SELECT vec_id, cent_id AS cell, q FROM (
    SELECT vec_id, cent_id, q,
      ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cs DESC, cent_id ASC) AS rk
    FROM cos_ec) WHERE rk = 1),
pairs AS (
  SELECT a.vec_id AS a_id, b.vec_id AS b_id
  FROM assign a JOIN assign b ON a.cell = b.cell AND a.vec_id < b.vec_id
  WHERE list_dot_product(a.q, b.q) /
      (sqrt(list_dot_product(a.q, a.q)) * sqrt(list_dot_product(b.q, b.q))) >= 0.4),
edges AS (
  SELECT a_id AS id, b_id AS nbr FROM pairs
  UNION SELECT b_id, a_id FROM pairs),
reach(id, r) AS (
  SELECT DISTINCT id, id FROM edges
  UNION
  SELECT e2.id, reach.r FROM edges e2 JOIN reach ON e2.nbr = reach.id),
losers AS (
  SELECT id FROM reach GROUP BY id HAVING id <> MIN(r))
SELECT vec_id, label FROM embeddings
WHERE vec_id NOT IN (SELECT id FROM losers)
${ord("vec_id")}""".trim

  /** Twin of Similarity.ivfPqResidualTopK (m=4, nprobe=3, centroid
    * stride 50, codebook stride 37, probes %100): residuals via
    * element-wise list subtraction, codebook codes = vec_id-rank
    * positions, per-subspace argmin with (d ASC, code ASC) tie-break,
    * per-(probe, probed-cell) residual block distances summed over the
    * m subspaces — all exact integer arithmetic. */
  val ivfPqResidual: String = s"""
WITH e AS ($quantized),
cents AS (SELECT vec_id AS cent_id, q AS cq FROM e WHERE vec_id % 50 = 0),
cos_ec AS (
  SELECT e.vec_id, e.q, c.cent_id,
    list_dot_product(e.q, c.cq) /
      (sqrt(list_dot_product(e.q, e.q)) * sqrt(list_dot_product(c.cq, c.cq))) AS cs
  FROM e, cents c),
assign AS (
  SELECT vec_id, cent_id AS cell, q FROM (
    SELECT vec_id, cent_id, q,
      ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cs DESC, cent_id ASC) AS rk
    FROM cos_ec) WHERE rk = 1),
resid AS (
  SELECT a.vec_id, a.cell,
    list_transform(list_zip(a.q, c.cq), s -> s[1] - s[2]) AS r
  FROM assign a JOIN cents c ON a.cell = c.cent_id),
bks AS (
  SELECT ROW_NUMBER() OVER (ORDER BY vec_id ASC) - 1 AS code, r
  FROM resid WHERE vec_id % 37 = 0),
js AS (SELECT unnest(generate_series(0, 3)) AS j),
encd AS (
  SELECT v.vec_id, v.cell, js.j, b.code,
    list_dot_product(
      v.r[(js.j*(len(v.r)//4)+1):((js.j+1)*(len(v.r)//4))],
      v.r[(js.j*(len(v.r)//4)+1):((js.j+1)*(len(v.r)//4))])
    - 2*list_dot_product(
      v.r[(js.j*(len(v.r)//4)+1):((js.j+1)*(len(v.r)//4))],
      b.r[(js.j*(len(b.r)//4)+1):((js.j+1)*(len(b.r)//4))])
    + list_dot_product(
      b.r[(js.j*(len(b.r)//4)+1):((js.j+1)*(len(b.r)//4))],
      b.r[(js.j*(len(b.r)//4)+1):((js.j+1)*(len(b.r)//4))]) AS d
  FROM resid v, js, bks b),
codes AS (
  SELECT vec_id, cell, j, code FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id, j
      ORDER BY d ASC, code ASC) AS rk FROM encd) WHERE rk = 1),
p AS (SELECT vec_id AS probe_id, q AS pq FROM e WHERE vec_id % 100 = 0),
pc AS (
  SELECT p.probe_id, c.cent_id, p.pq, c.cq,
    list_dot_product(p.pq, c.cq) /
      (sqrt(list_dot_product(p.pq, p.pq)) * sqrt(list_dot_product(c.cq, c.cq))) AS cs
  FROM p, cents c),
pcells AS (
  SELECT probe_id, cent_id AS cell,
    list_transform(list_zip(pq, cq), s -> s[1] - s[2]) AS pr
  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY probe_id
    ORDER BY cs DESC, cent_id ASC) AS rk FROM pc) WHERE rk <= 3),
cand AS (
  SELECT pl.probe_id, co.vec_id, co.j,
    list_dot_product(
      pl.pr[(co.j*(len(pl.pr)//4)+1):((co.j+1)*(len(pl.pr)//4))],
      pl.pr[(co.j*(len(pl.pr)//4)+1):((co.j+1)*(len(pl.pr)//4))])
    - 2*list_dot_product(
      pl.pr[(co.j*(len(pl.pr)//4)+1):((co.j+1)*(len(pl.pr)//4))],
      b.r[(co.j*(len(b.r)//4)+1):((co.j+1)*(len(b.r)//4))])
    + list_dot_product(
      b.r[(co.j*(len(b.r)//4)+1):((co.j+1)*(len(b.r)//4))],
      b.r[(co.j*(len(b.r)//4)+1):((co.j+1)*(len(b.r)//4))]) AS d
  FROM pcells pl JOIN codes co USING (cell) JOIN bks b ON co.code = b.code
  WHERE pl.probe_id <> co.vec_id),
adist AS (
  SELECT probe_id, vec_id, CAST(SUM(d) AS BIGINT) AS adist
  FROM cand GROUP BY probe_id, vec_id),
topk AS (
  SELECT probe_id, vec_id, adist FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY probe_id
      ORDER BY adist ASC, vec_id ASC) AS rk FROM adist) WHERE rk <= 5)
SELECT probe_id, vec_id, adist FROM topk
${ord("probe_id", "vec_id")}""".trim

  /** Shared CTE chain for the kNN-graph twins: the semanticDedup cell
    * assignment, within-cell pairs both directions, per-vector
    * (cosine DESC, nbr ASC) top-5 window → `knng`. */
  private val knnChain: String = s"""
WITH e AS ($quantized),
cents AS (SELECT vec_id AS cent_id, q AS cq FROM e WHERE vec_id % 50 = 0),
cos_ec AS (
  SELECT e.vec_id, e.q, c.cent_id,
    list_dot_product(e.q, c.cq) /
      (sqrt(list_dot_product(e.q, e.q)) * sqrt(list_dot_product(c.cq, c.cq))) AS cs
  FROM e, cents c),
assign AS (
  SELECT vec_id, cent_id AS cell, q FROM (
    SELECT vec_id, cent_id, q,
      ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cs DESC, cent_id ASC) AS rk
    FROM cos_ec) WHERE rk = 1),
scored AS (
  SELECT a.vec_id, b.vec_id AS nbr_id,
    list_dot_product(a.q, b.q) /
      (sqrt(list_dot_product(a.q, a.q)) * sqrt(list_dot_product(b.q, b.q)))
      AS cosine_sim
  FROM assign a JOIN assign b ON a.cell = b.cell AND a.vec_id <> b.vec_id),
rk AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
    ORDER BY cosine_sim DESC, nbr_id ASC) AS nn_rank FROM scored),
knng AS (
  SELECT vec_id, nbr_id, nn_rank, cosine_sim FROM rk WHERE nn_rank <= 5)""".trim

  /** Twin of Similarity.knnGraph. */
  val knnGraph: String = s"""
$knnChain
SELECT vec_id, nbr_id, nn_rank, cosine_sim FROM knng
${ord("vec_id", "nbr_id")}""".trim

  /** Twin of Similarity.knnLabelAccuracy: knng chain + neighbor-label
    * votes, (v DESC, label ASC) majority window, per-label rollup. */
  val knnLabelAccuracy: String = s"""
$knnChain,
votes AS (
  SELECT g.vec_id, l.label AS nbr_label, CAST(COUNT(*) AS BIGINT) AS v
  FROM knng g JOIN embeddings l ON g.nbr_id = l.vec_id
  GROUP BY g.vec_id, l.label),
pred AS (
  SELECT vec_id, nbr_label AS pred FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
      ORDER BY v DESC, nbr_label ASC) AS rk FROM votes) WHERE rk = 1),
acc AS (
  SELECT l.label, CAST(COUNT(*) AS BIGINT) AS n_vecs,
    CAST(SUM(CASE WHEN p.pred = l.label THEN 1 ELSE 0 END) AS BIGINT)
      AS n_correct
  FROM pred p JOIN embeddings l ON p.vec_id = l.vec_id
  GROUP BY l.label)
SELECT label, n_vecs, n_correct,
  CAST(n_correct AS DOUBLE) / CAST(n_vecs AS DOUBLE) AS accuracy
FROM acc
${ord("label")}""".trim

  /** Twin of Similarity.knnPageRank(iters=5): the knng chain +
    * out-degrees + 5 unrolled integer-PageRank iterations (scores in
    * int64 10⁻¹² units, integral divisions — bit-identical to the
    * engine's trajectory). */
  val knnPageRank: String = {
    val S = "1000000000000"
    val rounds = (1 to 5).map { i =>
      s"""
c$i AS (
  SELECT g.nbr_id AS dst, CAST(SUM(s.sc // od.deg) AS BIGINT) AS i
  FROM knng g JOIN od ON g.vec_id = od.src JOIN s${i - 1} s ON g.vec_id = s.id
  GROUP BY g.nbr_id),
s$i AS (
  SELECT od.src AS id,
    CAST(($S * 15 // 100) // nn.n + (85 * COALESCE(c.i, 0)) // 100 AS BIGINT) AS sc
  FROM od CROSS JOIN nn LEFT JOIN c$i c ON od.src = c.dst)""".trim
    }.mkString(",\n")
    s"""
$knnChain,
od AS (SELECT vec_id AS src, CAST(COUNT(*) AS BIGINT) AS deg
  FROM knng GROUP BY vec_id),
nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM od),
s0 AS (SELECT od.src AS id, CAST($S // nn.n AS BIGINT) AS sc FROM od, nn),
$rounds
SELECT id AS vec_id, sc AS q_rank,
  CAST(sc AS DOUBLE) / $S AS pagerank
FROM s5
${ord("vec_id")}""".trim
  }

  val nearDupEmbeddings: String = s"""
WITH e AS ($quantized),
a AS (SELECT vec_id AS a_id, q AS qa FROM e WHERE vec_id % 10 = 0),
b AS (SELECT vec_id AS b_id, q AS qb FROM e),
scored AS (
  SELECT a_id, b_id,
    list_dot_product(qa, qb) /
      (sqrt(list_dot_product(qa, qa)) * sqrt(list_dot_product(qb, qb)))
      AS cosine_sim
  FROM a, b WHERE a_id < b_id)
SELECT a_id, b_id, cosine_sim FROM scored WHERE cosine_sim >= 0.4
${ord("a_id", "b_id")}""".trim
}
