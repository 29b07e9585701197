package graft.analytics

/** Sampling / splitting / packing / curation oracle twins. Split
  * and curation twins ride the MinHash cluster chain
  * (DedupOracle) and the language-ID core (TextOracle).
  *
  * Carved out of the former monolithic ExtOracle object (round 8);
  * mixed back into `ExtOracle`, whose name every gate entry keeps
  * using. Parity rules in the ExtOracle scaladoc. */
trait SamplingOracle extends CoreOracle with TextOracle with DedupOracle {

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

  /** Twin of Sampling.systematicSample(every = 500): the same
    * two-level exclusive token prefix in (knuth-bucket-64, doc_id)
    * order — here one global window, same total order — and the
    * integer span-covers-a-multiple predicate. */
  /** Twin of Sampling.weightedSample (A-ES, k=50, weight = token
    * count): the Knuth-bucket uniform u = (bucket+1)/10⁶, the
    * ·10⁶-quantized ln, ONE correctly-rounded double division qln/w
    * per row (identical in any IEEE engine), top-50 by
    * (key DESC, doc_id ASC). */
  val weightedSample: String = s"""
WITH ws_w AS (
  SELECT doc_id, lang, source,
    CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS weight
  FROM documents),
ws_k AS (
  SELECT *,
    CAST(round(ln((((doc_id % 1000003) * 2654435761) % 1000000 + 1)
        / 1000000.0) * 1000000) AS BIGINT) AS qln
  FROM ws_w),
ws_r AS (
  SELECT doc_id, lang, source, weight,
    CAST(qln AS DOUBLE) / CAST(weight AS DOUBLE) AS es_key,
    ROW_NUMBER() OVER (
      ORDER BY CAST(qln AS DOUBLE) / CAST(weight AS DOUBLE) DESC,
        doc_id ASC) AS sample_rank
  FROM ws_k)
SELECT doc_id, lang, source, weight, es_key,
  CAST(sample_rank AS BIGINT) AS sample_rank
FROM ws_r WHERE sample_rank <= 50
${ord("doc_id")}""".trim

  /** Twin of Sampling.weightedSampleByGroup (k=10 per source, weight =
    * token count): the same A-ES key chain, rank windowed PER SOURCE. */
  val weightedSampleBySource: String = s"""
WITH wg_w AS (
  SELECT doc_id, lang, source,
    CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS weight
  FROM documents),
wg_k AS (
  SELECT *,
    CAST(round(ln((((doc_id % 1000003) * 2654435761) % 1000000 + 1)
        / 1000000.0) * 1000000) AS BIGINT) AS qln
  FROM wg_w),
wg_r AS (
  SELECT doc_id, lang, source, weight,
    CAST(qln AS DOUBLE) / CAST(weight AS DOUBLE) AS es_key,
    ROW_NUMBER() OVER (PARTITION BY source
      ORDER BY CAST(qln AS DOUBLE) / CAST(weight AS DOUBLE) DESC,
        doc_id ASC) AS sample_rank
  FROM wg_k)
SELECT doc_id, lang, source, weight, es_key,
  CAST(sample_rank AS BIGINT) AS sample_rank
FROM wg_r WHERE sample_rank <= 10
${ord("doc_id")}""".trim

  /** Twin of Sampling.epochsReport (weights src0:6 src1:3 src2:1,
    * budget 300000): |sources|-row token totals, the VALUES weight
    * table left-joined, integer floor division, one double division. */
  val epochsReport: String = s"""
WITH ep_d AS (
  SELECT source,
    CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_tokens
  FROM documents),
ep_a AS (
  SELECT source, CAST(SUM(n_tokens) AS BIGINT) AS n_tokens_available
  FROM ep_d GROUP BY source),
ep_w(source, w) AS (
  VALUES ('src0', CAST(6 AS BIGINT)), ('src1', CAST(3 AS BIGINT)),
    ('src2', CAST(1 AS BIGINT))),
ep_r AS (
  SELECT a.source, COALESCE(w.w, 0) AS w, a.n_tokens_available,
    (COALESCE(w.w, 0) * 300000) // 10 AS n_tokens_requested
  FROM ep_a a LEFT JOIN ep_w w USING (source))
SELECT source, w, n_tokens_available,
  CAST(n_tokens_requested AS BIGINT) AS n_tokens_requested,
  CASE WHEN n_tokens_available = 0 THEN NULL
       ELSE CAST(n_tokens_requested AS DOUBLE)
            / CAST(n_tokens_available AS DOUBLE) END AS epochs
FROM ep_r
${ord("source")}""".trim

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

  /** Twin of Sampling.negativeSamples(numNeg=2): contiguous doc_id-
    * order positions, negative j at (pos + j·⌊N/3⌋) mod N, resolved
    * back to ids by a position equi-join. The window rank is the
    * test-scale stand-in for the range-exchange + offsets position
    * table (same total order). */
  val negativeSamples: String = s"""
WITH ids AS (
  SELECT doc_id, row_number() OVER (ORDER BY doc_id) - 1 AS pos
  FROM documents),
nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
neg AS (
  SELECT i.doc_id, CAST(t.j AS BIGINT) AS neg_rank,
    (i.pos + CAST(t.j AS BIGINT) * GREATEST(nn.n // 3, 1)) % nn.n AS neg_pos
  FROM ids i, nn, generate_series(1, 2) AS t(j)),
res AS (
  SELECT g.doc_id, g.neg_rank, i2.doc_id AS neg_doc_id
  FROM neg g JOIN ids i2 ON i2.pos = g.neg_pos)
SELECT doc_id, neg_rank, neg_doc_id FROM res
${ord("doc_id", "neg_rank")}""".trim

  /** Twin of Sampling.reshardReport(events.user_id, 8→9): rendezvous
    * argmax per key via the affine mix in mod-2⁶⁴ HUGEINT (user_id is
    * non-negative, so the signed/unsigned reinterpretation is the
    * identity), ranked (u DESC, s DESC) to match the engine's
    * struct-max tie rule; mod comparison on the same distinct keys. */
  val reshardReport: String = {
    val pow64 = "CAST('18446744073709551616' AS HUGEINT)"
    val gold = "CAST('11400714819323198485' AS HUGEINT)"
    s"""
WITH ks AS (SELECT DISTINCT CAST(user_id AS BIGINT) AS k FROM events),
kh AS (
  SELECT k,
    ((CAST(k AS HUGEINT) * 2135587861) % $pow64
      + ((CAST(k AS HUGEINT) * 2654435769) % CAST(4294967296 AS HUGEINT))
        * CAST(4294967296 AS HUGEINT)) % $pow64 AS h
  FROM ks),
fan AS (
  SELECT k, t.s,
    ((kh.h * (2*t.s + 1)) % $pow64
      + (t.s * $gold) % $pow64) % $pow64 AS u
  FROM kh, generate_series(0, 8) t(s)),
r8 AS (SELECT k, s AS rv8 FROM (
  SELECT k, s,
    ROW_NUMBER() OVER (PARTITION BY k ORDER BY u DESC, s DESC) AS r
  FROM fan WHERE s < 8) WHERE r = 1),
r9 AS (SELECT k, s AS rv9 FROM (
  SELECT k, s,
    ROW_NUMBER() OVER (PARTITION BY k ORDER BY u DESC, s DESC) AS r
  FROM fan) WHERE r = 1)
SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
  CAST(SUM(CASE WHEN r8.rv8 <> r9.rv9 THEN 1 ELSE 0 END) AS BIGINT)
    AS moved_rendezvous,
  CAST(SUM(CASE WHEN ks.k % 8 <> ks.k % 9 THEN 1 ELSE 0 END) AS BIGINT)
    AS moved_mod,
  CAST(SUM(CASE WHEN r8.rv8 <> r9.rv9 THEN 1 ELSE 0 END) AS DOUBLE)
    / CAST(COUNT(*) AS DOUBLE) AS frac_rendezvous,
  CAST(SUM(CASE WHEN ks.k % 8 <> ks.k % 9 THEN 1 ELSE 0 END) AS DOUBLE)
    / CAST(COUNT(*) AS DOUBLE) AS frac_mod
FROM ks JOIN r8 USING (k) JOIN r9 USING (k)""".trim
  }

  /** Twin of Sampling.temperatureWeights(alpha=0.7): per-source token
    * totals (length projection), q_pow = round(pow·10⁶) BIGINT — the
    * one quantized transcendental — shares and upsample factor as the
    * identical double-division expressions. */
  val temperatureWeights: String = s"""
WITH st AS (
  SELECT source,
    CAST(SUM(len(string_split_regex(trim(text), '\\s+'))) AS BIGINT)
      AS n_tokens
  FROM documents GROUP BY source),
wp AS (
  SELECT source, n_tokens,
    CAST(round(pow(CAST(n_tokens AS DOUBLE), 0.7) * 1000000) AS BIGINT)
      AS q_pow
  FROM st),
t AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS tot_tokens,
  CAST(SUM(q_pow) AS BIGINT) AS tot_pow FROM wp)
SELECT source, n_tokens,
  CAST(n_tokens AS DOUBLE) / CAST(tot_tokens AS DOUBLE) AS natural_share,
  q_pow,
  CAST(q_pow AS DOUBLE) / CAST(tot_pow AS DOUBLE) AS temp_share,
  (CAST(q_pow AS DOUBLE) / CAST(tot_pow AS DOUBLE))
    / (CAST(n_tokens AS DOUBLE) / CAST(tot_tokens AS DOUBLE))
    AS upsample_factor
FROM wp, t
${ord("source")}""".trim
}
