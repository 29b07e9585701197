package graft.analytics

/** Dedup-family oracle twins: exact / MinHash / SimHash / n-gram
  * Jaccard tiers, decontamination, line/substring/boilerplate
  * cleanup, and the shared MinHash pair/cluster chains.
  *
  * Carved out of the former monolithic ExtOracle object (round 8);
  * mixed back into `ExtOracle`, whose name every gate entry keeps
  * using. Parity rules in the ExtOracle scaladoc. */
trait DedupOracle extends CoreOracle {

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

  val dedupExact: String = s"""
SELECT sha256(text) AS text_sha,
  MIN(doc_id) AS keep_id,
  CAST(COUNT(*) AS BIGINT) AS n_copies
FROM documents
GROUP BY text_sha
${ord("text_sha")}""".trim

  /** Twin of the normalize→exact-dedup composition: the normalizeText
    * canonical form (NFC + case fold + whitespace collapse) hashed by
    * the dedupExact rule. */
  val dedupNormalized: String = s"""
WITH n AS (
  SELECT doc_id,
    trim(regexp_replace(lower(nfc_normalize(text)), '\\s+', ' ', 'g'))
      AS text
  FROM documents)
SELECT sha256(text) AS text_sha,
  MIN(doc_id) AS keep_id,
  CAST(COUNT(*) AS BIGINT) AS n_copies
FROM n
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
  protected lazy val minhashAgreeChain: String = {
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

  /** Twin of Dedup.dupGraphTransitivity over the portable-minhash pair
    * set: undirected fan-out, x<y wedge join on the center, closure
    * probe against the edge key, one global rollup. */
  val dupGraphTransitivity: String = s"""$minhashAgreeChain,
tg_e AS (
  SELECT a_id, b_id FROM agree WHERE CAST(n_agree AS DOUBLE) / 32 >= 0.5),
tg_u AS (
  SELECT a_id AS c, b_id AS n FROM tg_e
  UNION ALL SELECT b_id AS c, a_id AS n FROM tg_e),
tg_w AS (
  SELECT ux.c, ux.n AS x, uy.n AS y
  FROM tg_u ux JOIN tg_u uy ON ux.c = uy.c AND ux.n < uy.n),
tg_c AS (
  SELECT w.c, w.x, w.y, e.a_id IS NOT NULL AS closed
  FROM tg_w w LEFT JOIN tg_e e ON e.a_id = w.x AND e.b_id = w.y),
tg_a AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_wedges,
    CAST(SUM(CASE WHEN closed THEN 1 ELSE 0 END) AS BIGINT)
      AS n_closed_wedges
  FROM tg_c),
tg_n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_edges FROM tg_e)
SELECT n.n_edges, a.n_wedges, a.n_closed_wedges,
  CAST(a.n_closed_wedges // 3 AS BIGINT) AS n_triangles,
  CASE WHEN a.n_wedges = 0 THEN NULL
       ELSE CAST(a.n_closed_wedges AS DOUBLE) / CAST(a.n_wedges AS DOUBLE)
  END AS transitivity
FROM tg_a a, tg_n n""".trim

  /** Twin of Dedup.decontaminateFuzzy(benchmark = doc_id%97): the
    * corpus×benchmark candidate space is a subset of the self-join
    * chain's `agree` table (same signatures, same buckets), plus the
    * self-match arm — a benchmark doc present in the corpus matches
    * itself at est 1.0, which the chain's a<b candidates exclude, so
    * benchmark membership drops explicitly. */
  val decontaminateFuzzy: String = s"""$minhashAgreeChain,
fz_cont AS (
  SELECT a_id AS doc_id FROM agree
  WHERE b_id % 97 = 0 AND CAST(n_agree AS DOUBLE) / 32 >= 0.5
  UNION
  SELECT b_id FROM agree
  WHERE a_id % 97 = 0 AND CAST(n_agree AS DOUBLE) / 32 >= 0.5
  UNION
  SELECT doc_id FROM documents WHERE doc_id % 97 = 0)
SELECT d.doc_id, d.lang, d.source FROM documents d
WHERE d.doc_id NOT IN (SELECT doc_id FROM fz_cont)
${ord("doc_id")}""".trim

  /** Twin of Dedup.clusterSizeHistogram over MinHash-keyed clusters:
    * cluster sizes from mh_clusters, then the size histogram. */
  val clusterSizeHistogram: String = s"""$minhashKeyedChain,
csz AS (
  SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS cluster_size
  FROM mh_clusters GROUP BY cluster_id)
SELECT cluster_size, CAST(COUNT(*) AS BIGINT) AS n_clusters,
  cluster_size * CAST(COUNT(*) AS BIGINT) AS n_docs
FROM csz GROUP BY cluster_size
${ord("cluster_size")}""".trim

  /** Twin of Dedup.dedupCrossSource over the MinHash pair tier:
    * unordered source pair per agree-pair (LEAST/GREATEST), pair
    * count + distinct involved docs via the union-all explode. */
  val dedupCrossSource: String = s"""$minhashAgreeChain,
xp AS (
  SELECT LEAST(da.source, db.source) AS source_a,
         GREATEST(da.source, db.source) AS source_b,
         ag.a_id, ag.b_id
  FROM agree ag
  JOIN documents da ON da.doc_id = ag.a_id
  JOIN documents db ON db.doc_id = ag.b_id
  WHERE CAST(ag.n_agree AS DOUBLE) / 32 >= 0.5),
xnp AS (
  SELECT source_a, source_b, CAST(COUNT(*) AS BIGINT) AS n_pairs
  FROM xp GROUP BY source_a, source_b),
xnd AS (
  SELECT source_a, source_b, CAST(COUNT(*) AS BIGINT) AS n_docs_involved
  FROM (SELECT DISTINCT source_a, source_b, d FROM (
          SELECT source_a, source_b, a_id AS d FROM xp
          UNION ALL SELECT source_a, source_b, b_id AS d FROM xp) u) v
  GROUP BY source_a, source_b)
SELECT xnp.source_a, xnp.source_b, xnp.n_pairs, xnd.n_docs_involved
FROM xnp JOIN xnd USING (source_a, source_b)
${ord("source_a", "source_b")}""".trim

  /** minhashAgreeChain + est ≥ 0.5 pairs + recursive component closure
    * + per-doc split key `k` = COALESCE(cluster_id, doc_id) in CTE
    * `keyed` — the MinHash analog of the exact-tier keyed chain. The
    * split/fold/cluster gate consumers ride THIS tier (round-6
    * re-point): ScaleProbe measures the exact shingle self-join as the
    * one super-linear candidate path under growing duplication while
    * MinHash band-buckets stay ~linear, so the sketch tier is the
    * production feeder; the exact chain remains the verification twin
    * via `ngram_jaccard` / `dedup_corpus`. */
  protected lazy val minhashKeyedChain: String = s"""$minhashAgreeChain,
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

  /** Twin of Dedup.sourceResemblance: the agree chain's per-doc
    * signed signature rows min-rolled per (source, slot), pairwise
    * agreement per unordered source pair. */
  val sourceResemblance: String = s"""$minhashAgreeChain,
sr_s AS (
  SELECT d.source, s.i, MIN(s.v) AS v
  FROM sigrows s JOIN documents d ON s.doc_id = d.doc_id
  GROUP BY d.source, s.i),
sr_p AS (
  SELECT a.source AS source_a, b.source AS source_b,
    SUM(CASE WHEN a.v = b.v THEN 1 ELSE 0 END) AS n_agree
  FROM sr_s a JOIN sr_s b ON a.i = b.i AND a.source < b.source
  GROUP BY a.source, b.source)
SELECT source_a, source_b, CAST(n_agree AS DOUBLE) / 32 AS est_jaccard
FROM sr_p
${ord("source_a", "source_b")}""".trim

  /** Twin of Dedup.contaminationReport (benchmark = doc_id%97, whole
    * corpus incl. the benchmark itself — a verbatim leak matches at
    * 1.0): the decontaminate twin's string-shingle chain, flipped to
    * per-bench attribution with the integer threshold predicate. */
  val contaminationReport: String = s"""
WITH cr_ws AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w FROM documents),
cr_shl AS (
  SELECT doc_id, list_distinct(list_transform(
    generate_series(1, greatest(len(w) - 7, 1)),
    i -> array_to_string(list_slice(w, i, i + 7), ' '))) AS sh
  FROM cr_ws),
cr_b AS (
  SELECT doc_id AS bench_id, len(sh) AS bn_sh, unnest(sh) AS s
  FROM cr_shl WHERE doc_id % 97 = 0),
cr_c AS (SELECT doc_id, unnest(sh) AS s FROM cr_shl),
cr_o AS (
  SELECT c.doc_id, b.bench_id, MIN(b.bn_sh) AS bn_sh,
    CAST(COUNT(*) AS BIGINT) AS inter
  FROM cr_c c JOIN cr_b b ON c.s = b.s
  GROUP BY c.doc_id, b.bench_id),
cr_f AS (SELECT * FROM cr_o WHERE inter * 100 >= bn_sh * 50)
SELECT bench_id, CAST(MIN(bn_sh) AS INT) AS n_sh,
  CAST(COUNT(*) AS BIGINT) AS n_contaminating_docs,
  MAX(CAST(inter AS DOUBLE) / CAST(bn_sh AS DOUBLE)) AS max_overlap
FROM cr_f GROUP BY bench_id
${ord("bench_id")}""".trim

  /** Twin of the streaming near-dup ingest gate (CorpusStream
    * .nearDupVsCorpus): the portable-minhash agree chain restricted to
    * stream(%5=0)-vs-standing(%5≠0) pairs — an arriving doc survives
    * iff NO standing doc shares a band bucket with signature agreement
    * ≥ 0.5 (the chain's a<b candidates cover both orientations, so
    * both WHERE arms are needed). */
  val streamNearDupIngest: String = s"""$minhashAgreeChain,
sn_cont AS (
  SELECT a_id AS doc_id FROM agree
  WHERE a_id % 5 = 0 AND b_id % 5 <> 0
    AND CAST(n_agree AS DOUBLE) / 32 >= 0.5
  UNION
  SELECT b_id FROM agree
  WHERE b_id % 5 = 0 AND a_id % 5 <> 0
    AND CAST(n_agree AS DOUBLE) / 32 >= 0.5)
SELECT d.doc_id, d.lang, d.source FROM documents d
WHERE d.doc_id % 5 = 0
  AND d.doc_id NOT IN (SELECT doc_id FROM sn_cont)
${ord("doc_id")}""".trim

  /** Twin of the composed streaming ingest gate (CorpusStream
    * .fullIngest): the %5=0 arrivals pass the gopherRules shape
    * predicate (inlined verbatim from CoreOracle.streamQualityFilter's
    * chain — the engine's expression parity with gopherRules is
    * spec-pinned), then drop on exact text match against the standing
    * corpus, then drop on the fuzzy (agree-chain) tier vs standing —
    * the three admission tiers as one statement. */
  val streamFullIngest: String = s"""$minhashAgreeChain,
fi_sig AS (
  SELECT doc_id, text, string_split_regex(trim(text), '\\s+') AS w
  FROM documents WHERE doc_id % 5 = 0),
fi_pass AS (
  SELECT doc_id FROM fi_sig
  WHERE CAST(len(w) AS INT) BETWEEN 20 AND 100000
    AND (CAST(length(array_to_string(w, '')) AS DOUBLE)
         / CAST(len(w) AS DOUBLE)) BETWEEN 3.0 AND 10.0
    AND CAST(len(regexp_extract_all(text, '#|\\.\\.\\.')) AS DOUBLE)
         / CAST(len(w) AS DOUBLE) <= 0.1
    AND CAST(len(list_filter(w, x -> regexp_matches(x, '[A-Za-z]'))) AS DOUBLE)
         / CAST(len(w) AS DOUBLE) >= 0.8),
fi_exact AS (
  SELECT DISTINCT a.doc_id FROM documents a JOIN documents b
  ON a.text = b.text AND a.doc_id % 5 = 0 AND b.doc_id % 5 <> 0),
fi_fuzzy AS (
  SELECT a_id AS doc_id FROM agree
  WHERE a_id % 5 = 0 AND b_id % 5 <> 0
    AND CAST(n_agree AS DOUBLE) / 32 >= 0.5
  UNION
  SELECT b_id FROM agree
  WHERE b_id % 5 = 0 AND a_id % 5 <> 0
    AND CAST(n_agree AS DOUBLE) / 32 >= 0.5)
SELECT d.doc_id AS doc_id, d.lang, d.source FROM documents d
JOIN fi_pass p ON d.doc_id = p.doc_id
WHERE d.doc_id NOT IN (SELECT doc_id FROM fi_exact)
  AND d.doc_id NOT IN (SELECT doc_id FROM fi_fuzzy)
ORDER BY d.doc_id ASC NULLS FIRST""".trim

  /** Twin of Dedup.dedupCorpusVerified: the portable-minhash candidate
    * chain (est ≥ 0.5), the exact Levenshtein verify filter over
    * 200-char trimmed prefixes (dist·100 ≤ maxLen·30 — the integer
    * predicate, no doubles), the recursive component closure over the
    * VERIFIED pairs only, and the survivor anti-join — the
    * candidates→verify→prune production chain recomputed end-to-end
    * as one statement. */
  val dedupCorpusVerified: String = s"""$minhashAgreeChain,
dv_p AS (
  SELECT a_id, b_id FROM agree
  WHERE CAST(n_agree AS DOUBLE) / 32 >= 0.5),
dv_tx AS (
  SELECT doc_id, substr(trim(text), 1, 200) AS t,
    CAST(length(substr(trim(text), 1, 200)) AS INT) AS len
  FROM documents),
dv_v AS (
  SELECT p.a_id, p.b_id
  FROM dv_p p
  JOIN dv_tx ta ON ta.doc_id = p.a_id
  JOIN dv_tx tb ON tb.doc_id = p.b_id
  WHERE levenshtein(ta.t, tb.t) * 100 <= greatest(ta.len, tb.len) * 30),
dv_e AS (
  SELECT a_id AS id, b_id AS nbr FROM dv_v
  UNION SELECT b_id, a_id FROM dv_v),
dv_r(id, r) AS (
  SELECT DISTINCT id, id FROM dv_e
  UNION
  SELECT e.id, dv_r.r FROM dv_e e JOIN dv_r ON e.nbr = dv_r.id),
dv_losers AS (
  SELECT id AS doc_id FROM dv_r GROUP BY id HAVING id <> MIN(r))
SELECT d.doc_id, d.lang, d.source FROM documents d
WHERE d.doc_id NOT IN (SELECT doc_id FROM dv_losers)
${ord("doc_id")}""".trim

  /** Twin of Dedup.dedupKeepBest over MinHash-keyed clusters: the same
    * cluster chain as dedupClusters, the qualityScore expression
    * ·10⁶-quantized, rank within cluster (q6 DESC, doc_id ASC), every
    * rank>1 member dropped. */
  val dedupKeepBest: String = s"""$minhashKeyedChain,
kqw AS (
  SELECT doc_id, text, string_split_regex(trim(text), '\\s+') AS wq
  FROM documents),
kq AS (
  SELECT doc_id,
    CAST(round(round((CAST(len(list_distinct(wq)) AS DOUBLE) / CAST(len(wq) AS DOUBLE)) * 0.5
      + least(CAST(len(wq) AS DOUBLE) / 64.0, 1.0) * 0.3
      + (CASE WHEN ((CAST(length(text) AS DOUBLE) - (CAST(len(wq) AS DOUBLE) - 1))
                    / CAST(len(wq) AS DOUBLE)) BETWEEN 3.0 AND 9.0
              THEN 1.0 ELSE 0.5 END) * 0.2, 6) * 1000000) AS BIGINT) AS q6
  FROM kqw),
sl AS (
  SELECT c.doc_id, c.cluster_id, kq.q6
  FROM mh_clusters c JOIN kq ON kq.doc_id = c.doc_id),
bestrk AS (
  SELECT doc_id, row_number() OVER (
    PARTITION BY cluster_id ORDER BY q6 DESC, doc_id ASC) AS r
  FROM sl),
kb_losers AS (SELECT doc_id FROM bestrk WHERE r > 1)
SELECT d.doc_id, d.lang, d.source FROM documents d
WHERE d.doc_id NOT IN (SELECT doc_id FROM kb_losers)
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

  /** Twin of Dedup.winnowCandidates(w=3, window=4, minShared=2):
    * POSITIONAL (non-distinct) 3-token shingles, polyhash64 via the
    * power-sum decomposition, hashes re-signed BIGINT before the MIN
    * (Spark mins signed longs), per-doc window minimum over
    * [pos, pos+3] with full windows only (short docs keep pos 1 — the
    * global min), distinct value set, fp self-join with pair counts
    * ≥ 2. */
  val winnowCandidates: String = {
    val pow64 = "CAST('18446744073709551616' AS HUGEINT)"
    val half = "CAST('9223372036854775808' AS HUGEINT)"
    s"""
WITH RECURSIVE
ws AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w FROM documents),
shp AS (SELECT doc_id, list_transform(generate_series(1, greatest(len(w)-2, 1)),
  i -> array_to_string(list_slice(w, i, i+2), ' ')) AS sh FROM ws),
pw(kk, p) AS (SELECT 0, CAST(1 AS HUGEINT)
  UNION ALL SELECT kk+1, (p*1000003) % $pow64 FROM pw WHERE kk < 255),
pl AS MATERIALIZED (SELECT list(p ORDER BY kk) AS ps FROM pw),
srow AS (SELECT doc_id, len(sh) AS n_sh, generate_subscripts(sh, 1) AS pos,
  unnest(sh) AS s FROM shp),
hraw AS (
  SELECT doc_id, n_sh, pos,
    COALESCE(list_sum(list_transform(string_split_regex(s, ''),
      (c, i) -> ord(c) * pl.ps[strlen(s) - i + 1])), 0) % $pow64 AS hu
  FROM srow, pl),
hsig AS (SELECT doc_id, n_sh, pos,
  CAST(CASE WHEN hu >= $half THEN hu - $pow64 ELSE hu END AS BIGINT) AS h
  FROM hraw),
mw AS (SELECT doc_id, n_sh, pos,
  MIN(h) OVER (PARTITION BY doc_id ORDER BY pos
    ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp
  FROM hsig),
fps AS (SELECT DISTINCT doc_id, fp FROM mw
  WHERE pos - 1 <= greatest(n_sh - 4, 0))
SELECT a.doc_id AS a_id, b.doc_id AS b_id,
  CAST(COUNT(*) AS BIGINT) AS n_shared
FROM fps a JOIN fps b ON a.fp = b.fp AND a.doc_id < b.doc_id
GROUP BY a.doc_id, b.doc_id
HAVING COUNT(*) >= 2
${ord("a_id", "b_id")}""".trim
  }

  // ---- similarity --------------------------------------------------
}
