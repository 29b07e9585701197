package graft.analytics

/** Text-analysis oracle twins: stats, quality, LM scoring, BPE,
  * language ID, TF-IDF / BM25 retrieval, span corruption.
  *
  * Carved out of the former monolithic ExtOracle object (round 8);
  * mixed back into `ExtOracle`, whose name every gate entry keeps
  * using. Parity rules in the ExtOracle scaladoc. */
trait TextOracle extends CoreOracle {

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

  /** Twin of the calibration gate entry: quality (the dedupKeepBest
    * q6 expression) as the score, the 4-condition shape pass
    * (minWords 20 — streamQualityFilter's predicate) as the label,
    * integer bin assignment, HUGEINT bin sums, the fixed double
    * mean/rate/gap expressions. */
  val calibrationReport: String = s"""
WITH cb_w AS (
  SELECT doc_id, text, string_split_regex(trim(text), '\\s+') AS w
  FROM documents),
cb_q AS (
  SELECT doc_id,
    CAST(round(round((CAST(len(list_distinct(w)) AS DOUBLE) / CAST(len(w) AS DOUBLE)) * 0.5
      + least(CAST(len(w) AS DOUBLE) / 64.0, 1.0) * 0.3
      + (CASE WHEN ((CAST(length(text) AS DOUBLE) - (CAST(len(w) AS DOUBLE) - 1))
                    / CAST(len(w) AS DOUBLE)) BETWEEN 3.0 AND 9.0
              THEN 1.0 ELSE 0.5 END) * 0.2, 6) * 1000000) AS BIGINT) AS q6
  FROM cb_w),
cb_l AS (
  SELECT doc_id,
    (CAST(len(w) AS INT) BETWEEN 20 AND 100000
      AND (CAST(length(array_to_string(w, '')) AS DOUBLE)
           / CAST(len(w) AS DOUBLE)) BETWEEN 3.0 AND 10.0
      AND CAST(len(regexp_extract_all(text, '#|\\.\\.\\.')) AS DOUBLE)
           / CAST(len(w) AS DOUBLE) <= 0.1
      AND CAST(len(list_filter(w, x -> regexp_matches(x, '[A-Za-z]'))) AS DOUBLE)
           / CAST(len(w) AS DOUBLE) >= 0.8) AS y
  FROM cb_w),
cb_b AS (
  SELECT greatest(least((q.q6 * 10) // 1000000, 9), 0) AS bin, q.q6,
    CASE WHEN l.y THEN 1 ELSE 0 END AS pos
  FROM cb_q q JOIN cb_l l USING (doc_id)),
cb_a AS (
  SELECT bin, CAST(COUNT(*) AS BIGINT) AS n,
    SUM(CAST(q6 AS HUGEINT)) AS sq,
    CAST(SUM(pos) AS BIGINT) AS n_pos
  FROM cb_b GROUP BY bin)
SELECT CAST(bin AS INT) AS bin, n, n_pos,
  CAST(sq AS DOUBLE) / CAST(n AS DOUBLE) / 1000000 AS mean_score,
  CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE) AS frac_pos,
  abs(CAST(sq AS DOUBLE) / CAST(n AS DOUBLE) / 1000000
    - CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE)) AS abs_gap
FROM cb_a
${ord("bin")}""".trim

  /** Twin of TextAnalysis.lmQualityHeldOut (train = doc_id%5≠0, score
    * = doc_id%5=0): add-1-smoothed unigram log-probs under the TRAIN
    * distribution, OOV via the left join's null, the same quantized
    * int64 per-doc sums. */
  val lmHeldOut: String = s"""
WITH ho_tr AS (
  SELECT unnest(string_split_regex(trim(text), '\\s+')) AS tok
  FROM documents WHERE doc_id % 5 <> 0),
ho_tf AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS tf FROM ho_tr GROUP BY tok),
ho_st AS (SELECT CAST(SUM(tf) AS BIGINT) AS total,
  CAST(COUNT(*) AS BIGINT) AS vocab FROM ho_tf),
ho_sc AS (
  SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM (SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS tok
        FROM documents WHERE doc_id % 5 = 0)
  GROUP BY doc_id, tok),
ho_q AS (
  SELECT s.doc_id, s.cnt,
    CASE WHEN f.tf IS NULL THEN 1 ELSE 0 END AS oov,
    CAST(round(ln((COALESCE(f.tf, 0) + 1)
      / CAST(st.total + st.vocab + 1 AS DOUBLE)) * 1000000) AS BIGINT) AS q
  FROM ho_sc s LEFT JOIN ho_tf f USING (tok), ho_st st),
ho_agg AS (
  SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS n_tokens,
    CAST(SUM(cnt * q) AS BIGINT) AS sum_q_logprob,
    CAST(SUM(cnt * oov) AS BIGINT) AS n_oov
  FROM ho_q GROUP BY doc_id)
SELECT doc_id, n_tokens, sum_q_logprob, n_oov,
  CAST(sum_q_logprob AS DOUBLE) / CAST(n_tokens AS DOUBLE) / 1000000
    AS mean_logprob,
  CAST(n_oov AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS oov_rate
FROM ho_agg
${ord("doc_id")}""".trim

  /** Twin of TextAnalysis.lmQualityBuckets: the lmQuality chain
    * collapsed to one quantized long per doc, per-source weighted
    * quantile_cont tertile cuts (the pin_q6 interpolation contract),
    * HUGEINT moments, the eventAnomaly z expressions, scan-side CASE
    * bucketing. */
  val lmQualityBuckets: String = s"""
WITH toks AS (
  SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS tok
  FROM documents),
freqs AS (
  SELECT tok, CAST(COUNT(*) AS BIGINT) AS tf FROM toks GROUP BY tok),
tot AS (SELECT CAST(SUM(tf) AS BIGINT) AS total FROM freqs),
scored AS (
  SELECT t.doc_id,
    CAST(round(ln(CAST(f.tf AS DOUBLE) / CAST(tot.total AS DOUBLE))
      * 1000000) AS BIGINT) AS q
  FROM toks t JOIN freqs f ON t.tok = f.tok, tot),
perdoc AS (
  SELECT doc_id,
    CAST(round(CAST(SUM(q) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE))
      AS BIGINT) AS q_doc
  FROM scored GROUP BY doc_id),
lqs AS (
  SELECT p.doc_id, d.source, p.q_doc
  FROM perdoc p JOIN documents d USING (doc_id)),
fcnt AS (
  SELECT source, q_doc, CAST(COUNT(*) AS BIGINT) AS f
  FROM lqs GROUP BY source, q_doc),
cuts AS (
  SELECT source,
    quantile_cont(q_doc, 0.3333333333333333) AS cut_lo,
    quantile_cont(q_doc, 0.6666666666666666) AS cut_hi,
    CAST(COUNT(*) AS BIGINT) AS n_docs,
    SUM(CAST(q_doc AS HUGEINT)) AS s1,
    SUM(CAST(q_doc AS HUGEINT) * CAST(q_doc AS HUGEINT)) AS s2
  FROM lqs GROUP BY source),
zc AS (
  SELECT l.doc_id, l.source, l.q_doc,
    CAST(c.s1 AS DOUBLE) / CAST(c.n_docs AS DOUBLE) AS mean_q,
    (CAST(c.s2 AS DOUBLE) - CAST(c.s1 AS DOUBLE) * CAST(c.s1 AS DOUBLE)
       / CAST(c.n_docs AS DOUBLE)) / CAST(c.n_docs AS DOUBLE) AS var_q,
    c.cut_lo, c.cut_hi
  FROM lqs l JOIN cuts c USING (source))
SELECT doc_id, source, q_doc,
  CASE WHEN var_q <= 0.0 THEN NULL
       ELSE (CAST(q_doc AS DOUBLE) - mean_q) / sqrt(var_q) END AS z,
  CASE WHEN CAST(q_doc AS DOUBLE) >= cut_hi THEN 'head'
       WHEN CAST(q_doc AS DOUBLE) >= cut_lo THEN 'middle'
       ELSE 'tail' END AS ccnet_bucket
FROM zc
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

  protected val langIdCore: String = s"""
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

  /** Twin of TextAnalysis.langMismatch: the langId chain joined back
    * to the shipped lang column, per-source disagreement rollup. */
  val langMismatch: String = s"""
WITH $langIdCore
SELECT d.source, CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(SUM(CASE WHEN p.lang_pred <> d.lang THEN 1 ELSE 0 END) AS BIGINT)
    AS n_mismatch,
  CAST(SUM(CASE WHEN p.lang_pred <> d.lang THEN 1 ELSE 0 END) AS DOUBLE)
    / CAST(COUNT(*) AS DOUBLE) AS mismatch_rate
FROM documents d JOIN lang_pred_t p USING (doc_id)
GROUP BY d.source
${ord("source")}""".trim

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
  /** Shared chain for the multi-query BM25 twins: everything through
    * the per-query ranked CTE `topk` (rank rk by q_bm25 DESC, doc_id
    * ASC). `bm25Multiquery` and the hybrid-fusion twin splice it. */
  protected lazy val bm25MqChain: String = s"""
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
  FROM perq)""".trim

  val bm25Multiquery: String = s"""$bm25MqChain
SELECT query_id, doc_id, q_bm25, n_terms FROM topk WHERE rk <= 5
${ord("query_id", "doc_id")}""".trim

  /** Twin of TextAnalysis.lexicalDiversity: per-(source, token) counts
    * then per-source type/token/hapax rollup; ratios are the same
    * int64/int64 double divisions. */
  val lexicalDiversity: String = s"""
WITH t AS (
  SELECT source, unnest(string_split_regex(trim(text), '\\s+')) AS tok
  FROM documents),
c AS (SELECT source, tok, COUNT(*) AS cnt FROM t GROUP BY source, tok)
SELECT source,
  CAST(SUM(cnt) AS BIGINT) AS n_tokens,
  CAST(COUNT(*) AS BIGINT) AS n_types,
  CAST(SUM(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
  CAST(COUNT(*) AS DOUBLE) / CAST(SUM(cnt) AS DOUBLE) AS type_token_ratio,
  CAST(SUM(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS DOUBLE) /
    CAST(COUNT(*) AS DOUBLE) AS hapax_rate
FROM c GROUP BY source
${ord("source")}""".trim

  /** Shared CTE: the FULL Gopher pass predicate at minWords = 20 (the
    * sourceScorecard convention) — the gopherRules twin's expression
    * with the lower word bound. */
  protected lazy val gopherPass20: String = s"""
gp_d AS (
  SELECT doc_id,
    string_split_regex(trim(text), '\\s+') AS w,
    string_split_regex(trim(lower(text)), '\\s+') AS tl,
    string_split(text, chr(10)) AS lines,
    CAST(len(regexp_extract_all(text, '#|\\.\\.\\.')) AS INT) AS n_symbols
  FROM documents),
gp AS (
  SELECT doc_id,
    (CAST(len(w) AS INT) BETWEEN 20 AND 100000)
    AND ((CAST(length(array_to_string(w, '')) AS DOUBLE) /
          CAST(len(w) AS DOUBLE)) BETWEEN 3.0 AND 10.0)
    AND (CAST(n_symbols AS DOUBLE) / CAST(len(w) AS DOUBLE)) <= 0.1
    AND (CAST(len(list_filter(lines, l -> trim(l) LIKE '-%'
          OR trim(l) LIKE '*%' OR trim(l) LIKE '•%')) AS DOUBLE) /
         CAST(len(lines) AS DOUBLE)) <= 0.9
    AND (CAST(len(list_filter(lines, l -> trim(l) LIKE '%...')) AS DOUBLE) /
         CAST(len(lines) AS DOUBLE)) <= 0.3
    AND (CAST(len(list_filter(w, x -> regexp_matches(x, '[A-Za-z]'))) AS DOUBLE) /
         CAST(len(w) AS DOUBLE)) >= 0.8
    AND CAST(len(list_intersect(tl,
      ['the','be','to','of','and','that','have','with'])) AS INT) >= 2
    AS pass
  FROM gp_d)""".trim

  /** Shared CTE: the ·10⁶-quantized quality score (sourceScorecard's
    * double-round spelling). */
  protected lazy val q6Chain: String = s"""
q6w AS (
  SELECT doc_id, text, string_split_regex(trim(text), '\\s+') AS wq
  FROM documents),
q6t AS (
  SELECT doc_id,
    CAST(round(round((CAST(len(list_distinct(wq)) AS DOUBLE) / CAST(len(wq) AS DOUBLE)) * 0.5
      + least(CAST(len(wq) AS DOUBLE) / 64.0, 1.0) * 0.3
      + (CASE WHEN ((CAST(length(text) AS DOUBLE) - (CAST(len(wq) AS DOUBLE) - 1))
                    / CAST(len(wq) AS DOUBLE)) BETWEEN 3.0 AND 9.0
              THEN 1.0 ELSE 0.5 END) * 0.2, 6) * 1000000) AS BIGINT) AS q6
  FROM q6w)""".trim

  /** Twin of TextAnalysis.qualityCalibration(bins=10, minWords=20):
    * integer decile binning on q6 (capped at bin 9), per-bin count /
    * quantized-sum mean / Gopher pass rate. */
  val qualityCalibration: String = s"""
WITH $q6Chain,
$gopherPass20,
j AS (
  SELECT LEAST((q6t.q6 * 10) // 1000000, 9) AS bin, q6t.q6, gp.pass
  FROM q6t JOIN gp ON gp.doc_id = q6t.doc_id)
SELECT bin, CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(SUM(q6) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) / 1000000 AS mean_quality,
  CAST(SUM(CASE WHEN pass THEN 1 ELSE 0 END) AS BIGINT) AS n_pass,
  CAST(SUM(CASE WHEN pass THEN 1 ELSE 0 END) AS DOUBLE) /
    CAST(COUNT(*) AS DOUBLE) AS pass_rate
FROM j GROUP BY bin
${ord("bin")}""".trim

  /** Twin of TextAnalysis.filterAgreement(pct=0.5, minWords=20):
    * exact-median quality cut vs the full Gopher pass, 2×2 contingency
    * counts, Cohen's kappa from HUGEINT marginal products (the
    * decimal(38) twin of Spark's overflow-safe spelling). */
  val filterAgreement: String = s"""
WITH q6w AS (
  SELECT doc_id, text, string_split_regex(trim(text), '\\s+') AS wq
  FROM documents),
fq AS (
  SELECT doc_id,
    round((CAST(len(list_distinct(wq)) AS DOUBLE) / CAST(len(wq) AS DOUBLE)) * 0.5
      + least(CAST(len(wq) AS DOUBLE) / 64.0, 1.0) * 0.3
      + (CASE WHEN ((CAST(length(text) AS DOUBLE) - (CAST(len(wq) AS DOUBLE) - 1))
                    / CAST(len(wq) AS DOUBLE)) BETWEEN 3.0 AND 9.0
              THEN 1.0 ELSE 0.5 END) * 0.2, 6) AS quality
  FROM q6w),
fcut AS (SELECT quantile_cont(quality, 0.5) AS cut FROM fq),
fa AS (SELECT doc_id, quality >= fcut.cut AS a FROM fq, fcut),
$gopherPass20,
m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
    CAST(SUM(CASE WHEN a AND pass THEN 1 ELSE 0 END) AS BIGINT) AS n11,
    CAST(SUM(CASE WHEN a AND NOT pass THEN 1 ELSE 0 END) AS BIGINT) AS n10,
    CAST(SUM(CASE WHEN NOT a AND pass THEN 1 ELSE 0 END) AS BIGINT) AS n01,
    CAST(SUM(CASE WHEN NOT a AND NOT pass THEN 1 ELSE 0 END) AS BIGINT) AS n00
  FROM fa JOIN gp ON gp.doc_id = fa.doc_id),
r AS (
  SELECT n, n11, n10, n01, n00,
    CAST(n11 + n00 AS DOUBLE) / CAST(n AS DOUBLE) AS po,
    CAST(CAST(n11 + n10 AS HUGEINT) * CAST(n11 + n01 AS HUGEINT)
       + CAST(n01 + n00 AS HUGEINT) * CAST(n10 + n00 AS HUGEINT) AS DOUBLE)
      / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) AS pe
  FROM m)
SELECT n, n11, n10, n01, n00, po, pe,
  CASE WHEN pe = 1.0 THEN NULL
       ELSE (po - pe) / (1.0 - pe) END AS kappa
FROM r""".trim

  /** Twin of TextAnalysis.oovRate(vocabSize=1000): corpus token
    * counts, top-1000 cut (cnt DESC, tok ASC — the deterministic
    * boundary tie-break), per-language OOV rollup via a left join
    * against the cut. */
  val oovRate: String = s"""
WITH ot AS (
  SELECT lang, unnest(string_split_regex(trim(text), '\\s+')) AS tok
  FROM documents),
oc AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS cnt FROM ot GROUP BY tok),
topv AS (SELECT tok FROM oc ORDER BY cnt DESC, tok ASC LIMIT 1000),
lc AS (
  SELECT lang, tok, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM ot GROUP BY lang, tok),
oj AS (
  SELECT lc.lang, lc.cnt, t.tok AS iv
  FROM lc LEFT JOIN topv t ON t.tok = lc.tok)
SELECT lang, CAST(SUM(cnt) AS BIGINT) AS n_tokens,
  CAST(SUM(CASE WHEN iv IS NULL THEN cnt ELSE 0 END) AS BIGINT) AS n_oov,
  CAST(SUM(CASE WHEN iv IS NULL THEN cnt ELSE 0 END) AS DOUBLE) /
    CAST(SUM(cnt) AS DOUBLE) AS oov_rate
FROM oj GROUP BY lang
${ord("lang")}""".trim

  /** Twin of TextAnalysis.lengthQuantiles: per-source exact
    * quantile_cont p50/p90/p99 of the whitespace token count (same
    * linear interpolation as Spark's percentile — the pin_q6 rule;
    * Spark's weighted-frequency form aggregates the identical
    * multiset). */
  val lengthQuantiles: String = s"""
WITH lq AS (
  SELECT source,
    CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_tokens
  FROM documents)
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
  quantile_cont(n_tokens, 0.5) AS p50_tokens,
  quantile_cont(n_tokens, 0.9) AS p90_tokens,
  quantile_cont(n_tokens, 0.99) AS p99_tokens
FROM lq GROUP BY source
${ord("source")}""".trim

  /** Twin of Sketches.kmvCardinality(k=16): per-source distinct
    * polyhash64 token hashes in unsigned 2⁶⁴ space (the power-sum
    * decomposition, see fingerprintDocs), the 16 minima via a rank
    * window, estimate = 15·2⁶⁴ / 16th-min as one double expression
    * (HUGEINT→DOUBLE is correctly rounded, matching BigInteger
    * conversion on the Spark side); exact count below k. */
  val kmvCardinality: String = {
    val pow64 = "CAST('18446744073709551616' AS HUGEINT)"
    val half = "CAST('9223372036854775808' AS HUGEINT)"
    s"""
WITH RECURSIVE
kt AS (
  SELECT source, unnest(string_split_regex(trim(text), '\\s+')) AS tok
  FROM documents),
kpw(kk, p) AS (
  SELECT 0, CAST(1 AS HUGEINT)
  UNION ALL SELECT kk + 1, (p * 1000003) % $pow64 FROM kpw WHERE kk < 255),
kpl AS MATERIALIZED (SELECT list(p ORDER BY kk) AS ps FROM kpw),
kh0 AS (
  SELECT source,
    COALESCE(list_sum(list_transform(string_split_regex(tok, ''),
      (c, i) -> ord(c) * kpl.ps[strlen(tok) - i + 1])) % $pow64,
      CAST(0 AS HUGEINT)) AS hu
  FROM kt, kpl),
-- Fibonacci finalizer (hu · 11400714819323198485) mod 2⁶⁴, split as
-- hi/lo 32-bit halves so no intermediate exceeds HUGEINT range
kh AS (
  SELECT DISTINCT source,
    ((hu * 2135587861) % $pow64
     + ((hu * 2654435769) % CAST(4294967296 AS HUGEINT))
       * CAST(4294967296 AS HUGEINT)) % $pow64 AS u
  FROM kh0),
krk AS (
  SELECT source, u,
    row_number() OVER (PARTITION BY source ORDER BY u ASC) AS r,
    COUNT(*) OVER (PARTITION BY source) AS nd
  FROM kh),
ksel AS (SELECT source, u, nd FROM krk WHERE r = LEAST(nd, 16))
SELECT source, LEAST(nd, 16) AS n_kept,
  CAST(CASE WHEN u >= $half THEN u - $pow64 ELSE u END AS BIGINT) AS kth_hash,
  CASE WHEN nd < 16 THEN CAST(LEAST(nd, 16) AS DOUBLE)
       ELSE (CAST(15 AS DOUBLE) * CAST('18446744073709551616' AS DOUBLE))
            / CAST(u AS DOUBLE) END AS est_distinct
FROM ksel
${ord("source")}""".trim
  }

  /** The register-chain CTEs shared by the two HLL twins (p=10,
    * m=1024): polyhash64 power-sum + split Fibonacci finalizer
    * (identical to the kmvCardinality chain), bucket = top 10 bits
    * (floor-divide by 2⁵⁴), rank = 55 − bitlength(low 54 bits) via a
    * range join against an exact powers-of-two list (w=0 → 55, the
    * engine's capped leading-zero count), registers = per-(source,
    * bucket) MAX over the full 0..1023 domain with absent buckets 0. */
  private def hllRegCtes: String = {
    val pow64 = "CAST('18446744073709551616' AS HUGEINT)"
    s"""
hlt AS (
  SELECT source, unnest(string_split_regex(trim(text), '\\s+')) AS tok
  FROM documents),
hlpw(kk, p) AS (
  SELECT 0, CAST(1 AS HUGEINT)
  UNION ALL SELECT kk + 1, (p * 1000003) % $pow64 FROM hlpw WHERE kk < 255),
hlpl AS MATERIALIZED (SELECT list(p ORDER BY kk) AS ps FROM hlpw),
hlh0 AS (
  SELECT source,
    COALESCE(list_sum(list_transform(string_split_regex(tok, ''),
      (c, i) -> ord(c) * hlpl.ps[strlen(tok) - i + 1])) % $pow64,
      CAST(0 AS HUGEINT)) AS hu
  FROM hlt, hlpl),
${mix64Chain("hl", "source", "hlh0", "hlh")},
hljw AS (
  SELECT source, u,
    CAST(u // CAST('18014398509481984' AS HUGEINT) AS INTEGER) AS j,
    u % CAST('18014398509481984' AS HUGEINT) AS w
  FROM hlh),
hlbl AS (
  SELECT b, CAST(2**(b - 1) AS HUGEINT) AS lo
  FROM generate_series(1, 54) t(b)),
hlrk AS (
  SELECT source, j,
    CASE WHEN w = 0 THEN 55 ELSE 55 - hlbl.b END AS r
  FROM hljw LEFT JOIN hlbl ON hljw.w >= hlbl.lo AND hljw.w < hlbl.lo * 2),
hlmx AS (SELECT source, j, MAX(r) AS r FROM hlrk GROUP BY source, j),
hldom AS (
  SELECT s.source, CAST(g.j AS INTEGER) AS j
  FROM (SELECT DISTINCT source FROM hlh) s, generate_series(0, 1023) g(j)),
hlreg AS (
  SELECT hldom.source, hldom.j, COALESCE(hlmx.r, 0) AS r
  FROM hldom LEFT JOIN hlmx
    ON hlmx.source = hldom.source AND hlmx.j = hldom.j)""".trim
  }

  /** splitmix64 finalizer on an unsigned-64 HUGEINT `hu` column (twin
    * of `HllSketch.mix64` — see its scaladoc for why HLL's
    * leading-zeros statistic needs a full-avalanche mix): xorshift
    * rides DuckDB's native HUGEINT xor / `>>` (values stay < 2⁶⁴, so
    * `>>` ≡ the engine's unsigned shift), wrapping multiplies ride the
    * split 32-bit decomposition (13787848793156543929 = hi 3210233709
    * · 2³² + lo 484763065; 10723151780598845931 = hi 2496678331 · 2³²
    * + lo 321982955). Emits CTEs `<prefix>x1..x4` and `$finalName`
    * (`$keys`, u). `distinct` collapses duplicate rows — right for the
    * set-semantics consumers (HLL registers, shingle/bloom universes),
    * WRONG for the quantile samplers, whose engine side keeps every
    * occurrence of a repeated (id, value) in its k slots (r13 ADVICE:
    * the twins diverged whenever idCol was non-unique with repeated
    * values — quantile callers pass distinct = false so the oracle
    * sample is the same multiset the engine keeps). */
  private def mix64Chain(prefix: String, keys: String, from: String,
      finalName: String, distinct: Boolean = true): String = {
    val pow64 = "CAST('18446744073709551616' AS HUGEINT)"
    val pow32 = "CAST(4294967296 AS HUGEINT)"
    s"""${prefix}x1 AS (SELECT $keys, xor(hu, hu >> 30) AS z1 FROM $from),
${prefix}x2 AS (SELECT $keys,
  ((z1 * 484763065) % $pow64 + ((z1 * 3210233709) % $pow32) * $pow32)
    % $pow64 AS z2 FROM ${prefix}x1),
${prefix}x3 AS (SELECT $keys, xor(z2, z2 >> 27) AS z3 FROM ${prefix}x2),
${prefix}x4 AS (SELECT $keys,
  ((z3 * 321982955) % $pow64 + ((z3 * 2496678331) % $pow32) * $pow32)
    % $pow64 AS z4 FROM ${prefix}x3),
$finalName AS (
  SELECT ${if (distinct) "DISTINCT " else ""}$keys, xor(z4, z4 >> 31) AS u
  FROM ${prefix}x4)""".trim
  }

  /** The HLL estimate from (zero-count, harmonic-sum) columns — the
    * bit-exact SQL of `Sketches.hllEstimate`: one double division of
    * the interpolated pinned numerator by the exact HUGEINT harmonic
    * sum, linear counting below 2.5·m with the ln quantized at 10⁶. */
  private def hllEstSql(v: String, s: String): String = {
    val amm = java.lang.Double.toString(
      graft.functions.HllSketch.alphaMm2Pow64(10))
    s"""CASE WHEN $v > 0 AND $amm / CAST($s AS DOUBLE) <= 2560.0
      THEN CAST(CAST(round(ln(1024.0 / CAST($v AS DOUBLE)) * 1000000.0)
        AS BIGINT) * 1024 AS DOUBLE) / 1000000.0
      ELSE $amm / CAST($s AS DOUBLE) END"""
  }

  /** Twin of Sketches.approxQuantiles over events.value keyed by
    * event_id (k=4096, quantiles .25/.5/.75/.9/.99): the bottom-k
    * rows by splitmix64(event_id) unsigned hash order (mix64 is a
    * bijection, so unique ids give a total deterministic order),
    * values quantized to integer cents, exact interpolated
    * quantile_cont over the sample (the pin_q6 percentile-parity
    * contract), result rounded at 1e-4 cents — both engines produce
    * the identical double. */
  val approxQuantiles: String = {
    def one(q: String): String =
      s"""SELECT CAST($q AS DOUBLE) AS quantile,
  CAST(round(quantile_cont(cents, $q) * 10000) AS BIGINT) / 1000000.0
    AS value FROM aqsamp"""
    s"""
WITH aq0 AS (SELECT CAST(event_id AS HUGEINT) AS hu, value FROM events),
${mix64Chain("aq", "value", "aq0", "aqm", distinct = false)},
aqsamp AS (
  SELECT CAST(round(value * 100) AS BIGINT) AS cents
  FROM aqm ORDER BY u LIMIT 4096)
${Seq("0.25", "0.5", "0.75", "0.9", "0.99").map(one).mkString("\nUNION ALL\n")}
${ord("quantile")}""".trim
  }

  /** Twin of Sketches.approxQuantilesByGroup over events.value grouped
    * by event_type (k=256, quantiles .5/.9/.99): per-group rank window
    * over the splitmix64 hash order, integer cents, per-group exact
    * quantile_cont, 1e-4-cent output rounding. */
  val approxQuantilesByType: String = {
    def one(q: String): String =
      s"""SELECT event_type, CAST($q AS DOUBLE) AS quantile,
  CAST(round(quantile_cont(cents, $q) * 10000) AS BIGINT) / 1000000.0
    AS value FROM gqsamp GROUP BY event_type"""
    s"""
WITH gq0 AS (
  SELECT CAST(event_id AS HUGEINT) AS hu, event_type, value FROM events),
${mix64Chain("gq", "event_type, value", "gq0", "gqm", distinct = false)},
gqrk AS (
  SELECT event_type, value,
    row_number() OVER (PARTITION BY event_type ORDER BY u) AS rn
  FROM gqm),
gqsamp AS (
  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents
  FROM gqrk WHERE rn <= 256)
${Seq("0.5", "0.9", "0.99").map(one).mkString("\nUNION ALL\n")}
${ord("event_type", "quantile")}""".trim
  }

  /** Twin of Sketches.hllCardinality(p=10): the full register array
    * recomputed bucket by bucket (see hllRegCtes), zero count and
    * exact HUGEINT harmonic sum per source, the pinned-numerator
    * estimate, exact distinct hashes + signed basis-point error as
    * the audit columns. */
  val hllCardinality: String = s"""
WITH RECURSIVE
$hllRegCtes,
hlagg AS (
  SELECT source,
    CAST(SUM(CASE WHEN r = 0 THEN 1 ELSE 0 END) AS BIGINT) AS v_zero,
    SUM(CAST(2**(64 - r) AS HUGEINT)) AS s_sum
  FROM hlreg GROUP BY source),
hlex AS (
  SELECT source, CAST(COUNT(DISTINCT u) AS BIGINT) AS exact_distinct
  FROM hlh GROUP BY source),
hlfin AS (
  SELECT hlagg.source, v_zero,
    ${hllEstSql("v_zero", "s_sum")} AS est_distinct,
    exact_distinct
  FROM hlagg JOIN hlex ON hlex.source = hlagg.source)
SELECT source, v_zero, est_distinct, exact_distinct,
  CAST(round((est_distinct / CAST(exact_distinct AS DOUBLE) - 1.0)
    * 10000.0) AS BIGINT) AS err_bp
FROM hlfin
${ord("source")}""".trim

  /** Twin of Sketches.hllUnionSources(p=10): pair the per-source
    * registers on bucket index, union registers by GREATEST, the same
    * pinned estimate for each side and the union, inclusion–exclusion
    * intersection clamped at 0. */
  val hllUnionSources: String = s"""
WITH RECURSIVE
$hllRegCtes,
hlpair AS (
  SELECT a.source AS source_a, b.source AS source_b,
    a.r AS ra, b.r AS rb, GREATEST(a.r, b.r) AS ru
  FROM hlreg a JOIN hlreg b
    ON a.j = b.j AND a.source < b.source),
hlps AS (
  SELECT source_a, source_b,
    CAST(SUM(CASE WHEN ra = 0 THEN 1 ELSE 0 END) AS BIGINT) AS va,
    SUM(CAST(2**(64 - ra) AS HUGEINT)) AS sa,
    CAST(SUM(CASE WHEN rb = 0 THEN 1 ELSE 0 END) AS BIGINT) AS vb,
    SUM(CAST(2**(64 - rb) AS HUGEINT)) AS sb,
    CAST(SUM(CASE WHEN ru = 0 THEN 1 ELSE 0 END) AS BIGINT) AS vu,
    SUM(CAST(2**(64 - ru) AS HUGEINT)) AS su
  FROM hlpair GROUP BY source_a, source_b),
hlpe AS (
  SELECT source_a, source_b,
    ${hllEstSql("va", "sa")} AS est_a,
    ${hllEstSql("vb", "sb")} AS est_b,
    ${hllEstSql("vu", "su")} AS est_union
  FROM hlps),
hlpf AS (
  SELECT source_a, source_b, est_a, est_b, est_union,
    GREATEST(0.0, est_a + est_b - est_union) AS est_intersection
  FROM hlpe)
SELECT source_a, source_b, est_a, est_b, est_union, est_intersection,
  est_intersection / est_union AS est_jaccard
FROM hlpf
${ord("source_a", "source_b")}""".trim

  /** Twin of EventStream.hllUsersPartials→Compact (p=10): per (hour
    * window, event_type), the HLL registers over the Fibonacci-mixed
    * user_id (split 32-bit multiply, as streamKmvUsers), then the
    * pinned estimate. No watermark cutoff — the partials path is
    * stateless and the register merge (elementwise max) is
    * associative, so one global pass here equals the micro-batched
    * stream. */
  val streamHllUsers: String = {
    val pow64 = "CAST('18446744073709551616' AS HUGEINT)"
    val pow32 = "CAST(4294967296 AS HUGEINT)"
    s"""
WITH shu0 AS (
  SELECT date_trunc('hour', ts) AS ws, event_type,
    CAST(user_id AS HUGEINT) AS hu
  FROM events),
${mix64Chain("sh", "ws, event_type", "shu0", "shuu")},
shjw AS (
  SELECT ws, event_type,
    CAST(u // CAST('18014398509481984' AS HUGEINT) AS INTEGER) AS j,
    u % CAST('18014398509481984' AS HUGEINT) AS w
  FROM shuu),
shbl AS (
  SELECT b, CAST(2**(b - 1) AS HUGEINT) AS lo
  FROM generate_series(1, 54) t(b)),
shrk AS (
  SELECT ws, event_type, j,
    CASE WHEN w = 0 THEN 55 ELSE 55 - shbl.b END AS r
  FROM shjw LEFT JOIN shbl ON shjw.w >= shbl.lo AND shjw.w < shbl.lo * 2),
shmx AS (
  SELECT ws, event_type, j, MAX(r) AS r
  FROM shrk GROUP BY ws, event_type, j),
shdom AS (
  SELECT g.ws, g.event_type, CAST(t.j AS INTEGER) AS j
  FROM (SELECT DISTINCT ws, event_type FROM shuu) g,
    generate_series(0, 1023) t(j)),
shreg AS (
  SELECT shdom.ws, shdom.event_type, COALESCE(shmx.r, 0) AS r
  FROM shdom LEFT JOIN shmx
    ON shmx.ws = shdom.ws AND shmx.event_type = shdom.event_type
    AND shmx.j = shdom.j),
shagg AS (
  SELECT ws, event_type,
    CAST(SUM(CASE WHEN r = 0 THEN 1 ELSE 0 END) AS BIGINT) AS v_zero,
    SUM(CAST(2**(64 - r) AS HUGEINT)) AS s_sum
  FROM shreg GROUP BY ws, event_type)
SELECT CAST(ws AS VARCHAR) AS window_start, event_type, v_zero,
  ${hllEstSql("v_zero", "s_sum")} AS est_distinct
FROM shagg
${ord("window_start", "event_type")}""".trim
  }

  /** Twin of Sketches.cmsTokenFreq(probes spark/merge/vector, 4×1024):
    * the Count-Min matrix recomputed cell-exactly — per distinct token
    * the polyhash64 power-sum, the Kirsch–Mitzenmacher affine bucket
    * per depth row (mod-2⁶⁴ HUGEINT ≡ the engine's wrapping long & mask),
    * bucket sums weighted by token counts, probe estimates as MIN over
    * rows, exact counts as the honesty column. */
  val cmsTokenFreq: String = {
    val pow64 = "CAST('18446744073709551616' AS HUGEINT)"
    val gold = "CAST('11400714819323198485' AS HUGEINT)"
    s"""
WITH RECURSIVE
ctoks AS (
  SELECT unnest(string_split_regex(trim(text), '\\s+')) AS token
  FROM documents),
ctc AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM ctoks GROUP BY token),
pw(kk, p) AS (SELECT 0, CAST(1 AS HUGEINT)
  UNION ALL SELECT kk+1, (p*1000003) % $pow64 FROM pw WHERE kk < 255),
pl AS MATERIALIZED (SELECT list(p ORDER BY kk) AS ps FROM pw),
cth AS (
  SELECT ctc.token, ctc.cnt,
    COALESCE(list_sum(list_transform(string_split_regex(ctc.token, ''),
      (c, i) -> ord(c) * pl.ps[strlen(ctc.token) - i + 1])), 0) % $pow64 AS hu
  FROM ctc, pl),
cbk AS (
  SELECT t.i,
    ((cth.hu * (2*t.i + 1) + t.i * $gold) % $pow64) % 1024 AS b,
    CAST(SUM(cth.cnt) AS BIGINT) AS c
  FROM cth, generate_series(0, 3) t(i)
  GROUP BY t.i, ((cth.hu * (2*t.i + 1) + t.i * $gold) % $pow64) % 1024),
cpr(token) AS (VALUES ('spark'), ('merge'), ('vector')),
cph AS (
  SELECT cpr.token,
    COALESCE(list_sum(list_transform(string_split_regex(cpr.token, ''),
      (c, i) -> ord(c) * pl.ps[strlen(cpr.token) - i + 1])), 0) % $pow64 AS hu
  FROM cpr, pl),
cpb AS (
  SELECT cph.token, t.i,
    ((cph.hu * (2*t.i + 1) + t.i * $gold) % $pow64) % 1024 AS b
  FROM cph, generate_series(0, 3) t(i)),
cpe AS (
  SELECT cpb.token, CAST(MIN(COALESCE(cbk.c, 0)) AS BIGINT) AS est_freq
  FROM cpb LEFT JOIN cbk ON cbk.i = cpb.i AND cbk.b = cpb.b
  GROUP BY cpb.token),
cfin AS (
  SELECT cpe.token AS token, cpe.est_freq,
    CAST(COALESCE(ctc.cnt, 0) AS BIGINT) AS exact_freq,
    cpe.est_freq - CAST(COALESCE(ctc.cnt, 0) AS BIGINT) AS overestimate
  FROM cpe LEFT JOIN ctc ON ctc.token = cpe.token)
SELECT token, est_freq, exact_freq, overestimate FROM cfin
${ord("token")}""".trim
  }

  /** Twin of Sketches.cmsHeavyHitters(φ=0.001, 4×1024, 1/64 sample):
    * token instances with zipped-unnest positions (0-based, matching
    * posexplode), the CMS bucket sums recomputed cell-exactly from
    * per-token counts, the Knuth instance-sample candidates, the
    * `est ≥ ceil(φ·N)` screen, and the exact verdict on the kept
    * sliver. */
  val cmsHeavyHitters: String = {
    val pow64 = "CAST('18446744073709551616' AS HUGEINT)"
    val gold = "CAST('11400714819323198485' AS HUGEINT)"
    s"""
WITH RECURSIVE
hht AS (
  SELECT doc_id,
    unnest(string_split_regex(trim(text), '\\s+')) AS token,
    unnest(generate_series(1,
      len(string_split_regex(trim(text), '\\s+')))) - 1 AS pos
  FROM documents),
hhn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM hht),
hhc AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM hht GROUP BY token),
hhpw(kk, p) AS (SELECT 0, CAST(1 AS HUGEINT)
  UNION ALL SELECT kk+1, (p*1000003) % $pow64 FROM hhpw WHERE kk < 255),
hhpl AS MATERIALIZED (SELECT list(p ORDER BY kk) AS ps FROM hhpw),
hhh AS (
  SELECT hhc.token, hhc.cnt,
    COALESCE(list_sum(list_transform(string_split_regex(hhc.token, ''),
      (c, i) -> ord(c) * hhpl.ps[strlen(hhc.token) - i + 1])), 0)
      % $pow64 AS hu
  FROM hhc, hhpl),
hhbk AS (
  SELECT t.i,
    ((hhh.hu * (2*t.i + 1) + t.i * $gold) % $pow64) % 1024 AS b,
    CAST(SUM(hhh.cnt) AS BIGINT) AS c
  FROM hhh, generate_series(0, 3) t(i)
  GROUP BY t.i, ((hhh.hu * (2*t.i + 1) + t.i * $gold) % $pow64) % 1024),
hhcand AS (
  SELECT DISTINCT token FROM hht
  WHERE (((doc_id * 1009 + pos) % 1000003) * 2654435761) % 64 = 0),
hhpb AS (
  SELECT hhh.token, hhh.cnt, t.i,
    ((hhh.hu * (2*t.i + 1) + t.i * $gold) % $pow64) % 1024 AS b
  FROM hhh JOIN hhcand ON hhcand.token = hhh.token,
    generate_series(0, 3) t(i)),
hhpe AS (
  SELECT hhpb.token, hhpb.cnt,
    CAST(MIN(COALESCE(hhbk.c, 0)) AS BIGINT) AS est_freq
  FROM hhpb LEFT JOIN hhbk ON hhbk.i = hhpb.i AND hhbk.b = hhpb.b
  GROUP BY hhpb.token, hhpb.cnt),
hhk AS (
  SELECT token, est_freq, cnt,
    CAST(ceil(0.001 * n_total) AS BIGINT) AS threshold
  FROM hhpe, hhn
  WHERE est_freq >= CAST(ceil(0.001 * n_total) AS BIGINT))
SELECT token, est_freq, cnt AS exact_freq, threshold,
  (cnt >= threshold) AS is_heavy
FROM hhk
${ord("token")}""".trim
  }

  /** Twin of CorpusStream.cmsTokenPartials→Compact (4×1024, probes
    * spark/merge/vector): CMS counts are linear, so the elementwise
    * sum of per-batch matrices equals ONE global matrix — recomputed
    * here cell-exactly from corpus token counts (the cmsTokenFreq
    * chain minus its exact-audit columns). */
  val streamCmsTokens: String = {
    val pow64 = "CAST('18446744073709551616' AS HUGEINT)"
    val gold = "CAST('11400714819323198485' AS HUGEINT)"
    s"""
WITH RECURSIVE
sct AS (
  SELECT unnest(string_split_regex(trim(text), '\\s+')) AS token
  FROM documents),
sctc AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM sct GROUP BY token),
scpw(kk, p) AS (SELECT 0, CAST(1 AS HUGEINT)
  UNION ALL SELECT kk+1, (p*1000003) % $pow64 FROM scpw WHERE kk < 255),
scpl AS MATERIALIZED (SELECT list(p ORDER BY kk) AS ps FROM scpw),
scth AS (
  SELECT sctc.token, sctc.cnt,
    COALESCE(list_sum(list_transform(string_split_regex(sctc.token, ''),
      (c, i) -> ord(c) * scpl.ps[strlen(sctc.token) - i + 1])), 0)
      % $pow64 AS hu
  FROM sctc, scpl),
scbk AS (
  SELECT t.i,
    ((scth.hu * (2*t.i + 1) + t.i * $gold) % $pow64) % 1024 AS b,
    CAST(SUM(scth.cnt) AS BIGINT) AS c
  FROM scth, generate_series(0, 3) t(i)
  GROUP BY t.i, ((scth.hu * (2*t.i + 1) + t.i * $gold) % $pow64) % 1024),
scpr(token) AS (VALUES ('spark'), ('merge'), ('vector')),
scph AS (
  SELECT scpr.token,
    COALESCE(list_sum(list_transform(string_split_regex(scpr.token, ''),
      (c, i) -> ord(c) * scpl.ps[strlen(scpr.token) - i + 1])), 0)
      % $pow64 AS hu
  FROM scpr, scpl),
scpb AS (
  SELECT scph.token, t.i,
    ((scph.hu * (2*t.i + 1) + t.i * $gold) % $pow64) % 1024 AS b
  FROM scph, generate_series(0, 3) t(i))
SELECT scpb.token, CAST(MIN(COALESCE(scbk.c, 0)) AS BIGINT) AS est_freq
FROM scpb LEFT JOIN scbk ON scbk.i = scpb.i AND scbk.b = scpb.b
GROUP BY scpb.token
${ord("token")}""".trim
  }

  /** Twin of Sketches.bloomFprAudit(m=16384, k=6): even/odd doc_id
    * split, splitmix64 keys (mix64Chain), affine bit positions, the
    * distinct member bit set, per-probe all-positions-present test,
    * and the quantized analytic bound with the pinned k=6
    * multiplication tree. */
  val bloomFprAudit: String = {
    val pow64 = "CAST('18446744073709551616' AS HUGEINT)"
    val gold = "CAST('11400714819323198485' AS HUGEINT)"
    s"""
WITH bfm0 AS (
  SELECT CAST(doc_id AS HUGEINT) AS hu FROM documents WHERE doc_id % 2 = 0),
${mix64Chain("bfm", "hu", "bfm0", "bfmu")},
bfp0 AS (
  SELECT CAST(doc_id AS HUGEINT) AS hu FROM documents WHERE doc_id % 2 = 1),
${mix64Chain("bfp", "hu", "bfp0", "bfpu")},
bfmb AS (
  SELECT DISTINCT
    CAST(((u * (2*t.i + 1) + t.i * $gold) % $pow64) % 16384 AS INTEGER)
      AS pos
  FROM bfmu, generate_series(0, 5) t(i)),
bfpp AS (
  SELECT u,
    CAST(((u * (2*t.i + 1) + t.i * $gold) % $pow64) % 16384 AS INTEGER)
      AS pos
  FROM bfpu, generate_series(0, 5) t(i)),
bfph AS (
  SELECT bfpp.u, MAX(CASE WHEN b.pos IS NULL THEN 1 ELSE 0 END) AS miss
  FROM bfpp LEFT JOIN bfmb b ON b.pos = bfpp.pos
  GROUP BY bfpp.u),
bfagg AS (
  SELECT
    (SELECT CAST(COUNT(DISTINCT u) AS BIGINT) FROM bfmu) AS n_members,
    CAST(COUNT(*) AS BIGINT) AS n_probes,
    (SELECT CAST(COUNT(*) AS BIGINT) FROM bfmb) AS n_bits_set,
    CAST(SUM(CASE WHEN miss = 0 THEN 1 ELSE 0 END) AS BIGINT)
      AS n_false_pos
  FROM bfph),
bfe AS (
  SELECT *,
    round(exp((-6.0 * CAST(n_members AS DOUBLE)) / 16384.0)
      * 1000000000.0) / 1000000000.0 AS e
  FROM bfagg),
bfy AS (SELECT *, 1.0 - e AS y FROM bfe)
SELECT n_members, n_probes, n_bits_set, n_false_pos,
  CASE WHEN n_probes = 0 THEN NULL
       ELSE CAST(n_false_pos AS DOUBLE) / CAST(n_probes AS DOUBLE)
  END AS measured_fpr,
  ((y * y) * y) * ((y * y) * y) AS theoretical_fpr
FROM bfy""".trim
  }

  /** Twin of TextAnalysis.klDivergence: (source, tok) counts, corpus
    * counts rolled up FROM them, both log-probs quantized
    * round(ln·10⁶) as BIGINT before the HUGEINT-weighted sum (the
    * decimal(38) twin), one double division per source. */
  val klDivergence: String = s"""
WITH t AS (
  SELECT source, unnest(string_split_regex(trim(text), '\\s+')) AS tok
  FROM documents),
sc AS (SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM t GROUP BY source, tok),
cc AS (SELECT tok, CAST(SUM(cnt) AS BIGINT) AS ctf FROM sc GROUP BY tok),
stot AS (SELECT source, CAST(SUM(cnt) AS BIGINT) AS s_total
  FROM sc GROUP BY source),
ctot AS (SELECT CAST(SUM(ctf) AS BIGINT) AS c_total FROM cc),
dqs AS (
  SELECT sc.source, sc.cnt, stot.s_total,
    CAST(round(ln(CAST(sc.cnt AS DOUBLE) / CAST(stot.s_total AS DOUBLE))
      * 1000000) AS BIGINT)
    - CAST(round(ln(CAST(cc.ctf AS DOUBLE) / CAST(ctot.c_total AS DOUBLE))
      * 1000000) AS BIGINT) AS dq
  FROM sc JOIN stot USING (source) JOIN cc USING (tok), ctot)
SELECT source, MIN(s_total) AS n_tokens,
  CAST(SUM(CAST(cnt AS HUGEINT) * CAST(dq AS HUGEINT)) AS DOUBLE)
    / CAST(MIN(s_total) AS DOUBLE) / 1000000 AS kl_divergence
FROM dqs GROUP BY source
${ord("source")}""".trim

  /** Twin of TextAnalysis.bigramPmi(minCount=5, k=50): adjacent-pair
    * and unigram instance counts, the identical fixed-association
    * probability-ratio double chain quantized round(ln·10⁶), top-50
    * (q_pmi DESC, tok ASC, next ASC). */
  val bigramPmi: String = s"""
WITH ws AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w
  FROM documents),
pr AS (
  SELECT doc_id, unnest(generate_series(1, greatest(len(w) - 1, 0))) AS i, w
  FROM ws WHERE len(w) >= 2),
bg AS (
  SELECT w[CAST(i AS INT)] AS tok, w[CAST(i AS INT) + 1] AS next FROM pr),
bi AS (
  SELECT tok, next, CAST(COUNT(*) AS BIGINT) AS c_ab
  FROM bg GROUP BY tok, next),
uni AS (
  SELECT unnest(string_split_regex(trim(text), '\\s+')) AS tok
  FROM documents),
uc AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS c FROM uni GROUP BY tok),
nb AS (SELECT CAST(SUM(c_ab) AS BIGINT) AS n_bi FROM bi),
nu AS (SELECT CAST(SUM(c) AS BIGINT) AS n_uni FROM uc),
scored AS (
  SELECT b.tok, b.next, b.c_ab,
    CAST(round(ln(
      (CAST(b.c_ab AS DOUBLE) / CAST(nb.n_bi AS DOUBLE))
        / ((CAST(ca.c AS DOUBLE) / CAST(nu.n_uni AS DOUBLE))
          * (CAST(cb.c AS DOUBLE) / CAST(nu.n_uni AS DOUBLE))))
      * 1000000) AS BIGINT) AS q_pmi
  FROM bi b
  JOIN uc ca ON ca.tok = b.tok
  JOIN uc cb ON cb.tok = b.next, nb, nu
  WHERE b.c_ab >= 5),
topk AS (
  SELECT * FROM scored ORDER BY q_pmi DESC, tok ASC, next ASC LIMIT 50)
SELECT tok, next, c_ab, q_pmi FROM topk
${ord("tok", "next")}""".trim

  /** Twin of TextAnalysis.charEntropy: (source, char) counts, totals
    * rolled up FROM them, log-probs quantized round(ln·10⁶), HUGEINT
    * weighted sum (the decimal(38) twin), one double division per
    * source. */
  val charEntropy: String = s"""
WITH cs AS (
  SELECT source, unnest(string_split_regex(text, '')) AS c
  FROM documents),
cc AS (
  SELECT source, c, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM cs WHERE length(c) > 0 GROUP BY source, c),
ct AS (SELECT source, CAST(SUM(cnt) AS BIGINT) AS total
  FROM cc GROUP BY source),
cq AS (
  SELECT cc.source, cc.cnt, ct.total,
    CAST(round(ln(CAST(cnt AS DOUBLE) / CAST(total AS DOUBLE))
      * 1000000) AS BIGINT) AS q
  FROM cc JOIN ct USING (source))
SELECT source, MIN(total) AS n_chars,
  CAST(COUNT(*) AS BIGINT) AS n_distinct_chars,
  CAST(SUM(CAST(cnt AS HUGEINT) * CAST(-q AS HUGEINT)) AS DOUBLE)
    / CAST(MIN(total) AS DOUBLE) / 1000000 AS char_entropy
FROM cq GROUP BY source
${ord("source")}""".trim

  /** Twin of TextAnalysis.vocabCoverage(cuts=100/1000/10000): corpus
    * token counts, rank over (cnt DESC, tok ASC), per-cut conditional
    * sums over the max-cut head, coverage as one double division. */
  val vocabCoverage: String = {
    def cut(v: Int) = s"""
  SELECT CAST($v AS BIGINT) AS vocab_size,
    CAST(SUM(CASE WHEN rank <= $v THEN 1 ELSE 0 END) AS BIGINT) AS n_types,
    CAST(SUM(CASE WHEN rank <= $v THEN cnt ELSE 0 END) AS BIGINT) AS n_covered
  FROM h""".trim
    s"""
WITH t AS (
  SELECT unnest(string_split_regex(trim(text), '\\s+')) AS tok
  FROM documents),
f AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS cnt FROM t GROUP BY tok),
tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS total FROM f),
rk AS (SELECT cnt,
  ROW_NUMBER() OVER (ORDER BY cnt DESC, tok ASC) AS rank FROM f),
h AS (SELECT * FROM rk WHERE rank <= 10000),
u AS (${cut(100)}
  UNION ALL ${cut(1000)}
  UNION ALL ${cut(10000)})
SELECT vocab_size, n_types, n_covered,
  CAST(n_covered AS DOUBLE) / CAST(tot.total AS DOUBLE) AS coverage
FROM u, tot
${ord("vocab_size")}""".trim
  }

  /** Twin of TextAnalysis.vocabOverlapMatrix: per-source distinct
    * vocab, token-keyed self-join a<b, per-pair shared counts, sizes
    * joined back, Jaccard as one double division of exact int64s. */
  val vocabOverlapMatrix: String = s"""
WITH st0 AS (
  SELECT source, unnest(string_split_regex(trim(text), '\\s+')) AS tok
  FROM documents),
st AS (SELECT DISTINCT source, tok FROM st0),
sz AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_types
  FROM st GROUP BY source),
pairs AS (
  SELECT a.source AS source_a, b.source AS source_b,
    CAST(COUNT(*) AS BIGINT) AS n_shared_types
  FROM st a JOIN st b ON a.tok = b.tok AND a.source < b.source
  GROUP BY a.source, b.source)
SELECT p.source_a, p.source_b, p.n_shared_types,
  za.n_types AS n_types_a, zb.n_types AS n_types_b,
  CAST(p.n_shared_types AS DOUBLE)
    / CAST(za.n_types + zb.n_types - p.n_shared_types AS DOUBLE)
    AS vocab_jaccard
FROM pairs p
JOIN sz za ON za.source = p.source_a
JOIN sz zb ON zb.source = p.source_b
${ord("source_a", "source_b")}""".trim

  /** Twin of TextAnalysis.sourceHealthReport: the five per-source
    * twins joined on source (each twin nests as a subquery — its
    * internal ORDER BY is inert there). */
  lazy val sourceHealthReport: String = s"""
SELECT ld.source, ld.n_tokens, ld.n_types, ld.n_hapax,
  ld.type_token_ratio, ld.hapax_rate,
  k.kl_divergence, z.slope AS zipf_slope, ce.char_entropy,
  lq.n_docs, lq.p50_tokens, lq.p90_tokens, lq.p99_tokens
FROM ($lexicalDiversity) ld
JOIN ($klDivergence) k USING (source)
JOIN ($zipfFit) z USING (source)
JOIN ($charEntropy) ce USING (source)
JOIN ($lengthQuantiles) lq USING (source)
${ord("source")}""".trim

  /** Twin of TextAnalysis.zipfFit(topV=500): per-source counts, rank
    * window (cnt DESC, tok ASC), x/y = round(ln·10⁶) longs, HUGEINT
    * moment sums, slope/intercept as the identical double
    * expressions. */
  val zipfFit: String = s"""
WITH t AS (
  SELECT source, unnest(string_split_regex(trim(text), '\\s+')) AS tok
  FROM documents),
c AS (SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM t GROUP BY source, tok),
r AS (
  SELECT source, cnt,
    ROW_NUMBER() OVER (PARTITION BY source
      ORDER BY cnt DESC, tok ASC) AS rank
  FROM c),
xy AS (
  SELECT source,
    CAST(round(ln(CAST(rank AS DOUBLE)) * 1000000) AS BIGINT) AS x,
    CAST(round(ln(CAST(cnt AS DOUBLE)) * 1000000) AS BIGINT) AS y
  FROM r WHERE rank <= 500),
m AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_terms,
    SUM(CAST(x AS HUGEINT)) AS sx, SUM(CAST(y AS HUGEINT)) AS sy,
    SUM(CAST(x AS HUGEINT) * CAST(y AS HUGEINT)) AS sxy,
    SUM(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS sxx
  FROM xy GROUP BY source)
SELECT source, n_terms,
  CAST(n_terms * sxy - sx * sy AS DOUBLE)
    / CAST(n_terms * sxx - sx * sx AS DOUBLE) AS slope,
  (CAST(sy AS DOUBLE)
    - CAST(n_terms * sxy - sx * sy AS DOUBLE)
      / CAST(n_terms * sxx - sx * sx AS DOUBLE)
      * CAST(sx AS DOUBLE))
    / CAST(n_terms AS DOUBLE) / 1000000 AS intercept
FROM m
${ord("source")}""".trim
}
