package graft.analytics

/** Embedding-similarity oracle twins: brute / LSH / IVF / SQ / PQ /
  * IVF-PQ / residual ANN tiers, kNN graph family, k-means and
  * coreset sampling.
  *
  * Carved out of the former monolithic ExtOracle object (round 8);
  * mixed back into `ExtOracle`, whose name every gate entry keeps
  * using. Parity rules in the ExtOracle scaladoc. */
trait SimilarityOracle extends CoreOracle with TextOracle {

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

  /** Shared CTE chain for the PageRank twins: knng out-degrees + 5
    * unrolled integer-PageRank iterations (scores in int64 10⁻¹²
    * units, integral divisions — bit-identical to the engine's
    * trajectory); final scores land in CTE `s5`. */
  private val prScale = "1000000000000"
  private val pageRankChain: String = {
    val S = prScale
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
od AS (SELECT vec_id AS src, CAST(COUNT(*) AS BIGINT) AS deg
  FROM knng GROUP BY vec_id),
nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM od),
s0 AS (SELECT od.src AS id, CAST($S // nn.n AS BIGINT) AS sc FROM od, nn),
$rounds""".trim
  }

  /** Twin of Similarity.knnPageRank(iters=5). */
  val knnPageRank: String = s"""
$knnChain,
$pageRankChain
SELECT id AS vec_id, sc AS q_rank,
  CAST(sc AS DOUBLE) / $prScale AS pagerank
FROM s5
${ord("vec_id")}""".trim

  /** Twin of Similarity.knnCommunities: the knng chain, the mutual
    * filter (both directions present), and the recursive min-label
    * closure over the mutual sliver. */
  val knnCommunities: String = s"""
${knnChain.replaceFirst("WITH ", "WITH RECURSIVE ")},
kc_mu AS (
  SELECT a.vec_id AS a_id, a.nbr_id AS b_id
  FROM knng a JOIN knng b
    ON a.vec_id = b.nbr_id AND a.nbr_id = b.vec_id
  WHERE a.vec_id < a.nbr_id),
kc_e AS (
  SELECT a_id AS id, b_id AS nbr FROM kc_mu
  UNION SELECT b_id, a_id FROM kc_mu),
kc_r(id, r) AS (
  SELECT DISTINCT id, id FROM kc_e
  UNION
  SELECT e.id, kc_r.r FROM kc_e e JOIN kc_r ON e.nbr = kc_r.id)
SELECT id AS vec_id, CAST(MIN(r) AS BIGINT) AS community_id
FROM kc_r GROUP BY id
${ord("vec_id")}""".trim

  /** Twin of the shared-graph production composition (gate entry
    * `knn_pagerank_shared`): ONE knng chain feeds BOTH the PageRank
    * rounds and the label-accuracy vote chain, joined per vector via
    * its label — value-identical to the engine's materialize-once
    * `knnGraph` → (`pageRankFromEdges`, `labelAccuracyFromEdges`)
    * composition. */
  val knnPageRankShared: String = s"""
$knnChain,
$pageRankChain,
sh_votes AS (
  SELECT g.vec_id, l.label AS nbr_label, CAST(COUNT(*) AS BIGINT) AS v
  FROM knng g JOIN embeddings l ON g.nbr_id = l.vec_id
  GROUP BY g.vec_id, l.label),
sh_pred AS (
  SELECT vec_id, nbr_label AS pred FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
      ORDER BY v DESC, nbr_label ASC) AS rk FROM sh_votes) WHERE rk = 1),
sh_acc AS (
  SELECT l.label, CAST(COUNT(*) AS BIGINT) AS n_vecs,
    CAST(SUM(CASE WHEN p.pred = l.label THEN 1 ELSE 0 END) AS BIGINT)
      AS n_correct
  FROM sh_pred p JOIN embeddings l ON p.vec_id = l.vec_id
  GROUP BY l.label)
SELECT s.id AS vec_id, s.sc AS q_rank,
  CAST(s.sc AS DOUBLE) / $prScale AS pagerank,
  l.label, a.n_vecs, a.n_correct,
  CAST(a.n_correct AS DOUBLE) / CAST(a.n_vecs AS DOUBLE) AS accuracy
FROM s5 s
JOIN embeddings l ON s.id = l.vec_id
JOIN sh_acc a ON l.label = a.label
${ord("vec_id")}""".trim

  val nearDupEmbeddings: String = s"""
WITH e AS ($quantized),
a AS (SELECT vec_id AS a_id, q AS qa FROM e WHERE vec_id % 10 = 0),
b AS (SELECT vec_id AS b_id, q AS qb FROM e),
scored AS (
  SELECT a_id, b_id,
    list_dot_product(qa, qb) /
      (sqrt(list_dot_product(qa, qa)) * sqrt(list_dot_product(qb, qb)))
      AS cosine_sim
  FROM a, b WHERE a_id <> b_id)
SELECT a_id, b_id, cosine_sim FROM scored WHERE cosine_sim >= 0.4
${ord("a_id", "b_id")}""".trim

  /** Twin of TextAnalysis.rrfFuse over the bm25Multiquery lexical arm
    * (TextOracle's shared chain, rank rk ≤ 5) and a brute-cosine arm
    * on probes vec_id 1..3 (query q ↔ probe q, the aligned-id fixture
    * convention): full-outer rank join, 1/(60+rank) fused in arm
    * order, per-query top-5 (score DESC, doc_id ASC). */
  val hybridRrf: String = s"""$bm25MqChain,
he AS ($quantized),
hpr AS (SELECT vec_id AS probe_id, q AS pq FROM he WHERE vec_id IN (1, 2, 3)),
hsc AS (
  SELECT p.probe_id, e.vec_id,
    list_dot_product(p.pq, e.q) /
      (sqrt(list_dot_product(p.pq, p.pq)) * sqrt(list_dot_product(e.q, e.q)))
      AS cosine_sim
  FROM hpr p, he e WHERE p.probe_id <> e.vec_id),
hrk AS (
  SELECT probe_id, vec_id,
    ROW_NUMBER() OVER (PARTITION BY probe_id
      ORDER BY cosine_sim DESC, vec_id ASC) AS rk
  FROM hsc),
arm_a AS (SELECT query_id, doc_id, rk AS rank_a FROM topk WHERE rk <= 5),
arm_b AS (
  SELECT probe_id AS query_id, vec_id AS doc_id, rk AS rank_b
  FROM hrk WHERE rk <= 5),
fused AS (
  SELECT COALESCE(a.query_id, b.query_id) AS query_id,
         COALESCE(a.doc_id, b.doc_id) AS doc_id,
         COALESCE(1.0 / (60 + a.rank_a), 0.0)
           + COALESCE(1.0 / (60 + b.rank_b), 0.0) AS rrf_score,
         a.rank_a AS rank_a, b.rank_b AS rank_b
  FROM arm_a a FULL OUTER JOIN arm_b b
    ON a.query_id = b.query_id AND a.doc_id = b.doc_id),
ftop AS (
  SELECT query_id, doc_id, rrf_score, rank_a, rank_b,
    ROW_NUMBER() OVER (PARTITION BY query_id
      ORDER BY rrf_score DESC, doc_id ASC) AS fr
  FROM fused)
SELECT query_id, doc_id, rrf_score, rank_a, rank_b FROM ftop WHERE fr <= 5
${ord("query_id", "doc_id")}""".trim

  /** Twin of TextAnalysis.retrievalMetrics(k=5) over the bm25 multi-
    * query run (TextOracle's shared chain) and the brute-cosine gold
    * on probes 1..3: quantized `round(10⁶/(ln(r+1)/ln(2)))` gains,
    * exact BIGINT DCG/IDCG sums, recall/MRR/nDCG as single double
    * divisions. */
  val retrievalMetrics: String = s"""$bm25MqChain,
he AS ($quantized),
hpr AS (SELECT vec_id AS probe_id, q AS pq FROM he WHERE vec_id IN (1, 2, 3)),
hsc AS (
  SELECT p.probe_id, e.vec_id,
    list_dot_product(p.pq, e.q) /
      (sqrt(list_dot_product(p.pq, p.pq)) * sqrt(list_dot_product(e.q, e.q)))
      AS cosine_sim
  FROM hpr p, he e WHERE p.probe_id <> e.vec_id),
hrk AS (
  SELECT probe_id, vec_id,
    ROW_NUMBER() OVER (PARTITION BY probe_id
      ORDER BY cosine_sim DESC, vec_id ASC) AS rk
  FROM hsc),
rrun AS (SELECT query_id, doc_id, rk AS rank FROM topk WHERE rk <= 5),
rgold AS (
  SELECT probe_id AS query_id, vec_id AS doc_id FROM hrk WHERE rk <= 5),
rgcnt AS (
  SELECT query_id, CAST(COUNT(*) AS BIGINT) AS n_gold
  FROM rgold GROUP BY query_id),
rgw AS (
  SELECT query_id,
    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY doc_id ASC) AS i
  FROM rgold),
ridcg AS (
  SELECT query_id,
    CAST(SUM(CAST(round(1000000.0
      / (ln(CAST(i AS DOUBLE) + 1.0) / ln(2.0))) AS BIGINT)) AS BIGINT)
      AS q_idcg
  FROM rgw WHERE i <= 5 GROUP BY query_id),
rhits AS (
  SELECT r.query_id, CAST(COUNT(*) AS BIGINT) AS n_hits,
    CAST(MIN(r.rank) AS BIGINT) AS first_hit,
    CAST(SUM(CAST(round(1000000.0
      / (ln(CAST(r.rank AS DOUBLE) + 1.0) / ln(2.0))) AS BIGINT)) AS BIGINT)
      AS q_dcg
  FROM rrun r JOIN rgold g ON r.query_id = g.query_id AND r.doc_id = g.doc_id
  GROUP BY r.query_id)
SELECT c.query_id, c.n_gold,
  COALESCE(h.n_hits, 0) AS n_hits,
  CAST(COALESCE(h.n_hits, 0) AS DOUBLE) / CAST(c.n_gold AS DOUBLE)
    AS recall_at_k,
  CASE WHEN h.first_hit IS NULL THEN 0.0
       ELSE 1.0 / CAST(h.first_hit AS DOUBLE) END AS mrr,
  COALESCE(h.q_dcg, 0) AS q_dcg, d.q_idcg,
  CAST(COALESCE(h.q_dcg, 0) AS DOUBLE) / CAST(d.q_idcg AS DOUBLE) AS ndcg
FROM rgcnt c JOIN ridcg d USING (query_id)
LEFT JOIN rhits h ON h.query_id = c.query_id
${ord("query_id")}""".trim

  /** Twin of TextAnalysis.clusterTopTerms(m=5) over the kmeans(k=8,
    * iters=2) assignment: docs joined to clusters by the aligned-id
    * convention, (cluster, tok) counts, cluster-level df rolled up
    * FROM them, idf quantized round(ln·10⁶) per term, per-cluster
    * top-5 (score DESC, tok ASC). */
  val clusterTopTerms: String = s"""
$kmeansChain,
ct_docs AS (
  SELECT a.cluster, unnest(string_split_regex(trim(d.text), '\\s+')) AS tok
  FROM a3 a JOIN documents d ON d.doc_id = a.vec_id),
ct_tf AS (
  SELECT cluster, tok, CAST(COUNT(*) AS BIGINT) AS tf
  FROM ct_docs GROUP BY cluster, tok),
ct_df AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS df FROM ct_tf GROUP BY tok),
ct_k AS (SELECT CAST(COUNT(DISTINCT cluster) AS BIGINT) AS n_clusters FROM a3),
ct_s AS (
  SELECT t.cluster, t.tok, t.tf, d.df,
    t.tf * CAST(round(ln(CAST(k.n_clusters AS DOUBLE) / CAST(d.df AS DOUBLE))
      * 1000000) AS BIGINT) AS q_ctfidf
  FROM ct_tf t JOIN ct_df d USING (tok), ct_k k),
ct_r AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY cluster
    ORDER BY q_ctfidf DESC, tok ASC) AS rk
  FROM ct_s)
SELECT cluster, tok, tf, df, q_ctfidf FROM ct_r WHERE rk <= 5
${ord("cluster", "tok")}""".trim

  /** Twin of Similarity.embeddingOutliers(k=8, iters=2, threshold=3):
    * the kmeans chain's final assignment, per-cluster HUGEINT moment
    * sums over the exact int64 distances, the eventAnomaly fixed
    * mean/var/z expressions, one-sided flag with NULL-variance →
    * false. */
  val embeddingOutliers: String = s"""
$kmeansChain,
eo_st AS (
  SELECT cluster, CAST(COUNT(*) AS BIGINT) AS n_members,
    SUM(CAST(d AS HUGEINT)) AS s1,
    SUM(CAST(d AS HUGEINT) * CAST(d AS HUGEINT)) AS s2
  FROM a3 GROUP BY cluster),
eo_j AS (
  SELECT a.vec_id, a.cluster, a.d AS dist, st.n_members,
    CAST(st.s1 AS DOUBLE) / CAST(st.n_members AS DOUBLE) AS mean_dist,
    (CAST(st.s2 AS DOUBLE) - CAST(st.s1 AS DOUBLE) * CAST(st.s1 AS DOUBLE)
       / CAST(st.n_members AS DOUBLE)) / CAST(st.n_members AS DOUBLE)
      AS var_dist
  FROM a3 a JOIN eo_st st USING (cluster)),
eo_z AS (
  SELECT *, CASE WHEN var_dist <= 0.0 THEN NULL
    ELSE (CAST(dist AS DOUBLE) - mean_dist) / sqrt(var_dist) END AS z
  FROM eo_j)
SELECT vec_id, cluster, dist, n_members, mean_dist, var_dist, z,
  COALESCE(z > 3.0, FALSE) AS is_outlier
FROM eo_z
${ord("vec_id")}""".trim

  /** Twin of the streaming IVF assignment (centroidMod=50): the
    * ivfCandChain assignment argmax — cosine DESC, cent_id ASC — over
    * every vector; the stream must land each row in the identical
    * cell. */
  val streamIvfAssign: String = s"""
WITH e AS ($quantized),
cents AS (SELECT vec_id AS cent_id, q AS cq FROM e WHERE vec_id % 50 = 0),
cos_ec AS (
  SELECT e.vec_id, c.cent_id,
    list_dot_product(e.q, c.cq) /
      (sqrt(list_dot_product(e.q, e.q)) * sqrt(list_dot_product(c.cq, c.cq)))
      AS cs
  FROM e, cents c)
SELECT vec_id, cell FROM (
  SELECT vec_id, cent_id AS cell,
    ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cs DESC, cent_id ASC)
      AS rk
  FROM cos_ec) WHERE rk = 1
${ord("vec_id")}""".trim

  /** Twin of Similarity.embeddingDimStats: per-dimension count / min /
    * max over the ·10³-quantized space, HUGEINT moment sums (the
    * decimal(38) twin), mean/variance as the identical double
    * expressions. Dims 0-based to match posexplode. */
  val embeddingDimStats: String = s"""
WITH eq AS (
  SELECT vec_id, list_transform(embedding,
    x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS q
  FROM embeddings),
ed AS (
  SELECT unnest(q) AS v, generate_subscripts(q, 1) - 1 AS dim FROM eq),
ea AS (
  SELECT dim, CAST(COUNT(*) AS BIGINT) AS n_vecs,
    SUM(CAST(v AS HUGEINT)) AS s1,
    SUM(CAST(v AS HUGEINT) * CAST(v AS HUGEINT)) AS s2,
    MIN(v) AS min_q, MAX(v) AS max_q
  FROM ed GROUP BY dim)
SELECT CAST(dim AS BIGINT) AS dim, n_vecs, min_q, max_q,
  CAST(s1 AS DOUBLE) / CAST(n_vecs AS DOUBLE) AS mean_q,
  GREATEST(0.0, (CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
     / CAST(n_vecs AS DOUBLE)) / CAST(n_vecs AS DOUBLE)) AS var_q
FROM ea
${ord("dim")}""".trim
}
