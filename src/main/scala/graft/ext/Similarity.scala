package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor / similarity search over the
  * `embeddings` table (vec_id, embedding list<float>, label).
  *
  * Numeric-parity design: scores are computed on embeddings quantized
  * to integers (`round(x*1000)` as long) so dot products and norms are
  * EXACT integer arithmetic — bit-identical across Spark, DuckDB, or
  * any engine, regardless of summation order. Cosine is then a
  * deterministic double expression over those exact integers. With
  * 64-dim unit-ish vectors the products stay ≪ 2^53, so even a
  * double-based engine computes them exactly.
  *
  * Scale posture:
  *  - brute force = broadcast the query vector(s), one scan, top-k via
  *    TakeOrderedAndProject — the right baseline for one-off queries;
  *  - `lshTopK` buckets vectors by sign-bit sketches of deterministic
  *    pseudo-hyperplanes, so batch k-NN joins only within buckets —
  *    the 100 TB shape (bucket join ≈ IVF cell probe).
  */
object Similarity {

  /** Quantized integer copy of an embedding column. */
  def quantize(emb: Column): Column =
    transform(emb, x => round(x.cast("double") * 1000).cast("long"))

  /** Exact integer dot product — the native codegen expression
    * (graft.functions.DotProduct64); the interpreted HOF formulation
    * `aggregate(zip_with(a,b,_*_), 0, _+_)` computes the same value
    * but falls out of WholeStageCodegen. */
  private def dotL(a: Column, b: Column): Column =
    graft.functions.DotProduct64.dot64(a, b)

  /** Exact cosine over quantized vectors (deterministic double).
    * Zero-norm vectors (all components quantize to 0 — corrupt/empty
    * embeddings) get sentinel −2.0 instead of 0/0 = NaN: Spark orders
    * NaN ABOVE every double, so an unguarded corrupt vector would rank
    * #1 in every (cosine DESC) top-k; −2.0 sits below the entire real
    * cosine range and pushes it last. */
  def cosineQ(a: Column, b: Column): Column = {
    val den = sqrt(dotL(a, a).cast("double")) * sqrt(dotL(b, b).cast("double"))
    when(den === 0.0, lit(-2.0)).otherwise(dotL(a, b).cast("double") / den)
  }

  /** Deterministic double norm of a quantized vector — computed ONCE
    * per row in the scan projection and carried through joins, so the
    * candidate-pair hot path pays 1 dot product instead of 3 (cosineQ
    * inlined at a pair site re-derives both self-dots per pair: at
    * 100 TB that is 3× the FLOPs of the whole operator). */
  private def normQ(q: Column): Column = sqrt(dotL(q, q).cast("double"))

  /** Cosine from a pair dot and two pre-computed norms. Bit-identical
    * to cosineQ: same double operations in the same order — only the
    * evaluation SITE of the norms moves (per row, not per pair);
    * zero-norm sentinel −2.0 matches cosineQ's guard. */
  private def cosineN(ab: Column, na: Column, nb: Column): Column =
    when(na * nb === 0.0, lit(-2.0)).otherwise(ab.cast("double") / (na * nb))

  /** (vec_id, q, nq) scan projection: quantize in a child projection
    * (HOF inputs must be attributes — see Dedup.minhashSignature), then
    * the norm over the materialized attribute. */
  private def quantizedWithNorm(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"), quantize(col("embedding")).as("q"))
      .select(col("vec_id"), col("q"), normQ(col("q")).as("nq"))

  /** Pinned quantized corpus proxy for the BATCH ANN tiers (r19): each
    * ANN operator references the quantized corpus 2–4× (index build,
    * codebook training, candidate projection, exact re-rank) and
    * Catalyst plans every reference as its own scan+quantize chain —
    * the r19 stage profile showed 2–3 identical 64-task quantize
    * stages per entry (ann_sq_topk 2 × ~15 s run, ann_ivfpq_residual
    * 3 × ~2 s). One eager pin makes every consumer a checkpoint-scan
    * read; because the pin is plan-keyed, composed operators
    * (ivfPqRerank = ivfPqTopK + exact re-rank) share ONE build within
    * an invocation. The proxy is the narrow (vec_id, q, nq) index
    * shape — linear in the corpus with a small constant, the same
    * class as knnGraph's r18 assignment pin; media/text payloads are
    * never pinned. Batch-only call sites (localCheckpoint is illegal
    * in streaming plans; the streaming assignment path keeps the
    * unpinned `quantizedWithNorm`). */
  private def quantizedPinned(emb: DataFrame): DataFrame =
    Pin.eager(quantizedWithNorm(emb))

  /** Brute-force top-k by cosine against one stored query vector.
    * Plan: broadcast 1-row query → scan → projection → top-k. */
  def bruteForceTopK(emb: DataFrame, queryVecId: Long, k: Int = 10): DataFrame = {
    val e = quantizedWithNorm(emb)
    val qv = e.where(col("vec_id") === queryVecId)
      .select(col("q").as("qq"), col("nq").as("nqq"))
    e.crossJoin(broadcast(qv))
      .select(col("vec_id"),
        cosineN(dotL(col("q"), col("qq")), col("nq"), col("nqq")).as("cosine_sim"))
      .orderBy(col("cosine_sim").desc, col("vec_id").asc)
      .limit(k)
  }

  /** Deterministic pseudo-hyperplane component for (plane p, dim d): a
    * fixed integer in [-1000, 1000] from two Lehmer LCG steps (mod
    * 2^31-1) over a (p,d)-mixed seed — no RNG, and PORTABLE integer
    * arithmetic (every intermediate < 2^47): any engine reproduces the
    * planes bit-for-bit, which is what makes `lshTopK` end-to-end
    * oracle-checkable in DuckDB (unlike a seeded xxhash64 derivation). */
  private def planeComponent(p: Int, d: Column): Column = {
    val h0 = (lit(p.toLong * 131071L) + d * 524287L + 17L) % 2147483647L
    val h1 = (h0 * 48271L) % 2147483647L
    val h2 = (h1 * 48271L) % 2147483647L
    h2 % 2001L - 1000L
  }

  /** Sign-bit LSH sketch: bit p = sign of ⟨v, plane_p⟩. Computed by
    * the native codegen expression (graft.functions.LshSketch64) — one
    * fused primitive loop; the HOF formulation below computes the same
    * value and is kept as the equivalence-test reference. */
  def lshSketch(q: Column, planes: Int = 8): Column =
    graft.functions.LshSketch64.lshSketch64(q, planes)

  /** Higher-order-function reference formulation of the sketch, over a
    * PRE-MATERIALIZED quantized column (see Dedup.minhashSignature for
    * why the input must be an attribute, not the quantize expression).
    * Interpreted (`aggregate`/`zip_with` are CodegenFallback with
    * `planes` intermediate arrays per row) — test-surface only. */
  def lshSketchHof(q: Column, planes: Int = 8): Column = {
    val sum = (0 until planes).map { p =>
      val proj = aggregate(zip_with(q, sequence(lit(0), size(q) - 1),
        (x, i) => x * planeComponent(p, i)), lit(0L), (acc, v) => acc + v)
      // lit(1L): the 32-bit literal overflowed at p >= 31, breaking
      // bit-for-bit parity with the native LshSketch64 above 31 planes
      when(proj >= 0, shiftleft(lit(1L), p)).otherwise(lit(0L))
    }.reduce(_ + _)
    // empty vector: every projection is 0 (>= 0) → all sign bits set;
    // spelled out because sequence(0, -1) yields [0,-1], not []
    when(size(q) === 0, lit((1L << planes) - 1)).otherwise(sum)
  }

  /** Random-projection dimensionality reduction — project quantized
    * vectors onto `k` deterministic pseudo-hyperplanes (the same
    * Lehmer-LCG planes the LSH sketch signs; here the raw integer
    * projections are kept). Johnson–Lindenstrauss-style reduction for
    * cheaper downstream clustering/ANN when the native dimension is
    * large; exact int64 arithmetic, so any engine reproduces the
    * projections bit-for-bit. Interpreted HOF per plane — for a
    * 100 TB hot path fuse as a native Expression like LshSketch64
    * (identical loop, no sign step). Output rides a pure projection:
    * no shuffle. */
  def randomProjection(emb: DataFrame, k: Int = 8): DataFrame = {
    val base = emb.select(col("vec_id"), quantize(col("embedding")).as("q"))
    val projs = (0 until k).map { p =>
      when(size(col("q")) === 0, lit(0L)).otherwise(
        aggregate(zip_with(col("q"), sequence(lit(0), size(col("q")) - 1),
          (x, i) => x * planeComponent(p, i)), lit(0L), (acc, v) => acc + v))
    }
    base.select(col("vec_id"), array(projs: _*).as("proj"))
  }

  /** Bucketed batch k-NN: probe vectors join candidates sharing an LSH
    * bucket, then exact cosine + per-probe top-k window. Bucket-local
    * join — no all-pairs blowup. Recall is tunable via `planes`
    * (fewer planes → bigger buckets → higher recall, more compute).
    *
    * Shuffle shape (the 100 TB path, same as Dedup.minhashLshPairs):
    * the bucket join moves NARROW (id, bucket) rows only — vectors
    * never ride the bucket shuffle. Candidate (probe_id, vec_id) pairs
    * then fetch their vectors via two id equi-joins; with a small
    * candidate set AQE turns those into broadcast joins, so the big
    * vector table is scanned in place and never shuffled at all. */
  def lshTopK(emb: DataFrame, probes: DataFrame, k: Int = 5,
      planes: Int = 8): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = quantizedWithNorm(emb)
    val baseB = base.select(col("vec_id"), lshSketch(col("q"), planes).as("bucket"))
    val prbQ = quantizedWithNorm(probes).select(col("vec_id").as("probe_id"),
      col("q").as("pq"), col("nq").as("npq"))
    val prbB = prbQ.select(col("probe_id"), lshSketch(col("pq"), planes).as("bucket"))
    // narrow candidate generation: (id,bucket) ⋈ (id,bucket)
    val cands = prbB.join(baseB, "bucket")
      .where(col("probe_id") =!= col("vec_id"))
      .select("probe_id", "vec_id")
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("cosine_sim").desc, col("vec_id").asc)
    cands
      .join(base, "vec_id")   // vector fetch for candidates only
      .join(prbQ, "probe_id")
      .select(col("probe_id"), col("vec_id"),
        cosineN(dotL(col("pq"), col("q")), col("npq"), col("nq")).as("cosine_sim"))
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= k)
      .drop("rk")
  }

  /** IVF-style coarse quantization (the inverted-file ANN layout):
    * centroids = a deterministic id-sampled subset of the corpus
    * itself (every `centroidMod`-th vector — no k-means dependency,
    * reproducible); each vector is assigned to its nearest centroid
    * (broadcast centroid table, argmax over cosine); a probe searches
    * only the `nprobe` cells nearest to it. At scale: the corpus is
    * hash-partitioned by cell, the centroid table stays broadcast-size
    * (√N centroids for N vectors), and a probe touches nprobe/cells of
    * the data — the classic IVF trade of recall for fan-out. Returns
    * (vec_id, cell) assignments via `ivfAssign` so the index is
    * materializable/bucketable once and probed many times. */
  /** The IVF coarse-quantizer centroid table (seeded by the
    * `vec_id % centroidMod == 0` stride) — exposed so a STREAMING
    * assignment can quantize against the centroids of an existing
    * static index (`CorpusStream.runIvfAssign`): the assignment stage
    * is a pure projection against this broadcast table, which is
    * exactly what makes IVF index maintenance streaming-safe. */
  def ivfCentroids(emb: DataFrame, centroidMod: Int = 50): DataFrame =
    quantizedWithNorm(emb).where(col("vec_id") % centroidMod === 0)
      .select(col("vec_id").as("cent_id"), col("q").as("cq"),
        col("nq").as("ncq"))

  def ivfAssign(emb: DataFrame, centroidMod: Int = 50): DataFrame =
    ivfAssignAgainst(emb, ivfCentroids(emb, centroidMod))

  /** Assignment against an EXPLICIT centroid table — `ivfAssign`'s
    * second half, shared by the batch path (centroids derived from the
    * same corpus) and the streaming path (centroids from the static
    * index; micro-batch rows are projected through the same broadcast
    * argmax, so stream assignment ≡ batch assignment row-for-row). */
  def ivfAssignAgainst(emb: DataFrame, cents: DataFrame): DataFrame = {
    val e = quantizedWithNorm(emb)
    // nearest centroid = argmax over (cosine DESC, cent_id ASC) — the
    // explicit tie-break makes assignment deterministic even for
    // duplicate centroid vectors, as engine-vs-oracle hash equality
    // requires. The centroid table is collected to ONE array row and
    // broadcast; the argmax is then the native codegen'd
    // NearestCentroidCosine over that array — a pure scan-side
    // PROJECTION. The corpus never shuffles: the earlier
    // crossJoin + max_by(groupBy(vec_id)) spelling was already
    // map-side-collapsed after the broadcast join, but still paid a
    // corpus-wide exchange (vectors aboard) to merge one-row groups.
    // The single collect_list row is the same bytes the centroid
    // broadcast always shipped; centroidMod stays the knob bounding
    // it. Assignment order-independence: ties break inside the
    // expression to the lowest cent_id, so the scheduling-dependent
    // collect_list order can't leak into results.
    val packed = cents.agg(collect_list(
      struct(col("cent_id"), col("cq"), col("ncq"))).as("cs"))
    e.crossJoin(broadcast(packed))
      .select(col("vec_id"),
        graft.functions.NearestCentroidCosine
          .nearestCos(col("q"), col("nq"), col("cs")).as("cell"),
        col("q"), col("nq"))
  }

  /** Scored IVF candidates — (probe_id, vec_id, cosine_sim) for every
    * corpus vector in a probe's `nprobe` nearest cells (self excluded).
    * The shared probe stage of `ivfTopK` and `hardNegatives`: the only
    * corpus exchange is the candidate join on `cell`; centroid tables
    * broadcast. */
  /** `ivfScored` over an EXPLICIT (pre-built) posting table + centroid
    * table — the injectable core shared by the self-building batch
    * path and the persisted-layout serving path
    * (`ivfTopKFromPostings` over `Layout.writeIvfPostings` output).
    * `indexed` must carry (vec_id, cell, q, nq) — `ivfAssign`'s
    * schema (integer-quantized, so a parquet round-trip is exact). */
  private def ivfScoredFrom(indexed: DataFrame, cents: DataFrame,
      probes: DataFrame, nprobe: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // probe → its nprobe nearest cells
    val probeCells = quantizedWithNorm(probes)
      .select(col("vec_id").as("probe_id"), col("q").as("pq"), col("nq").as("npq"))
      .crossJoin(broadcast(cents))
      .select(col("probe_id"), col("pq"), col("npq"), col("cent_id"),
        cosineN(dotL(col("pq"), col("cq")), col("npq"), col("ncq")).as("cs"))
      .withColumn("rk", row_number().over(Window.partitionBy(col("probe_id"))
        .orderBy(col("cs").desc, col("cent_id").asc)))
      .where(col("rk") <= nprobe)
      .select(col("probe_id"), col("pq"), col("npq"), col("cent_id").as("cell"))
    // search only those cells
    probeCells.join(indexed, "cell")
      .where(col("probe_id") =!= col("vec_id"))
      .select(col("probe_id"), col("vec_id"),
        cosineN(dotL(col("pq"), col("q")), col("npq"), col("nq")).as("cosine_sim"))
  }

  private def ivfScored(emb: DataFrame, probes: DataFrame,
      nprobe: Int, centroidMod: Int): DataFrame =
    ivfScoredFrom(ivfAssign(emb, centroidMod),
      ivfCentroids(emb, centroidMod), probes, nprobe)

  /** IVF probe over a PERSISTED posting layout — the serving path:
    * `Layout.writeIvfPostings` lands the index cell-partitioned on
    * disk, and the probe's broadcast cell join lets Spark's dynamic
    * partition pruning read ONLY the nprobe probed cells' files (the
    * declarative analogue of FAISS's inverted lists — at 100 TB a
    * probe touches nprobe/|cells| of the index bytes; LayoutSpec pins
    * the dynamicpruning expression on the scan). Quantization is
    * integer, so the parquet round-trip is exact and results are
    * value-identical to the self-building `ivfTopK` (shares its gate
    * oracle). */
  def ivfTopKFromPostings(postings: DataFrame, cents: DataFrame,
      probes: DataFrame, k: Int = 5, nprobe: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("cosine_sim").desc, col("vec_id").asc)
    ivfScoredFrom(postings, cents, probes, nprobe)
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= k)
      .drop("rk")
  }

  /** IVF probe: top-k within the probe's `nprobe` nearest cells. */
  def ivfTopK(emb: DataFrame, probes: DataFrame, k: Int = 5,
      nprobe: Int = 3, centroidMod: Int = 50): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("cosine_sim").desc, col("vec_id").asc)
    ivfScored(emb, probes, nprobe, centroidMod)
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= k)
      .drop("rk")
  }

  /** Hard-negative mining for contrastive / retrieval training: per
    * probe, the top-k candidates by cosine INSIDE the band
    * `[simLo, simHi)` — similar enough to be informative negatives,
    * but strictly below the near-duplicate threshold (a near-dup of
    * the query is a false negative that poisons the loss; too-easy
    * negatives teach nothing). The standard mining recipe behind
    * dense-retriever training (DPR/ANCE-style).
    *
    * Rides the IVF cell-pruned path, NOT a brute-force scan: a probe
    * scores only its `nprobe` cells' vectors, the band filter is a
    * per-row compare fused into the candidate projection, and the
    * top-k is the same `row_number` window WindowGroupLimit prunes
    * map-side. At 100 TB the plan is identical to `ivfTopK`'s —
    * one candidate join on `cell` — so mining negatives costs the
    * same as serving neighbors. Cosine is the deterministic
    * quantized-integer double, so the band edges are engine-portable
    * IEEE compares. Tie-break (cosine DESC, vec_id ASC). */
  def hardNegatives(emb: DataFrame, probes: DataFrame, k: Int = 5,
      simLo: Double = 0.1, simHi: Double = 0.9,
      nprobe: Int = 3, centroidMod: Int = 50): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(simLo < simHi, "band must be non-empty")
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("cosine_sim").desc, col("vec_id").asc)
    ivfScored(emb, probes, nprobe, centroidMod)
      .where(col("cosine_sim") >= simLo && col("cosine_sim") < simHi)
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= k)
      .drop("rk")
  }

  // ---- product quantization (the ANN memory tier) --------------------

  /** Packed per-subspace PQ codebooks — ONE row with columns
    * `cs_0..cs_{m-1}`, each `array<struct<code, block, blockSelfDot>>`
    * ordered however collect_list delivered it (consumers either argmin
    * with an explicit code tie-break or array_sort by code first, so
    * the scheduling-dependent order can't leak). Codebook entries are
    * the SEED vectors (`vec_id % centroidMod == 0` — the ivfAssign
    * convention: deterministic, engine-reproducible, no k-means
    * dependency); dense code = POSITION in vec_id-sorted seed order
    * (array_sort of the collected structs orders by the leading
    * cent_id), so codes are 0..K−1 regardless of id spacing — the
    * contract `PqAdc`'s table indexing relies on. Trailing dims beyond
    * m·(dim/m) are ignored by every consumer symmetrically (dim
    * divisible by m in practice; 64/4 here). */
  private def pqCodebooks(e: DataFrame, m: Int, centroidMod: Int): DataFrame =
    subspaceBooks(e.where(col("vec_id") % centroidMod === 0)
      .agg(array_sort(collect_list(struct(
        col("vec_id").as("cent_id"), col("q").as("cq")))).as("cs")), m)

  /** Per-subspace codebook columns from a 1-row packed (cent_id, cq)
    * struct array — shared by the raw-vector and residual PQ tiers. */
  private def subspaceBooks(packed: DataFrame, m: Int): DataFrame =
    packed.select((0 until m).map { j =>
      transform(col("cs"), (c, i) => {
        val sub = (size(c.getField("cq")) / m).cast("int")
        val blk = slice(c.getField("cq"), lit(j) * sub + 1, sub)
        struct(i.cast("long").as("code"), blk.as("blk"),
          graft.functions.DotProduct64.dot64(blk, blk).as("bb"))
      }).as(s"cs_$j")
    }: _*)

  /** Product-quantization encoding: each vector compresses to `m`
    * codebook indices (argmin squared-L2 per subspace, ties to the
    * lowest code) — 64 quantized longs become 4 small ints. THIS is
    * the ANN memory tier at 100 TB: the search structure the ADC scan
    * reads is |corpus|·m codes (plus the broadcast codebooks), not
    * |corpus|·dim floats — a ~100× smaller working set than the raw
    * embedding table, which is what makes exhaustive re-ranking scans
    * affordable after IVF pruning.
    *
    * Plan shape: codebooks collapse to ONE broadcast row; encoding is
    * a pure scan projection (m native NearestCentroidL2 argmins over
    * per-subspace slices, all inside WholeStageCodegen) — the corpus
    * never shuffles. */
  def pqEncode(emb: DataFrame, m: Int = 4, centroidMod: Int = 50): DataFrame = {
    val e = emb.select(col("vec_id"), quantize(col("embedding")).as("q"))
    e.crossJoin(broadcast(pqCodebooks(e, m, centroidMod)))
      .select(col("vec_id"),
        array((0 until m).map { j =>
          val sub = (size(col("q")) / m).cast("int")
          graft.functions.NearestCentroidL2.nearestL2(
            slice(col("q"), lit(j) * sub + 1, sub), col(s"cs_$j"))
            .getField("cluster")
        }: _*).as("codes"))
  }

  /** PQ top-k by asymmetric distance computation (ADC): per probe and
    * subspace, precompute the distance from the probe's block to EVERY
    * codebook entry (an m×K lookup table — K·m longs per probe, built
    * once and broadcast); a corpus vector's approximate distance is
    * then m table lookups over its codes — no per-pair dot products at
    * all. Exact integer arithmetic end-to-end (block distances are
    * `bb − 2·dot + bb` over quantized ints), so the result is
    * engine-reproducible and oracle-checkable.
    *
    * Scale shape: the corpus side reads only (vec_id, codes) — the
    * compressed index — with the probe tables broadcast; the ADC sum
    * is the native codegen'd `PqAdc` loop; per-probe top-k is the
    * rank-window WindowGroupLimit prunes map-side. The full-precision
    * re-rank of the survivors (standard IVF-PQ practice) is
    * `bruteForceTopK` over k·|probes| rows — a sliver. */
  def pqTopK(emb: DataFrame, probes: DataFrame, k: Int = 5, m: Int = 4,
      centroidMod: Int = 50): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // pinned (r19): `e` feeds codebook training AND the encode
    // projection — two full scan+quantize chains before
    val e = quantizedPinned(emb).select(col("vec_id"), col("q"))
    val books = pqCodebooks(e, m, centroidMod)
    // per-probe ADC tables, subspace-major, entries ordered by dense
    // code (array_sort on the struct array orders by its first field =
    // code) so tables[j][code] is the lookup PqAdc performs
    val tables = probes
      .select(col("vec_id").as("probe_id"), quantize(col("embedding")).as("pq"))
      .crossJoin(broadcast(books))
      .select(col("probe_id"),
        array((0 until m).map { j =>
          val sub = (size(col("pq")) / m).cast("int")
          val pblk = slice(col("pq"), lit(j) * sub + 1, sub)
          transform(array_sort(col(s"cs_$j")), c =>
            graft.functions.DotProduct64.dot64(pblk, pblk)
              - lit(2L) * graft.functions.DotProduct64.dot64(pblk, c.getField("blk"))
              + c.getField("bb"))
        }: _*).as("tables"))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("adist").asc, col("vec_id").asc)
    // encode inline against the SAME `books` frame (the ivfPqTopK
    // pattern): calling pqEncode here rebuilt the codebooks from its
    // own subtree — a second corpus scan+aggregate whenever broadcast
    // exchange reuse missed (the double-build idiom ScaleProbe has
    // measured at ~2× op cost)
    val codes = e.crossJoin(broadcast(books))
      .select(col("vec_id"),
        array((0 until m).map { j =>
          val sub = (size(col("q")) / m).cast("int")
          graft.functions.NearestCentroidL2.nearestL2(
            slice(col("q"), lit(j) * sub + 1, sub), col(s"cs_$j"))
            .getField("cluster")
        }: _*).as("codes"))
    codes.crossJoin(broadcast(tables))
      .where(col("probe_id") =!= col("vec_id"))
      .select(col("probe_id"), col("vec_id"),
        graft.functions.PqAdc.pqAdc(col("codes"), col("tables")).as("adist"))
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= k)
      .drop("rk")
  }

  /** HOF reference formulation of the ADC lookup-sum — interpreted
    * (CodegenFallback); equivalence with the native `PqAdc` is
    * spec-tested, the hot path uses the native loop. */
  def pqAdcHof(codes: Column, tables: Column): Column =
    aggregate(zip_with(codes, tables,
      (c, t) => element_at(t, (c + 1).cast("int"))), lit(0L), (acc, v) => acc + v)

  /** IVF-PQ — the production ANN composition at 100 TB: IVF cell
    * pruning bounds the candidate set (a probe touches nprobe/cells of
    * the corpus), ADC over the PQ codes scores it (m table lookups per
    * candidate, no dot products). The index is built in ONE corpus
    * scan — cell assignment (native cosine argmax) and the m code
    * argmins are the same projection, so there is no corpus self-join
    * to assemble (vec_id, cell, codes); the only corpus exchange in
    * the whole search is the hash partition on `cell` that the
    * candidate join needs — the same bucket-local shape as `ivfTopK`,
    * but carrying m codes per row instead of dim quantized longs.
    * Full-precision re-rank of the k·|probes| survivors (standard
    * practice) is a separate `bruteForceTopK`-style sliver. */
  def ivfPqTopK(emb: DataFrame, probes: DataFrame, k: Int = 5,
      nprobe: Int = 3, m: Int = 4, centroidMod: Int = 50): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // pinned (r19): before, the corpus was scan+quantized THREE times
    // per invocation (centroid pack, codebook training, index
    // projection); every consumer now reads the one pinned proxy —
    // the codebook input derives FROM the pin (same q column) instead
    // of re-quantizing the raw embeddings
    val e = quantizedPinned(emb)
    val cents = e.where(col("vec_id") % centroidMod === 0)
      .select(col("vec_id").as("cent_id"), col("q").as("cq"), col("nq").as("ncq"))
    val centPack = cents.agg(collect_list(
      struct(col("cent_id"), col("cq"), col("ncq"))).as("ivf_cs"))
    val books = pqCodebooks(
      e.select(col("vec_id"), col("q")), m, centroidMod)
    val indexed = e.crossJoin(broadcast(centPack)).crossJoin(broadcast(books))
      .select(col("vec_id"),
        graft.functions.NearestCentroidCosine
          .nearestCos(col("q"), col("nq"), col("ivf_cs")).as("cell"),
        array((0 until m).map { j =>
          val sub = (size(col("q")) / m).cast("int")
          graft.functions.NearestCentroidL2.nearestL2(
            slice(col("q"), lit(j) * sub + 1, sub), col(s"cs_$j"))
            .getField("cluster")
        }: _*).as("codes"))
    val pq0 = quantizedWithNorm(probes)
      .select(col("vec_id").as("probe_id"), col("q").as("pq"), col("nq").as("npq"))
    val probeCells = pq0.crossJoin(broadcast(cents))
      .select(col("probe_id"), col("cent_id"),
        cosineN(dotL(col("pq"), col("cq")), col("npq"), col("ncq")).as("cs"))
      .withColumn("rk", row_number().over(Window.partitionBy(col("probe_id"))
        .orderBy(col("cs").desc, col("cent_id").asc)))
      .where(col("rk") <= nprobe)
      .select(col("probe_id"), col("cent_id").as("cell"))
    val probeTabs = pq0.crossJoin(broadcast(books))
      .select(col("probe_id"),
        array((0 until m).map { j =>
          val sub = (size(col("pq")) / m).cast("int")
          val pblk = slice(col("pq"), lit(j) * sub + 1, sub)
          transform(array_sort(col(s"cs_$j")), c =>
            dotL(pblk, pblk) - lit(2L) * dotL(pblk, c.getField("blk"))
              + c.getField("bb"))
        }: _*).as("tables"))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("adist").asc, col("vec_id").asc)
    probeCells.join(probeTabs, "probe_id")
      .join(indexed, "cell")
      .where(col("probe_id") =!= col("vec_id"))
      .select(col("probe_id"), col("vec_id"),
        graft.functions.PqAdc.pqAdc(col("codes"), col("tables")).as("adist"))
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= k)
      .drop("rk")
  }

  /** k-nearest-neighbor GRAPH construction — every corpus vector gets
    * its top-k neighbors by cosine among vectors sharing its IVF cell:
    * the building block under graph-based dedup/clustering (SemDeDup
    * variants, agglomerative merging, connectivity analyses) and kNN
    * classifiers. Cell pruning is what makes an all-vectors kNN
    * tractable — the pair space is Σ|cell|², not N², the same bound as
    * `semanticDedup`; the recall trade (neighbors in foreign cells are
    * unseen) is the standard IVF one and `centroidMod` is the knob.
    *
    * Deterministic: cell assignment ties break to the lowest cent_id
    * (native NearestCentroidCosine) and neighbor ranks break on
    * (cosine DESC, nbr_id ASC). Returns (vec_id, nbr_id, nn_rank,
    * cosine_sim).
    *
    * Scale shape: ONE corpus exchange — the self-join on `cell`, both
    * sides shuffle-merged (broadcast of a corpus-proportional side
    * would OOM; identical sides let the ivfAssign pipeline materialize
    * once into an exchange read twice); the per-vector top-k is the
    * rank window WindowGroupLimit prunes map-side before the window
    * sort. */
  def knnGraph(emb: DataFrame, k: Int = 5, centroidMod: Int = 50): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // pinned eagerly (r18): the cell self-join references the assigned
    // table on both sides and Catalyst plans each side as its own
    // quantize+assign chain (exchange reuse does not fire across the
    // renamed sides under AQE) — with a downstream consumer that also
    // references the graph twice (pageRank's edges⋈outdeg), the
    // assignment pipeline ran 4× per invocation. The pin is the
    // quantized (cell, id, q, nq) proxy — linear, the same narrow
    // index shape the ANN tiers materialize.
    val assigned = Pin.eager(ivfAssign(emb, centroidMod))
    val a = assigned.select(col("cell"), col("vec_id"), col("q"), col("nq"))
      .hint("merge")
    val b = assigned.select(col("cell"), col("vec_id").as("nbr_id"),
      col("q").as("qb"), col("nq").as("nb")).hint("merge")
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("cosine_sim").desc, col("nbr_id").asc)
    a.join(b, "cell")
      .where(col("vec_id") =!= col("nbr_id"))
      .select(col("vec_id"), col("nbr_id"),
        cosineN(dotL(col("q"), col("qb")), col("nq"), col("nb")).as("cosine_sim"))
      .withColumn("nn_rank", row_number().over(w))
      .where(col("nn_rank") <= k)
      .select(col("vec_id"), col("nbr_id"), col("nn_rank"), col("cosine_sim"))
  }

  /** kNN label-consistency report — the standard embedding-quality
    * probe: predict every vector's label by majority vote over its
    * kNN-graph neighbors and report per-label accuracy. High accuracy
    * means the embedding space clusters by label (trustworthy for
    * semantic dedup / clustering-based curation); a label whose
    * accuracy craters marks a region where embedding-driven decisions
    * are noise. Ties break deterministically (vote count DESC, label
    * ASC). Returns (label, n_vecs, n_correct, accuracy) for vectors
    * that have ≥1 neighbor.
    *
    * Scale shape: rides `knnGraph`'s one corpus exchange; votes are a
    * map-combinable (vec, label) groupBy over the narrow k·N edge
    * table; the majority window is WindowGroupLimit-prunable; the
    * final rollup has |labels| rows. */
  def knnLabelAccuracy(emb: DataFrame, k: Int = 5,
      centroidMod: Int = 50): DataFrame =
    labelAccuracyFromEdges(knnGraph(emb, k, centroidMod),
      emb.select(col("vec_id"), col("label")))

  /** `knnLabelAccuracy` over a PRE-BUILT edge table — the shape a real
    * pipeline runs: the kNN graph is materialized once (`knnGraph` →
    * parquet or cache) and every graph consumer (this report,
    * `pageRankFromEdges`, connectivity audits) reads it, instead of
    * each consumer paying the corpus self-join again. `edges` must
    * carry (vec_id, nbr_id) — `knnGraph`'s output schema; `labels`
    * carries (vec_id, label). Semantics ≡ the self-building overload
    * (spec-pinned). */
  def labelAccuracyFromEdges(edges: DataFrame, labels: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val lbl = labels.select(col("vec_id"), col("label"))
    val votes = edges.select(col("vec_id"), col("nbr_id"))
      .join(lbl.select(col("vec_id").as("nbr_id"),
        col("label").as("nbr_label")), "nbr_id")
      .groupBy(col("vec_id"), col("nbr_label")).agg(count(lit(1)).as("v"))
    val pred = votes.withColumn("rk", row_number().over(
        Window.partitionBy(col("vec_id"))
          .orderBy(col("v").desc, col("nbr_label").asc)))
      .where(col("rk") === 1)
      .select(col("vec_id"), col("nbr_label").as("pred"))
    pred.join(lbl, "vec_id")
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n_vecs"),
        sum(when(col("pred") === col("label"), 1L).otherwise(0L)).as("n_correct"))
      .withColumn("accuracy",
        col("n_correct").cast("double") / col("n_vecs").cast("double"))
  }

  /** PageRank over the kNN graph — graph centrality as a data-curation
    * signal: a vector central to its neighborhood (many near-dup/
    * related documents point at it) is the canonical representative;
    * low-rank satellites are prune candidates. The standard iterative
    * PageRank (damping 0.85, uniform teleport) over `knnGraph`'s
    * edges, in EXACT integer arithmetic: scores live as int64
    * 10⁻¹²-units, per-edge contributions are integral division by
    * out-degree, and the damping step is (85·Σ) div 100 — every engine
    * reproduces the trajectory bit-for-bit (floating PageRank differs
    * by summation order). kNN graphs have no dangling nodes (a
    * neighbor shares a cell, so it has candidates of its own).
    *
    * Scale shape: the edge table (corpus·k rows, narrow) is built once
    * and CACHED (same eager trade as dupClusters/kcenterSample — the
    * alternative re-derives the whole kNN build per iteration
    * reference); each iteration is one join + map-combinable groupBy
    * on the dst key composed LAZILY, so up to `checkpointEvery`
    * iterations share one linear plan over the cached edges. Plan /
    * lineage depth grows linearly with `iters`, so every
    * `checkpointEvery` (default 8) iterations the score table is
    * `localCheckpoint`ed — narrow (id, sc) rows — truncating lineage
    * before Catalyst analysis cost or lineage re-execution depth
    * becomes the bottleneck at high iteration counts. The final scores
    * are materialized eagerly (same trade as the cache) so the edge /
    * node caches can be unpersisted before returning — repeated
    * invocations in one session do not accumulate executor storage.
    * Driver state: the node count. */
  def knnPageRank(emb: DataFrame, k: Int = 5, iters: Int = 5,
      centroidMod: Int = 50, checkpointEvery: Int = 8): DataFrame =
    pageRankFromEdges(knnGraph(emb, k, centroidMod), iters, checkpointEvery)

  /** Mutual-kNN communities — connected components over the MUTUAL
    * edges of the kNN graph (keep (a, b) only when a is in b's top-k
    * AND b is in a's): the standard density trick that turns a kNN
    * graph into meaningful clusters — one-directional edges chain
    * through hubs and melt everything into a blob; mutuality holds
    * only inside genuinely dense neighborhoods. Labels = min vec_id
    * reachable (the dupClusters contract). The embedding-space
    * community map behind semantic browsing / topic quotas /
    * cluster-aware splits, complementing kmeans (fixed k, spherical)
    * with a density-adaptive view.
    *
    * Scale shape: the mutual filter is one self-intersection of the
    * narrow k·N edge table (id-keyed, no vectors aboard); components
    * run on the mutual sliver via dupClusters' superstep loop (driver
    * fast path below the threshold, distributed above). */
  def knnCommunitiesFromEdges(edges: DataFrame): DataFrame = {
    // pinned eagerly (r18): the mutual-filter intersect references the
    // edge table on both sides; un-pinned, each side re-ran the whole
    // upstream kNN build (2× the window-rank stage per invocation).
    // Narrow (vec_id, nbr_id) rows, corpus·k of them.
    val e = Pin.eager(edges.select(col("vec_id"), col("nbr_id")))
    val mutual = e.intersect(
        e.select(col("nbr_id").as("vec_id"), col("vec_id").as("nbr_id")))
      .where(col("vec_id") < col("nbr_id"))
    graft.ext.Dedup.dupClusters(mutual.toDF("a_id", "b_id"))
      .select(col("doc_id").as("vec_id"), col("cluster_id").as("community_id"))
  }

  /** Self-building overload (materializes the kNN graph itself); a
    * production pipeline feeds the once-built edge table to
    * `knnCommunitiesFromEdges` like every other graph consumer. */
  def knnCommunities(emb: DataFrame, k: Int = 5,
      centroidMod: Int = 50): DataFrame =
    knnCommunitiesFromEdges(knnGraph(emb, k, centroidMod))

  /** `knnPageRank` over a PRE-BUILT edge table — the injectable core:
    * a production pipeline materializes the kNN graph ONCE and feeds
    * it to every consumer (centrality here, `labelAccuracyFromEdges`,
    * cluster audits) rather than re-running the corpus self-join per
    * report. `edges` must carry (vec_id, nbr_id) — `knnGraph`'s output
    * schema. Semantics ≡ the self-building overload (spec-pinned);
    * all caching/lineage notes above apply to this body. */
  def pageRankFromEdges(edgesIn: DataFrame, iters: Int = 5,
      checkpointEvery: Int = 8): DataFrame = {
    require(checkpointEvery >= 1, "checkpointEvery must be >= 1")
    val SCALE = 1000000000000L
    // pinned eagerly (r18): `edges` is referenced twice below (the
    // out-degree aggregate AND the join's probe side) — un-pinned,
    // each reference re-ran the caller's whole graph build.
    val edges = Pin.eager(edgesIn
      .select(col("vec_id").as("src"), col("nbr_id").as("dst")))
    val outdeg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    // The edge table is pinned EAGERLY (r18): with a lazy cache(), the
    // very first action (nodes.count below) materializes e's two union
    // branches CONCURRENTLY under AQE — both race the cold cache and
    // each re-ran the whole kNN build (the build's exchange appeared 3×
    // per invocation in the stage log: fill + the two branches). The
    // pinned table is the narrow (src, dst, deg) proxy, corpus·k rows.
    val e = edges.join(outdeg, "src")
      .select(col("src"), col("dst"), col("deg")).localCheckpoint()
    // src ∪ dst: unfiltered kNN output has every node as a src, but
    // the documented contract is only the (vec_id, nbr_id) schema — a
    // caller that filters weak edges first leaves dst-only nodes,
    // which a src-only node set would silently drop from the ranking
    // (and from n, skewing the teleport base)
    // eager pin (r18, registry-keyed r19): the loop below references
    // `nodes` once per iteration — a persisted-only node set ships its
    // full lineage in every iteration task's binary (the measured
    // ~0.2 s/task deserialization floor); the checkpoint stub doesn't.
    // The r18 persist+count+Pin.sized build also leaked the persist
    // and re-ran on every invocation; the count below reads the
    // checkpointed stub (single narrow partition at proxy scale).
    val nodes = Pin.eager(e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct())
    val n = nodes.count()
    if (n == 0) {
      // empty graph (no vector shares a cell): nothing to rank
      return edgesIn.sparkSession.emptyDataFrame
        .withColumn("vec_id", lit(0L)).withColumn("q_rank", lit(0L))
        .withColumn("pagerank", lit(0.0)).limit(0)
    }
    val init = SCALE / n
    val base = (SCALE * 15L / 100L) / n
    var scores = nodes.select(col("id"), lit(init).as("sc"))
    for (i <- 1 to iters) {
      val contrib = e.join(scores, col("src") === col("id"))
        .select(col("dst"), expr("sc div deg").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("in"))
      scores = nodes.join(contrib, col("id") === col("dst"), "left")
        .select(col("id"),
          (lit(base) + expr("(85 * coalesce(in, 0)) div 100")).as("sc"))
      // semantic no-op: values are identical either side of the cut
      if (i % checkpointEvery == 0 && i < iters)
        scores = scores.localCheckpoint()
    }
    scores.select(col("id").as("vec_id"), col("sc").as("q_rank"),
      (col("sc").cast("double") / SCALE).as("pagerank"))
      .localCheckpoint()
  }

  /** Residual IVF-PQ (IVFADC proper) — the composition FAISS ships as
    * its production index: PQ codes are learned and applied on the
    * RESIDUAL r = v − centroid(cell(v)), not the raw vector. Residuals
    * concentrate near the origin once the coarse quantizer has
    * absorbed cell geometry, so the same code budget spends its
    * resolution on within-cell detail — the standard accuracy upgrade
    * over raw-vector PQ at identical index size. The probe computes a
    * separate residual against EACH probed cell's centroid (per
    * (probe, cell) ADC tables — the IVFADC contract).
    *
    * Determinism: cell assignment and code argmins tie-break to the
    * lowest id/code; residual arithmetic is exact int64 differences of
    * quantized vectors; ADC block distances are exact integer
    * `rr − 2·dot + bb`. Codebook entries are the residuals of the
    * `vec_id % codebookMod == 0` subset — a DIFFERENT stride than the
    * centroid seeds, whose own residuals are ~zero and would collapse
    * the codebook.
    *
    * Scale shape: identical to `ivfPqTopK` — centroids, residual
    * codebooks, and per-(probe,cell) tables all broadcast; the (cell,
    * codes) index is built in ONE corpus scan (assignment, residual,
    * and m code argmins fuse into a single projection); the only
    * corpus exchange is the candidate join on `cell`. */
  def ivfPqResidualTopK(emb: DataFrame, probes: DataFrame, k: Int = 5,
      nprobe: Int = 3, m: Int = 4, centroidMod: Int = 50,
      codebookMod: Int = 37): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // pinned (r19): `e` fed the centroid pack and the residual
    // projection, and `resid` fed both codebook training and the index
    // projection — the full assignment+residual chain ran TWICE per
    // invocation (two identical 64-task stages in the r19 profile).
    // Both pins are the narrow linear index shape ((id,q,nq) and
    // (id,cell,r)); the heavy raw embeddings are scanned once.
    val e = quantizedPinned(emb)
    val cents = e.where(col("vec_id") % centroidMod === 0)
      .select(col("vec_id").as("cent_id"), col("q").as("cq"), col("nq").as("ncq"))
    val centPack = cents.agg(collect_list(
      struct(col("cent_id"), col("cq"), col("ncq"))).as("ivf_cs"))
    // assignment + residual in one projection (centroid vector fetched
    // from the broadcast pack by cell id)
    def cellCq(cellCol: Column) = element_at(
      filter(col("ivf_cs"), c => c.getField("cent_id") === cellCol), 1)
      .getField("cq")
    val resid = Pin.eager(e.crossJoin(broadcast(centPack))
      .withColumn("cell", graft.functions.NearestCentroidCosine
        .nearestCos(col("q"), col("nq"), col("ivf_cs")))
      .select(col("vec_id"), col("cell"),
        zip_with(col("q"), cellCq(col("cell")), (x, y) => x - y).as("r")))
    val books = subspaceBooks(
      resid.where(col("vec_id") % codebookMod === 0)
        .agg(array_sort(collect_list(struct(
          col("vec_id").as("cent_id"), col("r").as("cq")))).as("cs")), m)
    val indexed = resid.crossJoin(broadcast(books))
      .select(col("vec_id"), col("cell"),
        array((0 until m).map { j =>
          val sub = (size(col("r")) / m).cast("int")
          graft.functions.NearestCentroidL2.nearestL2(
            slice(col("r"), lit(j) * sub + 1, sub), col(s"cs_$j"))
            .getField("cluster")
        }: _*).as("codes"))
    val p0 = quantizedWithNorm(probes)
      .select(col("vec_id").as("probe_id"), col("q").as("pq"), col("nq").as("npq"))
    val probeCells = p0.crossJoin(broadcast(cents))
      .select(col("probe_id"), col("pq"), col("cent_id"),
        cosineN(dotL(col("pq"), col("cq")), col("npq"), col("ncq")).as("cs2"),
        col("cq"))
      .withColumn("rk", row_number().over(Window.partitionBy(col("probe_id"))
        .orderBy(col("cs2").desc, col("cent_id").asc)))
      .where(col("rk") <= nprobe)
      .select(col("probe_id"), col("cent_id").as("cell"),
        zip_with(col("pq"), col("cq"), (x, y) => x - y).as("pr"))
    val probeTabs = probeCells.crossJoin(broadcast(books))
      .select(col("probe_id"), col("cell"),
        array((0 until m).map { j =>
          val sub = (size(col("pr")) / m).cast("int")
          val pblk = slice(col("pr"), lit(j) * sub + 1, sub)
          transform(array_sort(col(s"cs_$j")), c =>
            dotL(pblk, pblk) - lit(2L) * dotL(pblk, c.getField("blk"))
              + c.getField("bb"))
        }: _*).as("tables"))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("adist").asc, col("vec_id").asc)
    probeTabs.join(indexed, "cell")
      .where(col("probe_id") =!= col("vec_id"))
      .select(col("probe_id"), col("vec_id"),
        graft.functions.PqAdc.pqAdc(col("codes"), col("tables")).as("adist"))
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= k)
      .drop("rk")
  }

  /** Scalar (int8) quantization encode — the memory-bandwidth ANN tier
    * between full-precision brute force and PQ: each DIMENSION gets an
    * affine [min, max] → [0, 255] map from corpus statistics and every
    * vector compresses to one byte-range code per dimension (8×
    * smaller scans than the ·1000 long quantization, no codebook
    * training). code_d = floor((q_d − min_d)·255 / (max_d − min_d)),
    * clamped trivially by construction; a constant dimension encodes
    * 0. All arithmetic is exact (integer products ≪ 2^53 through one
    * floored double division), so any engine reproduces the codes
    * bit-for-bit.
    *
    * Scale shape: per-dim min/max is one posexplode + (dim) groupBy —
    * map-side combinable, dim-count rows out — collected to a SINGLE
    * broadcast array row (same pattern as the centroid packs); the
    * encode itself is then a pure zip_with scan projection — the
    * corpus never shuffles. */
  def sqEncode(emb: DataFrame): DataFrame = {
    val e = emb.select(col("vec_id"), quantize(col("embedding")).as("q"))
    val pack = sqDimPack(e)
    e.crossJoin(broadcast(pack))
      .select(col("vec_id"), sqCodes(col("q"), col("dims")).as("codes"))
  }

  /** One-row (dim, lo, hi) pack, dim-ordered (array_sort on the struct
    * array orders by its first field = dim). */
  private def sqDimPack(e: DataFrame): DataFrame =
    e.select(posexplode(col("q")).as(Seq("dim", "v")))
      .groupBy(col("dim")).agg(min(col("v")).as("lo"), max(col("v")).as("hi"))
      .agg(array_sort(collect_list(
        struct(col("dim"), col("lo"), col("hi")))).as("dims"))

  /** Element-wise code array for a quantized vector under a dim pack. */
  private def sqCodes(q: Column, dims: Column): Column =
    zip_with(q, dims, (x, d) =>
      when(d.getField("hi") > d.getField("lo"),
        floor(((x - d.getField("lo")) * 255L).cast("double")
          / (d.getField("hi") - d.getField("lo")).cast("double")).cast("long"))
        .otherwise(lit(0L)))

  /** Top-k by symmetric scalar-quantized distance: probes encode under
    * the SAME corpus dim pack, distance = Σ(pc_d − c_d)² — exact int64
    * end-to-end (no asymmetric float path to disagree over). Plan:
    * probe codes broadcast, one corpus scan computing pp − 2·p·c + cc
    * via the native dot product, per-probe top-k via the rank window
    * WindowGroupLimit prunes map-side. The standard SQ trade: recall
    * dips where the affine grid aliases, which the gate entry pins
    * rather than hides. */
  def sqTopK(emb: DataFrame, probes: DataFrame, k: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // pinned (r19): `e` feeds both the dim-pack aggregate and the
    // encode projection — two full scan+quantize chains before
    val e = quantizedPinned(emb).select(col("vec_id"), col("q"))
    val pack = sqDimPack(e)
    val enc = e.crossJoin(broadcast(pack))
      .select(col("vec_id"), sqCodes(col("q"), col("dims")).as("codes"))
      .select(col("vec_id"), col("codes"),
        dotL(col("codes"), col("codes")).as("cc"))
    val penc = probes.select(col("vec_id").as("probe_id"),
        quantize(col("embedding")).as("pq"))
      .crossJoin(broadcast(pack))
      .select(col("probe_id"), sqCodes(col("pq"), col("dims")).as("pcodes"))
      .select(col("probe_id"), col("pcodes"),
        dotL(col("pcodes"), col("pcodes")).as("pp"))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("sq_dist").asc, col("vec_id").asc)
    enc.crossJoin(broadcast(penc))
      .where(col("probe_id") =!= col("vec_id"))
      .select(col("probe_id"), col("vec_id"),
        (col("pp") - lit(2L) * dotL(col("pcodes"), col("codes"))
          + col("cc")).as("sq_dist"))
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= k)
      .drop("rk")
  }

  /** Greedy k-center (farthest-point) coreset selection — the
    * diversity-sampling primitive behind coreset curation: pick the
    * `k` vectors that best COVER the corpus geometrically (each new
    * pick is the point farthest from everything picked so far — the
    * classic 2-approximation to the k-center objective). Complements
    * `clusterBalancedSample` (which balances cluster mass) by
    * maximizing spread instead.
    *
    * Deterministic contract: seed = lowest vec_id; each round adds
    * the (min-sq-L2-to-selected DESC, vec_id ASC) argmax over exact
    * integer quantized distances; stops early when the farthest
    * remaining distance is 0 (every point duplicates a selection —
    * no coverage left to add). Returns (sel_rank, vec_id, dist) with
    * dist = the selection-time coverage radius (seed: 0); the rank-i
    * dist column is the standard k-center radius curve, monotone
    * non-increasing.
    *
    * Scale shape — eager driver loop like `bpeLearnMerges`: the
    * quantized corpus is cached ONCE; each of the k rounds is a pure
    * scan projection (native NearestCentroidL2 over the ≤k selected
    * vectors collected to one broadcast array row) into a
    * partial-aggregatable 1-row max_by — the corpus NEVER shuffles,
    * and driver state is k·dim longs. k passes over a cached corpus
    * is the canonical distributed form; the incremental running-min
    * variant trades those passes for k materializations of a
    * corpus-sized column — strictly worse below thousands of picks. */
  def kcenterSample(emb: DataFrame, k: Int = 6): DataFrame = {
    require(k >= 1, "k must be positive")
    val spark = emb.sparkSession
    import spark.implicits._
    // eager pin (r18, registry-keyed r19): the k selection passes each
    // scan this frame — cached-only, every pass's tasks
    // re-deserialized the quantize lineage (6 × 64-task collect jobs
    // for KB-scale picks); the r18 cache+Pin.sized build additionally
    // re-ran on every invocation
    val e = Pin.eager(
      emb.select(col("vec_id"), quantize(col("embedding")).as("q")))
    try {
      val seedRows = e.orderBy(col("vec_id").asc).limit(1).collect()
      if (seedRows.isEmpty)
        // empty corpus slice: an empty typed result, not an opaque
        // ArrayIndexOutOfBounds from the driver-side seed access
        return Seq.empty[(Long, Long, Long)]
          .toDF("sel_rank", "vec_id", "dist")
      val seed = seedRows(0)
      val sel = scala.collection.mutable.ArrayBuffer[(Long, Array[Long], Long)](
        (seed.getLong(0), seed.getSeq[Long](1).toArray, 0L))
      var exhausted = false
      for (_ <- 2 to k if !exhausted) {
        val packed = sel.toSeq
          .map { case (id, q, _) => (id, q, q.map(x => x * x).sum) }
          .toDF("cluster", "cq", "cqq")
          .agg(collect_list(struct(col("cluster"), col("cq"), col("cqq"))).as("cs"))
        val far = e.crossJoin(broadcast(packed))
          .select(col("vec_id"), col("q"),
            graft.functions.NearestCentroidL2.nearestL2(col("q"), col("cs"))
              .getField("d").as("d"))
          .agg(max_by(struct(col("vec_id"), col("q"), col("d")),
            struct(col("d"), (-col("vec_id")).as("nv"))).as("m"))
          .select(col("m.vec_id"), col("m.q"), col("m.d")).collect()(0)
        if (far.getLong(2) == 0L) exhausted = true
        else sel += ((far.getLong(0), far.getSeq[Long](1).toArray, far.getLong(2)))
      }
      sel.toSeq.zipWithIndex
        .map { case ((id, _, d), i) => (i + 1L, id, d) }
        .toDF("sel_rank", "vec_id", "dist")
    } finally { () } // pin lifetime is registry-managed
  }

  /** Two-stage retrieval — the production ANN serving composition:
    * stage 1 takes the `r`-deep IVF-PQ shortlist (`ivfPqTopK` with
    * k = r: cell pruning bounds candidates, ADC over m codes scores
    * them), stage 2 re-ranks ONLY those r·|probes| survivors with the
    * exact full-precision cosine and keeps the top k. ADC distance is
    * a lossy proxy (block-quantized); re-ranking the shortlist buys
    * back exact ordering while touching a candidate set that is
    * bounded by r, not by the corpus.
    *
    * Scale shape: the shortlist (r·|probes| rows of (probe_id,
    * vec_id)) BROADCASTS into a hash join against the corpus scan —
    * the full-precision vectors are fetched by streaming the corpus
    * past a tiny hash table, never by shuffling it; probe vectors
    * broadcast the same way. Stage 1's only corpus exchange (the
    * candidate join on `cell`) remains the whole composition's only
    * corpus exchange. Tie-breaks: (adist ASC, vec_id ASC) for the
    * shortlist cut, (cosine DESC, vec_id ASC) for the final ranking —
    * both deterministic, so the two-stage result is bit-reproducible
    * cross-engine. */
  def ivfPqRerank(emb: DataFrame, probes: DataFrame, k: Int = 5,
      r: Int = 10, nprobe: Int = 3, m: Int = 4,
      centroidMod: Int = 50): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(r >= k, "shortlist depth r must be >= k")
    val shortlist = ivfPqTopK(emb, probes, k = r, nprobe, m, centroidMod)
      .select(col("probe_id"), col("vec_id"))
    // pinned (r19): plan-keyed, so this is the SAME registry entry
    // ivfPqTopK just built — the exact re-rank reads the one proxy
    // instead of re-quantizing the corpus a second time
    val e = quantizedPinned(emb)
    val p = quantizedWithNorm(probes)
      .select(col("vec_id").as("probe_id"), col("q").as("pq"),
        col("nq").as("npq"))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("cosine_sim").desc, col("vec_id").asc)
    e.join(broadcast(shortlist), "vec_id")
      .join(broadcast(p), "probe_id")
      .select(col("probe_id"), col("vec_id"),
        cosineN(dotL(col("pq"), col("q")), col("npq"), col("nq")).as("cosine_sim"))
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= k)
      .drop("rk")
  }

  /** Matryoshka-style truncated-dimension retrieval — the two-stage
    * serving pattern for MRL-trained embeddings (Kusupati et al.,
    * "Matryoshka Representation Learning"): stage 1 scores the corpus
    * with cosine over only the FIRST `dims` dimensions (an MRL
    * embedding front-loads information, so the prefix is itself a
    * usable low-dim embedding) and keeps an r-deep shortlist; stage 2
    * re-ranks those r·|probes| survivors with exact full-dimension
    * cosine. The prefix pass costs dims/D of the full-scan FLOPs and
    * memory bandwidth — with a separately-stored prefix index it reads
    * dims/D of the bytes — which is the whole point at 100 TB of
    * vectors.
    *
    * Scale shape: stage 1 is one corpus scan against a broadcast probe
    * batch with WindowGroupLimit map-side top-r pruning (bruteAllTopK's
    * plan over narrower vectors — no index build, no corpus shuffle);
    * stage 2 broadcasts the shortlist into a hash join against the
    * corpus scan exactly like `ivfPqRerank`. Tie-breaks (pre_sim DESC,
    * vec_id ASC) then (cosine DESC, vec_id ASC) — deterministic and
    * oracle-checkable end to end (ExtOracle.matryoshkaTopK). */
  def matryoshkaTopK(emb: DataFrame, probes: DataFrame, k: Int = 5,
      r: Int = 10, dims: Int = 16): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(r >= k, "shortlist depth r must be >= k")
    require(dims >= 1, "prefix must keep at least one dimension")
    def prefixed(df: DataFrame) = df
      .select(col("vec_id"), quantize(col("embedding")).as("q"))
      .select(col("vec_id"), slice(col("q"), 1, dims).as("qp"))
      .select(col("vec_id"), col("qp"), normQ(col("qp")).as("np"))
    val ep = prefixed(emb)
    val pp = prefixed(probes).select(col("vec_id").as("probe_id"),
      col("qp").as("pqp"), col("np").as("pnp"))
    val w1 = Window.partitionBy(col("probe_id"))
      .orderBy(col("pre_sim").desc, col("vec_id").asc)
    val shortlist = ep.crossJoin(broadcast(pp))
      .where(col("probe_id") =!= col("vec_id"))
      .select(col("probe_id"), col("vec_id"),
        cosineN(dotL(col("pqp"), col("qp")), col("pnp"), col("np")).as("pre_sim"))
      .withColumn("rk", row_number().over(w1))
      .where(col("rk") <= r)
      .select("probe_id", "vec_id")
    val e = quantizedWithNorm(emb)
    val p = quantizedWithNorm(probes).select(col("vec_id").as("probe_id"),
      col("q").as("pq"), col("nq").as("npq"))
    val w2 = Window.partitionBy(col("probe_id"))
      .orderBy(col("cosine_sim").desc, col("vec_id").asc)
    e.join(broadcast(shortlist), "vec_id")
      .join(broadcast(p), "probe_id")
      .select(col("probe_id"), col("vec_id"),
        cosineN(dotL(col("pq"), col("q")), col("npq"), col("nq")).as("cosine_sim"))
      .withColumn("rk", row_number().over(w2))
      .where(col("rk") <= k)
      .drop("rk")
  }

  /** Distributed k-means (Lloyd's algorithm, FIXED iteration count) —
    * the clustering primitive behind cluster-based curation (topic
    * balancing, cluster-level dedup/pruning, importance-weighted
    * mixes). Built for exact cross-engine determinism, unlike MLlib's
    * sampled/seeded KMeans:
    *
    *  - init: the k lowest-vec_id vectors, cluster id = that vec_id;
    *  - assignment: exact integer squared-L2 argmin over broadcast
    *    centroids (d = qq − 2·q·c + cc from precomputed self-dots —
    *    one dot per pair), partial-aggregatable min_by with (d,
    *    cluster) tie-break;
    *  - update: per-(cluster, dim) integer sums → floor(sum/count)
    *    component (one IEEE double division + floor, identical on any
    *    engine) → centroid arrays reassembled by sorted dim.
    *
    * Empty clusters (possible when duplicate init points tie) simply
    * drop out, the standard Lloyd behavior. A fixed `iters` (not a
    * convergence test) keeps the plan static and the result
    * reproducible bit-for-bit.
    *
    * Scale shape per iteration: assignment is a broadcast-array
    * PROJECTION (native NearestCentroidL2 over the collected centroid
    * row — the corpus never shuffles at any point) + one posexplode
    * groupBy on (cluster, dim) whose exchange carries only k·dim
    * partial sums after map-side combine. The corpus is scanned
    * iters+2 times (init + each pass); cache the quantized input when
    * iterating more deeply. */
  def kmeansAssign(emb: DataFrame, k: Int = 8, iters: Int = 2): DataFrame = {
    // quantized input pinned eagerly (r18): the Lloyd loop scans `e`
    // iters+2 times (init + one assignment per pass + the final
    // assignment), and each scan re-ran the quantize+self-dot
    // projection over the raw embeddings (3 × ~10 s executor time at
    // sf0.1 for iters=2). The pin is the linear quantized proxy — the
    // same narrow shape the ANN index tiers materialize.
    val e = Pin.eager(
      emb.select(col("vec_id"), quantize(col("embedding")).as("q"))
        .select(col("vec_id"), col("q"), dotL(col("q"), col("q")).as("qq")))
    // Assignment is a pure projection (see ivfAssign's comment): the
    // k centroids collect into ONE broadcast array row and the native
    // NearestCentroidL2 computes the (d, cluster)-argmin per vector
    // inside WholeStageCodegen — the corpus is never exchanged; each
    // Lloyd iteration's only shuffle is the k·dim partial-sum rollup.
    def assign(cents: DataFrame): DataFrame = {
      val packed = cents.agg(collect_list(
        struct(col("cluster"), col("cq"), col("cqq"))).as("cs"))
      e.crossJoin(broadcast(packed))
        .select(col("vec_id"), col("q"),
          graft.functions.NearestCentroidL2
            .nearestL2(col("q"), col("cs")).as("m"))
        .select(col("vec_id"), col("m.cluster").as("cluster"),
          col("m.d").as("dist"), col("q"))
    }
    var cents = e.orderBy(col("vec_id").asc).limit(k)
      .select(col("vec_id").as("cluster"), col("q").as("cq"),
        col("qq").as("cqq"))
    for (_ <- 1 to iters) {
      cents = assign(cents)
        .select(col("cluster"), posexplode(col("q")).as(Seq("dim", "v")))
        .groupBy(col("cluster"), col("dim"))
        .agg(sum(col("v")).as("s"), count(lit(1)).as("n"))
        .withColumn("c",
          floor(col("s").cast("double") / col("n").cast("double")).cast("long"))
        .groupBy(col("cluster"))
        .agg(transform(
          array_sort(collect_list(struct(col("dim"), col("c")))),
          x => x.getField("c")).as("cq"))
        .select(col("cluster"), col("cq"), dotL(col("cq"), col("cq")).as("cqq"))
    }
    assign(cents).select(col("vec_id"), col("cluster"), col("dist"))
  }

  /** Cluster-balanced subsampling — k-means topic clusters, then an
    * equal per-cluster cap: the "topic balancing" selector that stops
    * one dominant mode (one crawl domain, one boilerplate family) from
    * monopolizing a training mix. Members are capped in deterministic
    * pseudo-random order (Knuth bucket of vec_id, then vec_id — not id
    * prefix order, which would bias toward early ids).
    *
    * Scale shape: kmeansAssign's passes + one per-cluster top-k window
    * — row_number ≤ cap gets WindowGroupLimit map-side pruning, so
    * each map task forwards at most cap rows per cluster. */
  def clusterBalancedSample(emb: DataFrame, k: Int = 8, iters: Int = 2,
      cap: Int = 40): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("cluster"))
      .orderBy(Sampling.bucket(col("vec_id"), 10000).asc, col("vec_id").asc)
    kmeansAssign(emb, k, iters)
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= cap)
      .select(col("vec_id"), col("cluster"))
  }

  /** Per-label centroid components over quantized embeddings — the
    * "mean vector per class" primitive (label prototypes, class-aware
    * IVF seeding, embedding-drift monitoring). posexplode to
    * (label, dim, q) then ONE partial-aggregatable groupBy — narrow
    * rows through the shuffle, no vector reassembly; emits the exact
    * integer sum + count alongside the derived mean so the result is
    * bit-reproducible on any engine. */
  def labelCentroids(emb: DataFrame): DataFrame =
    emb.select(col("label"),
      posexplode(quantize(col("embedding"))).as(Seq("dim", "q")))
      .groupBy(col("label"), col("dim"))
      .agg(sum(col("q")).as("sum_q"), count(lit(1)).as("n_vecs"))
      .withColumn("mean_q",
        col("sum_q").cast("double") / col("n_vecs").cast("double"))

  /** SemDeDup-style semantic deduplication — the cluster-then-prune
    * recipe for embedding-level dedup of web-scale corpora (prune
    * near-identical *meanings*, not just near-identical bytes):
    *
    *   1. coarse-cluster the corpus into IVF cells (`ivfAssign`:
    *      deterministic centroids, broadcast assignment);
    *   2. exact quantized cosine WITHIN each cell only — pairs in
    *      different cells are never compared, which is the step that
    *      turns the N² pair space into Σ|cell|² (≈ N·√N worst-case
    *      with √N-sized cells, near-linear for balanced cells);
    *   3. connected components over ≥-threshold pairs
    *      (`Dedup.dupClusters` — same superstep/min-label machinery
    *      as the text-dedup path);
    *   4. keep one canonical survivor (min vec_id) per component.
    *
    * Shuffle shape at 100 TB: the within-cell self-join hash-partitions
    * both sides by `cell`, so each cell's pairing is partition-local;
    * vectors ride that shuffle once per side and nothing else moves.
    * Cell granularity (centroidMod) is the knob bounding per-partition
    * pair work. Returns the surviving corpus rows unchanged. */
  def semanticDedup(emb: DataFrame, threshold: Double = 0.4,
      centroidMod: Int = 50): DataFrame =
    emb.join(semanticDupLosers(emb, threshold, centroidMod),
      Seq("vec_id"), "left_anti")

  /** The pruned side of `semanticDedup`: vec_ids that are non-canonical
    * members of a within-cell near-dup component. Exposed separately so
    * compositions (e.g. `Curation.pretrainingCorpus`) can anti-join the
    * loser sliver against their own frame without re-deriving it. */
  def semanticDupLosers(emb: DataFrame, threshold: Double = 0.4,
      centroidMod: Int = 50): DataFrame = {
    // pinned eagerly (r18): the cell self-join references the assigned
    // table on both sides and each side planned its own quantize+assign
    // chain (2 × the full pipeline per invocation, measured as two
    // identical 64-task map stages in pretraining_corpus) — the same
    // duplicate-sides fix knnGraph got. The pin is the narrow (cell,
    // id, q, nq) proxy.
    val assigned = Pin.eager(ivfAssign(emb, centroidMod))
    // Shuffle-merge, not the stats-suggested broadcast: the assigned
    // frame is corpus-proportional (one row per vector, carrying the
    // quantized embedding), so a broadcast side is a driver OOM at
    // scale.
    val a = assigned.select(col("cell"), col("vec_id").as("a_id"),
      col("q").as("qa"), col("nq").as("na")).hint("merge")
    val b = assigned.select(col("cell"), col("vec_id").as("b_id"),
      col("q").as("qb"), col("nq").as("nb")).hint("merge")
    val pairs = a.join(b, "cell")
      .where(col("a_id") < col("b_id") &&
        cosineN(dotL(col("qa"), col("qb")), col("na"), col("nb")) >= threshold)
      .select(col("a_id"), col("b_id"))
    Dedup.dupClusters(pairs)
      .where(!col("is_keeper")).select(col("doc_id").as("vec_id"))
  }

  /** Embedding-cosine near-duplicate pairs: probe subset × base with
    * exact quantized cosine ≥ threshold — each probe scored against
    * EVERY other vector (an earlier `a_id < b_id` cut silently hid
    * every lower-id partner, halving each probe's measured near-dup
    * rate). The probe predicate keeps the pair space linear for oracle
    * verification; the broadcast side is |corpus|/probeMod rows, so
    * probeMod must keep it driver-small — the LSH variant above is the
    * full-corpus path with no such bound. */
  def nearDupPairs(emb: DataFrame, threshold: Double = 0.4,
      probeMod: Int = 10): DataFrame = {
    val e = quantizedWithNorm(emb)
    val a = e.where(col("vec_id") % probeMod === 0)
      .select(col("vec_id").as("a_id"), col("q").as("qa"), col("nq").as("na"))
    val b = e.select(col("vec_id").as("b_id"), col("q").as("qb"), col("nq").as("nb"))
    broadcast(a).crossJoin(b)
      .where(col("a_id") =!= col("b_id"))
      .select(col("a_id"), col("b_id"),
        cosineN(dotL(col("qa"), col("qb")), col("na"), col("nb")).as("cosine_sim"))
      .where(col("cosine_sim") >= threshold)
  }

  /** Exact brute-force batch top-k — the recall truth every approximate
    * tier is measured against, and the correct SERVING tier when the
    * probe batch is small and the corpus modest (one scan, no index
    * build). The probe table broadcasts (it must be driver-small: this
    * is by construction a |probes|·|corpus| score space); the corpus is
    * scanned in place — never shuffled — and the per-probe top-k is the
    * row_number window WindowGroupLimit prunes map-side. Returns
    * (probe_id, vec_id, cosine_sim), ties (cosine DESC, vec_id ASC). */
  def bruteAllTopK(emb: DataFrame, probes: DataFrame, k: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = quantizedWithNorm(emb)
    val prb = quantizedWithNorm(probes).select(col("vec_id").as("probe_id"),
      col("q").as("pq"), col("nq").as("npq"))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("cosine_sim").desc, col("vec_id").asc)
    base.crossJoin(broadcast(prb))
      .where(col("probe_id") =!= col("vec_id"))
      .select(col("probe_id"), col("vec_id"),
        cosineN(dotL(col("pq"), col("q")), col("npq"), col("nq")).as("cosine_sim"))
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= k)
      .drop("rk")
  }

  /** Unified ANN serving entry point — one API over the eight tiers,
    * selected by memory budget and recall target (the README "ANN tier
    * selection" table carries the measured recall/latency trade per
    * tier at sf0.1; each tier's own scaladoc carries its plan shape).
    * Strategies and the tier each dispatches to, VERBATIM (the
    * dispatcher adds no plan nodes — spec-tested result-identical to
    * calling the tier directly):
    *
    *  - "brute"          → `bruteAllTopK`    exact, no index, full scan/probe batch
    *  - "lsh"            → `lshTopK`         hash buckets, no training scan
    *  - "ivf"            → `ivfTopK`         cell-pruned exact cosine
    *  - "sq"             → `sqTopK`          int8 codes, 4× memory cut, exact int distance
    *  - "pq"             → `pqTopK`          m-subspace codes, ~dim/m× memory cut
    *  - "ivfpq"          → `ivfPqTopK`       cell-pruned ADC over PQ codes
    *  - "ivfpq_residual" → `ivfPqResidualTopK` IVFADC proper (residual codes)
    *  - "ivfpq_rerank"   → `ivfPqRerank`     ADC shortlist re-ranked full-precision
    *  - "matryoshka"     → `matryoshkaTopK`  prefix-dim shortlist re-ranked full-dim
    *
    * Score column follows the tier's metric (`cosine_sim` for exact /
    * re-ranked tiers, `adist` ADC distance for PQ tiers, `sq_dist` for
    * SQ) — a serving stack switching tiers must not silently reinterpret
    * an approximate distance as a true cosine, so the name says which
    * one it is. Knobs irrelevant to the chosen tier are ignored. */
  def annTopK(emb: DataFrame, probes: DataFrame, k: Int = 5,
      strategy: String = "ivf",
      planes: Int = 8, nprobe: Int = 3, m: Int = 4,
      centroidMod: Int = 50, codebookMod: Int = 37,
      rerankDepth: Int = 10, truncDims: Int = 16): DataFrame = strategy match {
    case "brute" => bruteAllTopK(emb, probes, k)
    case "lsh" => lshTopK(emb, probes, k, planes)
    case "ivf" => ivfTopK(emb, probes, k, nprobe, centroidMod)
    case "sq" => sqTopK(emb, probes, k)
    case "pq" => pqTopK(emb, probes, k, m, centroidMod)
    case "ivfpq" => ivfPqTopK(emb, probes, k, nprobe, m, centroidMod)
    case "ivfpq_residual" =>
      ivfPqResidualTopK(emb, probes, k, nprobe, m, centroidMod, codebookMod)
    case "ivfpq_rerank" =>
      ivfPqRerank(emb, probes, k, rerankDepth, nprobe, m, centroidMod)
    case "matryoshka" => matryoshkaTopK(emb, probes, k, rerankDepth, truncDims)
    case other => throw new IllegalArgumentException(
      s"unknown ANN strategy '$other' — expected one of: brute, lsh, ivf, " +
        "sq, pq, ivfpq, ivfpq_residual, ivfpq_rerank, matryoshka")
  }

  /** Per-dimension embedding statistics — the embedding-health report
    * run before trusting any ANN/clustering tier: count, min, max,
    * mean, variance for every dimension of the quantized space. A
    * dimension with collapsed variance is dead weight in every
    * distance computation (and the first candidate for Matryoshka-
    * style truncation — see `matryoshkaTopK`); a mean far off zero
    * says the vectors were never centered and cosine vs dot-product
    * choices start to matter. Also the input a scalar-quantization
    * tier (`sqDimPack`) would audit before choosing per-dim ranges.
    *
    * Scale shape: one map-side-combinable groupBy on the |dims|-sized
    * key after a posexplode scan projection — the shuffle carries
    * |dims| rows of moment state per task. Moment sums ride
    * decimal(38) (Σq² overflows int64 at corpus scale — the
    * signalCorrelation rule); mean/variance are fixed double
    * expressions from the exact sums, so every engine reproduces them
    * bit-for-bit. */
  def embeddingDimStats(emb: DataFrame): DataFrame = {
    val dec = "decimal(38,0)"
    emb.select(posexplode(quantize(col("embedding"))).as(Seq("dim", "qv")))
      .groupBy(col("dim"))
      .agg(count(lit(1)).as("n_vecs"),
        sum(col("qv").cast(dec)).as("s1"),
        sum(col("qv").cast(dec) * col("qv").cast(dec)).as("s2"),
        min(col("qv")).as("min_q"), max(col("qv")).as("max_q"))
      .select(col("dim").cast("long").as("dim"), col("n_vecs"),
        col("min_q"), col("max_q"),
        (col("s1").cast("double") / col("n_vecs").cast("double"))
          .as("mean_q"),
        // clamped at 0: the exact decimal sums can round to a tiny
        // negative through the double (s2 − s1²/n)/n on a constant
        // dimension — a negative variance reads as nonsense in the
        // health report (twin clamps identically)
        greatest(lit(0.0), (col("s2").cast("double") -
          col("s1").cast("double") * col("s1").cast("double") /
            col("n_vecs").cast("double")) / col("n_vecs").cast("double"))
          .as("var_q"))
  }

  /** Embedding outlier detection — each vector's centroid distance
    * z-scored against ITS OWN cluster's distance distribution: the
    * garbage-vector audit (corrupted decodes, wrong-modality rows,
    * mislabeled shards sit far from every centroid) run BEFORE an ANN
    * index or SemDeDup pass trusts the space. One-sided: only
    * far-outliers flag (tight inliers are the healthy case).
    *
    * Determinism: distances are `kmeansAssign`'s exact int64 sq-L2;
    * per-cluster moments are decimal(38) sums (dist² at quantized
    * scale brushes 2¹²⁷ nowhere, int64 everywhere); mean/var/z are the
    * `eventAnomaly` fixed double expressions, NULL z (→ outlier false)
    * at zero variance.
    *
    * Scale shape: kmeansAssign's projection-only passes + ONE
    * |clusters|-row moment rollup broadcast back over the assignment
    * — nothing new is corpus-proportional. */
  def embeddingOutliers(emb: DataFrame, k: Int = 8, iters: Int = 2,
      threshold: Double = 3.0): DataFrame = {
    val dec = "decimal(38,0)"
    // eager pin (r18): the moment branch and the score join would
    // otherwise each re-execute the full Lloyd chain (the
    // clusterTopTerms/knnPageRank double-build shape — measured 2× op
    // cost), and a LAZY cache still raced AQE's concurrent stages on
    // first evaluation. Kept persisted (no unpersist) so repeated
    // invocations substitute the materialized assignment — at
    // production scale the assignment is persisted/written anyway; it
    // feeds every downstream cluster consumer.
    val assigned = Pin.eager(kmeansAssign(emb, k, iters))
    val stats = assigned.groupBy(col("cluster"))
      .agg(count(lit(1)).as("n_members"),
        sum(col("dist").cast(dec)).as("s1"),
        sum(col("dist").cast(dec) * col("dist").cast(dec)).as("s2"))
    val out = assigned.join(broadcast(stats), "cluster")
      .withColumn("mean_dist",
        col("s1").cast("double") / col("n_members").cast("double"))
      .withColumn("var_dist",
        (col("s2").cast("double") - col("s1").cast("double")
          * col("s1").cast("double") / col("n_members").cast("double"))
          / col("n_members").cast("double"))
      .withColumn("z",
        // <= 0: the decimal moment sums are exact but the double
        // (s2 − s1²/n)/n can round a constant-value group to a tiny
        // NEGATIVE — sqrt of that is NaN, bypassing the NULL contract
        when(col("var_dist") <= 0.0, lit(null).cast("double"))
          .otherwise((col("dist").cast("double") - col("mean_dist"))
            / sqrt(col("var_dist"))))
      .select(col("vec_id"), col("cluster"), col("dist"), col("n_members"),
        col("mean_dist"), col("var_dist"), col("z"),
        coalesce(col("z") > threshold, lit(false)).as("is_outlier"))
      .localCheckpoint()
    out
  }
}
