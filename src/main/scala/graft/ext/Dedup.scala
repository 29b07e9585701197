package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for the `documents` table — the four
  * standard tiers of a pretraining-data dedup pipeline, each built from
  * codegen'd built-ins (no UDFs, no driver-side loops):
  *
  *  1. exact        — sha2(text) groupBy; one shuffle on the hash key.
  *  2. n-gram Jaccard — shingle explode → equi-join on shingle →
  *                      count-ratio; exact, quadratic only within
  *                      shingle buckets.
  *  3. MinHash + LSH — per-row signature (array ops, no shuffle) →
  *                      band buckets → join only within buckets →
  *                      exact-Jaccard verify of candidates.
  *  4. SimHash       — 64-bit sign-of-weighted-sum fingerprint;
  *                      near-dups = small Hamming distance.
  *
  * Scale posture: every pairwise step is bucket-local (LSH bands /
  * shared shingles), never an all-pairs cross join. At 100 TB the only
  * global shuffles are hash-partitioned groupBys on short keys.
  * Shingling is `transform` over a split array — fused into the scan.
  */
object Dedup {

  private def words(text: Column): Column = split(trim(text), "\\s+")

  /** w-token shingles from a PRE-MATERIALIZED words-array column,
    * distinct. `ws` must be an attribute, not the split expression:
    * subtrees embedded in a higher-order-function lambda are
    * re-evaluated per element (and this lambda references the words
    * array w times), so an inlined split() turns one tokenization per
    * row into |shingles|·w — measured 10× slowdown at sf0.1. */
  def shinglesFromWords(ws: Column, w: Int = 3): Column =
    array_distinct(transform(
      sequence(lit(0), greatest(size(ws) - w, lit(0))),
      i => concat_ws(" ", (0 until w).map(j => element_at(ws, i + j + 1)): _*)))

  /** Convenience single-expression form — only for tiny inputs/tests;
    * hot paths must use the two-projection shape (see above). */
  def shingles(text: Column, w: Int = 3): Column =
    shinglesFromWords(words(text), w)

  /** doc_id + distinct shingle array, in the CPU-safe two-projection
    * shape. */
  private def shingled(docs: DataFrame, w: Int): DataFrame =
    docs.select(col("doc_id"), words(col("text")).as("ws"))
      .select(col("doc_id"), shinglesFromWords(col("ws"), w).as("sh"))

  /** doc_id + distinct 64-bit shingle hashes via the native fused
    * `HashedShingles` expression (tokenize → shingle → hash in one
    * codegen'd pass; see graft.functions.Shingling). All pairwise
    * dedup paths run on these hashes: fixed-width join keys, ~3×
    * narrower shuffles than shingle strings, equivalence with the
    * string path tested in ScaleOpsSpec. */
  private def hashedShingled(docs: DataFrame, w: Int): DataFrame =
    docs.select(col("doc_id"),
      graft.functions.HashedShingles.hashedShingles(words(col("text")), w).as("sh"))

  /** Exact dedup: group identical texts by sha256, keep lowest doc_id.
    * (At scale: shuffle on the 32-byte digest, not the document body.) */
  def exact(docs: DataFrame): DataFrame =
    docs.groupBy(sha2(col("text"), 256).as("text_sha"))
      .agg(min(col("doc_id")).as("keep_id"),
        count("*").as("n_copies"))

  /** Exact n-gram Jaccard similarity for every pair sharing ≥1 shingle.
    * |A∩B| from the shingle join, |A∪B| = |A|+|B|−|A∩B|. */
  def ngramJaccardPairs(docs: DataFrame, w: Int = 3, minJaccard: Double = 0.5): DataFrame = {
    // pinned eagerly (r18): the self-join's two sides each planned
    // their own tokenize+shingle+hash chain (the claimed exchange
    // reuse between the identical hinted sides does NOT fire under
    // AQE — two identical heavy map stages, measured). The pin is the
    // per-doc hash-array table (8 bytes/shingle), never document text.
    val sized = Pin.eager(
      hashedShingled(docs, w).withColumn("n_sh", size(col("sh"))))
    val exploded = sized.select(col("doc_id"), col("n_sh"),
      explode(col("sh")).as("s"))
    // Force the shuffle-merge join: Spark's size estimate for the
    // exploded shingle stream reads "broadcastable" at fixture scale,
    // but the stream is corpus-proportional — a broadcast side here is
    // exactly the shape that dies first at 100 TB, and even at sf0.1
    // building the hash relation costs ~3× the shuffle (measured).
    // AQE's skew-join split also only applies to shuffle joins, which
    // is what hot shingles need.
    val a = exploded.toDF("a_id", "a_n", "s").hint("merge")
    val b = exploded.toDF("b_id", "b_n", "s").hint("merge")
    a.join(b, "s")
      .where(col("a_id") < col("b_id"))
      .groupBy(col("a_id"), col("b_id"))
      .agg(count("*").as("inter"), min(col("a_n")).as("a_n"),
        min(col("b_n")).as("b_n"))
      .select(col("a_id"), col("b_id"),
        (col("inter").cast("double") /
          (col("a_n") + col("b_n") - col("inter")).cast("double"))
          .as("jaccard"))
      .where(col("jaccard") >= minJaccard)
  }

  /** Shingle CONTAINMENT pairs — Broder's asymmetric companion to
    * resemblance: c(A→B) = |A∩B| / |A|. A short document quoted
    * inside a long one scores containment ≈ 1 while its Jaccard stays
    * low (the union is dominated by the long side), so containment is
    * the signal that catches quotation/subset duplication the
    * resemblance tier misses. Emits both directions per pair; filter
    * on the max. Same shuffle-merged shingle self-join and exchange
    * reuse as `ngramJaccardPairs` — one extra projection, no new
    * exchange. */
  def containmentPairs(docs: DataFrame, w: Int = 3,
      minContainment: Double = 0.8): DataFrame = {
    // pinned eagerly (r18): same duplicate-sides fix as ngramJaccardPairs
    val sized = Pin.eager(
      hashedShingled(docs, w).withColumn("n_sh", size(col("sh"))))
    val exploded = sized.select(col("doc_id"), col("n_sh"),
      explode(col("sh")).as("s"))
    val a = exploded.toDF("a_id", "a_n", "s").hint("merge")
    val b = exploded.toDF("b_id", "b_n", "s").hint("merge")
    a.join(b, "s")
      .where(col("a_id") < col("b_id"))
      .groupBy(col("a_id"), col("b_id"))
      .agg(count("*").as("inter"), min(col("a_n")).as("a_n"),
        min(col("b_n")).as("b_n"))
      .select(col("a_id"), col("b_id"),
        (col("inter").cast("double") / col("a_n").cast("double"))
          .as("containment_a_in_b"),
        (col("inter").cast("double") / col("b_n").cast("double"))
          .as("containment_b_in_a"))
      .where(greatest(col("containment_a_in_b"), col("containment_b_in_a"))
        >= minContainment)
  }

  /** Dup-graph transitivity audit — one row of global graph metrics
    * over a near-dup pair set: wedge count (paths x–c–y), closed-wedge
    * count, triangle count, and global transitivity C = closed/wedges.
    * This is the THRESHOLD-QUALITY dashboard for the sketch tiers: a
    * sound similarity cut is near-transitive (a≈b ≈c ⇒ a≈c — C → 1,
    * safe to collapse clusters to one keeper), while a loose cut
    * chains unrelated docs through hubs (C ≪ 1 — cluster-collapse
    * would over-delete, pairwise review needed). Run it before
    * trusting `dupClusters`' connected components as dedup units.
    *
    * Scale shape: runs on the pair SLIVER, never the corpus; the
    * wedge space is Σ_c deg(c)² — bounded by near-dup cluster sizes
    * (the same quantity that bounds `dupClusters`), with the closure
    * probe a shuffle-merged join back against the edge list on the
    * (x, y) key. All-integer output plus one double division. */
  def dupGraphTransitivity(pairs: DataFrame): DataFrame = {
    val e = pairs.select(col("a_id"), col("b_id"))
    val und = e.unionAll(e.select(col("b_id"), col("a_id"))).toDF("c", "n")
    val wedges = und.toDF("c", "x").join(und.toDF("c", "y"), "c")
      .where(col("x") < col("y"))
    val closed = wedges.join(
      e.select(col("a_id").as("x"), col("b_id").as("y"),
        lit(1L).as("__e")),
      Seq("x", "y"), "left")
    closed.agg(count(lit(1)).as("n_wedges"),
        sum(when(col("__e").isNotNull, 1L).otherwise(0L))
          .as("n_closed_wedges"))
      .crossJoin(broadcast(e.agg(count(lit(1)).as("n_edges"))))
      .select(col("n_edges"), col("n_wedges"), col("n_closed_wedges"),
        expr("n_closed_wedges div 3").as("n_triangles"),
        when(col("n_wedges") === 0L, lit(null).cast("double"))
          .otherwise(col("n_closed_wedges").cast("double")
            / col("n_wedges").cast("double")).as("transitivity"))
  }

  /** Winnowing fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD'03 —
    * the MOSS algorithm): per document, the set of window-minimum
    * shingle hashes — every `window` consecutive w-gram positions
    * contribute their minimum hash, so any shared run of at least
    * w + window − 1 tokens between two documents is GUARANTEED to
    * surface as a shared fingerprint (the local-min selection is
    * position-shift-robust, which plain every-Nth sampling is not),
    * at expected density 2/(window+1) of the shingle stream. The
    * robust complement to `fingerprintDocs`' single rolling hash:
    * that detects whole-doc identity, this localizes partial overlap.
    *
    * Short docs (< window shingles) keep their global minimum — one
    * fingerprint — so no document is invisible to the join.
    *
    * Determinism: polyhash64 shingle hashes (the portable family the
    * oracle recomputes), SIGNED-long minima (Spark's min; the twin
    * re-signs before MIN), value-set fingerprints (position metadata
    * dropped — dedup compares sets).
    *
    * Scale shape: the positional hash array is a two-projection scan
    * fusion (words attribute first — the lambda-inlining trap in
    * `shinglesFromWords`' scaladoc); the window min runs per document
    * (partitionBy doc_id — thousands of parallel partitions, each a
    * doc-length frame, never a global window); the distinct is a
    * map-combinable (doc, fp) aggregate. */
  def winnowFingerprints(docs: DataFrame, w: Int = 3,
      window: Int = 4): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val positional = docs.select(col("doc_id"), words(col("text")).as("ws"))
      .select(col("doc_id"), transform(
        sequence(lit(0), greatest(size(col("ws")) - w, lit(0))),
        i => graft.functions.PolyHash64.polyhash64(
          concat_ws(" ",
            (0 until w).map(j => element_at(col("ws"), i + j + 1)): _*)))
        .as("hs"))
    val win = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      .rowsBetween(Window.currentRow, window - 1)
    positional
      .select(col("doc_id"), size(col("hs")).as("n_sh"),
        posexplode(col("hs")).as(Seq("pos", "h")))
      .withColumn("fp", min(col("h")).over(win))
      .where(col("pos") <= greatest(col("n_sh") - window, lit(0)))
      .select(col("doc_id"), col("fp")).distinct()
  }

  /** Partial-overlap candidate pairs from shared winnowing
    * fingerprints — the MOSS report shape: documents sharing ≥
    * `minShared` fingerprint values, i.e. at least that many distinct
    * guaranteed-common token runs. Candidates only (verify with
    * `editDistanceVerify` / `ngramJaccardPairs` on the sliver, as the
    * MinHash tier does).
    *
    * Scale shape: the fingerprint self-join is shuffle-merged on the
    * fp key (`hint("merge")` — the broadcast-misestimate and
    * AQE-skew-split reasoning in `ngramJaccardPairs`' comment applies
    * verbatim: a boilerplate fingerprint is a hot key), with the
    * exchange computed once and reused across both sides; the pair
    * rollup is a narrow (a, b) count. */
  def winnowCandidates(docs: DataFrame, w: Int = 3, window: Int = 4,
      minShared: Int = 2): DataFrame = {
    // pinned eagerly (r18): the fp self-join's sides each re-ran the
    // whole winnowing chain (positional hash + per-doc window min) —
    // the pin is the (doc_id, fp) value set, 16 bytes/fingerprint
    val f = Pin.eager(winnowFingerprints(docs, w, window))
    val a = f.toDF("a_id", "fp").hint("merge")
    val b = f.toDF("b_id", "fp").hint("merge")
    a.join(b, "fp")
      .where(col("a_id") < col("b_id"))
      .groupBy(col("a_id"), col("b_id"))
      .agg(count(lit(1)).as("n_shared"))
      .where(col("n_shared") >= minShared)
  }

  /** Prefix-filtered exact n-gram Jaccard (AllPairs/PPJoin candidate
    * generation): identical output to `ngramJaccardPairs`, built for
    * corpora where hot shingles make the naive shingle self-join
    * quadratic.
    *
    * For J(A,B) ≥ t, any qualifying pair shares ≥ ⌈t·|A|⌉ shingles, so
    * it must share at least one of A's first |A| − ⌈t·|A|⌉ + 1 shingles
    * under ANY global total order. Ordering rarest-first (corpus
    * document frequency ASC) keeps hot shingles out of almost every
    * prefix — the posting list for "of the and" disappears instead of
    * fanning out quadratically. Candidates are then verified with the
    * exact intersection (`array_intersect` on the full shingle arrays),
    * so the prefix filter can only prune, never change results.
    *
    * Scale shape: one extra aggregation (document frequencies) and a
    * per-doc window sort, in exchange for posting lists bounded by
    * prefix length and free of hot keys. */
  def ngramJaccardPairsPrefix(docs: DataFrame, w: Int = 3,
      minJaccard: Double = 0.5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sized = hashedShingled(docs, w).withColumn("n_sh", size(col("sh")))
    val posting = sized.select(col("doc_id"), col("n_sh"),
      explode(col("sh")).as("s"))
    val freq = posting.groupBy(col("s")).agg(count("*").as("df"))
    // rank each doc's shingles rarest-first; keep the prefix
    val prefixLen = (col("n_sh") - ceil(lit(minJaccard) * col("n_sh")) + 1)
    val ranked = posting.join(freq, "s")
      .withColumn("rn", row_number().over(Window.partitionBy(col("doc_id"))
        .orderBy(col("df").asc, col("s").asc)))
      .where(col("rn") <= prefixLen)
      .select(col("doc_id"), col("s"))
    val cands = ranked.toDF("a_id", "s")
      .join(ranked.toDF("b_id", "s"), "s")
      .where(col("a_id") < col("b_id"))
      .select("a_id", "b_id").distinct()
    // exact verification on the full shingle arrays
    val arrays = sized.select(col("doc_id"), col("sh"), col("n_sh"))
    cands
      .join(arrays.toDF("a_id", "a_sh", "a_n"), "a_id")
      .join(arrays.toDF("b_id", "b_sh", "b_n"), "b_id")
      .select(col("a_id"), col("b_id"),
        size(array_intersect(col("a_sh"), col("b_sh"))).as("inter"),
        col("a_n"), col("b_n"))
      .select(col("a_id"), col("b_id"),
        (col("inter").cast("double") /
          (col("a_n") + col("b_n") - col("inter")).cast("double")).as("jaccard"))
      .where(col("jaccard") >= minJaccard)
  }

  /** MinHash signature over a PRE-MATERIALIZED array of shingle hashes
    * (one xxhash64 per shingle, done once in a child projection): the k
    * "independent" hash functions are affine reshufflings of the base
    * hash (Kirsch-Mitzenmacher construction, `h_i = h·(2i+1) + i·φ` in
    * wrapping 64-bit arithmetic) — k·|shingles| long multiplications
    * instead of k·|shingles| string hashes.
    *
    * The input MUST be an attribute from a separate projection, not an
    * inline expression: Catalyst inlines a single-use subtree into all
    * k branches, re-splitting/re-hashing the text k times per row — a
    * ~20× CPU blowup measured at sf0.1 (577s → 29s after splitting the
    * projection). CollapseProject keeps multi-referenced non-cheap
    * aliases materialized, so a two-step select is the right shape. */
  def minhashSignature(hs: Column, k: Int = 32): Column =
    array((0 until k).map(i =>
      array_min(transform(hs, h =>
        h * lit(2L * i + 1) + lit(i * -7046029254386353131L)))): _*)

  /** Shingle-hash column: one 64-bit hash per distinct shingle. */
  def shingleHashes(sh: Column): Column = transform(sh, s => xxhash64(s))

  /** LSH banding over MinHash signatures: signature split into
    * `bands` bands of `rows` hashes; docs sharing any band bucket are
    * candidates; candidates are verified with estimated Jaccard =
    * fraction of agreeing signature positions. Join is bucket-local —
    * the 100 TB-safe shape. */
  def minhashLshPairs(docs: DataFrame, bands: Int = 8, rows: Int = 4,
      minEstJaccard: Double = 0.5, w: Int = 3): DataFrame = {
    val k = bands * rows
    // The signature table is consumed four times (the band explode's
    // two join sides + the two candidate join-backs) with incompatible
    // partitionings, so exchange reuse can't help. It must be pinned
    // EAGERLY (r18): a lazy persist() did not dedup — AQE submits the
    // two band-side shuffle stages concurrently, both race the cold
    // cache and each re-ran the shingle+hash pipeline (2 × ~8 s
    // executor time at sf0.1, measured). The signatures are the
    // lightweight proxy (k longs per doc, linear), never the text.
    val sigs = Pin.eager(hashedShingled(docs, w)
      .select(col("doc_id"),
        graft.functions.MinHashSig.minhashSig(col("sh"), k).as("sig")))
    // Bucket rows stay NARROW (id, band, bucket) — the 32-hash
    // signatures never ride the candidate shuffle; they are joined back
    // only for the (distinct, much smaller) candidate set. This is the
    // difference between shuffling k·|docs|·bands longs and |pairs| ids.
    val banded = sigs.select(col("doc_id"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)), bi =>
        hash(slice(col("sig"), bi * rows + 1, lit(rows)), bi))).as(Seq("band", "bucket")))
    val a = banded.toDF("a_id", "band", "bucket")
    val b = banded.toDF("b_id", "band", "bucket")
    val cands = a.join(b, Seq("band", "bucket"))
      .where(col("a_id") < col("b_id"))
      .select("a_id", "b_id").distinct()
    val withSigs = cands
      .join(sigs.toDF("a_id", "a_sig"), "a_id")
      .join(sigs.toDF("b_id", "b_sig"), "b_id")
    withSigs.select(col("a_id"), col("b_id"),
      (aggregate(zip_with(col("a_sig"), col("b_sig"),
        (x, y) => when(x === y, lit(1)).otherwise(lit(0))),
        lit(0), (acc, v) => acc + v).cast("double") / lit(k))
        .as("est_jaccard"))
      .where(col("est_jaccard") >= minEstJaccard)
  }

  /** Portable-hash MinHash+LSH: identical pipeline shape to
    * `minhashLshPairs`, with every engine-specific hash swapped for
    * portable wrapping-integer arithmetic so the WHOLE operator is
    * recomputable in SQL (ExtOracle.minhashPairsPortable runs it in
    * DuckDB via HUGEINT mod-2^64):
    *
    *  - shingle hash: `polyhash64` (rolling polynomial) instead of
    *    seeded xxhash64;
    *  - signatures: the same Kirsch-Mitzenmacher affine family
    *    (wrapping 64-bit — already portable);
    *  - band bucket: a seeded polynomial fold over the band's
    *    signature slice instead of Murmur3 `hash()`.
    *
    * Same narrow (id, band, bucket) candidate shuffle and signature
    * join-back as the xxhash64 variant. Trade-off: polyhash64 has
    * weaker avalanche than xxhash64, which costs nothing here — MinHash
    * only needs the affine family to behave uniformly on DISTINCT
    * shingle hashes, and collisions stay astronomically unlikely at
    * 64 bits. */
  def minhashLshPairsPortable(docs: DataFrame, bands: Int = 8, rows: Int = 4,
      minEstJaccard: Double = 0.5, w: Int = 3): DataFrame = {
    val k = bands * rows
    // eager pin, same rationale as minhashLshPairs' sigs (r18): the
    // lazy persist raced AQE's concurrent band-side stages and the
    // shingle+polyhash+minhash pipeline ran 2× per invocation.
    val sigs = Pin.eager(shingled(docs, w)
      .select(col("doc_id"),
        transform(col("sh"), s => graft.functions.PolyHash64.polyhash64(s)).as("hs"))
      .select(col("doc_id"),
        graft.functions.MinHashSig.minhashSig(col("hs"), k).as("sig")))
    val banded = sigs.select(col("doc_id"),
      posexplode(transform(sequence(lit(0L), lit(bands - 1L)), bi =>
        aggregate(slice(col("sig"), (bi * rows + 1).cast("int"), lit(rows)),
          bi, (acc, v) => acc * 1000003L + v))).as(Seq("band", "bucket")))
    val a = banded.toDF("a_id", "band", "bucket")
    val b = banded.toDF("b_id", "band", "bucket")
    val cands = a.join(b, Seq("band", "bucket"))
      .where(col("a_id") < col("b_id"))
      .select("a_id", "b_id").distinct()
    cands
      .join(sigs.toDF("a_id", "a_sig"), "a_id")
      .join(sigs.toDF("b_id", "b_sig"), "b_id")
      .select(col("a_id"), col("b_id"),
        (aggregate(zip_with(col("a_sig"), col("b_sig"),
          (x, y) => when(x === y, lit(1)).otherwise(lit(0))),
          lit(0), (acc, v) => acc + v).cast("double") / lit(k))
          .as("est_jaccard"))
      .where(col("est_jaccard") >= minEstJaccard)
  }

  /** 64-bit SimHash from token-level xxhash64: bit b of the fingerprint
    * is the sign of Σ_tokens (±1 by the token hash's bit b), i.e. bit
    * set ⟺ 2·(#tokens with bit b) > #tokens. Computed entirely per-row
    * by the native codegen `SimHash64` expression — a projection fused
    * into the scan: no explode, no 64-column shuffle aggregate, no
    * per-bit array churn (see graft.functions.SimHash64; equivalence
    * with the HOF formulation below is property-tested). */
  def simhash64(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      graft.functions.SimHash64.simhash64(words(col("text"))).as("simhash"))

  /** Higher-order-function formulation of the same fingerprint (one
    * aggregate pass with a 64-slot count accumulator). Kept as the
    * pure-builtins reference implementation that the native expression
    * is equivalence-tested against — ~6× slower at sf0.1, O(tokens×64)
    * interpreted array arithmetic vs one primitive loop. */
  def simhash64Hof(docs: DataFrame): DataFrame = {
    val hs = docs
      .select(col("doc_id"), words(col("text")).as("ws"))
      .select(col("doc_id"), transform(col("ws"), t => xxhash64(t)).as("hs"))
    val bitIdx = sequence(lit(0), lit(63))
    hs.select(col("doc_id"),
      aggregate(
        zip_with(
          aggregate(col("hs"), array_repeat(lit(0), 64),
            (acc, h) => zip_with(acc, bitIdx,
              (a, b) => a + call_function("shiftright", h, b).bitwiseAND(1).cast("int"))),
          bitIdx,
          (ones, b) => when(ones * 2 > size(col("hs")),
            call_function("shiftleft", lit(1L), b)).otherwise(lit(0L))),
        lit(0L), (acc, v) => acc.bitwiseOR(v)).as("simhash"))
  }

  /** Connected components over near-duplicate pairs → cluster label per
    * document, label = min doc_id reachable through the pair graph.
    * This is the step that turns pairwise similarity into an actual
    * dedup decision: keep exactly the docs with `doc_id == cluster_id`
    * (one canonical survivor per cluster) and drop the rest.
    *
    * Algorithm: iterative min-label propagation to fixpoint — per
    * round, every node takes the min of its own and its neighbors'
    * labels; converges in O(cluster diameter) rounds (near-dup clusters
    * are near-cliques, so typically 2–3). Each round is one
    * hash-partitioned join+groupBy on (id) — no driver-side graph, no
    * assumption the component fits anywhere; the classic large-scale
    * connected-components shape. Deterministic: labels are mins over
    * an unordered set. */
  def dupClusters(pairs: DataFrame, maxIters: Int = 50,
      driverThreshold: Long = 1000000L): DataFrame = {
    // Cache the pair input: the union tree below references it four
    // times (both directions + the self-loop branch), and each union
    // branch re-evaluates its child — without the cache the whole
    // upstream pair-generation pipeline runs 4×.
    val p = pairs.select(col("a_id"), col("b_id")).cache()
    // Adaptive small-graph path: near-dup pair sets are usually a
    // sliver of the corpus (thousands of edges from billions of docs).
    // Below the bounded threshold, union-find on the driver answers in
    // one collect instead of 2+ distributed supersteps whose cost is
    // the per-stage scheduling floor, not data. Same output contract
    // (label = min reachable id); equality with the distributed path is
    // spec-tested. Above the threshold: the superstep loop below, which
    // assumes nothing fits anywhere. ONE action decides AND fetches:
    // on the SMALL path take(threshold+1) returns every edge (the +1
    // row is the only over-read) — a separate count-then-collect paid
    // a second full job per call, and pretrainingCorpus pays this twice
    // per run. take() short-circuits, so it fills the cache only for
    // the partitions it scanned — enough for the small path (which
    // consumed them all); the large path completes the cache explicitly
    // below before fanning out the 4-branch union.
    val probe = p.take(math.min(driverThreshold, Int.MaxValue - 2L).toInt + 1)
    if (probe.length <= driverThreshold) {
      val edges = probe.map(r => (r.getLong(0), r.getLong(1)))
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
        var c = x // path compression
        while (parent.getOrElse(c, c) != r) { val n = parent(c); parent(c) = r; c = n }
        r
      }
      edges.foreach { case (a, b) =>
        parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) { val (lo, hi) = if (ra < rb) (ra, rb) else (rb, ra)
          parent(hi) = lo }
      }
      val rows = parent.keys.toSeq.sorted.map { id =>
        val root = find(id)
        (id, root, id == root)
      }
      p.unpersist()
      val spark = pairs.sparkSession
      import spark.implicits._
      return rows.toDF("doc_id", "cluster_id", "is_keeper")
    }
    // Large path: complete the pair cache first. take() above short-
    // circuited, so partitions it never scanned are not cached yet; the
    // 4-branch union below would evaluate them up to 4× (concurrent
    // branches can each recompute a partition before its cache entry
    // lands). One count() finishes the cache so every branch reads it.
    p.count()
    // Self-loop edges fold "min of own and neighbors' labels" into the
    // round's single join+groupBy (no second join against own labels).
    val directed = p.union(p.select(col("b_id").as("a_id"), col("a_id").as("b_id")))
    val edges = directed
      .union(directed.select(col("a_id"), col("a_id").as("b_id")).distinct())
      .toDF("id", "nbr").cache()
    var labels = edges.select(col("id")).distinct()
      .withColumn("label", col("id")).cache()
    // Convergence via the exact label sum: per-node labels are
    // monotonically non-increasing under min-propagation, so the sum
    // strictly decreases until fixpoint. One aggregate per superstep
    // instead of a join + count; decimal(38) keeps it exact at any
    // id magnitude / row count.
    def labelSum(df: DataFrame): java.math.BigDecimal =
      Option(df.agg(sum(col("label").cast("decimal(38,0)"))).head()
        .getDecimal(0)).getOrElse(java.math.BigDecimal.ZERO) // empty → 0
    // Adaptive build side: the label table has one row per node of the
    // PAIR graph (dup-involved docs only — usually a sliver of the
    // corpus). When it is broadcastable, each round's join goes
    // map-side and only the groupBy shuffles; past the threshold the
    // hint drops away and rounds run as plain shuffle joins. The count
    // also materializes the edge cache before the loop. Threshold: 1M
    // (id, label) rows ≈ 16 MB of longs ≈ a few tens of MB as a hash
    // relation — customary broadcast sizing; a row-count gate far above
    // that would push a few hundred MB to every executor each round.
    val broadcastable = labels.count() <= 1000000L
    def round(l: DataFrame): DataFrame = {
      val build = l.toDF("nbr", "label")
      edges.join(if (broadcastable) broadcast(build) else build, "nbr")
        .groupBy(col("id")).agg(min(col("label")).as("label"))
    }
    // Supersteps: compose `roundsPerCheck` propagation rounds LAZILY
    // (Catalyst fuses them into one query over the cached edges), then
    // pay ONE action for materialization + convergence check. Per-round
    // driver actions — each with its own job scheduling and codegen —
    // were the dominant cost, not the joins themselves; a superstep
    // amortizes that fixed cost over 4 rounds, and clusters of
    // diameter ≤ 4 (the near-dup norm: near-cliques) converge in a
    // single superstep plus the confirming one.
    val roundsPerCheck = 4
    // No initial-sum action: two consecutive superstep sums being equal
    // is the fixpoint test (sums are strictly decreasing until then).
    var prevSum: java.math.BigDecimal = null
    var iter = 0
    var converged = false
    while (!converged && iter < maxIters) {
      val next = (1 to roundsPerCheck).foldLeft(labels)((l, _) => round(l)).cache()
      val s = labelSum(next)
      labels.unpersist()
      labels = next
      converged = prevSum != null && s.compareTo(prevSum) == 0
      prevSum = s
      iter += roundsPerCheck
    }
    // A high-diameter pair graph (chains, not the near-clique norm) can
    // exhaust maxIters before fixpoint; silently returning would mean
    // multiple is_keeper rows per true cluster (under-dedup) with no
    // signal. Label propagation is label-correct only at fixpoint, so
    // surface it loudly.
    if (!converged)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"dupClusters: label propagation did NOT converge within " +
          s"$maxIters rounds (graph diameter > $maxIters); clusters may " +
          s"be split — rerun with a larger maxIters")
    // labels is fully materialized by the last convergence sum, so the
    // caches can be released without an extra action
    edges.unpersist()
    p.unpersist()
    labels.select(col("id").as("doc_id"),
      col("label").as("cluster_id"),
      (col("id") === col("label")).as("is_keeper"))
  }

  /** End-to-end corpus deduplication — the call a pipeline actually
    * makes: pairs → connected components → drop every non-canonical
    * member. Documents never involved in any near-dup pair pass
    * through untouched (the overwhelming majority at any scale), so
    * the join against the cluster table is a broadcast/anti-style
    * lookup on the tiny dup sliver, not a corpus-wide shuffle. */
  def dedupCorpus(docs: DataFrame, w: Int = 3,
      minJaccard: Double = 0.5): DataFrame = {
    val losers = dupClusters(ngramJaccardPairs(docs, w, minJaccard))
      .where(!col("is_keeper")).select(col("doc_id"))
    docs.join(losers, Seq("doc_id"), "left_anti")
  }

  /** Per-document novelty — the dual of `spanDupScore`: the fraction
    * of a doc's distinct w-token shingles whose FIRST corpus
    * occurrence (min doc_id) is this doc. In a doc_id-ordered corpus
    * this measures what each new document actually adds (marginal
    * information for curriculum ordering / crawl-value estimation);
    * a pure copy scores 0, a fully original doc 1.
    *
    * Scale shape: identical to spanDupScore — distinct per-doc shingle
    * hashes, one map-side-combinable min groupBy on the 8-byte shingle
    * key, the join back on the same key (exchange reuse), one doc_id
    * rollup. */
  def noveltyScore(corpus: DataFrame, w: Int = 8): DataFrame = {
    // pinned eagerly (r18): `ex` has two consumers (the first-doc model
    // + the join back) — each planned its own shingling chain
    val sized = Pin.eager(
      hashedShingled(corpus, w).withColumn("n_sh", size(col("sh"))))
    val ex = sized.select(col("doc_id"), col("n_sh"), explode(col("sh")).as("s"))
    val firsts = ex.groupBy(col("s")).agg(min(col("doc_id")).as("first_doc"))
    ex.join(firsts, "s")
      .groupBy(col("doc_id"))
      .agg(min(col("n_sh")).as("n_sh"),
        sum(when(col("first_doc") === col("doc_id"), 1L).otherwise(0L))
          .as("n_novel"))
      .select(col("doc_id"), col("n_sh"), col("n_novel"),
        (col("n_novel").cast("double") / col("n_sh").cast("double"))
          .as("novelty"))
  }

  /** Exact-substring deduplication — remove every LATER occurrence of
    * any duplicated w-token span, keeping the corpus-wide first
    * occurrence (by (doc_id, position)): the span-granularity dedup
    * that document- and line-level tiers can't see (a license block
    * pasted mid-document, a quoted paragraph). For an exactly-shared
    * span of L ≥ w tokens the duplicated window starts cover precisely
    * its L tokens, so whole spans excise cleanly; tokens are rebuilt
    * in position order.
    *
    * Mechanics: every w-token window start is hashed; a start is
    * "duplicated" iff its hash occurs more than once corpus-wide and
    * this occurrence is not the (doc_id, start)-minimal one; a token
    * is removed iff some duplicated start covers it (a per-doc sliding
    * `max` window over the start flags — positions s..s+w−1).
    *
    * Scale shape: one map-combinable groupBy on the 8-byte window
    * hash (min(struct) + count), the join back on the same key, then
    * one per-doc window + rollup (both partition on doc_id — one
    * shuffle, reused). Window state is w flags.
    *
    * Whitespace contract: `text_dedup` is rebuilt by joining kept
    * tokens with single spaces, so the original whitespace/newline
    * layout is normalized for EVERY document — including ones that
    * lost no tokens (n_tokens_kept == n_tokens but text_dedup != text
    * for any multi-line doc). Same lossy convention as `lineDedup`'s
    * `sep` rebuild; callers piping `text_dedup` back into a corpus
    * where layout is signal should re-tokenize from `text` instead. */
  def substringDedup(docs: DataFrame, w: Int = 8): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = docs.select(col("doc_id"), words(col("text")).as("ws"))
    // pinned eagerly (r18): `starts` has two consumers (the
    // first-occurrence model + the join back) — each planned its own
    // tokenize + per-window hash chain. 16 bytes/window-start.
    val starts = Pin.eager(toks
      .select(col("doc_id"),
        posexplode(transform(
          sequence(lit(0), greatest(size(col("ws")) - w, lit(0))),
          s => xxhash64(concat_ws(" ", slice(col("ws"), s + 1, lit(w))))))
          .as(Seq("pos", "sh"))))
    val firsts = starts.groupBy(col("sh"))
      .agg(min(struct(col("doc_id"), col("pos"))).as("f"),
        count(lit(1)).as("occ"))
    val dupStarts = starts.join(firsts, "sh")
      .where(col("occ") > 1 &&
        !(col("doc_id") === col("f.doc_id") && col("pos") === col("f.pos")))
      .select(col("doc_id"), col("pos"), lit(1).as("__dup"))
    val tok = docs.select(col("doc_id"),
      posexplode(words(col("text"))).as(Seq("pos", "tok")))
    val cover = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      .rowsBetween(-(w - 1), 0)
    tok.join(dupStarts, Seq("doc_id", "pos"), "left")
      .withColumn("cov", max(coalesce(col("__dup"), lit(0))).over(cover))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("cov") === 0, 1L).otherwise(0L)).as("n_tokens_kept"),
        array_join(
          transform(
            array_sort(collect_list(
              when(col("cov") === 0, struct(col("pos").as("i"), col("tok").as("t"))))),
            x => x.getField("t")),
          " ").as("text_dedup"))
  }

  /** Incremental batch dedup — the daily-ingest shape: deduplicate a
    * NEW batch against the existing corpus (and internally) without
    * ever pairing corpus docs with each other. A batch doc is dropped
    * iff it n-gram-Jaccard-near-duplicates any corpus doc or any
    * lower-id batch doc (dropped or not — the conservative, order-free
    * rule that needs no connected-components closure); survivors are
    * returned unchanged, ready to append.
    *
    * Scale shape: this is `ngramJaccardPairs` with the LEFT side
    * restricted to the batch — the shingle equi-join fans out as
    * |batch shingles| × matches, so daily work scales with the batch,
    * not the corpus; the corpus side contributes only posting-list
    * rows that actually collide with a batch shingle. In production
    * the corpus's (shingle-hash, doc_id, n_sh) posting list is the
    * precomputed index this join probes. */
  def incrementalDedup(corpus: DataFrame, batch: DataFrame, w: Int = 3,
      minJaccard: Double = 0.5): DataFrame = {
    // pinned eagerly (r18): the batch side is referenced twice (probe
    // side + the pool's intra-batch branch) — batch-proportional pin
    val bSized = Pin.eager(
      hashedShingled(batch, w).withColumn("n_sh", size(col("sh"))))
    val bEx = bSized.select(col("doc_id").as("a_id"), col("n_sh").as("a_n"),
      explode(col("sh")).as("s"))
    val poolEx = hashedShingled(corpus, w).withColumn("n_sh", size(col("sh")))
      .select(col("doc_id").as("b_id"), col("n_sh").as("b_n"),
        lit(true).as("is_corpus"), explode(col("sh")).as("s"))
      .unionByName(bSized.select(col("doc_id").as("b_id"),
        col("n_sh").as("b_n"), lit(false).as("is_corpus"),
        explode(col("sh")).as("s")))
    val losers = bEx.join(poolEx, "s")
      .where(col("is_corpus") || col("b_id") < col("a_id"))
      .groupBy(col("a_id"), col("b_id"))
      .agg(count(lit(1)).as("inter"),
        min(col("a_n")).as("a_n"), min(col("b_n")).as("b_n"))
      .where(col("inter").cast("double") /
        (col("a_n") + col("b_n") - col("inter")).cast("double") >= minJaccard)
      .select(col("a_id").as("doc_id")).distinct()
    batch.join(losers, Seq("doc_id"), "left_anti")
  }

  /** Corpus-wide LINE-level exact dedup — the sub-document dedup tier
    * (boilerplate headers, navigation text, license blocks recur
    * across millions of pages; document-level dedup never sees them).
    * Every line keeps its FIRST occurrence corpus-wide — ordered by
    * (doc_id, line position), so the survivor choice is deterministic
    * on any layout — and later occurrences are dropped; documents are
    * reassembled in original line order with per-doc keep counts.
    *
    * Scale shape: lines shuffle once on their sha256 digest (32-byte
    * key, not the line text — same trick as `exact`) for the
    * first-occurrence argmin (min(struct) — partial-aggregatable,
    * map-side combined), once more back on doc_id for reassembly.
    * Per-group state is one (doc_id, ord) pair per distinct line;
    * reassembly state is bounded by document size.
    *
    * `sep` is treated as a LITERAL separator on both the split and the
    * rebuild (the split side regex-quotes it, so a regex-special
    * separator like "." or "|" splits on the literal character, exactly
    * what array_join then rejoins with). Null-text rows vanish from the
    * output entirely (posexplode of a null array emits no rows) —
    * callers needing them must left-join the result back. */
  def lineDedup(docs: DataFrame, textCol: String = "text",
      sep: String = "\n"): DataFrame = {
    val ex = docs
      .select(col("doc_id"),
        posexplode(split(col(textCol), java.util.regex.Pattern.quote(sep)))
          .as(Seq("ord", "line")))
      .select(col("doc_id"), col("ord"), col("line"),
        sha2(col("line"), 256).as("lh"))
    val firsts = ex.groupBy(col("lh"))
      .agg(min(struct(col("doc_id"), col("ord"))).as("first"))
      .select(col("lh"), col("first.doc_id").as("f_doc"),
        col("first.ord").as("f_ord"))
    ex.join(firsts, "lh")
      .withColumn("kept",
        col("doc_id") === col("f_doc") && col("ord") === col("f_ord"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_lines"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("n_lines_kept"),
        array_join(
          transform(
            array_sort(collect_list(
              when(col("kept"), struct(col("ord").as("i"), col("line").as("t"))))),
            x => x.getField("t")),
          sep).as("text_dedup"))
  }

  /** Corpus-frequency boilerplate removal — drop EVERY occurrence of a
    * line whose document frequency exceeds `maxDocFrac` of the corpus
    * (navigation bars, cookie banners, license footers). The
    * complement of `lineDedup`: there a recurring line SURVIVES once
    * (its first occurrence is real content somewhere); boilerplate is
    * noise in every copy, so the whole line class goes. Emits per-doc
    * line counts and the reassembled text (original line order, like
    * `lineDedup`'s whitespace contract: lines re-joined with `sep`).
    *
    * Document frequency counts each document ONCE per line (a footer
    * repeated within one page is still one document), via a distinct
    * (digest, doc) aggregation. Keep rule: `df ≤ maxDocFrac · n_docs`
    * — one IEEE multiply + compare, engine-portable.
    *
    * Scale shape: lines shuffle once on the sha256 digest for the
    * distinct-doc frequency model (map-side combinable after the
    * distinct), the frequency model joins back on the digest, and
    * reassembly shuffles once on doc_id — the same two-exchange
    * profile as `lineDedup`; the 1-row corpus count broadcasts.
    *
    * `sep` is a LITERAL separator (regex-quoted on the split side, see
    * `lineDedup`); null-text rows vanish from the output (posexplode of
    * a null array emits no rows). */
  def boilerplateStrip(docs: DataFrame, maxDocFrac: Double = 0.05,
      textCol: String = "text", sep: String = "\n"): DataFrame = {
    val ex = docs
      .select(col("doc_id"),
        posexplode(split(col(textCol), java.util.regex.Pattern.quote(sep)))
          .as(Seq("ord", "line")))
      .select(col("doc_id"), col("ord"), col("line"),
        sha2(col("line"), 256).as("lh"))
    val nDocs = docs.agg(count(lit(1)).as("n_total"))
    val freq = ex.select(col("lh"), col("doc_id")).distinct()
      .groupBy(col("lh")).agg(count(lit(1)).as("df"))
    ex.join(freq, "lh").crossJoin(broadcast(nDocs))
      .withColumn("kept",
        col("df").cast("double") <= lit(maxDocFrac) * col("n_total").cast("double"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_lines"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("n_lines_kept"),
        array_join(
          transform(
            array_sort(collect_list(
              when(col("kept"), struct(col("ord").as("i"), col("line").as("t"))))),
            x => x.getField("t")),
          sep).as("text_clean"))
  }

  /** MinHash-backed end-to-end corpus dedup — `dedupCorpus` with the
    * sketch-based candidate tier instead of the exact shingle join:
    * portable MinHash+LSH pairs (est. Jaccard ≥ `minEst`) → connected
    * components → drop non-canonical members. At 100 TB this IS the
    * production path: candidate generation touches band buckets (near-
    * linear), never the full shingle posting lists, and the signature
    * agreement check reads 32 longs per candidate instead of whole
    * shingle sets. The exact-Jaccard variant remains the verification
    * twin at test scale. */
  def dedupCorpusMinhash(docs: DataFrame, minEst: Double = 0.9): DataFrame = {
    val pairs = minhashLshPairsPortable(docs, minEstJaccard = minEst)
      .select(col("a_id"), col("b_id"))
    val losers = dupClusters(pairs)
      .where(!col("is_keeper")).select(col("doc_id"))
    docs.join(losers, Seq("doc_id"), "left_anti")
  }

  /** Verified end-to-end corpus dedup — the full production chain a
    * 100 TB run ships: portable MinHash+LSH candidates (sketch RECALL,
    * est. Jaccard ≥ `minEst`) → exact edit-distance verification
    * (PRECISION: the prefix-capped Levenshtein tier rejects sketch
    * false positives before they merge distinct documents) → connected
    * components over the VERIFIED pairs only → drop non-canonical
    * members. `dedupCorpusMinhash` trusts the sketch estimate alone;
    * this composition is what protects against the MinHash failure
    * mode that matters — block reorderings and shared-boilerplate
    * pairs whose shingle resemblance is high while the texts are NOT
    * redundant (spec-pinned: a half-swapped document pair passes the
    * band tier and is rescued by the verify tier).
    *
    * Scale shape: candidates are band-bucket narrow joins (never
    * all-pairs), the O(prefix²) DP runs on the candidate sliver only,
    * the component closure runs on the verified sliver (strictly
    * smaller), and survivors are one anti-join. Every stage is the
    * already-probed operator (ScaleProbe: linear pair growth at 64×);
    * composing them adds no new exchange over `dedupCorpusMinhash`
    * beyond the two narrow text-prefix joins of the verify tier. */
  def dedupCorpusVerified(docs: DataFrame, minEst: Double = 0.5,
      prefix: Int = 200, maxDistPct: Int = 30): DataFrame = {
    val cands = minhashLshPairsPortable(docs, minEstJaccard = minEst)
      .select(col("a_id"), col("b_id"))
    val verified = editDistanceVerify(docs, cands, prefix, maxDistPct)
      .select(col("a_id"), col("b_id"))
    val losers = dupClusters(verified)
      .where(!col("is_keeper")).select(col("doc_id"))
    docs.join(losers, Seq("doc_id"), "left_anti")
  }

  /** Quality-aware canonical dedup — corpus dedup that keeps the BEST
    * member of each near-dup cluster instead of the arbitrary min-id
    * one: a crawl usually captures the same page as a clean mirror and
    * a boilerplate-laden copy, and the min-id convention keeps
    * whichever was crawled first. Canonical = highest lexical quality
    * (`TextAnalysis.withQuality`, ·10⁶-quantized for deterministic
    * ordering), doc_id ascending on ties. Any pair tier plugs in; the
    * gate entry feeds MinHash pairs like every cluster consumer.
    *
    * Scale shape: clusters are the dup sliver (broadcast-size at any
    * corpus scale); quality is computed only for sliver members — the
    * sliver joins INTO the corpus (Spark broadcasts the small side),
    * and the per-cluster argmax is a rank window over the sliver, not
    * the corpus. Survivors = one anti-join against the loser sliver. */
  def dedupKeepBest(docs: DataFrame, pairs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val clusters = dupClusters(pairs)
      .select(col("doc_id"), col("cluster_id"))
    val sliver = TextAnalysis.withQuality(docs.join(clusters, "doc_id"))
      .select(col("doc_id"), col("cluster_id"),
        round(col("quality") * 1000000).cast("long").as("q6"))
    val w = Window.partitionBy(col("cluster_id"))
      .orderBy(col("q6").desc, col("doc_id").asc)
    val losers = sliver.withColumn("rk", row_number().over(w))
      .where(col("rk") > 1).select(col("doc_id"))
    docs.join(losers, Seq("doc_id"), "left_anti")
  }

  /** Per-source dedup scorecard — the data-sourcing observability
    * report: for each source, how many documents participate in at
    * least one near-dup pair (either side), and the resulting dup
    * rate. A source whose rate spikes is re-crawling itself or
    * mirroring another source — the dashboard signal that triggers
    * re-weighting or exclusion BEFORE the tokens are spent. Any pair
    * tier plugs in; the gate entry feeds the MinHash sketch tier like
    * every production consumer.
    *
    * Scale shape: the involved-id set is a distinct over the pair
    * sliver (dup-involved docs only — broadcast-size at any corpus
    * scale); the per-source rollup is one map-side-combinable groupBy
    * over (source, involved?) after a broadcast lookup join. One
    * double division per source row at the end. */
  def dedupScorecard(docs: DataFrame, pairs: DataFrame): DataFrame = {
    val involved = pairs.select(col("a_id").as("doc_id"))
      .union(pairs.select(col("b_id").as("doc_id"))).distinct()
      .withColumn("__dup", lit(1L))
    docs.select(col("doc_id"), col("source"))
      .join(involved, Seq("doc_id"), "left")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        coalesce(sum(col("__dup")), lit(0L)).as("n_dup_involved"))
      .withColumn("dup_rate",
        col("n_dup_involved").cast("double") / col("n_docs").cast("double"))
  }

  /** Benchmark decontamination: for every corpus document, the
    * fraction of its w-token shingles that appear anywhere in the
    * benchmark set — the standard train/test contamination check run
    * before training. Returns (doc_id, n_sh, n_contaminated,
    * contamination) for docs with ≥1 hit; filter `contamination >=
    * threshold` to quarantine.
    *
    * Scale shape: the benchmark is the SMALL side (eval suites are
    * thousands of docs, the corpus is the 100 TB side) — its distinct
    * shingle-hash set builds once and broadcasts; the corpus side is a
    * per-row projection + explode + broadcast semi-join, no corpus
    * shuffle at all except the final per-doc count (map-side
    * combinable on doc_id, the natural partitioning). */
  def contamination(corpus: DataFrame, benchmark: DataFrame, w: Int = 8): DataFrame = {
    val bench = hashedShingled(benchmark, w)
      .select(explode(col("sh")).as("s")).distinct()
    val sized = hashedShingled(corpus, w).withColumn("n_sh", size(col("sh")))
    sized.select(col("doc_id"), col("n_sh"), explode(col("sh")).as("s"))
      .join(broadcast(bench), "s") // semi: bench shingles are distinct
      .groupBy(col("doc_id")).agg(min(col("n_sh")).as("n_sh"),
        count(lit(1)).as("n_contaminated"))
      .select(col("doc_id"), col("n_sh"), col("n_contaminated"),
        (col("n_contaminated").cast("double") / col("n_sh").cast("double"))
          .as("contamination"))
  }

  /** Source-level resemblance matrix — MinHash at SOURCE granularity:
    * a source's signature is the elementwise MIN of its documents'
    * portable signatures. Min-of-mins IS the signature of the
    * source's shingle-set UNION (the MinHash sketch is mergeable),
    * so each unordered source pair's agreement fraction estimates the
    * Jaccard of their FULL shingle sets in one pass — the
    * corpus-level mirror detector at sketch cost. Complements
    * `vocabOverlapMatrix` (exact unigram vocabularies): re-hosted
    * content moves 3-shingle resemblance even when light rewording
    * keeps vocabulary overlap flat, and unlike `dedupCrossSource`
    * this needs no pair tier — sources with zero document-level
    * near-dups still show their shared-content mass.
    *
    * Scale shape: per-doc signatures are a scan projection; the
    * rollup state is |sources|·k longs (posexplode → (source, i) min
    * groupBy — map-side combinable, the only corpus-proportional
    * exchange is the narrow (source, i, v) rows); the pair space is
    * |sources|² rows of k-long arrays (driver-trivial). Deterministic:
    * mins over unordered sets, struct-sorted signature reassembly. */
  def sourceResemblance(docs: DataFrame, bands: Int = 8, rows: Int = 4,
      w: Int = 3): DataFrame = {
    val k = bands * rows
    val sigs = docs
      .select(col("source"), words(col("text")).as("ws"))
      .select(col("source"), minhashSigCol(col("ws"), k, w).as("sig"))
    val mins = sigs
      .select(col("source"), posexplode(col("sig")).as(Seq("i", "v")))
      .groupBy(col("source"), col("i")).agg(min(col("v")).as("v"))
    val packed = mins.groupBy(col("source"))
      .agg(transform(array_sort(collect_list(struct(col("i"), col("v")))),
        s => s.getField("v")).as("sig"))
    val a = packed.toDF("source_a", "sig_a")
    val b = packed.toDF("source_b", "sig_b")
    a.join(b, col("source_a") < col("source_b"))
      .select(col("source_a"), col("source_b"),
        (aggregate(zip_with(col("sig_a"), col("sig_b"),
          (x, y) => when(x === y, lit(1)).otherwise(lit(0))),
          lit(0), (acc, v) => acc + v).cast("double") / lit(k))
          .as("est_jaccard"))
  }

  /** Benchmark-side contamination attribution — `contamination` with
    * the perspective FLIPPED: for each EVAL document, how many corpus
    * documents share ≥ `minFracPct`% of ITS shingles, and the worst
    * overlap fraction. `decontaminate` protects the training corpus;
    * this tells the EVAL owner which benchmark items are already
    * burned (their reported metrics inflated by memorization)
    * regardless of what the corpus does next — the eval-integrity
    * dashboard. Returns (bench_id, n_sh, n_contaminating_docs,
    * max_overlap) for benchmark docs with ≥1 contaminating corpus
    * doc. The threshold is a pure integer predicate
    * (inter·100 ≥ n_sh·pct — no doubles in the filter); max_overlap
    * is a max over exact-division doubles.
    *
    * Scale shape: benchmark shingles broadcast (eval-suite-sized by
    * contract); the per-(corpus doc, bench doc) overlap counts group
    * on the collision sliver only (a corpus doc sharing nothing never
    * leaves the map side); the final rollup is |benchmark| rows. */
  def contaminationReport(corpus: DataFrame, benchmark: DataFrame,
      w: Int = 8, minFracPct: Int = 50): DataFrame = {
    val bench = hashedShingled(benchmark, w)
      .select(col("doc_id").as("bench_id"), size(col("sh")).as("bn_sh"),
        explode(col("sh")).as("s"))
    val corp = hashedShingled(corpus, w)
      .select(col("doc_id"), explode(col("sh")).as("s"))
    val overlaps = corp.join(broadcast(bench), "s")
      .groupBy(col("doc_id"), col("bench_id"))
      .agg(min(col("bn_sh")).as("bn_sh"), count(lit(1)).as("inter"))
      .where(col("inter") * 100 >= col("bn_sh").cast("long") * minFracPct)
    overlaps.groupBy(col("bench_id"))
      .agg(min(col("bn_sh")).as("n_sh"),
        count(lit(1)).as("n_contaminating_docs"),
        max(col("inter").cast("double") / col("bn_sh").cast("double"))
          .as("max_overlap"))
  }

  /** Cross-document span duplication — the shingle-granularity
    * approximation of exact-substring dedup (flag documents dominated
    * by text spans that also occur in OTHER documents, the signal
    * behind span-level corpus dedup): per doc, the fraction of its
    * distinct w-token shingles whose corpus document-frequency
    * exceeds 1. Differs from `contamination` (overlap vs an external
    * benchmark) and `repetitionScore` (WITHIN-doc looping) — this is
    * corpus-internal cross-doc redundancy.
    *
    * Scale shape: shingles are per-doc distinct, so the doc-frequency
    * groupBy is an exact map-side-combinable count on the 8-byte
    * shingle hash; the join back is shingle-partitioned (the same key
    * the count already shuffled on → exchange reuse), and the per-doc
    * rollup combines map-side on doc_id. No driver state. */
  def spanDupScore(corpus: DataFrame, w: Int = 8): DataFrame = {
    // pinned eagerly (r18): same two-consumer shape as noveltyScore
    val sized = Pin.eager(
      hashedShingled(corpus, w).withColumn("n_sh", size(col("sh"))))
    val ex = sized.select(col("doc_id"), col("n_sh"), explode(col("sh")).as("s"))
    val dfreq = ex.groupBy(col("s")).agg(count(lit(1)).as("df"))
    ex.join(dfreq, "s")
      .groupBy(col("doc_id"))
      .agg(min(col("n_sh")).as("n_sh"),
        sum(when(col("df") > 1, 1L).otherwise(0L)).as("n_shared"))
      .select(col("doc_id"), col("n_sh"), col("n_shared"),
        (col("n_shared").cast("double") / col("n_sh").cast("double"))
          .as("span_dup"))
  }

  /** Duplicate-cluster size histogram — the dedup dashboard's shape
    * summary: how many near-dup clusters exist at each size. A healthy
    * crawl shows a steep power law (mostly pairs); a fat tail of big
    * clusters means template farms or a mirror network, and the
    * histogram is what decides whether keep-one dedup suffices or the
    * big clusters need source-level exclusion. Any pair tier plugs in.
    *
    * Scale shape: both rollups run on the dup SLIVER (cluster table ≪
    * corpus); output is ≤ max-cluster-size rows. */
  def clusterSizeHistogram(pairs: DataFrame): DataFrame =
    dupClusters(pairs)
      .groupBy(col("cluster_id")).agg(count(lit(1)).as("cluster_size"))
      .groupBy(col("cluster_size")).agg(count(lit(1)).as("n_clusters"))
      .select(col("cluster_size"), col("n_clusters"),
        (col("cluster_size") * col("n_clusters")).as("n_docs"))

  /** Fuzzy (MinHash-tier) decontamination — drop every corpus document
    * whose estimated Jaccard against ANY benchmark document reaches
    * `minEst`, including verbatim copies (a benchmark doc present in
    * the corpus matches itself at est 1.0 and is removed). The
    * paraphrase-robust complement to the exact-shingle `contamination`
    * check: light rewording drops exact 8-gram overlap to ~0 while
    * resemblance stays high — this is the tier that catches it.
    *
    * Scale shape: benchmark signatures/bands are eval-suite-sized by
    * contract, so the band-bucket candidate join BROADCASTS the
    * benchmark side — the corpus never shuffles for candidate
    * generation (vs the corpus self-join dedup pays). The signature
    * verify join touches only the candidate sliver; survivors are one
    * anti-join. Same affine signature family as the portable pair
    * tier, so the oracle reuses the self-join chain's agree table. */
  /** Portable MinHash signature COLUMN from a pre-materialized words
    * array (`ws` must be an attribute — see `shinglesFromWords`):
    * polyhash64'd w-shingles through the Kirsch–Mitzenmacher affine
    * family, k mins. A pure projection — which is what lets the
    * sketch tier lift to Structured Streaming STATELESS
    * (CorpusStream.nearDupVsCorpus). */
  def minhashSigCol(ws: Column, k: Int, w: Int = 3): Column =
    graft.functions.MinHashSig.minhashSig(
      transform(shinglesFromWords(ws, w),
        s => graft.functions.PolyHash64.polyhash64(s)), k)

  /** Per-band bucket array COLUMN from a signature column: the seeded
    * polynomial fold over each band's slice — the identical expression
    * every portable band tier uses (element i = band i's bucket). Pure
    * projection, stream-safe. */
  def minhashBucketsCol(sig: Column, bands: Int, rows: Int): Column =
    transform(sequence(lit(0L), lit(bands - 1L)), bi =>
      aggregate(slice(sig, (bi * rows + 1).cast("int"), lit(rows)),
        bi, (acc, v) => acc * 1000003L + v))

  def decontaminateFuzzy(corpus: DataFrame, benchmark: DataFrame,
      bands: Int = 8, rows: Int = 4, minEst: Double = 0.5,
      w: Int = 3): DataFrame = {
    val k = bands * rows
    def sigsOf(df: DataFrame): DataFrame = df
      .select(col("doc_id"), words(col("text")).as("ws"))
      .select(col("doc_id"), minhashSigCol(col("ws"), k, w).as("sig"))
    def bandedOf(sigs: DataFrame): DataFrame = sigs.select(col("doc_id"),
      posexplode(minhashBucketsCol(col("sig"), bands, rows))
        .as(Seq("band", "bucket")))
    val corpusSigs = sigsOf(corpus).persist()
    val benchSigs = sigsOf(benchmark)
    val cands = bandedOf(corpusSigs).toDF("doc_id", "band", "bucket")
      .join(broadcast(bandedOf(benchSigs).toDF("bench_id", "band", "bucket")),
        Seq("band", "bucket"))
      .select("doc_id", "bench_id").distinct()
    val contaminated = cands
      .join(corpusSigs.toDF("doc_id", "sig"), "doc_id")
      .join(broadcast(benchSigs.toDF("bench_id", "bench_sig")), "bench_id")
      .where(aggregate(zip_with(col("sig"), col("bench_sig"),
          (x, y) => when(x === y, lit(1)).otherwise(lit(0))),
          lit(0), (acc, v) => acc + v).cast("double") / lit(k) >= minEst)
      .select(col("doc_id")).distinct()
    val out = corpus.join(contaminated, Seq("doc_id"), "left_anti")
    corpusSigs.unpersist(blocking = false)
    out
  }

  /** Cross-source duplication matrix — `dedupScorecard`'s pairwise
    * refinement: for every unordered source pair, how many near-dup
    * pairs straddle it (and how many distinct docs are involved).
    * The mirror-detection dashboard: a hot (A, B) off-diagonal cell
    * means B is re-hosting A's content and one of them should be
    * down-weighted BEFORE the tokens are spent; a hot diagonal cell
    * is a source re-crawling itself. Any pair tier plugs in; the gate
    * entry feeds MinHash pairs like every consumer.
    *
    * Scale shape: both lookups join the broadcast-size pair sliver
    * against the narrow (doc_id, source) projection; the rollup is a
    * map-side-combinable groupBy on |sources|² keys. */
  def dedupCrossSource(docs: DataFrame, pairs: DataFrame): DataFrame = {
    val lk = docs.select(col("doc_id"), col("source"))
    val norm = pairs.select(col("a_id"), col("b_id"))
      .join(lk.toDF("a_id", "source_a"), "a_id")
      .join(lk.toDF("b_id", "source_b"), "b_id")
      .select(least(col("source_a"), col("source_b")).as("source_a"),
        greatest(col("source_a"), col("source_b")).as("source_b"),
        col("a_id"), col("b_id"))
    val nPairs = norm.groupBy(col("source_a"), col("source_b"))
      .agg(count(lit(1)).as("n_pairs"))
    // involved docs via explode + distinct, NOT a per-group collected
    // list — a hot mirror cell holds millions of pairs at scale and a
    // single-group array would concentrate them on one task
    val nDocs = norm
      .select(col("source_a"), col("source_b"),
        explode(array(col("a_id"), col("b_id"))).as("d"))
      .distinct()
      .groupBy(col("source_a"), col("source_b"))
      .agg(count(lit(1)).as("n_docs_involved"))
    nPairs.join(nDocs, Seq("source_a", "source_b"))
  }

  /** Bloom-filtered decontamination — same result as `contamination`,
    * different 100 TB cost model. `contamination` broadcasts the full
    * distinct benchmark shingle set as a join hash relation; fine for
    * eval-suite-sized benchmarks, but the broadcast grows linearly
    * with the benchmark (8 B + hash-map overhead per shingle). Here
    * the benchmark is collapsed into ONE driver-built Bloom filter
    * (`fpp`-sized bit array — ~1.2 MB per million shingles at 1%,
    * independent of hash-map overhead), broadcast into every task via
    * a native codegen expression that prunes the exploded corpus
    * shingles MAP-SIDE, before any join. Only the surviving sliver
    * (true hits + fpp false positives) enters the exact verification
    * semi-join, which AQE then sizes freely — the big side never
    * shuffles more than its match candidates. False positives are
    * removed by that exact join, so the output is bit-identical to
    * `contamination` (equivalence is spec-tested; the gate entry
    * shares its oracle).
    *
    * `expectedItems` sizes the filter without a driver-side count
    * action — overshooting just wastes filter bits, undershooting
    * raises fpp (never correctness). */
  def contaminationBloom(corpus: DataFrame, benchmark: DataFrame,
      w: Int = 8, expectedItems: Long = 1L << 20,
      fpp: Double = 0.01): DataFrame = {
    // The benchmark shingle set is consumed three times (emptiness
    // probe, filter build, exact-verify join) — persist it so the
    // shingling/explode/distinct pipeline runs ONCE, not three times.
    // It stays cached for the verify join of the (lazy) returned plan;
    // the benchmark side is eval-suite-sized by contract, so pinning
    // it is cheap and Spark's LRU evicts it under pressure anyway.
    val bench = hashedShingled(benchmark, w)
      .select(explode(col("sh")).as("s")).distinct().persist()
    // empty benchmark: Spark's stat.bloomFilter NPEs on zero rows
    // (null aggregate buffer) — substitute an empty filter (rejects
    // everything) so the operator degrades to "nothing contaminated"
    // instead of crashing. count() (not isEmpty) materializes the
    // cache fully in the same pass that answers the probe.
    val bloom =
      if (bench.count() == 0L)
        org.apache.spark.util.sketch.BloomFilter.create(1, fpp)
      else bench.stat.bloomFilter("s", expectedItems, fpp)
    val sized = hashedShingled(corpus, w).withColumn("n_sh", size(col("sh")))
    sized.select(col("doc_id"), col("n_sh"), explode(col("sh")).as("s"))
      .where(graft.functions.BloomMightContainLong.mightContain(col("s"), bloom))
      .join(bench, "s") // exact verify: scrub bloom false positives
      .groupBy(col("doc_id")).agg(min(col("n_sh")).as("n_sh"),
        count(lit(1)).as("n_contaminated"))
      .select(col("doc_id"), col("n_sh"), col("n_contaminated"),
        (col("n_contaminated").cast("double") / col("n_sh").cast("double"))
          .as("contamination"))
  }

  /** Near-dup pairs by SimHash Hamming distance ≤ maxDist. Candidate
    * generation blocks on 16-bit chunks (a Hamming-(≤3) pair must agree
    * on ≥1 of 4 chunks — pigeonhole), so the join is bucket-local. */
  def simhashPairs(docs: DataFrame, maxDist: Int = 3): DataFrame =
    simhashPairsFrom(simhash64(docs), maxDist)

  /** Portable-hash SimHash pairs: token hashes come from polyhash64
    * (the same native codegen expression, `poly` mode) instead of
    * seeded xxhash64, so the whole fingerprint — per-token rolling
    * hashes, bit-majority vote, 16-bit chunk blocking, Hamming
    * distance — is recomputable in SQL (ExtOracle.simhashPairsPortable
    * runs it in DuckDB via HUGEINT mod-2^64). Same plan shape and
    * codegen cost as the xxhash64 variant. */
  def simhashPairsPortable(docs: DataFrame, maxDist: Int = 3): DataFrame =
    simhashPairsFrom(
      docs.select(col("doc_id"),
        graft.functions.SimHash64.simhash64Poly(words(col("text"))).as("simhash")),
      maxDist)

  /** Shared chunk-blocked candidate join + Hamming verify over a
    * (doc_id, simhash) frame. private[ext]: Multimodal's perceptual-
    * hash dedup reuses the identical blocking (an aHash is just
    * another 64-bit locality-sensitive fingerprint). */
  private[ext] def simhashPairsFrom(sh: DataFrame, maxDist: Int): DataFrame = {
    // 4-chunk blocking is SOUND only for maxDist <= 3: a pair within
    // Hamming distance d must agree on >= 1 of d+1 chunks (pigeonhole),
    // so 4 chunks cover d <= 3. A larger maxDist would silently MISS
    // pairs whose differing bits spread across all four chunks — fail
    // loudly instead of returning a wrong (incomplete) pair set.
    require(maxDist >= 0 && maxDist <= 3,
      s"simhashPairs: 16-bit-chunk blocking covers maxDist <= 3, got $maxDist")
    val chunked = sh.select(col("doc_id"), col("simhash"),
      posexplode(array((0 until 4).map(i =>
        shiftright(col("simhash"), i * 16).bitwiseAND(0xffffL)): _*))
        .as(Seq("chunk_no", "chunk")))
    val a = chunked.toDF("a_id", "a_sim", "chunk_no", "chunk")
    val b = chunked.toDF("b_id", "b_sim", "chunk_no", "chunk")
    a.join(b, Seq("chunk_no", "chunk"))
      .where(col("a_id") < col("b_id"))
      .select("a_id", "b_id", "a_sim", "b_sim").distinct()
      .select(col("a_id"), col("b_id"),
        bit_count(col("a_sim").bitwiseXOR(col("b_sim"))).as("hamming"))
      .where(col("hamming") <= maxDist)
  }

  /** Edit-distance verification tier — the exact check that sits
    * between sketch RECALL (MinHash/SimHash candidate pairs) and a
    * dedup DECISION: Levenshtein distance over whitespace-trimmed
    * `prefix`-char text prefixes, keeping pairs whose distance is at
    * most `maxDistPct`% of the longer prefix. Character-level edit
    * distance catches the near-dups token sketches blur (reorderings,
    * small insertions that still shift every shingle) and, run on
    * candidates only, rejects sketch false positives before they merge
    * distinct documents into one cluster.
    *
    * Scale shape: the O(n·m) DP runs ONLY on the candidate sliver
    * (thousands of pairs from billions of docs — never all pairs), and
    * `prefix` caps each DP at prefix² cells, so per-pair cost is a
    * constant independent of document length. The texts arrive by two
    * id-keyed narrow joins against a (doc_id, prefix, len) projection
    * — the pair side is the small side and the projection prunes the
    * full text from the shuffle. The distance filter is pure integer
    * arithmetic (dist·100 ≤ maxLen·pct — no doubles in the predicate);
    * `edit_sim` is one deterministic double division for reporting.
    * Both engines implement textbook Levenshtein, which is what makes
    * the tier oracle-checkable (ExtOracle.editdistVerify). */
  def editDistanceVerify(docs: DataFrame, pairs: DataFrame,
      prefix: Int = 200, maxDistPct: Int = 30): DataFrame = {
    val t = docs
      .select(col("doc_id"), substring(trim(col("text")), 1, prefix).as("__t"))
      .select(col("doc_id"), col("__t"), length(col("__t")).cast("int").as("__len"))
    pairs.select("a_id", "b_id")
      .join(t.select(col("doc_id").as("a_id"), col("__t").as("__ta"),
        col("__len").as("a_len")), "a_id")
      .join(t.select(col("doc_id").as("b_id"), col("__t").as("__tb"),
        col("__len").as("b_len")), "b_id")
      .select(col("a_id"), col("b_id"),
        levenshtein(col("__ta"), col("__tb")).as("edit_dist"),
        col("a_len"), col("b_len"))
      .where(col("edit_dist") * 100 <=
        greatest(col("a_len"), col("b_len")) * maxDistPct)
      .select(col("a_id"), col("b_id"), col("edit_dist"),
        col("a_len"), col("b_len"),
        (lit(1.0) - col("edit_dist").cast("double") /
          greatest(col("a_len"), col("b_len")).cast("double")).as("edit_sim"))
  }
}
