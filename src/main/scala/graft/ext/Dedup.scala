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

  /** w-token shingles of a document, distinct. */
  def shingles(text: Column, w: Int = 3): Column = {
    val ws = words(text)
    array_distinct(transform(
      sequence(lit(0), greatest(size(ws) - w, lit(0))),
      i => concat_ws(" ", (0 until w).map(j => element_at(ws, i + j + 1)): _*)))
  }

  /** Exact dedup: group identical texts by sha256, keep lowest doc_id.
    * (At scale: shuffle on the 32-byte digest, not the document body.) */
  def exact(docs: DataFrame): DataFrame =
    docs.groupBy(sha2(col("text"), 256).as("text_sha"))
      .agg(min(col("doc_id")).as("keep_id"),
        count("*").as("n_copies"))

  /** Exact n-gram Jaccard similarity for every pair sharing ≥1 shingle.
    * |A∩B| from the shingle join, |A∪B| = |A|+|B|−|A∩B|. */
  def ngramJaccardPairs(docs: DataFrame, w: Int = 3, minJaccard: Double = 0.5): DataFrame = {
    val sized = docs.select(col("doc_id"), shingles(col("text"), w).as("sh"))
      .withColumn("n_sh", size(col("sh")))
    val exploded = sized.select(col("doc_id"), col("n_sh"),
      explode(col("sh")).as("s"))
    val a = exploded.toDF("a_id", "a_n", "s")
    val b = exploded.toDF("b_id", "b_n", "s")
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

  /** MinHash signature: k independent hash functions simulated by
    * xxhash64 over a per-function prefix — `min_i(h(i ++ shingle))`.
    * Pure array expressions; signature computed in one pass over the
    * scan, no shuffle. */
  def minhashSignature(text: Column, k: Int = 32, w: Int = 3): Column = {
    val sh = shingles(text, w)
    array((0 until k).map(i =>
      array_min(transform(sh, s => xxhash64(lit(i), s)))): _*)
  }

  /** LSH banding over MinHash signatures: signature split into
    * `bands` bands of `rows` hashes; docs sharing any band bucket are
    * candidates; candidates are verified with estimated Jaccard =
    * fraction of agreeing signature positions. Join is bucket-local —
    * the 100 TB-safe shape. */
  def minhashLshPairs(docs: DataFrame, bands: Int = 8, rows: Int = 4,
      minEstJaccard: Double = 0.5, w: Int = 3): DataFrame = {
    val k = bands * rows
    val sigs = docs.select(col("doc_id"),
      minhashSignature(col("text"), k, w).as("sig"))
    val banded = sigs.select(col("doc_id"), col("sig"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)), bi =>
        hash(slice(col("sig"), bi * rows + 1, lit(rows)), bi))).as(Seq("band", "bucket")))
    val a = banded.toDF("a_id", "a_sig", "band", "bucket")
    val b = banded.toDF("b_id", "b_sig", "band", "bucket")
    val cands = a.join(b, Seq("band", "bucket"))
      .where(col("a_id") < col("b_id"))
      .select("a_id", "b_id", "a_sig", "b_sig").distinct()
    cands.select(col("a_id"), col("b_id"),
      (aggregate(zip_with(col("a_sig"), col("b_sig"),
        (x, y) => when(x === y, lit(1)).otherwise(lit(0))),
        lit(0), (acc, v) => acc + v).cast("double") / lit(k))
        .as("est_jaccard"))
      .where(col("est_jaccard") >= minEstJaccard)
  }

  /** 64-bit SimHash from token-level xxhash64: bit b of the fingerprint
    * is the sign of Σ_tokens (±1 by the token hash's bit b). Computed
    * with explode + 64 conditional sums (single hash-agg pass), then
    * assembled with bitwise ops. */
  def simhash64(docs: DataFrame): DataFrame = {
    val tok = docs.select(col("doc_id"),
      explode(words(col("text"))).as("t"))
      .select(col("doc_id"), xxhash64(col("t")).as("h"))
    val sums = (0 until 64).map(b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(1) === 1, 1)
        .otherwise(-1)).as(s"b$b"))
    val bitSums = tok.groupBy(col("doc_id")).agg(sums.head, sums.tail: _*)
    bitSums.select(col("doc_id"),
      (0 until 64).map(b =>
        when(col(s"b$b") > 0, shiftleft(lit(1L), b)).otherwise(lit(0L)))
        .reduce(_.bitwiseOR(_)).as("simhash"))
  }

  /** Near-dup pairs by SimHash Hamming distance ≤ maxDist. Candidate
    * generation blocks on 16-bit chunks (a Hamming-(≤3) pair must agree
    * on ≥1 of 4 chunks — pigeonhole), so the join is bucket-local. */
  def simhashPairs(docs: DataFrame, maxDist: Int = 3): DataFrame = {
    val sh = simhash64(docs)
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
}
