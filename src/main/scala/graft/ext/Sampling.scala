package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling/splitting for training-data pipelines.
  *
  * Everything is keyed on integer arithmetic over a row id — Knuth
  * multiplicative hashing `((id mod p) · 2654435761) mod m` — rather
  * than `rand()`: assignments are (a) reproducible run-to-run and
  * engine-to-engine (the DuckDB oracle computes the identical buckets),
  * (b) stable under repartitioning — a row's split never depends on
  * which task sampled it, and (c) join-free — a pure projection/filter
  * fused into the scan at any scale. The inner `mod p` (p prime >
  * bucket count) bounds the product away from 64-bit overflow for
  * arbitrarily large ids. */
object Sampling {

  private val P = 1000003L        // prime: id range compressor
  private val A = 2654435761L     // Knuth's multiplicative constant

  /** Pseudo-uniform bucket in [0, m) from a non-negative id. */
  def bucket(id: Column, m: Int): Column =
    pmod(pmod(id, lit(P)) * lit(A), lit(m.toLong))

  /** Train/val/test assignment by percentage (e.g. 80/10/10). */
  def assignSplit(df: DataFrame, idCol: String = "doc_id",
      trainPct: Int = 80, valPct: Int = 10): DataFrame = {
    val b = bucket(col(idCol), 100)
    df.withColumn("split",
      when(b < trainPct, "train")
        .when(b < trainPct + valPct, "val")
        .otherwise("test"))
  }

  /** Leakage-safe train/val/test split: near-duplicate documents must
    * land in the SAME split — independent per-doc assignment puts
    * near-copies of training rows into the held-out sets, and eval
    * silently leaks. The split key is the near-dup cluster's canonical
    * id (connected components over the caller-chosen pair graph — any
    * dedup tier's pairs plug in) for clustered docs, the doc's own id
    * otherwise; the same deterministic bucket hash then runs on that
    * key, so each whole cluster moves between splits atomically and
    * unpaired docs split exactly as `assignSplit` would.
    *
    * Scale shape: the cluster table covers only the dup sliver, so the
    * left join is a broadcast lookup at any corpus size; everything
    * else is the projection-only split arithmetic. */
  def leakageSafeSplit(docs: DataFrame, pairs: DataFrame,
      trainPct: Int = 80, valPct: Int = 10): DataFrame = {
    val clusters = Dedup.dupClusters(pairs)
      .select(col("doc_id"), col("cluster_id"))
    val keyed = docs.join(clusters, Seq("doc_id"), "left")
      .withColumn("__split_key", coalesce(col("cluster_id"), col("doc_id")))
    assignSplit(keyed, "__split_key", trainPct, valPct)
      .drop("__split_key", "cluster_id")
  }

  /** Cross-split leakage audit — the eval-integrity check a split step
    * must ship with: join a near-dup pair graph (any dedup tier's
    * pairs plug in) against a (id, split) assignment and roll up pair
    * counts per unordered split combination. Rows with `leaky = true`
    * (split_x ≠ split_y) are near-copies straddling a train/held-out
    * boundary — each one silently inflates eval. Run it on
    * `assignSplit` to SEE the leakage independent assignment causes;
    * run it on `leakageSafeSplit` and every row must be same-split —
    * the paired gate entries pin both facts.
    *
    * Scale shape: the pair graph is the dup sliver, so both
    * assignment joins stream the tiny pair side against the split
    * projection; the rollup has at most |splits|² rows and is
    * map-combinable. */
  def splitLeakageAudit(assignment: DataFrame, pairs: DataFrame,
      idCol: String = "doc_id"): DataFrame =
    pairs.select("a_id", "b_id")
      .join(assignment.select(col(idCol).as("a_id"),
        col("split").as("a_split")), "a_id")
      .join(assignment.select(col(idCol).as("b_id"),
        col("split").as("b_split")), "b_id")
      .select(least(col("a_split"), col("b_split")).as("split_x"),
        greatest(col("a_split"), col("b_split")).as("split_y"))
      .groupBy(col("split_x"), col("split_y"))
      .agg(count(lit(1)).as("n_pairs"))
      .withColumn("leaky", col("split_x") =!= col("split_y"))

  /** Per-stratum deterministic sampling: keep a row iff its 1/10000
    * bucket clears the stratum's fraction. Strata missing from
    * `fractions` are dropped (fraction 0). One filter, no shuffle, no
    * per-stratum pass — unlike `DataFrameStatFunctions.sampleBy`, the
    * result is identical on every run and engine. */
  def stratifiedSample(df: DataFrame, stratumCol: String,
      fractions: Map[String, Double], idCol: String = "doc_id"): DataFrame = {
    val threshold = fractions.foldLeft(lit(0.0)) { case (acc, (k, f)) =>
      when(col(stratumCol) === k, lit(f * 10000)).otherwise(acc)
    }
    df.where(bucket(col(idCol), 10000).cast("double") < threshold)
  }

  /** Deterministic k-fold assignment (cross-validation prep): fold =
    * Knuth bucket of the id — layout- and engine-invariant like every
    * sampler here. The leakage-safe variant keys the fold hash on the
    * near-dup cluster id (same contract as `leakageSafeSplit`): near-
    * duplicate documents land in the SAME fold, so no fold's held-out
    * slice contains near-copies of another fold's training rows. */
  def kfoldSplit(df: DataFrame, k: Int = 5,
      idCol: String = "doc_id"): DataFrame = {
    require(k > 1, "need at least 2 folds")
    df.withColumn("fold", bucket(col(idCol), k).cast("int"))
  }

  def leakageSafeKfold(docs: DataFrame, pairs: DataFrame,
      k: Int = 5): DataFrame = {
    val clusters = Dedup.dupClusters(pairs)
      .select(col("doc_id"), col("cluster_id"))
    val keyed = docs.join(clusters, Seq("doc_id"), "left")
      .withColumn("__fold_key", coalesce(col("cluster_id"), col("doc_id")))
    kfoldSplit(keyed, k, "__fold_key").drop("__fold_key", "cluster_id")
  }

  /** Mixture (domain-weighted) sampling — the "data mixing" step of a
    * pretraining pipeline: given integer target proportions per group
    * (e.g. web 6 : books 2 : code 2), downsample each group so the
    * OUTPUT matches those proportions at the largest size achievable
    * without upsampling any group. Groups with no weight are dropped.
    *
    * Determinism contract: the derived output size `n_out` =
    * min over weighted groups of `(n_g · W) div w_g` (exact integer
    * floor, W = Σw), and a row survives iff
    * `bucket(id,10⁴) · W · n_g < 10⁴ · w_g · n_out` — a pure int64
    * comparison (magnitudes < 2^60 for corpora to 10¹⁰ rows), no
    * floating point anywhere, so any engine reproduces the sample
    * bit-for-bit and the choice is repartition-invariant like every
    * sampler here.
    *
    * Scale shape: one tiny per-group count aggregation (map-side
    * combinable, |groups| rows), its 1-row min rollup, both broadcast
    * back — the keep decision is then a map-side filter fused into the
    * scan; the corpus itself never shuffles. */
  def mixtureSample(df: DataFrame, groupCol: String,
      weights: Map[String, Int], idCol: String = "doc_id"): DataFrame = {
    val w = weights.filter(_._2 > 0)
    require(w.nonEmpty, "at least one positive weight")
    val wTot = w.values.map(_.toLong).sum
    val wCol = w.foldLeft(lit(0L)) { case (acc, (k, v)) =>
      when(col(groupCol) === k, lit(v.toLong)).otherwise(acc)
    }
    val counts = df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("__n")).withColumn("__w", wCol)
    val nOut = counts.where(col("__w") > 0)
      .agg(min(expr(s"(__n * $wTot) div __w")).as("__n_out"))
    df.join(broadcast(counts), groupCol)
      .crossJoin(broadcast(nOut))
      .where(col("__w") > 0 &&
        bucket(col(idCol), 10000) * lit(wTot) * col("__n") <
          lit(10000L) * col("__w") * col("__n_out"))
      .drop("__n", "__w", "__n_out")
  }

  /** Token-budget waterfill mixing — the "data mixing under a token
    * budget" allocation a pretraining run actually performs: given
    * per-source integer weights and a GLOBAL token budget, allocate
    * budget across sources proportionally to weight, cap every source
    * at its supply, and redistribute the excess over the remaining
    * sources (classic waterfill; converges in ≤ |sources| rounds).
    * Documents are then kept per source in the deterministic shuffle
    * order (Knuth bucket, id tie-break) while the inclusive token
    * prefix-sum stays within the source's allocation. Floor-division
    * remainders (< |sources| tokens) stay unallocated by contract.
    *
    * Scale shape: the waterfill loop runs on the driver over the
    * collected per-source supply table — |sources| rows (dozens at any
    * corpus scale; same bounded-driver-state trade as bpeLearnMerges'
    * vocab path); selection is one per-source prefix-sum window over
    * rows pre-filtered to weighted sources. All arithmetic is exact
    * int64 (remaining·w < 2^63 for corpora to ~10¹⁵ tokens), so any
    * engine reproduces allocations and the kept set bit-for-bit. */
  def budgetMix(df: DataFrame, groupCol: String, weights: Map[String, Int],
      budget: Long, tokensCol: String, idCol: String = "doc_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = weights.filter(_._2 > 0)
    require(w.nonEmpty, "at least one positive weight")
    require(budget >= 0, "budget must be non-negative")
    val in = df.where(col(groupCol).isin(w.keys.toSeq: _*))
    val sup = in.groupBy(col(groupCol)).agg(sum(col(tokensCol)).as("s"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val alloc = scala.collection.mutable.Map.empty[String, Long]
    var active = sup.keySet
    var remaining = budget
    var done = false
    while (!done && active.nonEmpty) {
      val wsum = active.iterator.map(s => w(s).toLong).sum
      val tent = active.iterator.map(s => s -> remaining * w(s) / wsum).toMap
      val sat = active.filter(s => tent(s) >= sup(s))
      if (sat.isEmpty) { tent.foreach { case (s, t) => alloc(s) = t }; done = true }
      else {
        sat.foreach { s => alloc(s) = sup(s); remaining -= sup(s) }
        active --= sat
      }
    }
    val allocCol = alloc.foldLeft(lit(0L)) { case (acc, (k, v)) =>
      when(col(groupCol) === k, lit(v)).otherwise(acc)
    }
    val order = Window.partitionBy(col(groupCol))
      .orderBy(bucket(col(idCol), 10000).asc, col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    in.withColumn("__cum", sum(col(tokensCol)).over(order))
      .where(col("__cum") <= allocCol)
      .drop("__cum")
  }

  /** Rendezvous (highest-random-weight) shard assignment — consistent
    * hashing in its SQL-expressible form: shard(key) = argmax over
    * shards s of the mixed hash `key·(2s+1) + s·gold` (the portable
    * affine family), compared in unsigned order. When the shard count
    * changes n → n+1, ONLY the keys whose argmax lands on the new
    * shard move (≈ 1/(n+1) of them) — vs `key mod n`, which reshuffles
    * ≈ n/(n+1) of the corpus. Pure projection: every row computes n
    * products and one argmax scan-side, no shuffle, no ring state. */
  def rendezvousShard(key: Column, n: Int): Column = {
    require(n >= 1)
    val MIN = lit(Long.MinValue)
    val gold = lit(-7046029254386353131L)
    // the key is Fibonacci-mixed FIRST: the affine family assumes a
    // full-range 64-bit input (it only reweights per shard), and raw
    // small ids would leave s·gold dominating — one shard wins for
    // every key and "consistent" hashing degenerates to all-move
    // (caught by the gate's frac_rendezvous = 1.0 on the first cut).
    // unsigned argmax via the sign-bit flip; ties (u equal) break to
    // the LARGER shard id — array_max on struct compares fieldwise,
    // and the twin ranks (u DESC, s DESC) to match
    val h = key.cast("long") * gold
    array_max(transform(sequence(lit(0), lit(n - 1)), s =>
      struct(
        (h * (s.cast("long") * 2L + 1L)
          + s.cast("long") * gold).bitwiseXOR(MIN).as("u"),
        s.cast("long").as("s")))).getField("s")
  }

  /** Resharding-cost report — the number a 100 TB re-shard decision
    * needs BEFORE touching data: how many keys move when the shard
    * count goes `from` → `to`, under rendezvous hashing vs the naive
    * `mod` layout. Consistent hashing's selling point made measurable:
    * rendezvous moves ≈ 1/to of keys, mod moves ≈ (to−1)/to — a
    * 10× data-movement difference at typical counts, which is the
    * difference between an overnight re-shard and a week-long one.
    *
    * Scale shape: distinct keys (map-combinable), then ONE 1-row
    * aggregate over scan-side shard projections; nothing pairwise,
    * no driver state. */
  def reshardReport(df: DataFrame, keyCol: String, from: Int = 8,
      to: Int = 9): DataFrame = {
    val k = df.select(col(keyCol).cast("long").as("k")).distinct()
    k.agg(count(lit(1)).as("n_keys"),
        sum(when(rendezvousShard(col("k"), from)
          =!= rendezvousShard(col("k"), to), 1L).otherwise(0L))
          .as("moved_rendezvous"),
        sum(when(pmod(col("k"), lit(from.toLong))
          =!= pmod(col("k"), lit(to.toLong)), 1L).otherwise(0L))
          .as("moved_mod"))
      .select(col("n_keys"), col("moved_rendezvous"), col("moved_mod"),
        (col("moved_rendezvous").cast("double") / col("n_keys").cast("double"))
          .as("frac_rendezvous"),
        (col("moved_mod").cast("double") / col("n_keys").cast("double"))
          .as("frac_mod"))
  }

  /** Temperature-scaled mixture weights — the multilingual/multi-source
    * sampling rule (mBERT/XLM-R style): source s is sampled with
    * probability ∝ (tokens_s)^α, α ∈ (0, 1], which upsamples small
    * sources relative to their natural share (α = 1 ⇒ natural
    * sampling; α → 0 ⇒ uniform over sources). This is the WEIGHT
    * COMPUTATION half of mixture design — its `q_pow` column is the
    * integer weight vector `budgetMix`/`mixtureSample` consume, and
    * `upsample_factor` is the epochs-per-source dashboard number
    * (a factor ≫ the dedup-safe repeat budget flags α too low).
    *
    * Determinism: the single transcendental per SOURCE is quantized —
    * q_pow = round(tokens^α·10⁶) as long — so the shares are exact
    * integer ratios evaluated as single double divisions;
    * upsample_factor divides those two quotients in fixed order.
    *
    * Scale shape: one map-side-combinable per-source token count (a
    * pure length projection — no tokenize explode), a |sources|-row
    * aggregate, a 1-row broadcast of the two totals. Nothing is
    * corpus-proportional past the first projection. */
  def temperatureWeights(docs: DataFrame, alpha: Double = 0.7): DataFrame = {
    val st = docs
      .select(col("source"),
        size(split(trim(col("text")), "\\s+")).cast("long").as("n"))
      .groupBy(col("source")).agg(sum(col("n")).as("n_tokens"))
      .select(col("source"), col("n_tokens"),
        round(pow(col("n_tokens").cast("double"), alpha) * 1000000)
          .cast("long").as("q_pow"))
    val tots = st.agg(sum(col("n_tokens")).as("tot_tokens"),
      sum(col("q_pow")).as("tot_pow"))
    st.crossJoin(broadcast(tots))
      .select(col("source"), col("n_tokens"),
        (col("n_tokens").cast("double") / col("tot_tokens").cast("double"))
          .as("natural_share"),
        col("q_pow"),
        (col("q_pow").cast("double") / col("tot_pow").cast("double"))
          .as("temp_share"),
        ((col("q_pow").cast("double") / col("tot_pow").cast("double"))
          / (col("n_tokens").cast("double") / col("tot_tokens").cast("double")))
          .as("upsample_factor"))
  }

  /** GPT-style sequence packing: assign documents to fixed-token-budget
    * training shards. Documents are packed concatenate-then-split — a
    * doc's shard is `floor(exclusive-prefix-sum(tokens) / budget)`, so
    * every shard holds ~budget tokens (straddlers spill into the next,
    * the standard packing rule).
    *
    * Scale shape: a single global running sum would serialize on one
    * reducer, so packing is bucketed — `nBuckets` independent streams
    * keyed by `id mod nBuckets` (oracle-reproducible integer
    * arithmetic, not a hash), each packed by a window partitioned on
    * the bucket and ordered by id. Shards are identified by
    * (pack_bucket, shard_in_bucket): deterministic, layout-invariant,
    * and the window sort is per-bucket — parallelism = nBuckets, state
    * = one running sum per bucket.
    *
    * `nBuckets <= 0` (the default) resolves to the session's
    * `defaultParallelism`, so reducer fan-out tracks the cluster
    * instead of a fixed constant (8 window reducers on a 1000-executor
    * cluster would serialize the packing). Pass an explicit value when
    * bucket ids must be stable across differently-sized sessions
    * (e.g. a cross-engine verification run). */
  def packShards(df: DataFrame, tokensCol: String, budget: Long,
      idCol: String = "doc_id", nBuckets: Int = 0): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val buckets =
      if (nBuckets > 0) nBuckets
      else df.sparkSession.sparkContext.defaultParallelism
    val w = Window.partitionBy(col("pack_bucket")).orderBy(col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("pack_bucket", pmod(col(idCol), lit(buckets.toLong)))
      .withColumn("__cum", sum(col(tokensCol)).over(w) - col(tokensCol))
      .withColumn("shard_in_bucket", (col("__cum") / lit(budget)).cast("long"))
      .drop("__cum")
  }

  /** Packing-efficiency report over a `packShards` assignment — the
    * loader-health observability a packing step needs: per-shard fill
    * is the padding/waste a trainer actually eats, and a fill
    * distribution with a long thin tail means the budget or bucket
    * count is mistuned. ONE report row: shard count, total tokens,
    * mean fill fraction, exact fill-fraction quartiles, and the waste
    * fraction of a full budget·n_shards allocation. The per-shard
    * rollup is map-side combinable on the (bucket, shard) key it is
    * already partitioned by; the report is a 1-row aggregate (exact
    * `percentile`, the pin_q6 parity rule). */
  def packingReport(packed: DataFrame, budget: Long,
      tokensCol: String = "n_tokens"): DataFrame = {
    val fills = packed.groupBy(col("pack_bucket"), col("shard_in_bucket"))
      .agg(sum(col(tokensCol)).as("fill"))
      .select((col("fill").cast("double") / budget).as("frac"), col("fill"))
    fills.agg(
      count(lit(1)).as("n_shards"),
      sum(col("fill")).as("total_tokens"),
      (sum(col("fill")).cast("double") /
        (count(lit(1)).cast("double") * budget)).as("mean_fill"),
      expr("percentile(frac, 0.25)").as("p25_fill"),
      expr("percentile(frac, 0.5)").as("p50_fill"),
      expr("percentile(frac, 0.75)").as("p75_fill"))
      .withColumn("waste_frac", lit(1.0) - col("mean_fill"))
  }

  /** Materialize the packed TRAINING SEQUENCES from a `packShards`
    * assignment: one row per (bucket, shard) with the member documents
    * concatenated in id order — the artifact a tokenizer/loader
    * actually consumes. `collect_list` is order-nondeterministic under
    * parallel aggregation, so members are gathered as (id, text)
    * structs and `array_sort`ed before joining — byte-identical output
    * on any layout or engine. Per-shard state is bounded by the pack
    * budget (a shard holds ~budget tokens by construction), so the
    * group aggregation never accumulates unbounded rows. */
  def packSequences(packed: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", tokensCol: String = "n_tokens",
      sep: String = " "): DataFrame =
    packed.groupBy(col("pack_bucket"), col("shard_in_bucket"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col(tokensCol)).as("n_tokens"),
        array_join(
          transform(
            array_sort(collect_list(struct(col(idCol).as("i"), col(textCol).as("t")))),
            x => x.getField("t")),
          sep).as("sequence"))

  /** Shard manifest over a `packShards` assignment — the WebDataset-
    * style index a training job reads before it reads any shard: one
    * row per (bucket, shard) with document count, token total, the
    * id range, and an MD5 content digest over the id-sorted member
    * list. The digest is what makes a multi-engine / multi-run corpus
    * build auditable: two builds of "the same" corpus either agree on
    * every shard digest or the diff points at exactly which shards
    * changed — without re-reading a byte of text.
    *
    * Scale shape: one map-side-combinable groupBy on the key the
    * assignment is already organized by; per-group state (the member
    * id list) is bounded by the pack budget, not the corpus —
    * `collect_list` is safe here for the same reason it is in
    * `packSequences`, and it is `array_sort`ed before hashing so the
    * digest is layout- and engine-invariant. */
  /** Length-grouped batching report — the dynamic-batching planner's
    * view of the corpus: documents sorted by token length are grouped
    * into consecutive batches of `batchSize`, and each batch row
    * reports the padding a trainer would eat bringing every member up
    * to the batch max (`n_docs·max − sum`). Length-sorted batching is
    * THE standard fix for padding waste in variable-length training;
    * this operator quantifies exactly what it saves.
    *
    * Scale shape: the global length-sorted rank never runs through one
    * reducer — rows rank within (n_tokens, knuth-bucket) groups (the
    * sub-bucket bounds the reducer even when the length distribution
    * is peaked, e.g. billions of docs truncated to exactly 512
    * tokens), and global contiguity comes from per-(length, bucket)
    * base offsets off a bounded count rollup joined back broadcast —
    * the stableRowIds / curriculumOrder pattern. The batch rollup is
    * one map-combinable groupBy on batch_id. Total order:
    * (n_tokens ASC, bucket ASC, doc_id ASC) — deterministic and
    * engine-reproducible. */
  def lengthBatches(df: DataFrame, batchSize: Int = 32,
      tokensCol: String = "n_tokens", idCol: String = "doc_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(batchSize >= 1, "batchSize must be positive")
    val t = df.withColumn("__bk", bucket(col(idCol), 10000))
    val counts = t.groupBy(col(tokensCol), col("__bk"))
      .agg(count(lit(1)).as("__n"))
    // prefix sum over the (length, bucket) ROLLUP — bounded by
    // |distinct lengths|·10000, not corpus size
    val wOff = Window.orderBy(col(tokensCol).asc, col("__bk").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow - 1)
    val base = counts
      .withColumn("__base", coalesce(sum(col("__n")).over(wOff), lit(0L)))
      .select(col(tokensCol), col("__bk"), col("__base"))
    val w = Window.partitionBy(col(tokensCol), col("__bk"))
      .orderBy(col(idCol).asc)
    t.join(broadcast(base), Seq(tokensCol, "__bk"))
      .withColumn("__rank", col("__base") + row_number().over(w))
      .withColumn("batch_id", ((col("__rank") - 1) / batchSize).cast("long"))
      .groupBy(col("batch_id"))
      .agg(count(lit(1)).as("n_docs"),
        max(col(tokensCol)).cast("long").as("max_tokens"),
        sum(col(tokensCol)).cast("long").as("sum_tokens"))
      .withColumn("padding",
        col("n_docs") * col("max_tokens") - col("sum_tokens"))
  }

  /** Token-proportional systematic sampling — a deterministic
    * weighted sample with zero RNG and zero floating point: lay the
    * corpus out on a token axis in (knuth-bucket, id) order and keep
    * every document whose span covers a multiple of `every`. Selection
    * probability is proportional to token count (the importance weight
    * that matters for a token-budgeted corpus), the expected sample
    * size is totalTokens/every exactly, and the whole decision is
    * integer arithmetic: a span [start, start+n) covers a multiple ⟺
    * start%every == 0 ∨ start%every + n > every — no doubles, no
    * u^(1/w) priority keys, reproducible on any engine.
    *
    * Scale shape: the exclusive prefix sum is two-level — per-bucket
    * token sums roll up to a bounded |buckets|-row offset table
    * (broadcast back), and the within-bucket running sum is a window
    * per bucket — so no single-reducer scan, same as stableRowIds.
    * Emits (id, tokens, token_pos) with token_pos the exact axis
    * offset, so a downstream shard can re-derive its sampling frame
    * without recomputing the prefix. */
  def systematicSample(df: DataFrame, every: Long,
      tokensCol: String = "n_tokens", idCol: String = "doc_id",
      nBuckets: Int = 64): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(every >= 1, "sampling interval must be positive")
    val t = df.withColumn("__b", bucket(col(idCol), nBuckets))
    val offs = t.groupBy(col("__b")).agg(sum(col(tokensCol)).as("__s"))
    val wOff = Window.orderBy(col("__b").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow - 1)
    val base = offs
      .withColumn("__base", coalesce(sum(col("__s")).over(wOff), lit(0L)))
      .select(col("__b"), col("__base"))
    val w = Window.partitionBy(col("__b")).orderBy(col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t.join(broadcast(base), "__b")
      .withColumn("__start",
        col("__base") + sum(col(tokensCol)).over(w) - col(tokensCol))
      .where(pmod(col("__start"), lit(every)) === 0 ||
        pmod(col("__start"), lit(every)) + col(tokensCol) > every)
      .select(col(idCol), col(tokensCol), col("__start").as("token_pos"))
  }

  /** Weighted sampling WITHOUT replacement — Efraimidis–Spirakis A-ES
    * (IPL 2006): each row gets key u^(1/w) for u uniform in (0, 1];
    * the k largest keys ARE a weight-proportional sample without
    * replacement. Selection pressure follows the weight column
    * (tokens, quality, recency…) exactly — the principled way to take
    * "a 50M-doc sample biased toward high-quality long documents"
    * without the with-replacement duplicates naive weighted draws
    * produce.
    *
    * Determinism contract (rand()-free like every sampler here): u =
    * (Knuth bucket(id, 10⁶) + 1) / 10⁶, the key compared in log space
    * ln(u)/w — ln quantized to integer ·10⁶ per the house rule, then
    * ONE correctly-rounded double division qln/w per row (identical in
    * any IEEE engine), ties doc_id ASC. Repartition-invariant,
    * engine-reproducible (DuckDB twin recomputes every key), and
    * stable run-to-run.
    *
    * Scale shape: the key is a pure scan projection (no joins, no
    * shuffle); the global top-k is sort+limit → TakeOrderedAndProject
    * (map-side pruned per partition, never a global sort); the
    * k-row result then gets its rank from a window over k rows.
    * Returns the input columns + (es_key, sample_rank). */
  def weightedSample(df: DataFrame, weightCol: String, k: Int,
      idCol: String = "doc_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 1, "sample size must be positive")
    val qln = round(log((bucket(col(idCol), 1000000) + 1L).cast("double")
      / 1000000.0) * 1000000).cast("long")
    val keyed = df
      .withColumn("es_key",
        qln.cast("double") / col(weightCol).cast("double"))
      .orderBy(col("es_key").desc, col(idCol).asc)
      .limit(k)
    keyed.withColumn("sample_rank", row_number().over(
      Window.orderBy(col("es_key").desc, col(idCol).asc)).cast("long"))
  }

  /** Per-group weighted sampling without replacement —
    * `weightedSample` within each group: every group keeps its own
    * k-row A-ES sample, so selection pressure follows the weight
    * INSIDE a source while the per-group quota bounds domination (the
    * weighted upgrade of `Curation.sourceCap`'s quality top-k; same
    * key contract as the global sampler). Per-group top-k is a rank
    * window WindowGroupLimit prunes map-side — never a per-group sort
    * of the corpus. */
  def weightedSampleByGroup(df: DataFrame, groupCol: String,
      weightCol: String, k: Int, idCol: String = "doc_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 1, "sample size must be positive")
    val qln = round(log((bucket(col(idCol), 1000000) + 1L).cast("double")
      / 1000000.0) * 1000000).cast("long")
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col("es_key").desc, col(idCol).asc)
    df.withColumn("es_key",
        qln.cast("double") / col(weightCol).cast("double"))
      .withColumn("sample_rank", row_number().over(w).cast("long"))
      .where(col("sample_rank") <= k)
  }

  /** Token-budget epochs report — the repetition accounting a data
    * mix implies, read BEFORE `budgetMix` materializes a sample: per
    * group, the tokens the mix ASKS for (budget·w div ΣW — exact
    * integer floor), the tokens the group HAS, and the resulting
    * epoch count (asked/has). Epochs > 1 means the mix repeats that
    * source's tokens; the repeated-data scaling literature makes high
    * epoch counts the first thing to check when a mix under-delivers
    * — this table surfaces them at plan time, not after training.
    * Groups without a weight report w = 0 (excluded from the mix but
    * still visible); a zero-token group reports NULL epochs.
    *
    * Scale shape: one map-side-combinable |groups|-row aggregation;
    * the weight map is a literal CASE column; requested/epochs are
    * per-row integer arithmetic + one double division. `budget ·
    * max(w)` must stay below 2⁶³ (any realistic budget does). */
  def epochsReport(df: DataFrame, groupCol: String,
      weights: Map[String, Int], budget: Long,
      tokensCol: String = "n_tokens"): DataFrame = {
    require(budget > 0, "budget must be positive")
    require(weights.nonEmpty && weights.values.forall(_ >= 0) &&
      weights.values.sum > 0, "need non-negative weights with a positive sum")
    val totalW = weights.values.sum
    val wcol = weights.foldLeft(lit(null).cast("long")) { case (acc, (k, v)) =>
      when(col("source") === k, lit(v.toLong)).otherwise(acc)
    }
    df.select(col(groupCol).as("source"), col(tokensCol))
      .groupBy(col("source"))
      .agg(sum(col(tokensCol)).as("n_tokens_available"))
      .withColumn("w", coalesce(wcol, lit(0L)))
      .withColumn("n_tokens_requested", expr(s"(w * $budget) div $totalW"))
      .withColumn("epochs",
        when(col("n_tokens_available") > 0,
          col("n_tokens_requested").cast("double")
            / col("n_tokens_available").cast("double")))
      .select("source", "w", "n_tokens_available", "n_tokens_requested",
        "epochs")
  }

  def shardManifest(packed: DataFrame, idCol: String = "doc_id",
      tokensCol: String = "n_tokens"): DataFrame =
    packed.groupBy(col("pack_bucket"), col("shard_in_bucket"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col(tokensCol)).cast("long").as("n_tokens"),
        min(col(idCol)).as("min_id"), max(col(idCol)).as("max_id"),
        array_sort(collect_list(col(idCol))).as("__ids"))
      .select(col("pack_bucket"), col("shard_in_bucket"), col("n_docs"),
        col("n_tokens"), col("min_id"), col("max_id"),
        md5(concat_ws(",", transform(col("__ids"), _.cast("string")))
          .cast("binary")).as("content_digest"))

  /** Deterministic in-corpus negative sampling — `numNeg` "random"
    * negatives per document for contrastive / retrieval training
    * (the other half of `TextAnalysis.contrastiveCrops`' positives),
    * without `rand()`: documents get contiguous positions
    * (`Indexing.stableRowIds` — range exchange + partition offsets, no
    * single-reducer window), and negative j for position p is the
    * document at (p + j·⌊N/(numNeg+1)⌋) mod N. The fixed large stride
    * guarantees the negative is far from the anchor in doc_id order
    * (never itself while N > numNeg, since then j·step < N — a corpus
    * of ≤ numNeg docs has no numNeg distinct others to offer), every
    * document serves as a
    * negative equally often (a permutation per j — balanced load, no
    * hot negatives), and the assignment is reproducible across runs
    * and engines.
    *
    * Scale shape: the position table builds with one range exchange;
    * the negative lookup is a self-equi-join on the position key (both
    * sides the same narrow (pos, id) table — shuffle-merged, never
    * broadcast at corpus scale). N arrives as a 1-row broadcast, not a
    * driver scalar. Returns (doc_id, neg_rank, neg_doc_id). */
  def negativeSamples(docs: DataFrame, numNeg: Int = 2): DataFrame = {
    require(numNeg >= 1, "need at least one negative per doc")
    val ids = Indexing.stableRowIds(
      docs.select(col("doc_id")), Seq("doc_id"), idCol = "pos")
    val n = broadcast(ids.agg(count(lit(1)).as("__n")))
    val negs = ids.crossJoin(n)
      .select(col("doc_id"), col("pos"), col("__n"),
        explode(sequence(lit(1L), lit(numNeg.toLong))).as("neg_rank"))
      .withColumn("neg_pos",
        pmod(col("pos") + col("neg_rank") *
          greatest(expr(s"__n div ${numNeg + 1}"), lit(1L)), col("__n")))
    negs.join(
        ids.select(col("pos").as("neg_pos"), col("doc_id").as("neg_doc_id")),
        "neg_pos")
      .select(col("doc_id"), col("neg_rank"), col("neg_doc_id"))
  }
}
