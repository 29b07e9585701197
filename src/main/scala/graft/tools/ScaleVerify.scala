package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft._

/** Correctness-at-scale spot check (round 13): the sf0.01 gate proves
  * result hashes against the DuckDB oracle and ScaleProbe proves
  * wall-time trajectories, but neither proves RESULT invariance at
  * scale. This harness runs the heaviest gate entries (the quiet-box
  * bench top-10 plus the codec seam entries) on the 4× replicated
  * sf0.1 corpus TWICE — once against a 32-file hash-layout copy and
  * once against a 13-range-partition, reverse-sorted copy of the
  * IDENTICAL rows — and asserts the unordered result hashes match.
  * Engine-vs-engine, no oracle needed: any partition-order
  * dependence, driver merge-order sensitivity, or non-deterministic
  * tie-break that survives the small-scale gate hash-fails here.
  *
  * The hash is the driver-gate shape made order-independent: per row,
  * xxhash64 of the JSON of the column-name-sorted struct; per result,
  * the wrapping Σ (commutative, so layout/order free) plus the row
  * count and the schema string.
  *
  * Writes replicas under /tmp; the artifact lands in the repo as
  * SCALEVERIFY.json + SCALEVERIFY.md.
  * Run: `sbt 'runMain graft.tools.ScaleVerify'` (optional arg:
  * comma-separated entry filter). */
object ScaleVerify {

  /** Quiet-box bench top-10 (BENCH_JUDGE_r12.json) + multimodal_decode
    * (the round-12 codec entry the verdict names explicitly), widened
    * (round-13 continuation) with the next docs/emb-only tier:
    * driver-state consumers (k-center's per-round collect, mutual-kNN
    * components' union-find), the sketch pair tiers, fusion, and the
    * new robust decode entry. */
  val defaultEntries: Seq[String] = Seq(
    "knn_pagerank", "knn_pagerank_shared", "image_dup_verified",
    "pretraining_corpus", "image_dup_decoded", "source_health",
    "cluster_top_terms", "image_dup_candidates", "lm_quality_buckets",
    "bigram_lm_interp", "multimodal_decode",
    "kcenter_sample", "knn_communities", "embedding_outliers",
    "bigram_pmi", "hybrid_rrf", "decontaminate",
    "minhash_pairs_portable", "multimodal_decode_robust",
    // the transactional-log row ops: the two layouts produce DIFFERENT
    // file groupings, hence different rewrite/remove sets — the final
    // snapshot (and the incremental view maintained from the net
    // change feed) must be identical anyway (COW is invisible)
    "txlog_rowops", "txlog_time_travel", "txlog_incremental_agg")

  def main(args: Array[String]): Unit = {
    val d = "/root/testdata/sf0.1"
    val probeOut = "/tmp/scaleprobe" // replicas shared with ScaleProbe
    val sv = "/tmp/scaleverify"
    val spark = Engine.prepare(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    val entries =
      if (args.nonEmpty) defaultEntries.filter(args(0).split(",").toSet)
      else defaultEntries

    Replicas.ensure(spark, d, probeOut, 4)
    Replicas.ensurePlainDocs(spark, d, probeOut, 4)

    /** Entries whose natural-language filters (stopword ratio, lang
      * id) reject every copy-tagged doc — they verify against the
      * plain-text exact-dup replica instead (ids shifted, text
      * untouched), where their dedup tiers carry the load. */
    val plainDocsEntries = Set("pretraining_corpus")

    // two physical layouts of the identical 4x corpus: different file
    // counts, partitioners (hash vs range) and row orders — the same
    // logical table a 1000-executor cluster might hold either way
    def stage(tag: String, src: String, name: String,
        relayout: DataFrame => DataFrame): Unit = {
      val dst = s"$sv/$tag/$name.parquet"
      if (!new java.io.File(s"$dst/_SUCCESS").exists())
        relayout(spark.read.parquet(src))
          .write.mode("overwrite").parquet(dst)
    }
    stage("a", Replicas.docsPath(probeOut, 4), "documents",
      _.repartition(32))
    stage("a", Replicas.embPath(probeOut, 4), "embeddings",
      _.repartition(32))
    stage("b", Replicas.docsPath(probeOut, 4), "documents",
      _.repartitionByRange(13, col("doc_id").desc)
        .sortWithinPartitions(col("doc_id").desc))
    stage("b", Replicas.embPath(probeOut, 4), "embeddings",
      _.repartitionByRange(13, col("vec_id").desc)
        .sortWithinPartitions(col("vec_id").desc))
    stage("ap", Replicas.plainDocsPath(probeOut, 4), "documents",
      _.repartition(32))
    stage("ap", Replicas.embPath(probeOut, 4), "embeddings",
      _.repartition(32))
    stage("bp", Replicas.plainDocsPath(probeOut, 4), "documents",
      _.repartitionByRange(13, col("doc_id").desc)
        .sortWithinPartitions(col("doc_id").desc))
    stage("bp", Replicas.embPath(probeOut, 4), "embeddings",
      _.repartitionByRange(13, col("vec_id").desc)
        .sortWithinPartitions(col("vec_id").desc))

    /** Order-independent result digest: (Σ xxhash64(row json), rows,
      * schema). Wrapping add is commutative, so the digest is a pure
      * function of the result SET. */
    def digest(df: DataFrame): (Long, Long, String) = {
      val cols = df.columns.sorted.map(c => col(s"`$c`"))
      val r = df.select(xxhash64(to_json(struct(cols: _*))).as("h"))
        .agg(sum(col("h")).as("hs"), count(lit(1)).as("n")).head()
      (if (r.isNullAt(0)) 0L else r.getLong(0), r.getLong(1),
        df.schema.map(f => s"${f.name}:${f.dataType.simpleString}")
          .sorted.mkString(","))
    }

    val rows = entries.map { name =>
      val q = SparkEntry.queries(name)
      def run(dir: String): (Long, Long, String, Double) = {
        val t0 = System.nanoTime()
        val (h, n, sch) = digest(q(spark, dir))
        (h, n, sch, (System.nanoTime() - t0) / 1e9)
      }
      val (da, db) =
        if (plainDocsEntries(name)) (s"$sv/ap", s"$sv/bp") else (s"$sv/a", s"$sv/b")
      val (ha, na, sa, ta) = run(da)
      val (hb, nb, sb, tb) = run(db)
      // a 0-row result proves nothing — count it as a failure, not a
      // vacuous pass
      val ok = ha == hb && na == nb && sa == sb && na > 0
      println(f"[scaleverify] $name%-24s ${if (ok) "OK " else "MISMATCH"} " +
        f"rows=$na%-8d hash=$ha%20d  a=$ta%6.2fs b=$tb%6.2fs" +
        (if (ok) "" else f"  (b: rows=$nb hash=$hb)"))
      (name, ok, na, nb, ha, hb, ta, tb)
    }

    val json = rows.map { case (n, ok, na, nb, ha, hb, ta, tb) =>
      s"""{"entry":"$n","match":$ok,"rows_a":$na,"rows_b":$nb,""" +
        s""""hash_a":$ha,"hash_b":$hb,"secs_a":${f"$ta%.2f"},""" +
        s""""secs_b":${f"$tb%.2f"}}"""
    }.mkString("[\n", ",\n", "\n]")
    val nOk = rows.count(_._2)
    java.nio.file.Files.write(java.nio.file.Paths.get("SCALEVERIFY.json"),
      (s"""{"sf":"$d","copies":4,"n_entries":${rows.size},""" +
        s""""n_match":$nOk,"layout_a":"repartition(32) hash",""" +
        s""""layout_b":"repartitionByRange(13, id desc) + """ +
        s"""sortWithinPartitions desc","entries":$json}""" + "\n")
        .getBytes("UTF-8"))
    val md = new StringBuilder
    md ++= "# SCALEVERIFY — result-hash invariance at 4× sf0.1\n\n"
    md ++= "Each entry runs on two physical layouts of the identical " +
      "4×-replicated corpus\n(32-file hash layout vs 13-range-partition " +
      "reverse-sorted layout); the unordered\nresult digest " +
      "(Σ xxhash64(row), row count, schema) must match exactly.\n\n"
    md ++= "| entry | match | rows | hash | secs a/b |\n|---|---|---|---|---|\n"
    rows.foreach { case (n, ok, na, _, ha, _, ta, tb) =>
      md ++= f"| $n | ${if (ok) "OK" else "**MISMATCH**"} | $na | $ha | $ta%.2f / $tb%.2f |\n"
    }
    md ++= s"\n${rows.size} entries, $nOk match.\n"
    java.nio.file.Files.write(java.nio.file.Paths.get("SCALEVERIFY.md"),
      md.toString.getBytes("UTF-8"))
    println(s"[scaleverify] ${rows.size} entries, $nOk match")
    spark.stop()
    if (nOk != rows.size) sys.exit(1)
  }
}
