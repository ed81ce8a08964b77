package graft

import java.nio.file.Files

import graft.jobs.HeaderEtlJob
import graft.tools.HeaderDataGen
import org.apache.spark.sql.SparkSession

/** Benchmark main: runs the header-ETL volume-scaling scenario (generate
  * batch1 + batch2 at each size, init-load batch1, measure the batch2
  * MERGE batch with the extract/validation/transform/merge phase
  * breakdown — the exact workload behind BASELINE.md's volume-scaling
  * rows), the partitioning/schema-evolution scenarios, then times every
  * SparkEntry query on SPARK_GRAFT_SF_DIR, then a CPU-scaling sweep —
  * and prints a final burst of small JSON lines (sections first, the
  * `"metric":"total"` headline line LAST — the recorder keeps only a
  * bounded output tail, and one giant line got truncated in round 4).
  * The volume sweep runs FIRST (right after warmup) so the headline
  * numbers aren't measured on a JVM aged by 40 queries of cache/GC
  * churn; the largest size repeats 3× so the artifact records a spread.
  * Failed queries are reported as errors with a negative time — never as
  * a (fake, fast) wall time. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftSession.tune(spark)
    watchStreamingResidue(spark)
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()

    // START-OF-RUN QUIESCE (the r11 ask): the driver invokes this main
    // right after its correctness pass, which leaves multi-GB of dirty
    // page cache AND possibly a still-running driver-side consumer
    // (oracle comparisons) sharing the host. The r11 record showed the
    // contamination migrating to whatever sections run EARLY (1M 21.4 s
    // vs 11.1 settled, 5M 53.4 vs 21.7) while later sections read clean —
    // i.e. the co-tenant drains a few minutes in. settle() only watches
    // writeback; this also waits (bounded) for external CPU consumers to
    // go quiet before any timed section starts.
    quiesce(maxWaitS = 120, label = "start")

    // ---- warmup (untimed) ----------------------------------------------
    // One throwaway query + one small end-to-end header batch absorb JIT,
    // codegen compilation, and filesystem warmup, so the first RECORDED
    // numbers are steady-state (round 2 recorded a 61.8 s first-run 100k
    // that re-measured at 8.3 s warm — the warmup closes that gap).
    try {
      SparkEntry.queries("q1_agg")(spark, sfDir).count()
      val w = Files.createTempDirectory("graft-bench-warmup").toString
      HeaderDataGen.writeBatch1(spark, 50000, "20230127", s"$w/crm", cpus.toInt, seed = 7)
      HeaderDataGen.writeBatch2(spark, 50000, "20230228", s"$w/crm", cpus.toInt,
        seed = 8, existingCount = 50000, pctNew = 50.0)
      HeaderEtlJob.run(spark, s"$w/crm/header_20230127.csv",
        s"$w/table", s"$w/discarded", s"$w/metrics")
      HeaderEtlJob.run(spark, s"$w/crm/header_20230228.csv",
        s"$w/table", s"$w/discarded", s"$w/metrics")
      deleteRecursively(new java.io.File(w))
    } catch {
      case e: Throwable =>
        errors("warmup") = Option(e.getMessage).getOrElse(e.getClass.getName).take(200)
    }

    // iteration aid: SPARK_GRAFT_SKIP_QUERIES=1 times only the ETL scenarios
    val skipQueries = sys.env.get("SPARK_GRAFT_SKIP_QUERIES").contains("1")
    // iteration aid: SPARK_GRAFT_ONLY_QUERIES=q32_streaming_scd2,q25_header_scd2
    // times just those queries (empty/unset = all)
    val onlyQueries: Set[String] = sys.env.getOrElse("SPARK_GRAFT_ONLY_QUERIES", "")
      .split(',').map(_.trim).filter(_.nonEmpty).toSet
    // fail fast on a typo'd name: silently timing an empty query map
    // reads as a valid (and suspiciously fast) run
    locally {
      val unknown = onlyQueries -- SparkEntry.queries.keySet
      require(unknown.isEmpty,
        s"SPARK_GRAFT_ONLY_QUERIES names not in SparkEntry.queries: " +
          s"${unknown.toSeq.sorted.mkString(",")}")
    }

    // ---- header-ETL volume scaling (BASELINE.md rows 1-4) --------------
    // batch2 (50% new keys) against an n-row table is the measured batch.
    // Default records all four published baseline points (100k/1M/5M/10M —
    // reference: metrics/volume_scaling/volume_scaling_metrics_all.csv:2-5).
    val headerSizes = sys.env.getOrElse("SPARK_GRAFT_HEADER_SIZES",
      "100000,1000000,5000000,10000000")
      .split(",").map(_.trim).filter(_.nonEmpty).map(_.toLong)
    // Timed repetitions per size: 3 from 1M up AND at the sweep's
    // largest point, 2 for the remaining cheap sizes — every recorded
    // number carries a spread, and the expensive points get a median of
    // 3 that absorbs one bad rep. A single sample at 10M proved
    // load-confounded (97.4 s recorded vs ~34.7 s quiet-host on
    // identical code), round-5 saw 1M swing 10.8→15.0 s on n=1, and
    // round-7's committed 1M spread ~2× on n=2.
    // Override with SPARK_GRAFT_HEADER_REPEATS: one int for all sizes, or
    // a comma list aligned with SPARK_GRAFT_HEADER_SIZES.
    val repeatList: Seq[Int] = {
      val env = sys.env.getOrElse("SPARK_GRAFT_HEADER_REPEATS", "").trim
      if (env.isEmpty)
        headerSizes.toSeq.map(n =>
          if (n >= 1000000L || (headerSizes.nonEmpty && n == headerSizes.max)) 3
          else 2)
      else {
        val parts = env.split(",").map(_.trim.toInt)
        if (parts.length == 1) Seq.fill(headerSizes.length)(parts(0))
        else {
          // a shorter list would zip-truncate sizes SILENTLY — the artifact
          // would look complete while missing points; fail loudly instead
          require(parts.length == headerSizes.length,
            s"SPARK_GRAFT_HEADER_REPEATS has ${parts.length} entries but " +
              s"SPARK_GRAFT_HEADER_SIZES has ${headerSizes.length}")
          parts.toSeq
        }
      }
    }
    var lastTablePath: Option[String] = None
    // SECTION SETTLE (the r10 ask): everything that ran before this
    // process section — the driver's Verify pass, the warmup's table
    // writes — may still be flushing; drain it AND wait for any external
    // CPU consumer so the sweep's first size starts from the same quiet
    // state as a standalone run
    quiesce(maxWaitS = 90, label = "pre_header")
    // per size: accepted reps as (metrics, extCpuAvg, extCpuMax) plus the
    // retry count — the r12 verdict's detect-don't-prevent ask. Each rep
    // SAMPLES external CPU during the measured batch2 window and a rep
    // trampled past ~1 core is re-run (bounded); the artifact records
    // per-rep ext_cpu_cores and a clean_median over uncontaminated reps,
    // so a mid-rep co-tenant stall (r12: one 226.5 s rep beside a 44.3 s
    // one) is named in the record instead of poisoning the median.
    val headerRuns: Seq[(Long, Seq[(graft.jobs.HeaderRunMetrics, ExtSample)], Int)] =
      headerSizes.toSeq.zip(repeatList).flatMap { case (n, reps) =>
        var thisTmp: Option[String] = None
        try {
          // previous size's data is deleted before the next timed run — the
          // accumulated temp tables otherwise evict the page cache and bleed
          // into the larger sizes' measurements (the r3 10M spread)
          lastTablePath.foreach { p =>
            deleteRecursively(new java.io.File(p).getParentFile)
          }
          System.gc()
          val tmp = Files.createTempDirectory(s"graft-bench-header-$n").toString
          thisTmp = Some(tmp)
          HeaderDataGen.writeBatch1(spark, n, "20230127", s"$tmp/crm", cpus.toInt, seed = 42)
          HeaderDataGen.writeBatch2(spark, n, "20230228", s"$tmp/crm", cpus.toInt,
            seed = 43, existingCount = n, pctNew = 50.0)
          // each repetition replays init + merge on a FRESH table from the
          // same generated CSVs — the batch2 merge is the measured number.
          // One rep = delete previous rep's outputs, settle the page cache
          // around the UNTIMED writes (CSV generation, the deletes, and
          // above all the batch1 INIT LOAD — a multi-GB table write whose
          // async writeback otherwise lands inside the measurement: reps
          // swung 13 → 42 s at 1M purely from flush overlap), then the
          // measured batch2 under the external-CPU sampler.
          def oneRep(deleteFirst: Boolean): (graft.jobs.HeaderRunMetrics, ExtSample) = {
            if (deleteFirst) {
              Seq("table", "discarded", "metrics").foreach(d =>
                deleteRecursively(new java.io.File(s"$tmp/$d")))
              System.gc()
            }
            // settle bound scales with the size: a 10M batch1 init writes
            // multi-GB whose flush outlives the default 30 s poll bound —
            // expired, the residue lands in timed rep 1 (r13 isolated 10M
            // rep1 read ~2× reps 2-3 on BOTH A/B trees). The poll returns
            // the moment Dirty+Writeback drains, so small sizes pay nothing.
            settle(maxWaitS = settleBoundS(n), label = s"header_$n")
            HeaderEtlJob.run(spark, s"$tmp/crm/header_20230127.csv",
              s"$tmp/table", s"$tmp/discarded", s"$tmp/metrics")
            settle(maxWaitS = settleBoundS(n), label = s"header_$n")
            val sampler = new ExtCpuSampler
            val m = HeaderEtlJob.run(spark, s"$tmp/crm/header_20230228.csv",
              s"$tmp/table", s"$tmp/discarded", s"$tmp/metrics")
            (m, sampler.stop())
          }
          // untimed warmup rep: first-touch read of the fresh multi-GB
          // CSVs + size-specific plan/codegen land here, so the TIMED
          // reps start from an identical warm state (the r8 first-rep
          // discipline — idle spreads tightened 2.1-2.6× → 1.05×)
          oneRep(deleteFirst = false)
          val (ms, retries) = guardedReps(reps)(() => oneRep(deleteFirst = true))
          lastTablePath = Some(s"$tmp/table")
          Some((n, ms, retries))
        } catch {
          case e: Throwable =>
            errors(s"header_etl_$n") = Option(e.getMessage).getOrElse(e.getClass.getName).take(200)
            // the failed size's partial data would bleed into the next
            // size's measurement (and leak after exit) — delete it too
            thisTmp.foreach(t => deleteRecursively(new java.io.File(t)))
            lastTablePath = None // previous size's dir was already deleted
            None
        }
      }

    // ---- partitioning + schema-evolution scenarios over the largest
    // header table (BASELINE.md partitioning + schema-evolution rows) ----
    def timed(f: => Long): (Double, Long) = {
      val t0 = System.nanoTime()
      val rows = f
      ((System.nanoTime() - t0) / 1e9, rows)
    }
    val extraJson: Seq[String] = lastTablePath.toSeq.flatMap { path =>
      try {
        // SECTION SETTLE: the largest ETL size's final merge just wrote
        // a multi-GB table; its flush otherwise lands inside the
        // partitioned-count / sweep timings
        quiesce(maxWaitS = 45, label = "pre_extras")
        import org.apache.spark.sql.functions.{col, lit}
        val t = graft.tables.VersionedTable.forPath(spark, path)
        // partition-pruned count (reference: src/utils/partitioning_test.py:24
        // — y/m/d filter + is_current over the partitioned table)
        val (qSec, qRows) = timed {
          t.read.filter(col("valid_from_year") === 2023 &&
            col("valid_from_month") === 2 && col("valid_from_day") === 28 &&
            col("is_current") === true).count()
        }
        // partitioning-strategy sweep: the SAME query against the same
        // data written FRESH under each layout (fresh for all three so
        // file-population effects of the merge history don't bias one
        // layout) — reference: infra/partitioning_runs.sh:39-47; its
        // finding, that y/m/d wins and 2-valued is_current partitioning
        // is no better than none, is partitioning_strategies.md:16-27
        val sweep = Seq(
          "ymd" -> Seq("valid_from_year", "valid_from_month", "valid_from_day"),
          "is_current" -> Seq("is_current"),
          "none" -> Seq.empty[String]).map { case (label, partCols) =>
          val dir = Files.createTempDirectory(s"graft-bench-part-$label").toString
          graft.tables.VersionedTable.create(spark, t.read, s"$dir/t", partCols)
          val alt = graft.tables.VersionedTable.forPath(spark, s"$dir/t")
          val (s, r) = timed {
            alt.read.filter(col("valid_from_year") === 2023 &&
              col("valid_from_month") === 2 && col("valid_from_day") === 28 &&
              col("is_current") === true).count()
          }
          require(r == qRows, s"partitioning sweep '$label' row mismatch: $r != $qRows")
          deleteRecursively(new java.io.File(dir))
          s""""$label":${math.rint(s * 1000) / 1000}"""
        }
        val sweepJson = s""""partitioning_sweep":{${sweep.mkString(",")}}"""
        // schema evolution: mergeSchema-append 100 rows with a new column,
        // then time-travel read prev + read current
        // (reference: schema_evolution_step1.py:139-178)
        val prevVersion = t.currentVersion
        val sample = t.read.limit(100).withColumn("new_col", lit("x"))
        val (wSec, _) = timed { t.append(sample, mergeSchema = true); 0L }
        val (rPrevSec, prevRows) = timed { t.readVersion(prevVersion).count() }
        val (rCurSec, curRows) = timed { t.read.count() }
        Seq(
          s""""partitioned_count":{"sec":${math.rint(qSec * 1000) / 1000},"rows":$qRows}""",
          sweepJson,
          s""""schema_evolution":{"append_sec":${math.rint(wSec * 1000) / 1000},""" +
            s""""read_prev_sec":${math.rint(rPrevSec * 1000) / 1000},"prev_rows":$prevRows,""" +
            s""""read_cur_sec":${math.rint(rCurSec * 1000) / 1000},"cur_rows":$curRows}""")
      } catch {
        case e: Throwable =>
          errors("extra_scenarios") = Option(e.getMessage).getOrElse(e.getClass.getName).take(200)
          Nil
      }
    }
    // the largest size's table is only needed by the extras — reclaim it
    // before the query section
    lastTablePath.foreach(p => deleteRecursively(new java.io.File(p).getParentFile))

    // ---- per-query timings ----------------------------------------------
    // Untimed warmup first (mirrors the ---- warmup ---- block): the query
    // section follows the 10M volume sweep, and without it the first timed
    // queries (alphabetically q5-q8 land there) absorb the aged JVM's
    // GC/page-cache turbulence — BENCH_r04 recorded them 3-6× inflated
    // purely from ordering.
    if (!skipQueries) {
      try {
        // SECTION SETTLE: the 10M ETL sweep + partitioning sweep just
        // deleted tens of GB of temp tables; drain the writeback (and
        // any external CPU consumer) before the first timed queries
        // (alphabetically q1-q10) absorb it
        quiesce(maxWaitS = 90, label = "pre_queries")
        SparkEntry.queries("q1_agg")(spark, sfDir).count()
        SparkEntry.queries("q6_nullsafe_diff")(spark, sfDir).count()
        graft.ops.Caches.releaseAll()
      } catch {
        case e: Throwable =>
          errors("query_warmup") = Option(e.getMessage).getOrElse(e.getClass.getName).take(200)
      }
    }
    // Each query runs `queryReps` times and the artifact records the
    // full run list plus the median — BENCH_r05's single-sample query section
    // read 1.8× slower than a committed same-code run purely from host load
    // (q25 21.3 vs 4.3 s); with a spread per query, load can never masquerade
    // as a regression again. SPARK_GRAFT_QUERY_REPEATS=1 for fast iteration.
    //
    // Tight-spread protocol (the r5→r7 ask): when reps > 1, each query
    // first runs ONCE UNTIMED — its own codegen/JIT and first-touch IO
    // land there, not in timed rep 1 (r7: q91 ran [3.06, 1.14, 1.11];
    // the 3.06 is pure first-run compilation, not the query) — and
    // queries whose warmup exceeded 1 s (the fixture-table builders:
    // q24/q25/q28...) get a sync+GC before every timed rep so the
    // previous rep's async writeback can't land inside this rep's
    // window (same flush-overlap mechanism the ETL section's settle()
    // closes, minus its 1 s sleep — a 0.1 s pause suffices for the
    // MB-scale tmp tables queries write).
    val queryReps = sys.env.getOrElse("SPARK_GRAFT_QUERY_REPEATS", "3").trim.toInt
    require(queryReps >= 1, s"SPARK_GRAFT_QUERY_REPEATS must be >= 1, got $queryReps")
    def settleLight(): Unit = {
      try Runtime.getRuntime.exec(Array("sync")).waitFor()
      catch { case scala.util.control.NonFatal(_) => }
      System.gc()
      // short drain (3 s cap): MB-scale tmp tables flush near-instantly,
      // so this normally returns on the first poll
      awaitWritebackDrain(3)
    }
    // per-rep contamination detection applies to the query section too:
    // each timed rep runs under an ExtCpuSampler and its external-CPU
    // average is recorded next to the time; a trampled rep (> 1 core)
    // is re-run once, drawing from a SECTION-WIDE retry budget so a
    // persistently busy host can at most add ~20 reps of wall time
    // instead of doubling a 94-query pass.
    var queryRetryBudget = 20
    var queryRetries = 0
    val results: Seq[(String, Seq[(Double, ExtSample)])] =
      (if (skipQueries) Map.empty[String, (SparkSession, String) => org.apache.spark.sql.DataFrame]
       else if (onlyQueries.nonEmpty) SparkEntry.queries.view.filterKeys(onlyQueries).toMap
       else SparkEntry.queries).toSeq.sortBy(_._1).map { case (name, fn) =>
        var failed = false
        var heavy = false
        if (queryReps > 1) {
          val t0 = System.nanoTime()
          try { fn(spark, sfDir).count(); heavy = (System.nanoTime() - t0) / 1e9 > 1.0 }
          catch {
            case e: Throwable =>
              errors(name) = Option(e.getMessage).getOrElse(e.getClass.getName).take(200)
              failed = true
          }
          graft.ops.Caches.releaseAll()
          drainStreamingResidue(spark)
        }
        def oneTimedRep(): Option[(Double, ExtSample)] = {
          if (heavy) settleLight()
          val sampler = new ExtCpuSampler
          val t0 = System.nanoTime()
          val r =
            try { fn(spark, sfDir).count(); Some((System.nanoTime() - t0) / 1e9) }
            catch {
              case e: Throwable =>
                errors(name) = Option(e.getMessage).getOrElse(e.getClass.getName).take(200)
                failed = true
                None
            }
          val sample = sampler.stop()
          graft.ops.Caches.releaseAll()
          drainStreamingResidue(spark)
          r.map(t => (t, sample))
        }
        // query threshold 1.5 external cores (vs the ETL sweep's 1.0):
        // streaming queries' per-checkpoint-file Hadoop chmod/stat
        // subprocesses are OUR work in child pids — unattributable to
        // self — and read up to ~1.1 "external" cores on a measured-idle
        // host; the ETL sweep forks nothing and keeps the tighter bar.
        // Steal keeps the 1.0-core bar everywhere: forked subprocesses
        // never show up as hypervisor steal.
        def trampled(s: ExtSample): Boolean = s.avg > 1.5 || s.steal > 1.0
        val runs = (1 to queryReps).flatMap { _ =>
          if (failed) None // a failing query would just re-fail; don't re-time it
          else oneTimedRep() match {
            case Some((t, ext)) if trampled(ext) && queryRetryBudget > 0 && !failed =>
              queryRetryBudget -= 1
              queryRetries += 1
              oneTimedRep() match {
                case Some(retry) if retry._2.worst >= 0 && retry._2.worst < ext.worst =>
                  Some(retry)
                case _ => Some((t, ext)) // keep the annotated original
              }
            case other => other
          }
        }
        name -> runs
      }

    // ---- items-ETL volume point (OP-A, the items counterpart of the
    // header sweep — the reference ships no published items curve, so
    // this is the engine's own record): batch2 (50% new contracts + 50%
    // price-changed re-sends) against an n-item table is the measured
    // batch, same rep-0-warmup + settle protocol as the header sweep.
    // Defaults off in SKIP_QUERIES iteration mode; SPARK_GRAFT_ITEMS_SIZES=
    // (empty) skips it entirely.
    // Default grid mirrors the header curve's four sizes (the r12 verdict
    // ask: symmetric volume-scaling records for both pipelines), with the
    // header sweep's rep policy — 3 timed reps from 1M up, 2 at 100k.
    val itemsSizes = sys.env.getOrElse("SPARK_GRAFT_ITEMS_SIZES",
        if (skipQueries) "" else "100000,1000000,5000000,10000000")
      .split(",").map(_.trim).filter(_.nonEmpty).map(_.toLong)
    val itemsRuns: Seq[(Long, Seq[(graft.jobs.ItemsRunMetrics, ExtSample)], Int)] =
      itemsSizes.toSeq.flatMap { n =>
        var tmpDir: Option[String] = None
        try {
          quiesce(maxWaitS = 45, label = s"items_$n")
          val tmp = Files.createTempDirectory(s"graft-bench-items-$n").toString
          tmpDir = Some(tmp)
          graft.tools.ItemsDataGen.writeBatch1(spark, n, "20230123",
            s"$tmp/crm", cpus.toInt, seed = 42)
          // batch2 re-sends derive from batch1's seed — the contract that
          // makes re-sent rows TRUE re-sends (identical untracked fields,
          // a guaranteed tracked-price change; see ItemsDataGen.writeBatch2)
          graft.tools.ItemsDataGen.writeBatch2(spark, n, "20230125",
            s"$tmp/crm", cpus.toInt, baseSeed = 42)
          def oneRep(deleteFirst: Boolean): (graft.jobs.ItemsRunMetrics, ExtSample) = {
            if (deleteFirst) {
              Seq("table", "metrics").foreach(d =>
                deleteRecursively(new java.io.File(s"$tmp/$d")))
              System.gc()
            }
            // size-scaled settle bound — same rationale as the header sweep
            settle(maxWaitS = settleBoundS(n), label = s"items_$n")
            graft.jobs.ItemsEtlJob.runWithMetrics(spark,
              s"$tmp/crm/items_20230123.txt", s"$tmp/table",
              Some(s"$tmp/metrics"))
            settle(maxWaitS = settleBoundS(n), label = s"items_$n")
            val sampler = new ExtCpuSampler
            val m = graft.jobs.ItemsEtlJob.runWithMetrics(spark,
              s"$tmp/crm/items_20230125.txt", s"$tmp/table",
              Some(s"$tmp/metrics"))
            (m, sampler.stop())
          }
          oneRep(deleteFirst = false) // untimed warmup rep
          val reps = if (n >= 1000000L) 3 else 2
          val (ms, retries) = guardedReps(reps)(() => oneRep(deleteFirst = true))
          deleteRecursively(new java.io.File(tmp))
          Some((n, ms, retries))
        } catch {
          case e: Throwable =>
            errors(s"items_etl_$n") =
              Option(e.getMessage).getOrElse(e.getClass.getName).take(200)
            tmpDir.foreach(t => deleteRecursively(new java.io.File(t)))
            None
        }
      }

    // ---- CPU-scaling sweep (the local analog of the reference's
    // infra/scale_horizontal_runner.sh:140-160 6→1-worker sweep): the 1M
    // batch2 workload at shrinking core counts, one fresh session each.
    // Defaults off under SPARK_GRAFT_SKIP_QUERIES (iteration mode).
    val sweepCpus = sys.env.getOrElse("SPARK_GRAFT_CPU_SWEEP",
        if (skipQueries) "" else "32,16,8,4")
      .split(",").map(_.trim).filter(_.nonEmpty).map(_.toInt)
    val cpuJson: Seq[String] =
      if (sweepCpus.isEmpty) Nil
      else try {
        spark.stop()
        val entries = sweepCpus.toSeq.map { c =>
          val s2 = SparkSession.builder()
            .master(s"local[$c]")
            .config("spark.sql.shuffle.partitions", c.toString)
            .config("spark.sql.session.timeZone", "UTC")
            .config("spark.ui.enabled", "false")
            .getOrCreate()
          s2.sparkContext.setLogLevel("WARN")
          GraftSession.tune(s2)
          val tmp = Files.createTempDirectory(s"graft-bench-cpu-$c").toString
          // untimed warmup batch: each sweep point runs in a FRESH session
          // whose first job otherwise absorbs codegen/session setup
          HeaderDataGen.writeBatch1(s2, 50000, "20230127", s"$tmp/warm/crm", c, seed = 7)
          HeaderEtlJob.run(s2, s"$tmp/warm/crm/header_20230127.csv",
            s"$tmp/warm/table", s"$tmp/warm/discarded", s"$tmp/warm/metrics")
          HeaderDataGen.writeBatch1(s2, 1000000, "20230127", s"$tmp/crm", c, seed = 42)
          HeaderDataGen.writeBatch2(s2, 1000000, "20230228", s"$tmp/crm", c,
            seed = 43, existingCount = 1000000, pctNew = 50.0)
          HeaderEtlJob.run(s2, s"$tmp/crm/header_20230127.csv",
            s"$tmp/table", s"$tmp/discarded", s"$tmp/metrics")
          val m = HeaderEtlJob.run(s2, s"$tmp/crm/header_20230228.csv",
            s"$tmp/table", s"$tmp/discarded", s"$tmp/metrics")
          s2.stop()
          deleteRecursively(new java.io.File(tmp))
          s""""$c":${math.rint(m.duration_s * 1000) / 1000}"""
        }
        Seq(s""""cpu_scaling_1m":{${entries.mkString(",")}}""")
      } catch {
        case e: Throwable =>
          errors("cpu_sweep") = Option(e.getMessage).getOrElse(e.getClass.getName).take(200)
          Nil
      }

    def esc(s: String): String =
      s.flatMap { case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
                  case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString }
    def r3(d: Double): Double = math.rint(d * 1000) / 1000
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.isEmpty) -1.0
      else if (s.length % 2 == 1) s(s.length / 2)
      else (s(s.length / 2 - 1) + s(s.length / 2)) / 2
    }
    // Per-size: every run's [total, extract, validation, transform, merge]
    // plus the median total — the spread IS the evidence (a single 10M
    // sample cannot separate host load from algorithm). ext_cpu_cores
    // (per-rep average external cores DURING the measured window, -1 =
    // /proc unreadable) and clean_median_s (median over reps with ext
    // ≤ 1 core; -1 = every rep trampled) make contamination a recorded
    // fact instead of an inference from elevated numbers.
    val headerJson = headerRuns.map { case (n, reps, retries) =>
      val ms = reps.map(_._1)
      val runs = ms.map(m => Seq(m.duration_s, m.duration_s_extract,
        m.duration_s_validation, m.duration_s_transform, m.duration_s_merge)
        .map(r3).mkString("[", ",", "]")).mkString("[", ",", "]")
      val m0 = ms.last
      s""""$n":{"runs_tevm":$runs,"median_s":${r3(median(ms.map(_.duration_s)))},""" +
        s""""clean_median_s":${r3(cleanMedian(reps.map(r => (r._1.duration_s, r._2))))},""" +
        s""""ext_cpu_cores":${reps.map(r => r3(r._2.avg)).mkString("[", ",", "]")},""" +
        s""""ext_cpu_max":${reps.map(r => r3(r._2.max)).mkString("[", ",", "]")},""" +
        s""""steal_cores":${reps.map(r => r3(r._2.steal)).mkString("[", ",", "]")},""" +
        s""""retries":$retries,""" +
        s""""median_merge_s":${r3(median(ms.map(_.duration_s_merge)))},""" +
        s""""median_validation_s":${r3(median(ms.map(_.duration_s_validation)))},""" +
        s""""staged":${m0.staged_count},"inserted":${m0.inserted_count},""" +
        s""""closed":${m0.closed_count},"dq_kept":${m0.dq_kept},"dq_discarded":${m0.dq_discarded}}"""
    }.mkString("{", ",", "}")
    // items sweep: per-size [total, extract, dedup, transform, merge]
    // per run + medians and the accounting counts (last rep's), with the
    // same per-rep contamination record as the header sweep
    val itemsJson = itemsRuns.map { case (n, reps, retries) =>
      val ms = reps.map(_._1)
      val runs = ms.map(m => Seq(m.duration_s, m.duration_s_extract,
        m.duration_s_dedup, m.duration_s_transform, m.duration_s_merge)
        .map(r3).mkString("[", ",", "]")).mkString("[", ",", "]")
      val m0 = ms.last
      s""""$n":{"runs_tedtm":$runs,"median_s":${r3(median(ms.map(_.duration_s)))},""" +
        s""""clean_median_s":${r3(cleanMedian(reps.map(r => (r._1.duration_s, r._2))))},""" +
        s""""ext_cpu_cores":${reps.map(r => r3(r._2.avg)).mkString("[", ",", "]")},""" +
        s""""steal_cores":${reps.map(r => r3(r._2.steal)).mkString("[", ",", "]")},""" +
        s""""retries":$retries,""" +
        s""""median_merge_s":${r3(median(ms.map(_.duration_s_merge)))},""" +
        s""""staged":${m0.staged_count},"duplicated":${m0.duplicated_count},""" +
        s""""inserted":${m0.inserted_count},"closed":${m0.closed_count}}"""
    }.mkString("{", ",", "}")
    val errJson = errors.map { case (k, v) => s""""${esc(k)}":"${esc(v)}"""" }.mkString("{", ",", "}")
    // a query's headline number is its MEDIAN across reps; total sums medians
    val queryMedians: Seq[(String, Double)] =
      results.map { case (k, runs) => k -> (if (runs.isEmpty) -1.0 else median(runs.map(_._1))) }
    val queriesTotal = queryMedians.collect { case (_, v) if v >= 0 => v }.sum
    // "total" keeps its pre-r12 definition (queries + header sweep) so
    // round-over-round totals stay comparable; the items sweep reports
    // under its own items_etl_median_s key only (ADVICE r12).
    val total = queriesTotal +
      headerRuns.map { case (_, reps, _) => median(reps.map(_._1.duration_s)) }.sum
    // ---- output ---------------------------------------------------------
    // The driver records only a bounded TAIL of this process's output
    // (BENCH_r04.json lost q1/q10-q25 + the total when one giant JSON line
    // outgrew the window). So: everything prints as a burst of SMALL
    // self-describing lines at the very end — after all Spark work, so no
    // interleaved log lines can dilute the window — ordered least- to
    // most-important, headline totals LAST (the tail always survives).
    // per-query spread: {"median":m,"runs":[a,b]} (runs empty + median -1 on
    // failure); chunked ~10 queries per line so every line stays well inside
    // the recorder's bounded output tail
    val qSeq = results.map { case (k, runs) =>
      val m = if (runs.isEmpty) -1.0 else median(runs.map(_._1))
      s""""${esc(k)}":{"median":${r3(m)},"runs":${runs.map(r => r3(r._1)).mkString("[", ",", "]")},""" +
        s""""ext":${runs.map(r => r3(r._2.avg)).mkString("[", ",", "]")},""" +
        s""""steal":${runs.map(r => r3(r._2.steal)).mkString("[", ",", "]")}}"""
    }
    val qLines =
      if (qSeq.isEmpty) Nil
      else qSeq.grouped(10).zipWithIndex.map {
        case (chunk, i) => s"""{"section":"queries_${i + 1}",${chunk.mkString(",")}}"""
      }.toSeq
    val out = Seq(
      s"""{"section":"header_etl_batch2","detail":$headerJson}""") ++
      (if (itemsRuns.nonEmpty)
        Seq(s"""{"section":"items_etl_batch2","detail":$itemsJson}""")
      else Nil) ++
      qLines ++ Seq(
      s"""{"metric":"total","value":${r3(total)},"unit":"sec","queries_total_s":${r3(queriesTotal)},""" +
        s""""header_etl_median_s":{${headerRuns.map { case (n, reps, _) =>
          s""""$n":${r3(median(reps.map(_._1.duration_s)))}""" }.mkString(",")}}""" +
        (if (itemsRuns.nonEmpty)
          s""","items_etl_median_s":{${itemsRuns.map { case (n, reps, _) =>
            s""""$n":${r3(median(reps.map(_._1.duration_s)))}""" }.mkString(",")}}"""
        else "") +
        (extraJson ++ cpuJson).mkString(if (extraJson.nonEmpty || cpuJson.nonEmpty) "," else "", ",", "") +
        s""","query_retries":$queryRetries,"quiesce_expired":${
          quiesceExpired.map(l => s""""${esc(l)}"""").mkString("[", ",", "]")},""" +
        s""""errors":$errJson,"sf":"$sfDir"}""")
    spark.stop()
    // Durable copy: the recorder keeps only a bounded tail of stdout, so
    // the COMPLETE section lines also land in a repo file the next reader
    // can open (committed per round as the local-run record).
    try {
      val dest = sys.env.getOrElse("SPARK_GRAFT_BENCH_FILE", "bench_last.json")
      java.nio.file.Files.writeString(java.nio.file.Paths.get(dest),
        out.mkString("", "\n", "\n"))
    } catch { case scala.util.control.NonFatal(_) => }
    out.foreach(println)
    if (errors.nonEmpty) sys.exit(1)
  }

  private def deleteRecursively(f: java.io.File): Unit =
    GraftSession.deleteRec(f)

  // ---- streaming-residue drain ------------------------------------------
  // A drained streaming query leaves two kinds of residue in the session
  // that land inside the NEXT query's timed window (the three-round
  // q52_late_split elevation: 6.2 s alone → 7.2-9.5 s after the three
  // streaming queries that precede it alphabetically, external CPU 0 —
  // in-JVM, not a co-tenant; a non-streaming control trio showed no
  // elevation): loaded state-store providers (unloaded only when the
  // maintenance thread notices the deactivation, up to a minute later)
  // and the GC/ContextCleaner debt of its micro-batches' RDDs,
  // broadcasts and checkpoint file handles, which the async cleaner
  // drains WHILE the next query runs. A terminated-query listener flags
  // the residue; the query loop then releases it OUTSIDE any timed
  // window: unload the providers, GC, and give the cleaner a bounded
  // head start (the 2 s pause measured as the difference between a
  // 6.4 s and a 7.2-7.7 s q52 median).
  private val streamingResidue = new java.util.concurrent.atomic.AtomicBoolean(false)

  private def watchStreamingResidue(spark: SparkSession): Unit =
    spark.streams.addListener(new org.apache.spark.sql.streaming.StreamingQueryListener {
      override def onQueryStarted(
          e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryProgress(
          e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryProgressEvent): Unit = ()
      override def onQueryTerminated(
          e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryTerminatedEvent): Unit =
        streamingResidue.set(true)
    })

  private def drainStreamingResidue(spark: SparkSession): Unit =
    if (streamingResidue.getAndSet(false)) {
      try org.apache.spark.sql.GraftColumnBridge.unloadStateStores()
      catch { case scala.util.control.NonFatal(_) => }
      spark.streams.resetTerminated()
      System.gc()
      Thread.sleep(2000)
    }

  /** Writeback-settle poll bound for an n-row ETL size: the default 30 s
    * up to 3M rows, then grows with the size (10M → 100 s). This bounds a
    * POLL, not a sleep — the wait ends the moment Dirty+Writeback drops
    * under the threshold, so the larger bound costs nothing on a drained
    * host and exists only so a multi-GB init flush can't expire the wait
    * and land inside the next timed rep. */
  private def settleBoundS(n: Long): Int =
    math.max(30, (n / 100000L).toInt)

  /** Block until outstanding page-cache writeback is flushed (plus a GC):
    * run between data generation and a timed rep so the flush of the
    * GENERATOR's (or previous rep's) writes doesn't land inside the
    * measurement. Best-effort — a missing /bin/sync degrades to gc+sleep.
    *
    * The tail wait POLLS /proc/meminfo Dirty+Writeback down to a
    * threshold instead of sleeping a fixed second: sync(2) returns when
    * data is SUBMITTED, not when the device is quiet, and the r10 driver
    * record's 93 s ETL-10M point (settled same-code reading: 31 s) showed
    * a fixed sleep doesn't cover the multi-GB flush tails a stacked
    * bench process produces. Polling makes the settle as long as the
    * contamination actually is — and no longer. */
  private[graft] def settle(maxWaitS: Int = 30, label: String = "settle"): Unit = {
    // sync → gc → sync: the GC's finalizers can close buffered streams
    // and re-dirty pages after the first flush; the second sync picks
    // those up so the timed window starts with a genuinely clean cache
    try Runtime.getRuntime.exec(Array("sync")).waitFor()
    catch { case scala.util.control.NonFatal(_) => }
    System.gc()
    try Runtime.getRuntime.exec(Array("sync")).waitFor()
    catch { case scala.util.control.NonFatal(_) => }
    awaitWritebackDrain(maxWaitS)
    // brief external-CPU guard on EVERY settle (bounded at 10 s so the
    // many per-rep call sites can't stall the run): a co-tenant burning
    // cores skews a timed window as surely as writeback does — the r11
    // driver record's 1M/5M ETL reps read 2× settled values despite
    // per-rep writeback settles, the signature of CPU contention, not
    // flush overlap
    awaitExternalCpuQuiet(math.min(maxWaitS, 10), label)
  }

  /** Section-boundary quiesce: full writeback settle plus a LONGER wait
    * for external CPU consumers to go quiet (the driver's own post-verify
    * work shares the host when it invokes this main back-to-back). */
  private[graft] def quiesce(maxWaitS: Int, label: String = "quiesce"): Unit = {
    settle(maxWaitS, label)
    awaitExternalCpuQuiet(maxWaitS, label)
  }

  // ---- external-CPU accounting ------------------------------------------
  // Shared /proc readers for the quiet-gate and the per-rep sampler.
  // "External" = host USER-MODE jiffies minus THIS process minus its
  // parent. User+nice only, deliberately: a co-tenant trampling a timed
  // rep (the five rounds of driver-record contamination this detects)
  // burns user time, while the kernel work our OWN I/O induces —
  // writeback flushers, jbd2, fs kworkers — is pure system time and
  // measured ~2-2.8 "external" cores during checkpoint-heavy streaming
  // queries when system time was counted, tripping false retries on an
  // idle host. (user already includes guest, so skipping the guest
  // fields double-counts nothing.) Subtracting self keeps our own
  // threads out; subtracting the parent exempts the mostly-idle sbt JVM
  // that forked us — its log pump otherwise holds quiet-waits at their
  // cap with no real co-tenant present.
  private val Hz = 100.0 // Linux USER_HZ

  /** Host (user+nice, steal) jiffies (see the accounting rationale
    * above). Steal is read alongside because it is the ONE external
    * signal per-process accounting can never see: time the hypervisor
    * ran a co-tenant VM instead of this vCPU. A mid-rep stall with zero
    * in-guest external user CPU (the r12 226.5 s outlier's shape, and
    * this round's 2× full-sweep ETL elevations that vanish in isolated
    * re-runs) is exactly what steal measures. */
  private def hostBusyJiffies(): Option[(Long, Long)] =
    try {
      val l = java.nio.file.Files.readAllLines(
        java.nio.file.Paths.get("/proc/stat")).get(0)
      // cpu user nice system idle iowait irq softirq steal guest guest_nice
      val vals = l.trim.split("\\s+").drop(1).map(_.toLong)
      Some((vals(0) + vals(1), if (vals.length > 7) vals(7) else 0L))
    } catch { case scala.util.control.NonFatal(_) => None }

  /** utime of one pid ("self" works) — user-mode only, matching the
    * host-side sum; None once the pid is gone. */
  private def procJiffies(pid: String): Option[Long] =
    try {
      val s = java.nio.file.Files.readString(
        java.nio.file.Paths.get(s"/proc/$pid/stat"))
      // comm may contain spaces — fields restart after the last ')'
      val rest = s.substring(s.lastIndexOf(')') + 2).split("\\s+")
      // after (state) at 0: utime is field 14 overall → idx 11
      Some(rest(11).toLong)
    } catch { case scala.util.control.NonFatal(_) => None }

  private lazy val parentPid: Option[String] =
    try {
      val s = java.nio.file.Files.readString(
        java.nio.file.Paths.get("/proc/self/stat"))
      val rest = s.substring(s.lastIndexOf(')') + 2).split("\\s+")
      Some(rest(1)) // state ppid pgrp ... → idx 1
    } catch { case scala.util.control.NonFatal(_) => None }

  /** One (hostBusy, self+parent, steal) snapshot; None on non-Linux. */
  private def cpuSnap(): Option[(Long, Long, Long)] =
    hostBusyJiffies().flatMap { case (b, st) =>
      procJiffies("self").map { s =>
        (b, s + parentPid.flatMap(procJiffies).getOrElse(0L), st)
      }
    }

  /** One timed window's contamination readings: average/max external
    * user-mode cores (co-tenant PROCESSES in this VM) and average steal
    * cores (co-tenant VMs at the hypervisor). Either one above the
    * threshold marks the rep contaminated — they detect disjoint
    * mechanisms, and the five-round history of "elevated reps with
    * nothing visible in ps" is precisely the steal-shaped kind. */
  private[graft] final case class ExtSample(avg: Double, max: Double, steal: Double) {
    def contaminated(thresholdCores: Double): Boolean =
      avg > thresholdCores || steal > thresholdCores
    /** Worst signal, for keep-the-least-contaminated retry comparisons. */
    def worst: Double = math.max(avg, steal)
  }

  /** Background sampler recording external-CPU cores DURING a timed rep
    * (the r12 verdict's detection ask): a pre-rep quiet-gate cannot see
    * contention that STARTS mid-rep — the r12 driver record's 226.5 s
    * 10M outlier sat beside a 44.3 s rep in the same artifact. A daemon
    * thread snapshots /proc at ~2 Hz; [[stop]] returns (avg, max) cores
    * burned by processes other than this JVM (and its parent) across the
    * rep PLUS the average hypervisor-steal cores — the signal that
    * catches co-tenant VMs, which no in-guest process accounting can see.
    * Costs two file reads per 500 ms — nothing against a seconds-scale
    * rep. Unreadable /proc (non-Linux) → (-1, -1, -1). */
  private[graft] final class ExtCpuSampler {
    @volatile private var running = true
    private val windows = scala.collection.mutable.ArrayBuffer[Double]()
    private val t0 = System.nanoTime()
    private val snap0 = cpuSnap()
    private val thread = new Thread(() => {
      var prev = snap0
      var prevT = t0
      while (running) {
        try Thread.sleep(500) catch { case _: InterruptedException => }
        if (running) {
          val cur = cpuSnap()
          val curT = System.nanoTime()
          for ((b0, s0, _) <- prev; (b1, s1, _) <- cur) {
            val dt = (curT - prevT) / 1e9
            if (dt > 0.05) windows.synchronized {
              windows += ((b1 - b0) - (s1 - s0)) / Hz / dt
            }
          }
          prev = cur
          prevT = curT
        }
      }
    })
    thread.setDaemon(true)
    thread.start()

    /** @return external user-mode cores (avg, max window) and steal cores
      *         (avg) over the sampler's lifetime; all -1 when /proc is
      *         unreadable. */
    def stop(): ExtSample = {
      running = false
      thread.interrupt()
      try thread.join(1500) catch { case _: InterruptedException => }
      val overall = for {
        (b0, s0, st0) <- snap0
        (b1, s1, st1) <- cpuSnap()
      } yield {
        val dt = (System.nanoTime() - t0) / 1e9
        if (dt > 0.05)
          (((b1 - b0) - (s1 - s0)) / Hz / dt, (st1 - st0) / Hz / dt)
        else (-1.0, -1.0)
      }
      overall match {
        // clamp ANY negative to 0: external load cannot be negative — a
        // negative reading is host-vs-process jiffy accounting drift
        // (host /proc/stat aggregates on tick boundaries; over a long
        // mostly-saturated rep the process utime sum can exceed the
        // host's user+nice sum by >0.5 cores). The r13-pre record showed
        // long ETL reps reading -1 ("unreadable") from exactly this,
        // which silently disabled contamination detection on the reps
        // that need it most. -1 now ONLY means /proc was unreadable.
        case Some((avg, steal)) =>
          val mx = windows.synchronized {
            if (windows.isEmpty) avg else windows.max }
          ExtSample(math.max(avg, 0.0), math.max(mx, 0.0), math.max(steal, 0.0))
        case _ => ExtSample(-1.0, -1.0, -1.0)
      }
    }
  }

  /** Rep loop with the detect-and-retry discipline: run `attempt` (which
    * must time its own measured window under an [[ExtCpuSampler]] and
    * return (result, sample)); a rep whose external CPU average OR steal
    * average exceeds `thresholdCores` is re-run up to `maxRetriesPerRep`
    * times, keeping the least-contaminated attempt. Unreadable /proc
    * (readings = -1) counts as clean — there is nothing to detect
    * against. @return (accepted reps, total retries taken) */
  private def guardedReps[T](nReps: Int, thresholdCores: Double = 1.0,
                             maxRetriesPerRep: Int = 2)
                            (attempt: () => (T, ExtSample)): (Seq[(T, ExtSample)], Int) = {
    var retries = 0
    val out = (1 to nReps).map { _ =>
      var best = attempt()
      var tries = 0
      while (best._2.contaminated(thresholdCores) && tries < maxRetriesPerRep) {
        tries += 1
        retries += 1
        val a = attempt()
        if (a._2.worst >= 0 && a._2.worst < best._2.worst) best = a
        if (!best._2.contaminated(thresholdCores)) tries = maxRetriesPerRep // clean — stop
      }
      best
    }
    (out, retries)
  }

  /** Median over the CLEAN reps only (ext AND steal averages under the
    * threshold, or unreadable); -1 when every rep was contaminated — the
    * artifact then says "no uncontaminated measurement exists" instead of
    * laundering a trampled median as the headline. */
  private def cleanMedian(reps: Seq[(Double, ExtSample)],
                          thresholdCores: Double = 1.0): Double = {
    val clean = reps.collect {
      case (v, ext) if !ext.contaminated(thresholdCores) => v }
    if (clean.isEmpty) -1.0
    else {
      val s = clean.sorted
      if (s.length % 2 == 1) s(s.length / 2)
      else (s(s.length / 2 - 1) + s(s.length / 2)) / 2
    }
  }

  // quiet-waits that expired without reaching quiet, by call site — the
  // artifact records that the run STARTED contaminated instead of the
  // reader inferring it from elevated numbers (ADVICE r12: a wait that
  // expires silently adds minutes of wall time and hides the cause)
  private val quiesceExpired = scala.collection.mutable.ArrayBuffer[String]()

  /** Poll external-CPU (see [[cpuSnap]]) over 500 ms windows until other
    * processes drop under ~0.75 cores, or `maxWaitS` elapses — in which
    * case the expiry is recorded under `label` in the artifact's
    * `quiesce_expired` list. Non-Linux → no-op. */
  private def awaitExternalCpuQuiet(maxWaitS: Int, label: String): Unit = {
    val quietCores = 0.75
    val deadline = System.nanoTime() + maxWaitS * 1000000000L
    var done = false
    while (!done && System.nanoTime() < deadline) {
      cpuSnap() match {
        case Some((b0, s0, _)) =>
          Thread.sleep(500)
          cpuSnap() match {
            case Some((b1, s1, _)) =>
              val external = (b1 - b0) - (s1 - s0)
              done = external < quietCores * Hz * 0.5 // 0.5 s window
            case _ => done = true
          }
        case _ => done = true // unreadable proc → don't spin
      }
    }
    if (!done) quiesceExpired += label
  }

  /** Poll Dirty+Writeback (kB) until under 48 MB or `maxWaitS` elapses;
    * unreadable /proc/meminfo (non-Linux) degrades to the old 1 s sleep. */
  private def awaitWritebackDrain(maxWaitS: Int): Unit = {
    def dirtyKb(): Option[Long] =
      try {
        val lines = java.nio.file.Files.readAllLines(
          java.nio.file.Paths.get("/proc/meminfo"))
        var sum = 0L
        var seen = 0
        lines.forEach { l =>
          if (l.startsWith("Dirty:") || l.startsWith("Writeback:")) {
            sum += l.split("\\s+")(1).toLong
            seen += 1
          }
        }
        if (seen == 2) Some(sum) else None
      } catch { case scala.util.control.NonFatal(_) => None }
    val deadline = System.nanoTime() + maxWaitS * 1000000000L
    var kb = dirtyKb()
    if (kb.isEmpty) { Thread.sleep(1000); return }
    while (kb.exists(_ > 48 * 1024) && System.nanoTime() < deadline) {
      Thread.sleep(200)
      kb = dirtyKb()
    }
    // small fixed tail: scheduler/kswapd quiesce after the last flush
    Thread.sleep(200)
  }
}
