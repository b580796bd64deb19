"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Each query runs SPARK_GRAFT_BENCH_REPS times (default 3) in-process
and reports the per-query MEDIAN — single cold runs at this scale
swing +/-50% (cf. BENCH_r02 vs r03 on byte-identical code), so
round-over-round deltas are only meaningful on medians.

Stdout contract (round-10 fix — BENCH_r08/r09 went "parsed: null"
because the single fat JSON line outgrew the driver's 2 kB tail
capture): prints the FULL diagnostics JSON (runs / steal / warmup /
retries) as one line first, then a compact <=2 kB summary as the
LAST line so a tail capture contains it whole:
  {"metric": "...", "value": total_sec, "unit": "sec",
   "queries": {name: median_sec, ...}, "queries_norm": {...},
   "norm_factor": f, "calib": {...}, "reps": 3, "sf": 0.1}
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("bubbles-bench")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        # the settle window between reps triggers a JVM GC, which queues
        # the previous rep's now-unreferenced shuffles for cleanup; by
        # default shuffle-file deletion is ASYNC, so it lands mid-rep and
        # randomly taxes a measured run (the r7 lineitem rep-3 spike).
        # Make it synchronous so cleanup happens inside the settle window.
        .config("spark.cleaner.referenceTracking.blocking.shuffle", "true")
        # diagnostic escape hatch: extra driver JVM flags for A/B runs
        # (e.g. -XX:ReservedCodeCacheSize=512m while chasing JIT churn)
        .config(
            "spark.driver.extraJavaOptions",
            os.environ.get("SPARK_GRAFT_DRIVER_JAVA_OPTS", ""),
        )
        # The multi-stage fit loop generates >100 distinct codegen
        # fragments per run, so Spark's default 100-entry generated-
        # class cache thrashes: every rep re-Janinos + re-JITs the
        # same classes (measured 6-7 s JIT per *steady-state* rep at
        # 100 entries vs 3.1-3.6 s at 5000, with the warmed floor
        # dropping 14.7 -> 13.5 s and warmup converging by rep 1
        # instead of rep 3-4). Same knob applies to executors on a
        # real cluster (see SCALE.md).
        .config(
            "spark.sql.codegen.cache.maxEntries",
            os.environ.get("SPARK_GRAFT_CODEGEN_CACHE", "5000"),
        )
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry_mod

    timings: dict[str, float] = {}
    all_runs: dict[str, list[float]] = {}
    all_steals: dict[str, list[float]] = {}
    warmups: dict[str, float] = {}
    steal_retries: dict[str, int] = {}
    profile = os.environ.get("SPARK_GRAFT_BENCH_PROFILE", "") == "1"
    # a measured rep whose hypervisor steal exceeds this (seconds of
    # stolen CPU across all vCPUs) is DISCARDED and re-measured, up to
    # n extra reps per query: the r7/r8 record shows single stolen
    # reps corrupting a 3-run median by 2-3x on unchanged code
    # (VERDICT r8 "what's wrong" #1). 0 disables. Discard counts are
    # reported as steal_retries so a noisy window is visible.
    steal_retry = float(os.environ.get("SPARK_GRAFT_STEAL_RETRY", "1.0"))

    import gc

    def _jvm_gc_totals():
        """(total GC ms, total GC count) across all JVM collectors."""
        beans = (
            spark.sparkContext._jvm.java.lang.management.ManagementFactory
            .getGarbageCollectorMXBeans()
        )
        ms = cnt = 0
        for i in range(beans.size()):
            b = beans.get(i)
            ms += max(0, b.getCollectionTime())
            cnt += max(0, b.getCollectionCount())
        return ms, cnt

    _jvm_pid = None

    def _cpu_totals():
        """(JVM CPU ticks, JIT ms, code-cache MB used, machine steal
        ticks, machine busy ticks).

        Separates the causes of a wall-clock spike on a rep: higher
        JVM CPU at the same job count = the JVM really did more work —
        rising JIT ms pins that on compilation storms (each fit rep
        generates fresh codegen classes); flat JVM CPU but wall up =
        the JVM *waited* — rising steal ticks pin that on hypervisor
        CPU steal (this box is a shared-host microVM), flat steal
        means in-guest waiting (disk, scheduling).
        """
        nonlocal _jvm_pid
        jvm = spark.sparkContext._jvm
        if _jvm_pid is None:
            _jvm_pid = jvm.java.lang.ProcessHandle.current().pid()
        with open(f"/proc/{_jvm_pid}/stat") as f:
            st = f.read().rsplit(")", 1)[1].split()
        jvm_cpu = int(st[11]) + int(st[12])  # utime + stime, ticks
        try:
            jit_ms = (
                jvm.java.lang.management.ManagementFactory
                .getCompilationMXBean().getTotalCompilationTime()
            )
        except Exception:
            jit_ms = -1
        code_mb = 0.0
        try:
            pools = (
                jvm.java.lang.management.ManagementFactory.getMemoryPoolMXBeans()
            )
            for i in range(pools.size()):
                p = pools.get(i)
                if "CodeHeap" in p.getName() or "Code Cache" in p.getName():
                    code_mb += p.getUsage().getUsed() / 1048576.0
        except Exception:
            code_mb = -1.0
        with open("/proc/stat") as f:
            parts = f.readline().split()
        # cpu user nice system idle iowait irq softirq steal ...
        vals = [int(x) for x in parts[1:]]
        steal = vals[7] if len(vals) > 7 else 0
        busy = vals[0] + vals[1] + vals[2] + vals[5] + vals[6]
        return jvm_cpu, jit_ms, code_mb, steal, busy

    def _steal_ticks():
        with open("/proc/stat") as f:
            vals = f.readline().split()[1:]
        return int(vals[7]) if len(vals) > 7 else 0

    def bench(name: str, thunk, n_runs: int | None = None, n_warmups: int = 1):
        n = n_runs or reps
        runs = []
        steals = []
        info = ""
        # untimed warmup(s) before the measured reps (JIT + page cache
        # + shuffle-file reuse): the first execution of a query runs
        # 2-5x its steady state, which poisons a 3-run median. The two
        # mrhdbscan fits take n_warmups=2 — their first WARMED rep was
        # still 1.8x the median (BENCH_r05 runs: 31.4 vs 17.4) because
        # one warmup doesn't fully JIT the multi-stage fit loop.
        # Queries pinned to a single run (n_runs=1) stay cold on
        # purpose — they mirror how the paper measured its runtime
        # table.
        warm = 0 if n == 1 else n_warmups
        total = n + warm
        retry_budget = n
        i = 0
        while i < total:
            # settle OUTSIDE the timed window: (1) drop python refs,
            # (2) synchronously unpersist every leftover persistent
            # RDD (the previous rep's localCheckpoint blocks — left to
            # the async ContextCleaner they get removed MID-measurement
            # and randomly double the kernel stages: mrhdbscan_lineitem
            # r6 spiked 14 -> 23-26 s on exactly those reps; blocking
            # unpersist measured max/median 1.49 -> 1.16 over 6 reps),
            # (3) JVM GC for the freed block memory
            gc.collect()
            for r in spark.sparkContext._jsc.getPersistentRDDs().values():
                r.unpersist(True)
            spark.sparkContext._jvm.System.gc()
            if profile:
                gms0, gcnt0 = _jvm_gc_totals()
                cpu0, jit0, _cm0, steal0, busy0 = _cpu_totals()
                group = f"{name}-rep{i}"
                spark.sparkContext.setJobGroup(group, name)
            st0 = _steal_ticks()
            t0 = time.time()
            info = thunk()
            el = round(time.time() - t0, 3)
            rep_steal = round((_steal_ticks() - st0) / os.sysconf("SC_CLK_TCK"), 2)
            if profile:
                gms1, gcnt1 = _jvm_gc_totals()
                cpu1, jit1, code_mb, steal1, busy1 = _cpu_totals()
                jobs = len(
                    spark.sparkContext.statusTracker().getJobIdsForGroup(group)
                )
                spark.sparkContext.setJobGroup("", "")
                tick = os.sysconf("SC_CLK_TCK")
                print(
                    f"#   {name} rep{i}{' (warm)' if i < warm else ''}:"
                    f" {el}s gc={gms1 - gms0}ms/{gcnt1 - gcnt0}x jobs={jobs}"
                    f" jvmcpu={(cpu1 - cpu0) / tick:.1f}s"
                    f" jit={jit1 - jit0}ms code={code_mb:.0f}MB"
                    f" steal={(steal1 - steal0) / tick:.1f}s"
                    f" busy={(busy1 - busy0) / tick:.1f}s",
                    file=sys.stderr,
                )
            if i < warm:
                warmups[name] = el  # keep the last warmup's time
            elif steal_retry > 0 and rep_steal > steal_retry and retry_budget > 0:
                # stolen rep: the host, not the plan — re-measure it
                retry_budget -= 1
                steal_retries[name] = steal_retries.get(name, 0) + 1
                print(
                    f"#   {name} rep{i}: {el}s DISCARDED"
                    f" (steal {rep_steal}s > {steal_retry}s)",
                    file=sys.stderr,
                )
                continue
            else:
                runs.append(el)
                steals.append(rep_steal)
            i += 1
        all_runs[name] = runs
        # per-rep hypervisor CPU steal (sec of stolen CPU time across
        # all 32 vCPUs during the rep): this box is a shared-host
        # microVM, and the round-7/8 rep spikes correlate 1:1 with
        # steal bursts (23.8 s stolen on a 32 s rep whose quiet twins
        # ran 13.6-14.2 s with 0.2-0.7 s steal) — recorded per-rep so
        # a spiked median is attributable to the host, not the plan
        all_steals[name] = steals
        timings[name] = statistics.median(runs)
        print(
            f"# {name}: median {timings[name]}s of {runs}"
            f" (warmup {warmups.get(name, 'n/a')}s) ({info})",
            file=sys.stderr,
        )

    # Fixed-size CPU calibration, independent of any engine code: the
    # same physical box runs 20-40% slower on some boots (shared-host
    # microVM — the r6->r7->r8 "regressions" on untouched rows like
    # keyword_search tracked this exactly), so cross-round medians are
    # only comparable after normalizing by these. calib_1core = pure
    # python arithmetic on one core; calib_allcore = one numpy GEMM
    # per vCPU through Spark python workers (the bench's actual
    # compute path). Reported in the JSON, excluded from the total.
    #
    # queries_norm = median ÷ (calib_allcore_sec / CALIB_ANCHOR): the
    # anchor is round 8's measured calib_allcore (BENCH_r08.json, the
    # first round the instrumentation existed), so a normalized number
    # means "what this query would take on the round-8 boot" — compare
    # THOSE across rounds, never raw medians (SCALE.md "cross-round
    # bench normalization").
    CALIB_ANCHOR_ALLCORE = 0.565
    # JVM-path anchor: the GEMM probe exercises python workers + BLAS,
    # but round 9 showed untouched sub-5 s SQL queries moving +16-58%
    # while the GEMM held steady — whatever moved them lives on the
    # JVM/codegen/shuffle path. This second probe is a fixed Spark-SQL
    # hash-aggregate over generated rows (no python workers at all);
    # anchor measured round 10 (first round the probe exists): steady
    # median of 5 warm runs in a quiet window on the round-10 boot
    # ([1.061, 0.742, 0.744, 0.695, 0.741] -> 0.74).
    CALIB_ANCHOR_SQL = 0.74
    calib: dict[str, float] = {}

    def _calibrate():
        # 1-core: pure-python arithmetic — GIL-bound and independent
        # of BLAS thread pools, so the number means the same thing on
        # every boot/config
        t0 = time.time()
        acc = 0
        for i in range(3_000_000):
            acc += i * i ^ (i >> 3)
        calib["calib_1core_sec"] = round(time.time() - t0, 3)

        # all-core: one numpy GEMM per vCPU through Spark python
        # workers (the bench's actual kernel compute path). Sized so
        # each worker's GEMM is ~0.1 s single-threaded; BLAS threads
        # inside 32 concurrent workers oversubscribe either way, which
        # is itself part of what's being calibrated.
        n_cpus = int(cpus)
        rdd = spark.sparkContext.parallelize(range(n_cpus), n_cpus)

        def gemm(_):
            import numpy as np

            r = np.random.default_rng(1)
            b = r.standard_normal((1000, 1000))
            return [float((b @ b)[0, 0])]

        rdd.flatMap(gemm).count()  # warm python workers
        # a stolen calibration window would corrupt EVERY normalized
        # number — retry up to 3x until the measurement ran quiet.
        # If even the LAST attempt ran dirty, mark the calibration
        # stolen (the summary then falls back to norm_factor=1 /
        # anchors, and queries_norm is explicitly untrustworthy).
        for _ in range(3):
            st0 = _steal_ticks()
            t0 = time.time()
            rdd.flatMap(gemm).count()
            el = round(time.time() - t0, 3)
            st = (_steal_ticks() - st0) / os.sysconf("SC_CLK_TCK")
            calib["calib_allcore_sec"] = el
            calib["calib_steal_sec"] = round(st, 2)
            if steal_retry <= 0 or st <= steal_retry:
                break

        # JVM-path probe: pure Spark-SQL hash-aggregate over generated
        # rows — whole-stage codegen, shuffle write+read, zero python.
        # Fixed shape (64M rows, 100k groups, 2 aggs) so the number is
        # comparable across rounds regardless of engine changes.
        def sql_probe():
            return (
                spark.range(0, 64_000_000, 1, int(cpus))
                .selectExpr(
                    "id % 100000 AS k",
                    "id % 7 AS a",
                    "cast(id % 13 as double) AS b",
                )
                .groupBy("k")
                .agg(F.sum("a").alias("sa"), F.avg("b").alias("ab"))
                .count()
            )

        # two warmups (the probe keeps JIT-warming past its first run:
        # 1.06, 0.74, 0.74, 0.70 measured), then median of 3 quiet
        # runs with up to 3 stolen-run retries
        sql_probe()
        sql_probe()
        sql_runs: list[float] = []
        sql_steal = 0.0
        attempts = 0
        while len(sql_runs) < 3 and attempts < 6:
            attempts += 1
            st0 = _steal_ticks()
            t0 = time.time()
            sql_probe()
            el = round(time.time() - t0, 3)
            sql_steal = (_steal_ticks() - st0) / os.sysconf("SC_CLK_TCK")
            if steal_retry > 0 and sql_steal > steal_retry and attempts < 6:
                continue
            sql_runs.append(el)
        calib["calib_sql_sec"] = round(statistics.median(sql_runs), 3)
        calib["calib_sql_steal_sec"] = round(sql_steal, 2)

        calib["calib_stolen"] = bool(
            steal_retry > 0
            and (
                calib.get("calib_steal_sec", 0.0) > steal_retry
                or calib.get("calib_sql_steal_sec", 0.0) > steal_retry
            )
        )

    # Calibration-level backoff (VERDICT r10 task 1): a stolen
    # calibration window poisons the WHOLE artifact (norm_factor falls
    # back to 1.0 and queries_norm becomes untrustworthy — exactly what
    # happened to BENCH_r10, whose own precondition `calib_stolen:
    # false` failed). Per-probe retries (seconds apart) don't survive a
    # steal STORM, so when the whole calibration still reads stolen,
    # back off MINUTES and re-run it, up to N attempts inside this same
    # invocation, keeping the first clean window.
    calib_backoff = float(os.environ.get("SPARK_GRAFT_CALIB_BACKOFF", "120"))
    calib_attempts_max = max(1, int(os.environ.get("SPARK_GRAFT_CALIB_ATTEMPTS", "4")))
    calib_attempts = 0
    while True:
        calib_attempts += 1
        _calibrate()
        if not calib.get("calib_stolen") or calib_attempts >= calib_attempts_max:
            break
        print(
            f"# calibration stolen (attempt {calib_attempts}/"
            f"{calib_attempts_max}) — backing off {calib_backoff}s",
            file=sys.stderr,
        )
        time.sleep(calib_backoff)
    calib["calib_attempts"] = calib_attempts
    print(f"# calibration: {calib}", file=sys.stderr)

    # SPARK_GRAFT_BENCH_ONLY="name1,name2" limits the run to those rows
    # (diagnostic reruns); empty = full headline set.
    only = {
        s.strip()
        for s in os.environ.get("SPARK_GRAFT_BENCH_ONLY", "").split(",")
        if s.strip()
    }

    def wanted(name: str) -> bool:
        return not only or name in only

    qs = entry_mod.all_queries()
    # headline set: engine-defining queries, not every oracle check
    headline = [
        "q1_pricing_summary",
        "j2_model_lookup",
        "w1_topk_per_group",
        "dedup_exact",
        "dedup_minhash_lsh",
        "text_profile",
        "ann_cosine_topk",
        "events_sessionize",
        "x6_connected_components",
        "doc_fingerprint",
        "keyword_search",
        # round-6 second pass: sketch set-ops + layout families
        "kmv_overlap",
        "zorder_key",
    ]
    for name in headline:
        if wanted(name):
            bench(name, lambda name=name: f"{qs[name](spark, sf_dir).count()} rows")

    # IVF ANN at corpus scale: every embedding row is both corpus and
    # query (the training-data-pipeline shape); centroid count sized so
    # buckets stay ~200 rows -> candidate join fan-out is bounded
    from bubbles.operators.similarity import ivf_topk

    emb_full = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n_vec = emb_full.count()
    n_cent = max(16, int((n_vec / 200) ** 0.5) ** 2)  # ~sqrt sizing, min 16

    def run_ivf():
        n = ivf_topk(
            emb_full, k=5, n_centroids=n_cent, n_probe=4, n_rows=n_vec
        ).count()
        return f"{n} rows, {n_vec} vecs, {n_cent} centroids"

    if wanted("ivf_ann_topk_full"):
        # headliner: 5 reps like mrhdbscan_lineitem so the median the
        # ANN perf claims ride on has the same robustness (VERDICT r9
        # task 7)
        bench("ivf_ann_topk_full", run_ivf, n_runs=max(reps, 5))

    # clustering headline: MR-HDBSCAN (bubbles variant) on the full
    # embeddings table — the BASELINE.md comparable (Skin 245k×4 ≈ 60 s
    # for the paper's DB variant; here 50k×64 at sf0.1)
    from bubbles import MRHDBSCAN

    pts = emb_full.select(
        F.col("vec_id").alias("point_id"),
        F.col("embedding").cast("array<double>").alias("features"),
    )

    def run_emb():
        model = MRHDBSCAN(
            min_pts=4,
            min_cluster_size=50,
            sample_fraction=0.05,
            max_local_size=4096,
            max_samples_per_subset=768,
            seed=42,
            dim=64,
        ).fit(pts)
        return f"{model.labels.count()} pts, {model.n_iterations} iters"

    if wanted("mrhdbscan_embeddings"):
        bench("mrhdbscan_embeddings", run_emb)

    # distributed-path clustering headline: 600k lineitem rows in a
    # 4-d engineered feature space (Skin-scale, cf. BASELINE.md)
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    lpts = li.select(
        F.monotonically_increasing_id().alias("point_id"),
        F.array(
            F.col("l_quantity"),
            F.log1p("l_extendedprice") * F.lit(8.0),
            F.col("l_discount") * F.lit(120.0),
            F.col("l_tax") * F.lit(120.0),
        ).alias("features"),
    )

    def run_li():
        lmodel = MRHDBSCAN(
            min_pts=4,
            min_cluster_size=200,
            sample_fraction=0.05,
            max_local_size=4096,
            max_samples_per_subset=768,
            seed=42,
            dim=4,
        ).fit(lpts)
        return f"{lmodel.labels.count()} pts, {lmodel.n_iterations} iters"

    # n_warmups=4: the multi-stage fit loop keeps getting faster
    # through rep 3 (C2 JIT across its many codegen'd stages — 10-rep
    # profile: 21.8, 17.9, 14.7, 14.9, then steady 11.6-12.8 with
    # max/median 1.05); two warmups left the r6 medians 1.3-1.6x noisy
    if wanted("mrhdbscan_lineitem"):
        bench("mrhdbscan_lineitem", run_li, n_runs=max(reps, 5), n_warmups=4)

    # the reference's real dataset (Skin_NonSkin 245k×4, BASELINE.md
    # Skin DB row: 60.19 s, the paper's bubbles variant on its cluster)
    # end-to-end through the text-ingest path — warmup + median-of-3
    # like every other row
    skin_path = "/root/reference/数据集/Skin_NonSkin.txt"
    if os.path.exists(skin_path):

        def run_skin():
            lines = spark.read.text(skin_path).filter(F.length(F.trim("value")) > 0)
            cols = F.split(F.trim("value"), r"\s+")
            spts = lines.select(
                F.monotonically_increasing_id().alias("point_id"),
                F.slice(F.transform(cols, lambda s: s.cast("double")), 1, 3).alias(
                    "features"
                ),
            ).localCheckpoint()
            # same config as tools/skin_run.py (the round-6 quality
            # pick: k=0.5 after the seed-variance diagnosis,
            # QUALITY_r6.json) so the benched runtime is the runtime
            # of the fit that achieves the reported ARI
            m = MRHDBSCAN(
                min_pts=16,
                min_cluster_size=16000,
                sample_fraction=0.5,
                max_local_size=4096,
                max_samples_per_subset=4096,
                seed=42,
                dim=3,
            ).fit(spts)
            return f"{m.labels.count()} pts (paper DB baseline 60.19s)"

        if wanted("skin_nonskin_fit"):
            # headliner vs BASELINE.md Skin DB 60.19 s: 5 reps
            # (VERDICT r9 task 7)
            bench("skin_nonskin_fit", run_skin, n_runs=max(reps, 5), n_warmups=2)

    # Post-pass window retry (VERDICT r10 task 1): the queries above can
    # take tens of minutes, so a steal storm seen by the UP-FRONT
    # calibration may be long gone (or may have arrived mid-run and
    # noised a headliner's kept reps). If the calibration is still
    # flagged stolen, or a headliner's kept window is noisy (kept-rep
    # max/median > 1.3 — the SCALE.md bar's own noise precondition),
    # back off and re-run JUST those, keeping whichever window is
    # cleaner. Bounded: SPARK_GRAFT_WINDOW_RETRIES passes (default 2).
    def _noise(name: str) -> float:
        r = all_runs.get(name) or []
        return (max(r) / statistics.median(r)) if r else 0.0

    headliner_reruns = {}
    if "mrhdbscan_lineitem" in timings:
        headliner_reruns["mrhdbscan_lineitem"] = (run_li, max(reps, 5), 4)
    if "skin_nonskin_fit" in timings:
        headliner_reruns["skin_nonskin_fit"] = (run_skin, max(reps, 5), 2)
    if "ivf_ann_topk_full" in timings:
        headliner_reruns["ivf_ann_topk_full"] = (run_ivf, max(reps, 5), 1)
    window_retry_max = max(0, int(os.environ.get("SPARK_GRAFT_WINDOW_RETRIES", "2")))
    window_retry_passes = 0
    while window_retry_passes < window_retry_max and (
        calib.get("calib_stolen")
        or any(_noise(n) > 1.3 for n in headliner_reruns)
    ):
        window_retry_passes += 1
        noisy = [n for n in headliner_reruns if _noise(n) > 1.3]
        print(
            f"# window retry pass {window_retry_passes}/{window_retry_max}:"
            f" calib_stolen={calib.get('calib_stolen')} noisy={noisy}"
            f" — backing off {calib_backoff}s",
            file=sys.stderr,
        )
        time.sleep(calib_backoff)
        if calib.get("calib_stolen"):
            calib_attempts += 1
            _calibrate()
            calib["calib_attempts"] = calib_attempts
            print(f"# re-calibration: {calib}", file=sys.stderr)
        for name in noisy:
            thunk, n_runs, n_warmups = headliner_reruns[name]
            prev = (all_runs[name], all_steals[name], timings[name])
            prev_noise = max(prev[0]) / statistics.median(prev[0])
            bench(name, thunk, n_runs=n_runs, n_warmups=n_warmups)
            if _noise(name) > max(1.3, prev_noise):
                # new window is even noisier — keep the first (cleaner) one
                all_runs[name], all_steals[name], timings[name] = prev
                print(f"#   {name}: retry window noisier, kept first", file=sys.stderr)
    calib["window_retry_passes"] = window_retry_passes

    total = round(sum(timings.values()), 3)
    # Two independent host-speed ratios vs their anchor boots: the
    # python/BLAS path (GEMM) and the JVM/codegen/shuffle path (SQL
    # hash-agg). The single norm_factor is their geometric mean — the
    # bench rows split roughly evenly between python-kernel and
    # pure-SQL plans, and the diagnostics line carries both ratios for
    # per-path analysis (SCALE.md "cross-round bench normalization").
    # A stolen calibration (all retries dirty) falls back to
    # norm_factor=1: raw numbers, explicitly flagged untrustworthy for
    # cross-round comparison rather than silently skewed (ADVICE r9).
    ratio_gemm = calib.get("calib_allcore_sec", CALIB_ANCHOR_ALLCORE) / CALIB_ANCHOR_ALLCORE
    ratio_sql = calib.get("calib_sql_sec", CALIB_ANCHOR_SQL) / CALIB_ANCHOR_SQL
    if calib.get("calib_stolen"):
        norm_factor = 1.0
    else:
        norm_factor = round((ratio_gemm * ratio_sql) ** 0.5, 4)
    calib["ratio_gemm"] = round(ratio_gemm, 4)
    calib["ratio_sql"] = round(ratio_sql, 4)
    # when the two paths disagree strongly (observed: GEMM 3.49x vs
    # SQL 0.88x in the SAME quiet window — python-worker/BLAS
    # contention that the real queries don't track), a single blended
    # factor misnormalizes both plan types: flag it so cross-round
    # claims fall back to raw medians + the per-path ratio closest to
    # the query's plan (SCALE.md "dual-probe normalization")
    calib["calib_divergent"] = bool(
        max(ratio_gemm, ratio_sql) / max(1e-9, min(ratio_gemm, ratio_sql))
        > 2.0
    )
    queries_norm = {
        k: round(v / norm_factor, 3) for k, v in timings.items()
    }
    # Full diagnostics FIRST (one JSON line: per-rep runs, steal,
    # retries, warmups) ...
    print(
        json.dumps(
            {
                "metric": "headline_queries_diagnostics",
                "runs": all_runs,
                "steal": all_steals,
                "steal_retries": steal_retries,
                # per-query LAST-WARMUP times (NOT the official medians:
                # those live only under "queries" on the summary line) —
                # named distinctly so a truncated tail capture of this
                # line can't be mistaken for the medians (VERDICT r10)
                "queries_warmup": warmups,
                "calib": calib,
                "calib_anchor_allcore": CALIB_ANCHOR_ALLCORE,
                "calib_anchor_sql": CALIB_ANCHOR_SQL,
            }
        )
    )
    # ... then the compact summary as the LAST stdout line, hard-kept
    # under 2 kB so the driver's tail capture parses it whole
    # (BENCH_r08/r09 were "parsed: null" because the fat line outgrew
    # the capture).
    summary = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "queries_norm": queries_norm,
        "norm_factor": norm_factor,
        "calib": calib,
        "reps": reps,
        "sf": sf,
    }
    line = json.dumps(summary)
    if len(line) > 2000:  # drop detail, never the medians
        summary["calib"] = {
            k: calib[k]
            for k in (
                "calib_allcore_sec",
                "calib_sql_sec",
                "calib_stolen",
                "calib_attempts",
            )
            if k in calib
        }
        line = json.dumps(summary)
    if len(line) > 2000:
        summary.pop("queries_norm")
        line = json.dumps(summary)
    if len(line) > 2000:
        # final fallbacks (ADVICE r10): with enough bench rows even the
        # medians-only form can outgrow the driver's 2 kB tail capture —
        # shed remaining detail in order, then medians precision, and
        # ASSERT the bound so growth fails loudly at bench time instead
        # of reproducing the r8/r9 "parsed: null" failure.
        summary.pop("calib", None)
        line = json.dumps(summary)
    if len(line) > 2000:
        summary["queries"] = {k: round(v, 2) for k, v in summary["queries"].items()}
        line = json.dumps(summary, separators=(",", ":"))
    assert len(line) <= 2000, f"bench summary line {len(line)} bytes > 2000"
    print(line)
    spark.stop()


if __name__ == "__main__":
    main()
