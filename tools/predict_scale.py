"""Scaling evidence for out-of-sample PREDICTION:

1. ``predict_distributed`` — approximate_predict through the IVF
   index path (reference never broadcast) at a >=2M-point fitted
   reference, scoring 200k new points. This is the row that backs the
   round-9 claim that prediction no longer stops at the 500k broadcast
   cap.
2. ``predict_broadcast`` — the broadcast+mapInPandas path's per-point
   cost at a fixed 100k reference across growing new-point batches
   (the blocked-kernel throughput row: wall seconds should grow
   linearly in the batch, with µs/pt flat or falling as the Arrow/
   task dispatch amortizes).

Corpus construction mirrors tools/cluster_scale.py (lineitem 4-d
feature space, deterministic hash jitter for replication) so the fit
is the same shape the clustering SCALEBENCH rows measure.

Usage: python tools/predict_scale.py [n_ref] [n_new] [bcast_batches...]
       (default 2_400_000 200_000 100_000 1_000_000)
Merges into SCALEBENCH.json.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")


def main():
    n_ref = int(sys.argv[1]) if len(sys.argv) > 1 else 2_400_000
    n_new = int(sys.argv[2]) if len(sys.argv) > 2 else 200_000
    bcast_batches = [int(x) for x in sys.argv[3:]] or [100_000, 1_000_000]

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from bubbles import MRHDBSCAN
    from bubbles.plans.predict import approximate_predict

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config(
            "spark.driver.memory",
            # env-overridable: this round's host OOM-kills the JVM near
            # ~14 GB anon rss despite /proc/meminfo reading 128 GB (a
            # host-side memcg), so a 48g heap that never GCs is fatal —
            # a smaller Xmx trades GC time for staying alive
            __import__("os").environ.get("SPARK_GRAFT_DRIVER_MEM", "12g"),
        )
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    def feats(sf_dir: str):
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        return li.select(
            F.monotonically_increasing_id().alias("point_id"),
            F.array(
                F.col("l_quantity"),
                F.log1p("l_extendedprice") * F.lit(8.0),
                F.col("l_discount") * F.lit(120.0),
                F.col("l_tax") * F.lit(120.0),
            ).alias("features"),
        )

    def replicate(base, factor: int, salt: int):
        rep = spark.range(factor).select(F.col("id").alias("rep"))
        jittered = F.transform(
            "features",
            lambda v, i: v
            + (
                F.pmod(
                    F.hash(
                        F.col("point_id") * F.lit(7)
                        + F.col("rep")
                        + i
                        + F.lit(salt)
                    ),
                    F.lit(1001),
                ).cast("double")
                / F.lit(1000.0)
                - F.lit(0.5)
            ),
        )
        return base.crossJoin(rep).select(
            (F.col("point_id") * factor + F.col("rep")).alias("point_id"),
            jittered.alias("features"),
        )

    from pyspark.sql import Window

    # contiguous 0..n-1 ids (monotonically_increasing_id is partition-
    # offset sparse, which would break the `point_id < n` takes below);
    # a one-off global sort of 600k slim rows — tool-side only
    base = (
        feats("/root/testdata/sf0.1")
        .select(F.col("point_id").alias("__orig"), "features")
        .withColumn(
            "point_id", F.row_number().over(Window.orderBy("__orig")) - 1
        )
        .drop("__orig")
        .localCheckpoint()
    )
    n_base = base.count()
    factor = max(1, -(-n_ref // n_base))
    ref_pts = (
        replicate(base, factor, salt=0).filter(F.col("point_id") < n_ref)
        if factor > 1
        else base.filter(F.col("point_id") < n_ref)
    ).repartition(64).localCheckpoint()
    n_ref_actual = ref_pts.count()
    print(f"fitting {n_ref_actual} reference points ...", flush=True)
    t0 = time.time()
    model = MRHDBSCAN(
        min_pts=4,
        min_cluster_size=max(50, n_ref_actual // 3000),
        sample_fraction=0.05,
        max_local_size=4096,
        max_samples_per_subset=768,
        seed=42,
        dim=4,
    ).fit(ref_pts)
    model.labels.count()
    print(f"fit done in {time.time() - t0:.1f}s", flush=True)

    # new points: jittered replicas in the same feature space, ids
    # disjoint handled inside the operator (offset shift). Explicit
    # repartition: the contiguous re-id above is a 1-partition window,
    # and a 1-partition new frame runs the scoring kernel on one core
    # (measured 305 s for a 100k batch that takes ~12 s wide)
    new_pts = (
        replicate(base, max(1, -(-n_new // n_base)), salt=99)
        .filter(F.col("point_id") < n_new)
        .repartition(32)
        .localCheckpoint()
    )
    n_new_actual = new_pts.count()

    results: dict[str, dict[str, float]] = {}

    # PREDICT_SCALE_SECTIONS=distributed,ivf,ebs,lsh,broadcast limits
    # the measured sections (re-measure only what changed — the fit
    # always runs, every section needs the model)
    import os as _os

    _sections = set(
        filter(
            None,
            _os.environ.get("PREDICT_SCALE_SECTIONS", "").split(","),
        )
    ) or {"distributed", "ivf", "ebs", "lsh", "broadcast"}

    # --- distributed path at the full reference ---------------------
    def run_distributed():
        return approximate_predict(
            model, ref_pts, new_pts, min_pts=4, index="ivf",
        ).count()

    # single-rep, warmup-free — same protocol as the 6M fit row
    # (cluster_scale.py): at this size a warmup doubles the wall/memory
    # cost for a number whose error band is owned by the host anyway
    if "distributed" in _sections:
        t0 = time.time()
        rows = run_distributed()
        el = round(time.time() - t0, 2)
        results["predict_distributed"] = {str(n_ref_actual): el}
        print(
            f"predict_distributed ref={n_ref_actual} new={n_new_actual}: "
            f"{el}s ({rows} rows, {el * 1e6 / n_new_actual:.1f} µs/new-pt)",
            flush=True,
        )

    # --- persisted index: build once vs warm per-batch ---------------
    import tempfile

    def _index_split(kind, build_row, warm_row, index_kwargs=None, note=""):
        """One persisted-index split: timed save(index=kind) (build
        row) then a warmed+timed fixed-batch predict through the
        loaded model (warm row)."""
        from bubbles.plans.mrhdbscan import MRHDBSCANModel

        with tempfile.TemporaryDirectory() as td:
            t0 = time.time()
            model.save(
                f"{td}/m", fitted_points=ref_pts,
                predict_rows_per_cluster=0, index=kind,
                index_kwargs=index_kwargs,
            )
            el = round(time.time() - t0, 2)
            results[build_row] = {str(n_ref_actual): el}
            print(
                f"{build_row} ref={n_ref_actual}: {el}s{note}", flush=True
            )
            import warnings as _w

            with _w.catch_warnings():
                _w.simplefilter("ignore")
                loaded = MRHDBSCANModel.load(spark, f"{td}/m")

            def run_warm():
                return loaded.predict(
                    new_pts, min_pts=4, index=kind
                ).count()

            run_warm()  # warmup rep (JIT + page cache on the index files)
            t0 = time.time()
            rows = run_warm()
            el = round(time.time() - t0, 2)
            results[warm_row] = {str(n_new_actual): el}
            print(
                f"{warm_row} ref={n_ref_actual} new={n_new_actual}: "
                f"{el}s ({rows} rows, "
                f"{el * 1e6 / n_new_actual:.1f} µs/new-pt)",
                flush=True,
            )

    if "ivf" in _sections:
        _index_split(
            "ivf", "predict_index_build", "predict_index_warm_batch",
            note=" (save: reference + centroids + capped inverted lists)",
        )

    # --- round 11: predict-optimal centroid rule (VERDICT r10 task 4)
    # The corpus rule sqrt(n_ref/200) picks ~11.9k centroids at 2.4M —
    # query-side assignment then dominates the warm batch. Rebuild
    # with expected_batch_size=n_new (n_centroids = min(sqrt(n_probe·
    # n_ref), sqrt(8·q))) and re-measure the same warm batch.
    if "ebs" in _sections:
        _index_split(
            "ivf", "predict_index_build_ebs",
            "predict_index_warm_batch_ebs",
            index_kwargs={"expected_batch_size": n_new_actual},
            note=f" (expected_batch_size={n_new_actual})",
        )

    # --- round 11: persisted LSH index split (VERDICT r10 task 5) ----
    # the streaming-build / churny-corpus variant: build = one
    # projection pass per row (no centroid training), warm = query-
    # side bucketing + capped cogroup + exact re-rank
    if "lsh" in _sections:
        _index_split(
            "lsh", "predict_lsh_index_build",
            "predict_lsh_index_warm_batch",
            note=" (save: reference + capped per-table sign-bit buckets)",
        )


    # --- broadcast path per-point cost at a 100k reference ----------
    if "broadcast" not in _sections:
        bcast_batches = []
    ref_small = ref_pts.filter(F.col("point_id") < 100_000).localCheckpoint()
    bres: dict[str, float] = {}
    for batch in bcast_batches:
        nb = (
            replicate(base, max(1, -(-batch // n_base)), salt=7)
            .filter(F.col("point_id") < batch)
            .repartition(32)
            .localCheckpoint()
        )
        nb_n = nb.count()

        def run_broadcast():
            return approximate_predict(
                model, ref_small, nb, min_pts=4, index="broadcast"
            ).count()

        run_broadcast()  # warmup
        t0 = time.time()
        rows = run_broadcast()
        el = round(time.time() - t0, 2)
        bres[str(nb_n)] = el
        print(
            f"predict_broadcast ref=100k new={nb_n}: {el}s "
            f"({rows} rows, {el * 1e6 / nb_n:.2f} µs/new-pt)",
            flush=True,
        )
    results["predict_broadcast"] = bres

    try:
        with open("SCALEBENCH.json") as f:
            merged = json.load(f)
    except FileNotFoundError:
        merged = {}
    for k, v in results.items():
        merged.setdefault(k, {}).update(v)
    with open("SCALEBENCH.json", "w") as f:
        json.dump(merged, f, indent=1)
    print("wrote SCALEBENCH.json")
    spark.stop()


if __name__ == "__main__":
    main()
