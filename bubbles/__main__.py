"""CLI mirroring the reference driver's k=v argument contract
(源代码/main/Main.java:417-528 checkInputParameters + the output file
layout documented at :556-612), so a reference user can run the same
invocation against this engine:

    python -m bubbles file=dataset.txt minPts=4 minClSize=4 k=0.2 \
        processing_units=4096 dist_function=euclidean \
        [constraints=constraints.csv] [compact={true,false}] \
        [hierarchy={true,false}] [out=outdir] [master=local[*]] \
        [checkpoint_dir=ckdir] [save_model=modeldir]

Outputs under <out>/ (default <file>_out/): flat partition, cluster
tree, outlier scores, hierarchy (CSV, reference contracts — the
hierarchy is non-compact/full by default and named compact_hierarchy
under ``compact=true``, matching Main.java:556-565), MST edges
(parquet), and the auxiliary ``visualization.vis`` for the
reference's visualization module (HDBSCANStar.java:470-489).
``hierarchy=false`` skips the O(n·levels) hierarchy matrix (and the
.vis that describes it) for very large runs.
"""

from __future__ import annotations

import sys


def parse_args(argv: list[str]) -> dict:
    args = {}
    for a in argv:
        if "=" not in a:
            raise SystemExit(f"arguments are key=value (reference contract); got {a!r}")
        k, v = a.split("=", 1)
        args[k] = v
    if "file" not in args:
        raise SystemExit(
            "usage: python -m bubbles file=<path> [minPts=4] [minClSize=4] "
            "[k=0.2] [processing_units=4096] [dist_function=euclidean] "
            "[constraints=<csv>] [out=<dir>] [master=local[*]]"
        )
    return args


def main(argv=None):
    args = parse_args(argv if argv is not None else sys.argv[1:])

    from pyspark.sql import SparkSession

    from bubbles import MRHDBSCAN
    from bubbles.sources.points import (
        read_points_text,
        write_cluster_tree,
        write_flat_partition,
        write_hierarchy,
        write_outlier_scores,
        write_visualization_file,
    )

    # reuse an already-active session (embedded use, e.g. tests) and
    # only stop what this invocation created
    owns_session = SparkSession.getActiveSession() is None
    spark = (
        SparkSession.builder.master(args.get("master", "local[*]"))
        .appName("bubbles-cli")
        .config("spark.sql.adaptive.enabled", "true")
        # the fit loop emits >100 distinct codegen fragments per run;
        # the default 100-entry generated-class cache thrashes and
        # re-JITs every iteration (measured in SCALE.md, round 8)
        .config("spark.sql.codegen.cache.maxEntries", "5000")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")

    path = args["file"]
    df = (
        spark.read.parquet(path)
        if path.endswith(".parquet")
        else read_points_text(spark, path)
    )
    constraints = None
    if "constraints" in args:
        # reference format: pointA,pointB,{ml|cl} (Main.java:590-597)
        constraints = (
            spark.read.csv(args["constraints"])
            .toDF("point_a", "point_b", "kind")
            .selectExpr(
                "cast(point_a as long) point_a",
                "cast(point_b as long) point_b",
                "kind",
            )
        )

    model = MRHDBSCAN(
        min_pts=int(args.get("minPts", 4)),
        min_cluster_size=int(args.get("minClSize", 4)),
        sample_fraction=float(args.get("k", 0.2)),
        max_local_size=int(args.get("processing_units", 4096)),
        distance=args.get("dist_function", "euclidean"),
        seed=int(args.get("seed", 42)),
        # durable per-iteration checkpoints + crash resume (round 7):
        # pass checkpoint_dir=<fs path> for long cluster runs
        checkpoint_dir=args.get("checkpoint_dir"),
    ).fit(df, constraints=constraints)

    out = args.get("out", path.rsplit(".", 1)[0] + "_out")
    write_flat_partition(model.labels, f"{out}/partition")
    write_cluster_tree(model.cluster_tree, f"{out}/tree")
    write_outlier_scores(model.outlier_scores, f"{out}/outlier_scores")
    model.mst_edges.write.mode("overwrite").parquet(f"{out}/mst")
    if args.get("hierarchy", "true").lower() != "false":
        # reference default is the full (non-compact) hierarchy; the
        # compact flag keeps only cluster birth/death levels and names
        # the output accordingly (Main.java help text + :556-565)
        compact = args.get("compact", "false").lower() == "true"
        name = "compact_hierarchy" if compact else "hierarchy"
        try:
            write_hierarchy(model.hierarchy_levels(full=not compact), f"{out}/{name}")
            # auxiliary .vis for the reference's visualization module
            # (HDBSCANStar.java:470-489): hierarchy kind + line count,
            # counted off the files just written
            n_lines = spark.read.text(f"{out}/{name}").count()
            write_visualization_file(f"{out}/visualization.vis", compact, n_lines)
        except ValueError as e:  # n·levels over the matrix guard
            print(f"skipping hierarchy output: {e}")
    if "save_model" in args:
        model.save(args["save_model"])
    n = model.labels.count()
    k = model.labels.filter("label > 0").select("label").distinct().count()
    print(f"clustered {n} points into {k} clusters -> {out}/")
    if owns_session:
        spark.stop()


if __name__ == "__main__":
    main()
