"""Sources & sinks for the clustering surface.

S1/S2: whitespace/CSV numeric text → (point_id, features), fixing the
reference's per-partition id collision (B4,
源代码/mappers/MapperDataset_github.java:9-21 — its id counter restarts
per task). Ids here come from ``zipWithIndex`` (dense, global) or
``monotonically_increasing_id`` (sparse, cheaper — default).

S3/S4/S5/S6: parquet checkpoint sink/source and the documented CSV
output contracts (源代码/main/Main.java:556-612).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_points_text(
    spark: SparkSession,
    path: str,
    sep: str = r"\s+",
    dense_ids: bool = False,
) -> DataFrame:
    """Parse a numeric text file (one object per line, sep-separated)
    into (point_id, features ARRAY<DOUBLE>)."""
    lines = spark.read.text(path).filter(F.length(F.trim("value")) > 0)
    # ONE parse rule for both id strategies (the rule living twice
    # invited silent divergence between the branches)
    feats = F.transform(
        F.split(F.trim(F.col("value")), sep), lambda s: s.cast("double")
    )
    if dense_ids:
        rdd = lines.rdd.zipWithIndex().map(lambda t: (t[1], t[0]["value"]))
        lines = spark.createDataFrame(rdd, schema="point_id long, value string")
        return lines.select("point_id", feats.alias("features"))
    return lines.select(
        F.monotonically_increasing_id().alias("point_id"), feats.alias("features")
    )


def checkpoint_parquet(df: DataFrame, path: str) -> DataFrame:
    """The reference's object-file checkpoint (S3/S4) as parquet —
    used between driver iterations when lineage must be cut across
    restarts (localCheckpoint covers the in-session case)."""
    df.write.mode("overwrite").parquet(path)
    return df.sparkSession.read.parquet(path)


def write_flat_partition(labels: DataFrame, path: str) -> None:
    """Flat partition CSV (point_id, label) — Main.java:572-578 contract."""
    labels.orderBy("point_id").write.mode("overwrite").option("header", True).csv(path)


def write_cluster_tree(tree: DataFrame, path: str) -> None:
    """Cluster-tree CSV — Main.java:566-571 contract, extended: the
    emitted columns are (label, birth_level, death_level, stability,
    n_points, parent). ``n_points`` is additional to the reference's
    (label,birth,death,stability,parent) line; the header names the
    columns so consumers parse by name, not position."""
    tree.select(
        "label", "birth_level", "death_level", "stability", "n_points", "parent"
    ).orderBy("label").write.mode("overwrite").option("header", True).csv(path)


def write_hierarchy(levels: DataFrame, path: str) -> None:
    """Hierarchy CSV — Main.java:556-565 contract: one line per
    significant level, ``<scale>,<label obj 1>,...,<label obj n>``
    ordered by scale descending, labels ordered by object id, noise
    labelled zero. ``levels`` is the long-form (level_weight,
    point_id, label) relation from ``model.hierarchy_levels()``; the
    per-level line assembly is a single groupBy (one shuffle) and the
    result is one row per level — small — so the single-file sort is
    driver-cheap."""
    lines = (
        levels.groupBy("level_weight")
        .agg(
            F.concat_ws(
                ",",
                F.transform(
                    F.sort_array(F.collect_list(F.struct("point_id", "label"))),
                    lambda s: s["label"].cast("string"),
                ),
            ).alias("labels")
        )
        .select(
            F.col("level_weight"),
            F.concat_ws(
                ",", F.col("level_weight").cast("string"), F.col("labels")
            ).alias("value"),
        )
        .repartition(1)
        .sortWithinPartitions(F.desc("level_weight"))
        .select("value")
    )
    lines.write.mode("overwrite").text(path)


def write_visualization_file(path: str, compact: bool, line_count: int) -> None:
    """Auxiliary ``.vis`` file for the reference's visualization
    module — HDBSCANStar.java:470-489 contract: line 1 is ``1`` for a
    full (non-compact) hierarchy / ``0`` for compact, line 2 the
    hierarchy file's line count. A two-line driver-side artifact, so
    a plain local write (no Spark job)."""
    with open(path, "w") as f:
        f.write(("0\n" if compact else "1\n") + str(int(line_count)))


def write_outlier_scores(scores: DataFrame, path: str) -> None:
    """Outlier-score CSV sorted ascending by (score, core_distance,
    point_id) — OutlierScore.java:34-48 ordering."""
    scores.orderBy("score", "core_distance", "point_id").write.mode("overwrite").option(
        "header", True
    ).csv(path)
