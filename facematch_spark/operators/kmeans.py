"""Deterministic distributed k-means (Lloyd's) over integer-quantized
embeddings — the iterative-ML operator class, made exactly cross-engine
reproducible by the same policy as the integer PageRank:

* coordinates quantize to ``round(x · 1e6)`` int64 micro-units — squared
  L2 distances are exact integer sums (64 dims × (1e6)² ≈ 6.4e13 ≪ 2^63),
  order-independent;
* centroid updates are ``floor(sum / n)`` computed as a DOUBLE division of
  exact integers (sums ≤ ~5e8 are exact in double; floor of a correctly-
  rounded quotient is engine-independent) — NOT integer ``div``/``//``,
  whose negative-operand semantics differ between engines (Spark
  truncates, DuckDB floors);
* assignment ties break to the smallest centroid id (min over a
  (dist, cid) struct — a total order);
* init = the k vectors with smallest (md5(vec_id), vec_id) — arbitrary
  but engine-reproducible, the same salt-hash idiom as the samplers;
* empty clusters are DROPPED (no respawn heuristic) — deterministic and
  mirrored verbatim in the SQL oracle.

Scale shape: the model (k·d integers) is driver/broadcast-scale BY
DESIGN — that is k-means' structure, not a shortcut: assignments and the
per-(cluster, dim) update aggregation are fully distributed (posexplode →
groupBy, map-side combined), and only the k·d centroid table crosses the
driver per round. Points are pinned once; k·d literals re-enter the plan
as a broadcast-joined literal relation each round.

Reference parity: no analog in the reference (engine addition, SURVEY
§2.11 similarity family); Lloyd's algorithm is the public canon.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

UNIT = 1_000_000


def quantize_embeddings(emb: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """(vec_id, q array<long>) — round(x·1e6) per coordinate."""
    return emb.select(
        "vec_id",
        F.transform(
            F.col(vec_col), lambda x: F.round(x * UNIT, 0).cast("long")
        ).alias("q"),
    )


def _assign(pts: DataFrame, cent: DataFrame) -> DataFrame:
    """(vec_id, cluster): nearest centroid by exact integer squared L2,
    ties to the smallest centroid id."""
    scored = pts.crossJoin(F.broadcast(cent)).select(
        "vec_id",
        "cid",
        F.aggregate(
            F.zip_with("q", "cq", lambda a, b: (a - b) * (a - b)),
            F.lit(0).cast("long"),
            lambda acc, d: acc + d,
        ).alias("dist"),
    )
    return (
        scored.groupBy("vec_id")
        .agg(F.min(F.struct("dist", "cid")).alias("m"))
        .select("vec_id", F.col("m.cid").alias("cluster"))
    )


def kmeans_int(
    spark: SparkSession,
    emb: DataFrame,
    k: int = 4,
    iterations: int = 2,
    vec_col: str = "embedding",
) -> DataFrame:
    """Run ``iterations`` Lloyd rounds from the md5-ordered init and return
    the FINAL assignment (vec_id, cluster) under the last centroids."""
    if k < 1 or iterations < 1:
        raise ValueError("k and iterations must be >= 1")
    pts = quantize_embeddings(emb, vec_col).localCheckpoint()

    init_ids = pts.select(
        "vec_id",
        F.md5(F.col("vec_id").cast("string")).alias("_h"),
    ).orderBy("_h", "vec_id").limit(k)
    # cid = rank in the init order (0-based), engine-reproducible
    cent = (
        init_ids.join(pts, "vec_id")
        .select("vec_id", "_h", "q")
        .orderBy("_h", "vec_id")
        .collect()
    )
    centroids = [(i, [int(v) for v in r.q]) for i, r in enumerate(cent)]

    def cent_df(cs):
        return spark.createDataFrame(
            [(cid, cq) for cid, cq in cs], "cid long, cq array<long>"
        )

    for _ in range(iterations):
        assigned = _assign(pts, cent_df(centroids))
        upd = (
            assigned.join(pts, "vec_id")
            .select("cluster", F.posexplode("q").alias("dim", "val"))
            .groupBy("cluster", "dim")
            .agg(F.sum("val").alias("s"), F.count("*").alias("n"))
            .select(
                "cluster",
                "dim",
                F.floor(
                    F.col("s").cast("double") / F.col("n").cast("double")
                ).cast("long").alias("c"),
            )
            .groupBy("cluster")
            .agg(F.array_sort(F.collect_list(F.struct("dim", "c"))).alias("dc"))
            .select(
                "cluster", F.transform("dc", lambda x: x["c"]).alias("cq")
            )
            .collect()
        )
        # empty clusters simply vanish (deterministic; mirrored in SQL)
        centroids = sorted(
            (int(r.cluster), [int(v) for v in r.cq]) for r in upd
        )

    return _assign(pts, cent_df(centroids))
