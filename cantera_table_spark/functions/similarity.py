"""Similarity search over embedding columns (north star, BASELINE.json).

- ``brute_force_topk``: exact cosine top-k — the correctness baseline.
  One broadcast of the (small) query set against the full corpus; the
  dot product runs as a JVM higher-order function (no Python).
- ``ivf_*``: inverted-file (IVF) approximate variant — the scale path.
  Vectors are bucketed by nearest centroid at index time; searches probe
  ``nprobe`` nearest centroid buckets only, turning an O(N) scan into
  O(N * nprobe / n_centroids) with partition pruning on ``cluster``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, v: acc + v)


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity with double accumulation (sequential left fold —
    same order as DuckDB's list_cosine_similarity over DOUBLE[])."""
    ad = F.transform(a, lambda x: x.cast("double"))
    bd = F.transform(b, lambda x: x.cast("double"))
    return dot(ad, bd) / (norm(ad) * norm(bd))


def brute_force_topk(emb: DataFrame, queries: DataFrame, k: int = 5,
                     id_col: str = "vec_id",
                     vec_col: str = "embedding") -> DataFrame:
    """Exact top-k cosine neighbours for each query vector.

    Returns (query_id, neighbor_id, cos, rank).  Ties break on
    neighbor_id ascending (deterministic).  The query side is
    broadcast; ranking uses a per-query window over the already-reduced
    candidate set.
    """
    from pyspark.sql import Window
    q = queries.select(F.col(id_col).alias("query_id"),
                       F.col(vec_col).alias("qv"))
    c = emb.select(F.col(id_col).alias("neighbor_id"),
                   F.col(vec_col).alias("cv"))
    scored = (c.join(F.broadcast(q),
                     F.col("query_id") != F.col("neighbor_id"))
              .withColumn("cos", F.round(cosine(F.col("qv"),
                                                F.col("cv")), 6)))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "cos", "rank"))


def ivf_assign(emb: DataFrame, centroids: DataFrame,
               id_col: str = "vec_id",
               vec_col: str = "embedding") -> DataFrame:
    """Index build: assign each vector to its nearest centroid by cosine
    (deterministic tie-break on centroid id).  At scale the result is
    written partitioned by ``cluster``."""
    from pyspark.sql import Window
    c = centroids.select(F.col("centroid_id"), F.col("cv"))
    scored = (emb.select(F.col(id_col).alias("vec_id"),
                         F.col(vec_col).alias("v"))
              .join(F.broadcast(c), F.lit(True))
              .withColumn("cos", cosine(F.col("v"), F.col("cv"))))
    w = Window.partitionBy("vec_id").orderBy(
        F.col("cos").desc(), F.col("centroid_id").asc())
    return (scored.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") == 1)
            .select("vec_id", "v", F.col("centroid_id").alias("cluster")))


def seed_centroids(emb: DataFrame, n: int = 8, id_col: str = "vec_id",
                   vec_col: str = "embedding") -> DataFrame:
    """Deterministic centroid seeds: the n lowest-id vectors (k-means
    iterations would refine these; seeds keep the gate deterministic)."""
    return (emb.orderBy(id_col).limit(n)
            .select(F.col(id_col).alias("centroid_id"),
                    F.col(vec_col).alias("cv")))


def ivf_topk(indexed: DataFrame, centroids: DataFrame, queries: DataFrame,
             k: int = 5, nprobe: int = 2,
             id_col: str = "vec_id", vec_col: str = "embedding"
             ) -> DataFrame:
    """Approximate top-k: probe the nprobe nearest centroid buckets per
    query, exact cosine within the probed buckets."""
    from pyspark.sql import Window
    q = queries.select(F.col(id_col).alias("query_id"),
                       F.col(vec_col).alias("qv"))
    probes = (q.join(F.broadcast(centroids), F.lit(True))
              .withColumn("ccos", cosine(F.col("qv"), F.col("cv"))))
    wp = Window.partitionBy("query_id").orderBy(
        F.col("ccos").desc(), F.col("centroid_id").asc())
    probed = (probes.withColumn("rk", F.row_number().over(wp))
              .filter(F.col("rk") <= nprobe)
              .select("query_id", "qv",
                      F.col("centroid_id").alias("cluster")))
    cand = (indexed.join(probed, "cluster")
            .filter(F.col("vec_id") != F.col("query_id"))
            .withColumn("cos", F.round(cosine(F.col("qv"), F.col("v")), 6)))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("vec_id").asc())
    return (cand.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", F.col("vec_id").alias("neighbor_id"),
                    "cos", "rank"))
