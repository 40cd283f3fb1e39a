"""Approximate-nearest-neighbor search over an embedding column.

Two strategies, one answer shape (vec_id, score):

* ``brute_force_topk`` — exact cosine top-k: one scan, one reduce. The
  correctness baseline, and at 100 TB still the right plan when the query
  batch is small (scan is embarrassingly parallel; topK is a
  TakeOrderedAndProject, no full sort).

* ``ivf_topk`` — IVF-style two-stage: vectors are assigned to their
  nearest of ``nlist`` deterministic centroids (here: the first ``nlist``
  vectors by id — swap in k-means centroids in production); a query probes
  only the ``nprobe`` closest centroid partitions. At scale the assignment
  is precomputed and the table is clustered/partitioned by ``centroid_id``
  so a probe prunes (nlist - nprobe)/nlist of the data *at the file level*.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from mysql_time_machine_spark.functions.similarity import cosine, lit_vec


def brute_force_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    q = lit_vec(query_vec)
    return (
        embeddings.select(F.col(id_col), cosine(F.col(vec_col), q).alias("score"))
        .orderBy(F.desc("score"), F.col(id_col))
        .limit(k)
    )


def assign_centroids(
    embeddings: DataFrame,
    nlist: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Stage 0: centroid assignment. Centroids = first nlist vectors by id
    (deterministic; production would use k-means). Broadcast cross-join +
    argmin — nlist is tiny, the join is map-side."""
    cents = embeddings.where(F.col(id_col) < nlist).select(
        F.col(id_col).alias("centroid_id"), F.col(vec_col).alias("centroid_vec")
    )
    scored = embeddings.crossJoin(F.broadcast(cents)).withColumn(
        "cscore", cosine(F.col(vec_col), F.col("centroid_vec"))
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("cscore"), F.col("centroid_id"))
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select(id_col, vec_col, "centroid_id")
    )


def ivf_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    nlist: int = 8,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    q = lit_vec(query_vec)
    assigned = assign_centroids(embeddings, nlist, id_col, vec_col)
    cents = embeddings.where(F.col(id_col) < nlist).select(
        F.col(id_col).alias("centroid_id"), F.col(vec_col).alias("centroid_vec")
    )
    probed = (
        cents.select("centroid_id", cosine(F.col("centroid_vec"), q).alias("qscore"))
        .orderBy(F.desc("qscore"), F.col("centroid_id"))
        .limit(nprobe)
    )
    return (
        assigned.join(F.broadcast(probed.select("centroid_id")), "centroid_id")
        .select(F.col(id_col), cosine(F.col(vec_col), q).alias("score"))
        .orderBy(F.desc("score"), F.col(id_col))
        .limit(k)
    )
