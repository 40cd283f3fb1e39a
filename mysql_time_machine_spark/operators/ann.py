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

from pyspark.sql import DataFrame
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
    argmin — nlist is tiny, the join is map-side.

    The argmin is ``groupBy(id).agg(max_by(...))`` — map-side combinable
    partial aggregation, so the exchange carries ONE row per vector instead
    of nlist scored candidates (and no Sort/Window at all). Tie-break is
    (highest cscore, lowest centroid_id), encoded as max over the ordering
    struct (cscore, -centroid_id)."""
    cents = embeddings.where(F.col(id_col) < nlist).select(
        F.col(id_col).alias("centroid_id"), F.col(vec_col).alias("centroid_vec")
    )
    scored = embeddings.crossJoin(F.broadcast(cents)).withColumn(
        "cscore", cosine(F.col(vec_col), F.col("centroid_vec"))
    )
    best = scored.groupBy(id_col).agg(
        F.max_by(
            F.struct(F.col(vec_col).alias("v"), F.col("centroid_id").alias("cid")),
            F.struct(F.col("cscore").alias("s"), (-F.col("centroid_id")).alias("tb")),
        ).alias("b")
    )
    return best.select(
        F.col(id_col), F.col("b.v").alias(vec_col), F.col("b.cid").alias("centroid_id")
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
