"""Corpus curation — the composed keep/drop decision a training-data
pipeline actually runs, built from the primitives in this package:

  1. exact-dup canonicalization (md5 groupBy; keep the min-id copy)
  2. language gate (n-gram stopword lang_id)
  3. quality gate (length / stopword / punctuation score)

Output: one row per input document with the verdict and why —
'keep' | 'dup' (a lower-id exact copy exists) | 'near_dup' (a non-
canonical member of a near-dup cluster, when the ``clusters`` tier is
plugged in) | 'lang' (guessed language not allowed) | 'quality' (score
below threshold). Gates are ordered: a duplicate is 'dup' even if it
would also fail quality, so downstream counts decompose cleanly.
Everything is one shuffle (the dup groupBy — map-side combined) plus one
left join on cluster membership when the near-dup tier is on, plus
codegen'd scalar gates.

The near-dup tier composes the package's own primitives —
``connected_components(minhash_lsh_pairs(docs))`` — and keeps the
min-id member of each cluster (cluster_id IS that min id), mirroring the
exact-dup canonicalization rule one level up.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mysql_time_machine_spark.functions.text import lang_id, quality_score


def curate(
    docs: DataFrame,
    min_quality: float = 0.5,
    langs: tuple[str, ...] = ("en", "de", "es", "fr"),
    text_col: str = "text",
    id_col: str = "doc_id",
    clusters: DataFrame | None = None,
) -> DataFrame:
    """One verdict row per document: (id, verdict, lang_guess, quality).

    ``clusters`` (optional) is a near-dup clustering in the
    ``connected_components`` output shape (id, cluster_id); non-canonical
    members (id != cluster_id) verdict as 'near_dup' unless they are
    already exact-dup losers ('dup' wins — it is the stronger, cheaper
    signal and keeps the tier counts disjoint)."""
    scored = docs.select(
        F.col(id_col),
        F.md5(F.col(text_col)).alias("_md5"),
        lang_id(F.col(text_col)).alias("lang_guess"),
        F.round(quality_score(F.col(text_col)), 6).alias("quality"),
    )
    canonical = scored.groupBy("_md5").agg(F.min(id_col).alias("_canon"))
    out = scored.join(canonical, "_md5")
    verdict = F.when(F.col(id_col) != F.col("_canon"), F.lit("dup"))
    if clusters is not None:
        losers = clusters.where(F.col("id") != F.col("cluster_id")).select(
            F.col("id").alias(id_col), F.lit(True).alias("_near_loser")
        )
        out = out.join(losers, id_col, "left")
        verdict = verdict.when(F.col("_near_loser"), F.lit("near_dup"))
    return out.select(
        id_col,
        verdict.when(~F.col("lang_guess").isin(*langs), F.lit("lang"))
        .when(F.col("quality") < min_quality, F.lit("quality"))
        .otherwise(F.lit("keep"))
        .alias("verdict"),
        "lang_guess",
        "quality",
    )
