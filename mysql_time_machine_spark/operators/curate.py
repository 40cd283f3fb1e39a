"""Corpus curation — the composed keep/drop decision a training-data
pipeline actually runs, built from the primitives in this package:

  1. exact-dup canonicalization (md5 groupBy; keep the min-id copy)
  2. language gate (n-gram stopword lang_id)
  3. quality gate (length / stopword / punctuation score)

Output: one row per input document with the verdict and why —
'keep' | 'dup' (a lower-id exact copy exists) | 'lang' (guessed language
not allowed) | 'quality' (score below threshold). Gates are ordered:
a duplicate is 'dup' even if it would also fail quality, so downstream
counts decompose cleanly. Everything is one shuffle (the dup groupBy —
map-side combined) plus codegen'd scalar gates; at 100 TB the near-dup
tier (MinHash-LSH + connected_components) slots in between steps 1 and 2
as an extra anti-join on cluster membership.
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
) -> DataFrame:
    """One verdict row per document: (id, verdict, lang_guess, quality)."""
    scored = docs.select(
        F.col(id_col),
        F.md5(F.col(text_col)).alias("_md5"),
        lang_id(F.col(text_col)).alias("lang_guess"),
        F.round(quality_score(F.col(text_col)), 6).alias("quality"),
    )
    canonical = scored.groupBy("_md5").agg(F.min(id_col).alias("_canon"))
    return (
        scored.join(canonical, "_md5")
        .select(
            id_col,
            F.when(F.col(id_col) != F.col("_canon"), F.lit("dup"))
            .when(~F.col("lang_guess").isin(*langs), F.lit("lang"))
            .when(F.col("quality") < min_quality, F.lit("quality"))
            .otherwise(F.lit("keep"))
            .alias("verdict"),
            "lang_guess",
            "quality",
        )
    )
