"""Deterministic seed `repos` table (FIXTURES.md §1).

Reshapes the driver-provided ``documents.parquet``
(doc_id, text, lang, source) into the BASELINE.json input shape
(repo, path, commit, lang, content). Pure Catalyst expressions, no seed
state — the table is a function of the input, so the DuckDB oracle can
reproduce it exactly in SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

N_ORGS = 20


def seed_repos_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.select(
        F.concat(F.lit("org"), (F.col("doc_id") % N_ORGS).cast("string")).alias("repo"),
        F.concat(F.lit("src/doc_"), F.col("doc_id").cast("string"), F.lit(".txt")).alias("path"),
        F.md5(F.concat(F.lit("c0:"), F.col("doc_id").cast("string"))).alias("commit"),
        F.col("lang"),
        F.col("text").alias("content"),
    )


SEED_REPOS_SQL = f"""
SELECT 'org' || (doc_id % {N_ORGS}) AS repo,
       'src/doc_' || doc_id || '.txt' AS path,
       md5('c0:' || doc_id) AS commit,
       lang,
       text AS content
FROM documents
"""
