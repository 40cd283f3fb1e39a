"""Shared MERGE semantics — ONE source of truth for every sink.

The reference applier's upsert rules (CHANGES.txt:173,184,174-175), stated
over a COLLAPSED batch row (repo, path, row_status, image, gtid_seq, ...):

  matched  & 'D' & fresh : DELETE
  matched  & fresh       : per business cell c:
                             b.full_image                -> full replace
                                                            (b.c verbatim,
                                                            incl. NULL)
                             else c present in b.image   -> b.c (a cell may
                                                            be SET to NULL)
                             else                        -> keep t.c
  matched  & stale (b.gtid_seq < t.gtid_seq) : no-op (per-key fence)
  unmatched & not 'D'    : INSERT
  unmatched & 'D'        : no-op

(``full_image`` comes from the collapse kernels: true iff the key's epoch
contained a reset I/D, i.e. the image is the complete post-reset row
state. ``row_status`` stays the last-op lineage marker.)

``ManifestParquetSink.merge`` implements these rules on image MAPS
(map_concat cell-merge); ``IcebergSink.merge`` implements them as a MERGE
INTO statement whose UPDATE SET clauses come from
``iceberg_matched_set_sql`` below; ``simulate_merge`` implements them as a
plain DataFrame full-outer join USING THE SAME SQL FRAGMENTS — the
equivalence test (tests/test_merge_logic.py) runs all paths on one batch
and asserts identical final tables, which is how the jar-gated Iceberg SQL
stays honest without a catalog in the sandbox.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: lineage columns are always taken from the batch on a fresh match
LINEAGE_SET = ("row_status", "gtid_seq", "schema_version", "updated_ts")

MATCHED_DELETE_COND = "b.row_status = 'D' AND b.gtid_seq >= t.gtid_seq"
MATCHED_UPDATE_COND = "b.gtid_seq >= t.gtid_seq"
NOT_MATCHED_INSERT_COND = "b.row_status != 'D'"


def matched_set_exprs(business_columns: list[tuple[str, str]]) -> dict[str, str]:
    """SQL expression per target column for the WHEN MATCHED ... UPDATE SET
    clause. Requires the batch side (alias ``b``) to expose BOTH the
    materialized business columns AND the raw ``image`` map — presence of a
    key in the map is what distinguishes "cell set to NULL" from "cell not
    in this partial update"."""
    exprs: dict[str, str] = {}
    for name, _typ in business_columns:
        exprs[name] = (
            f"CASE WHEN b.full_image OR map_contains_key(b.image, '{name}') "
            f"THEN b.{name} ELSE t.{name} END"
        )
    for name in LINEAGE_SET:
        exprs[name] = f"b.{name}"
    return exprs


def iceberg_matched_set_sql(business_columns: list[tuple[str, str]]) -> str:
    """The UPDATE SET assignment list for MERGE INTO."""
    return ", ".join(f"t.{c} = {e}" for c, e in matched_set_exprs(business_columns).items())


def materialize_batch(batch: DataFrame, business_columns: list[tuple[str, str]]) -> DataFrame:
    """Collapsed batch -> (keys, lineage, image, *typed business columns).
    Keeps the image map alongside the materialized cells so the matched-set
    expressions can test cell presence."""
    from mysql_time_machine_spark.functions.core import materialize_cell

    cols = [F.col("repo"), F.col("path"), F.col("row_status"), F.col("full_image"),
            F.col("gtid_seq"), F.col("schema_version"), F.col("updated_ts"), F.col("image")]
    for name, typ in business_columns:
        cols.append(materialize_cell("image", name, typ))
    return batch.select(*cols)


def simulate_merge(
    target: DataFrame,
    batch: DataFrame,
    business_columns: list[tuple[str, str]],
) -> DataFrame:
    """Reference implementation of the MERGE as a full-outer join, built
    from the SAME condition/assignment SQL fragments the IcebergSink feeds
    to MERGE INTO. ``target`` is the live table (materialized columns);
    ``batch`` is a COLLAPSED batch. Returns the post-merge table."""
    t = target.alias("t")
    b = materialize_batch(batch, business_columns).alias("b")
    j = t.join(b, (F.col("t.repo") == F.col("b.repo")) & (F.col("t.path") == F.col("b.path")), "full_outer")

    matched = F.col("t.repo").isNotNull() & F.col("b.repo").isNotNull()
    batch_only = F.col("t.repo").isNull()

    # rows surviving the merge: matched-deleted rows drop; batch-only 'D' drop
    survives = F.when(
        matched, ~F.expr(MATCHED_DELETE_COND)
    ).when(batch_only, F.expr(NOT_MATCHED_INSERT_COND)).otherwise(F.lit(True))

    out_cols = [
        F.when(batch_only, F.col("b.repo")).otherwise(F.col("t.repo")).alias("repo"),
        F.when(batch_only, F.col("b.path")).otherwise(F.col("t.path")).alias("path"),
    ]
    set_exprs = matched_set_exprs(business_columns)
    all_cols = [c for c, _ in business_columns] + list(LINEAGE_SET)
    for c in all_cols:
        out_cols.append(
            F.when(batch_only, F.col(f"b.{c}"))
            .when(matched & F.expr(MATCHED_UPDATE_COND), F.expr(set_exprs[c]))
            .otherwise(F.col(f"t.{c}"))
            .alias(c)
        )
    return j.where(survives).select(*out_cols)
