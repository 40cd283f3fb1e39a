"""Transaction reassembly + last-writer-wins collapse (SURVEY.md §2.5 A1/A2).

The reference buffers events per transaction uuid (`uuidBuffer`,
/root/reference/CHANGES.txt:168-170), applies them in commit order, and lets
HBase keep one version per cell timestamp; the *final* state of a row is the
last-writer-wins fold of its change events in (pGTID, binlog position) order
(CHANGES.txt:19-20,37,82).

Fold semantics per key (repo, path), in ascending
(gtid_seq, log_file, log_pos, seq_in_txn) order:

  I : image := after                      (full post-image)
  U : image := image <- after             (merge cells; `after` may be a
                                           partial changed-cells map,
                                           CHANGES.txt:173)
  D : image := tombstone                  (key-only, CHANGES.txt:184)

Two interchangeable implementations (equality is a test invariant):

* ``collapse_events_pandas`` — grouped-map ``applyInPandas``; groups are
  hash *buckets* of the key space (not single keys) so one Arrow batch
  carries many keys: thousands of tiny per-key Python calls collapse into
  ~n_shuffle_partitions vectorized calls. Inside, a vectorized
  reset-segmentation keeps only events at-or-after each key's last I/D,
  then a single pass merges the few surviving partial updates.

* ``collapse_events_sql`` — pure Catalyst: per-key last reset via
  ``max_by``, then per-*cell* LWW via explode + ``max_by``. No Python at
  all; skew is diffused across (key, cell) pairs; whole-stage codegen +
  map-side partial aggregation apply. This is the 100-TB path.
"""

from __future__ import annotations

from typing import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from mysql_time_machine_spark.functions.core import salted_shuffle_key

#: columns that define the total apply order (per key)
ORDER_COLS = ["gtid_seq", "log_file", "log_pos", "seq_in_txn"]

COLLAPSED_SCHEMA = T.StructType(
    [
        T.StructField("repo", T.StringType(), False),
        T.StructField("path", T.StringType(), False),
        T.StructField("row_status", T.StringType(), False),
        T.StructField("image", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField("gtid_seq", T.LongType(), True),
        T.StructField("schema_version", T.IntegerType(), True),
        T.StructField("updated_ts", T.TimestampType(), True),
    ]
)


def _local_live_filter(pdf: pd.DataFrame) -> pd.DataFrame:
    """Map-side combiner: drop events strictly older than the partition's
    last I/D per key. Safe regardless of how events are spread across
    partitions — a later reset (higher order key) makes every earlier event
    of that key dead in the global fold too. Cuts shuffle volume by the
    per-partition churn factor, the same trick as partial aggregation."""
    if pdf.empty:
        return pdf
    pdf = pdf.sort_values(ORDER_COLS, kind="mergesort")
    key = pdf["repo"].str.cat(pdf["path"], sep="\x00")
    is_reset = pdf["op"].isin(("I", "D"))
    reset_cum = is_reset.groupby(key, sort=False).cumsum()
    last_reset = reset_cum.groupby(key, sort=False).transform("max")
    return pdf.loc[(reset_cum == last_reset).to_numpy()]


def _collapse_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
    """Collapse all keys of one hash bucket. Called once per bucket group."""
    if pdf.empty:
        return pd.DataFrame(columns=[f.name for f in COLLAPSED_SCHEMA.fields])
    pdf = pdf.sort_values(ORDER_COLS, kind="mergesort")

    # vectorized reset-segmentation: only events at-or-after the last I/D of
    # each key can influence its final image
    key = pdf["repo"].str.cat(pdf["path"], sep="\x00")
    is_reset = pdf["op"].isin(("I", "D")).to_numpy()
    reset_cum = pd.Series(is_reset, index=pdf.index).groupby(key, sort=False).cumsum()
    last_reset = reset_cum.groupby(key, sort=False).transform("max")
    survives = (reset_cum == last_reset).to_numpy()
    live = pdf.loc[survives]
    live_key = key[survives]

    out: dict[str, dict] = {}
    rows = zip(
        live_key.to_numpy(),
        live["repo"].to_numpy(),
        live["path"].to_numpy(),
        live["op"].to_numpy(),
        live["after"].to_numpy(),
        live["gtid_seq"].to_numpy(),
        live["schema_version"].to_numpy(),
        live["ts"].to_numpy(),
    )
    for k, repo, path, op, after, gtid_seq, sv, ts in rows:
        st = out.get(k)
        if op == "D":
            out[k] = {
                "repo": repo, "path": path, "row_status": "D", "image": None,
                "gtid_seq": gtid_seq, "schema_version": sv, "updated_ts": ts,
            }
        elif op == "I" or st is None or st["image"] is None:
            out[k] = {
                "repo": repo, "path": path, "row_status": op,
                "image": dict(after) if after is not None else {},
                "gtid_seq": gtid_seq, "schema_version": sv, "updated_ts": ts,
            }
        else:  # U merged onto a live image
            if after:
                st["image"].update(after)
            st.update(row_status="U", gtid_seq=gtid_seq, schema_version=sv, updated_ts=ts)
    return pd.DataFrame(list(out.values()), columns=[f.name for f in COLLAPSED_SCHEMA.fields])


def collapse_events_pandas(events: DataFrame, n_buckets: int = 64) -> DataFrame:
    """North-rule path: salted-bucket repartition + grouped-map applyInPandas.

    ``n_buckets`` is the shuffle-group count: the md5-salt of the key
    (CHANGES.txt:102-104) decides the bucket, so hot *keys* spread across
    the hash space like every other key, and one executor task handles one
    bucket's worth of keys in a single Arrow batch.
    """
    events = events.where(F.col("op").isin("I", "U", "D"))
    # column-prune BEFORE the shuffle + Arrow hop: only what the fold reads
    # crosses the exchange and the JVM<->Python boundary ('before', gtid
    # strings, txn metadata never do)
    needed = ["repo", "path", "op", "after", "ts", "schema_version"] + ORDER_COLS
    pruned = events.select(*needed)
    # map-side combine: shed locally-dead events before shuffling
    pruned = pruned.mapInPandas(
        lambda batches: (_local_live_filter(b) for b in batches), pruned.schema
    )
    bucketed = pruned.withColumn("_bucket", salted_shuffle_key(n_buckets))
    return (
        bucketed.groupBy("_bucket")
        .applyInPandas(lambda pdf: _collapse_bucket(pdf.drop(columns=["_bucket"])), COLLAPSED_SCHEMA)
    )


def collapse_events_sql(events: DataFrame) -> DataFrame:
    """Pure-Catalyst collapse: no Python, cell-level parallel LWW.

    1. per key: find the last reset event (I or D) with ``max_by`` —
       map-side combinable, one shuffle;
    2. cells from events ordered >= last reset survive; merge per (key,
       cell) with ``max_by`` on the order key;
    3. reassemble the map with ``map_from_entries``.
    """
    ev = events.where(F.col("op").isin("I", "U", "D")).withColumn(
        "_ord",
        F.struct(
            F.col("gtid_seq"), F.col("log_file"), F.col("log_pos"), F.col("seq_in_txn")
        ),
    )

    last = ev.groupBy("repo", "path").agg(
        F.max_by(F.struct("op", "gtid_seq", "schema_version", "ts"), F.col("_ord")).alias("_last"),
        # max over a nullable struct ignores NULLs: the latest I/D order key
        F.max(F.when(F.col("op").isin("I", "D"), F.col("_ord"))).alias("_last_reset"),
    )

    live = (
        ev.alias("e")
        .join(last.alias("s"), ["repo", "path"])
        .where(
            F.col("s._last_reset").isNull()
            | (F.col("e._ord") >= F.col("s._last_reset"))
        )
        .where(F.col("e.op") != "D")
    )

    cells = (
        live.select("repo", "path", "_ord", F.explode_outer("after").alias("k", "v"))
        .where(F.col("k").isNotNull())
        .groupBy("repo", "path", "k")
        .agg(F.max_by("v", F.col("_ord")).alias("v"))
    )

    images = cells.groupBy("repo", "path").agg(
        F.map_from_entries(F.collect_list(F.struct("k", "v"))).alias("image")
    )

    return (
        last.join(images, ["repo", "path"], "left")
        .select(
            "repo",
            "path",
            F.when(F.col("_last.op") == "D", F.lit("D")).otherwise(F.col("_last.op")).alias("row_status"),
            F.when(F.col("_last.op") == "D", F.lit(None).cast("map<string,string>")).otherwise(F.col("image")).alias("image"),
            F.col("_last.gtid_seq").alias("gtid_seq"),
            F.col("_last.schema_version").alias("schema_version"),
            F.col("_last.ts").alias("updated_ts"),
        )
    )


def materialize(collapsed: DataFrame, business_columns: Iterable[tuple[str, str]]) -> DataFrame:
    """Project the string-map image onto the active schema's column set.

    Rows whose last write predates a DDL simply lack the new key in their
    image map and read as NULL — the active-schema semantics of
    CHANGES.txt:44-46 without any batch splitting.
    Tombstones (row_status='D') are kept: the sink turns them into deletes.
    """
    cast_map = {"string": "string", "long": "long", "int": "int", "timestamp": "timestamp", "double": "double"}
    cols = [F.col("repo"), F.col("path")]
    for name, typ in business_columns:
        cols.append(F.element_at(F.col("image"), name).cast(cast_map[typ]).alias(name))
    cols += [
        F.col("row_status"),
        F.col("gtid_seq"),
        F.col("schema_version"),
        F.col("updated_ts"),
    ]
    return collapsed.select(*cols)
