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

Collapsed output carries TWO markers the sink consumes:

* ``row_status`` — the reference's d:row_status cell (CHANGES.txt:174-175):
  the op type of the key's LAST event (I/U/D), a lineage column on the
  target table.
* ``full_image`` — how the sink must APPLY the image: true means the image
  is the complete row state (the epoch contained a reset I or D, so the
  post-reset fold supersedes everything stored) and must REPLACE the
  stored row; false means the image is a partial cell set to merge
  cell-wise. Merging a post-reset image onto the stored pre-reset row
  would resurrect stale cells (deleted-then-partially-updated keys, or
  post-I images that legitimately lack a column). Relies on the binlog
  invariant that I events carry full post-images.

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
        T.StructField("full_image", T.BooleanType(), False),
        T.StructField("gtid_seq", T.LongType(), True),
        T.StructField("schema_version", T.IntegerType(), True),
        T.StructField("updated_ts", T.TimestampType(), True),
    ]
)


def _with_ord(events: DataFrame) -> DataFrame:
    return events.withColumn(
        "_ord",
        F.struct(F.col("gtid_seq"), F.col("log_file"), F.col("log_pos"), F.col("seq_in_txn")),
    )


def live_events(events: DataFrame, broadcast_reset: bool = False) -> DataFrame:
    """JVM-side pre-reduction shared by both collapse paths: keep only
    events at-or-after each key's LAST reset (I or D).

    The per-key last-reset aggregate shuffles only (key, order-struct) —
    map-side combined, no image maps — and the subsequent join+filter lets
    whole-stage codegen discard every dead event before anything heavier
    touches it. On churny logs this is a 10-100x data reduction; in the
    no-reset worst case (pure partial updates) it degrades to a pass-through
    with one cheap extra aggregate.

    ``broadcast_reset`` hints the key-sized aggregate side as a broadcast.
    Batch callers don't need it (AQE sees the runtime size and converts
    the SortMergeJoin itself), but inside a STREAMING micro-batch AQE is
    unavailable and Catalyst plans a full SMJ — one exchange + sort of
    every raw event just to apply a key-sized filter. The streaming job
    sets it from the per-epoch stats aggregate (rows < big_batch_rows, so
    the distinct-key side is provably bounded); callers who cannot bound
    the key count must leave it off.
    """
    ev = _with_ord(events.where(F.col("op").isin("I", "U", "D")))
    last_reset = ev.groupBy("repo", "path").agg(
        F.max(F.when(F.col("op").isin("I", "D"), F.col("_ord"))).alias("_lr")
    )
    if broadcast_reset:
        last_reset = F.broadcast(last_reset)
    return (
        ev.join(last_reset, ["repo", "path"])
        .where(F.col("_lr").isNull() | (F.col("_ord") >= F.col("_lr")))
        .drop("_lr")
    )


def _full_image_flags(pdf: pd.DataFrame, meta: pd.DataFrame) -> "pd.Series":
    """full_image per key: true iff ANY surviving event is a reset (I or D)
    — the collapsed image is then the complete post-reset row state and the
    sink must replace, not cell-merge."""
    resets = pdf.loc[pdf["op"].isin(["I", "D"]), ["repo", "path"]].drop_duplicates()
    flagged = meta.merge(resets.assign(_hr=True), on=["repo", "path"], how="left")
    return flagged["_hr"].notna().to_numpy()


def _collapse_bucket_flat(pdf: pd.DataFrame) -> pd.DataFrame:
    """Collapse one hash bucket of FLATTENED (one row per event-cell) live
    events. Invariant (guaranteed by live_events upstream): per key, at most
    one reset event (I or D) survives, and it is the first in order — so
    per-(key, cell) last-writer-wins over the survivors is exact, including
    partial updates, deletes, and resurrection-after-delete.

    Everything heavy is vectorized pandas (stable sort + drop_duplicates);
    the only Python loop runs over the COLLAPSED (key, cell) pairs — the
    output size, not the event count.
    """
    cols = [f.name for f in COLLAPSED_SCHEMA.fields]
    if pdf.empty:
        return pd.DataFrame(columns=cols)
    pdf = pdf.sort_values(ORDER_COLS, kind="mergesort")

    # last event per key -> row_status + lineage meta
    meta = pdf.drop_duplicates(subset=["repo", "path"], keep="last")
    # last write per (key, cell) -> final image cells
    with_cell = pdf[pdf["cell"].notna()]
    final_cells = with_cell.drop_duplicates(subset=["repo", "path", "cell"], keep="last")

    images: dict[tuple, dict] = {}
    for repo, path, cell, value in zip(
        final_cells["repo"].to_numpy(),
        final_cells["path"].to_numpy(),
        final_cells["cell"].to_numpy(),
        final_cells["value"].to_numpy(),
    ):
        images.setdefault((repo, path), {})[cell] = value

    out = {
        "repo": meta["repo"].to_numpy(),
        "path": meta["path"].to_numpy(),
        "row_status": meta["op"].to_numpy(),
        "image": [
            None if op == "D" else images.get((r, p), {})
            for r, p, op in zip(meta["repo"].to_numpy(), meta["path"].to_numpy(), meta["op"].to_numpy())
        ],
        "full_image": _full_image_flags(pdf, meta),
        "gtid_seq": meta["gtid_seq"].to_numpy(),
        "schema_version": meta["schema_version"].to_numpy(),
        "updated_ts": meta["ts"].to_numpy(),
    }
    return pd.DataFrame(out, columns=cols)


#: flattened live-event schema shipped over the Arrow boundary (stage-1
#: partial collapse emits the same shape it consumes)
FLAT_SCHEMA = T.StructType(
    [
        T.StructField("repo", T.StringType(), False),
        T.StructField("path", T.StringType(), False),
        T.StructField("op", T.StringType(), False),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("schema_version", T.IntegerType(), True),
        T.StructField("gtid_seq", T.LongType(), True),
        T.StructField("log_file", T.StringType(), False),
        T.StructField("log_pos", T.LongType(), False),
        T.StructField("seq_in_txn", T.IntegerType(), True),
        T.StructField("cell", T.StringType(), True),
        T.StructField("value", T.StringType(), True),
        T.StructField("_bucket", T.IntegerType(), False),
    ]
)

_FLAT_COLS = [f.name for f in FLAT_SCHEMA.fields]


def _partial_collapse_flat(pdf: pd.DataFrame) -> pd.DataFrame:
    """Stage-1 partial collapse of ONE (bucket, sub-salt) slice of a hot
    key's flat live events. Emits a row-SUBSET in the same flat shape that
    preserves everything the final collapse needs:

    * the slice-local last write per (key, cell)  — the GLOBAL last write
      per cell survives in whichever slice holds it;
    * the slice-local last event per key          — ditto for the global
      last event (row_status / lineage meta);
    * the slice-local first event per key IF it is a reset (I/D) — so the
      final stage still sees the (unique, live_events-guaranteed) reset
      and sets full_image correctly even when every one of the reset's
      cells was overwritten inside this slice.

    The final stage re-runs global per-(key,cell) LWW over the union of
    slice survivors, so keeping extra (stale-ordered) rows is harmless.
    """
    pdf = pdf.sort_values(ORDER_COLS, kind="mergesort")
    last_cells = pdf[pdf["cell"].notna()].drop_duplicates(
        subset=["repo", "path", "cell"], keep="last"
    )
    meta = pdf.drop_duplicates(subset=["repo", "path"], keep="last")
    first = pdf.drop_duplicates(subset=["repo", "path"], keep="first")
    resets = first[first["op"].isin(["I", "D"])]
    out = pd.concat([last_cells, meta, resets], ignore_index=True).drop_duplicates(
        subset=["repo", "path", "cell"] + ORDER_COLS
    )
    return out[_FLAT_COLS]


def collapse_events_pandas(
    events: DataFrame,
    n_buckets: int = 64,
    hot_keys: list[tuple[str, str]] | None = None,
    hot_key_split: int = 8,
    hot_key_threshold: int = 0,
    broadcast_reset: bool = False,
) -> DataFrame:
    """North-rule path: salted-bucket repartition + grouped-map applyInPandas.

    ``n_buckets`` is the shuffle-group count: the md5-salt of the key
    (CHANGES.txt:102-104) decides the bucket, so hot *keys* spread across
    the hash space like every other key, and one executor task handles one
    bucket's worth of keys in a single Arrow batch.

    Hot-key two-stage collapse (the reference's salting story,
    CHANGES.txt:102-104, at sub-key granularity): a key whose surviving
    partial updates all share one bucket would otherwise have to fit a
    single Arrow batch. Keys in ``hot_keys`` are SUB-SALTED on
    pmod(xxhash64(order columns), hot_key_split); each (bucket, sub-salt)
    slice is partially collapsed first (_partial_collapse_flat), then the
    final per-bucket collapse merges the slice survivors — the classic
    partial/final aggregate shape, exact because per-(key,cell) LWW is
    order-max composable. ``hot_key_threshold`` > 0 self-detects hot keys
    with one count aggregate over the live events (an extra Spark action:
    cheap when ``events`` is a cached micro-batch — the streaming job's
    case — but a full recompute otherwise, so batch replay passes
    detection off and explicit ``hot_keys`` when known).
    """
    # column-prune BEFORE the shuffle + Arrow hop: only what the kernel reads
    # crosses the exchange and the JVM<->Python boundary ('before', gtid
    # strings, txn metadata never do)
    needed = ["repo", "path", "op", "after", "ts", "schema_version"] + ORDER_COLS
    pruned = events.select(*needed)
    # JVM-side pre-reduction: Python only ever sees events that can still
    # influence a final image (see live_events)
    live = live_events(pruned, broadcast_reset=broadcast_reset).drop("_ord")
    # flatten the image map JVM-side: Arrow then ships plain string columns
    # (no per-row python dict materialization — the map type is rebuilt only
    # for the collapsed output)
    flat = live.select(
        "repo", "path", "op", "ts", "schema_version", *ORDER_COLS,
        F.explode_outer("after").alias("cell", "value"),
    )
    bucketed = flat.withColumn("_bucket", salted_shuffle_key(n_buckets))

    if hot_keys is None and hot_key_threshold > 0:
        hot_keys = [
            (r["repo"], r["path"])
            for r in bucketed.groupBy("repo", "path")
            .count()
            .where(F.col("count") > hot_key_threshold)
            .collect()
        ]
    if hot_keys:
        hot_set = [f"{r}\x00{p}" for r, p in hot_keys]
        is_hot = F.concat_ws("\x00", F.col("repo"), F.col("path")).isin(hot_set)
        sub = F.pmod(
            F.xxhash64(*[F.col(c) for c in ORDER_COLS]), F.lit(hot_key_split)
        ).cast("int")
        partial = (
            bucketed.where(is_hot)
            .withColumn("_subsalt", sub)
            .groupBy("_bucket", "_subsalt")
            .applyInPandas(
                lambda pdf: _partial_collapse_flat(pdf.drop(columns=["_subsalt"])),
                FLAT_SCHEMA,
            )
        )
        bucketed = bucketed.where(~is_hot).unionByName(partial)

    return (
        bucketed.groupBy("_bucket")
        .applyInPandas(lambda pdf: _collapse_bucket_flat(pdf.drop(columns=["_bucket"])), COLLAPSED_SCHEMA)
    )


def collapse_events_sorted(
    events: DataFrame, n_buckets: int = 64, broadcast_reset: bool = False
) -> DataFrame:
    """Scale variant of the pandas path: one JVM shuffle on the salted
    bucket + Tungsten sortWithinPartitions((key, order)) + a STREAMING
    mapInPandas kernel.

    Unlike groupBy().applyInPandas — which re-sorts inside Python — the
    sort runs in whole-stage-codegen'd JVM code (spillable, radix-assisted),
    and Python does a single linear pass of vectorized drop_duplicates per
    Arrow batch with a small carry for keys spanning batch boundaries.
    """
    needed = ["repo", "path", "op", "after", "ts", "schema_version"] + ORDER_COLS
    live = live_events(
        events.select(*needed), broadcast_reset=broadcast_reset
    ).drop("_ord")
    flat = live.select(
        "repo", "path", "op", "ts", "schema_version", *ORDER_COLS,
        F.explode_outer("after").alias("cell", "value"),
    )
    arranged = (
        flat.repartition(n_buckets, salted_shuffle_key(n_buckets))
        .sortWithinPartitions("repo", "path", *ORDER_COLS)
    )

    def kernel(batches):
        carry: pd.DataFrame | None = None
        for pdf in batches:
            if carry is not None and len(carry):
                pdf = pd.concat([carry, pdf], ignore_index=True)
            if pdf.empty:
                continue
            # hold back the (possibly incomplete) trailing key
            last_repo = pdf["repo"].iloc[-1]
            last_path = pdf["path"].iloc[-1]
            tail_mask = (pdf["repo"] == last_repo) & (pdf["path"] == last_path)
            carry = pdf.loc[tail_mask]
            head = pdf.loc[~tail_mask]
            if len(head):
                yield _collapse_sorted_flat(head)
        if carry is not None and len(carry):
            yield _collapse_sorted_flat(carry)

    return arranged.mapInPandas(kernel, COLLAPSED_SCHEMA)


def _collapse_sorted_flat(pdf: pd.DataFrame) -> pd.DataFrame:
    """_collapse_bucket_flat minus the sort — input arrives (key, order)-
    sorted from the JVM."""
    cols = [f.name for f in COLLAPSED_SCHEMA.fields]
    meta = pdf.drop_duplicates(subset=["repo", "path"], keep="last")
    final_cells = pdf[pdf["cell"].notna()].drop_duplicates(
        subset=["repo", "path", "cell"], keep="last"
    )
    images: dict[tuple, dict] = {}
    for repo, path, cell, value in zip(
        final_cells["repo"].to_numpy(),
        final_cells["path"].to_numpy(),
        final_cells["cell"].to_numpy(),
        final_cells["value"].to_numpy(),
    ):
        images.setdefault((repo, path), {})[cell] = value
    out = {
        "repo": meta["repo"].to_numpy(),
        "path": meta["path"].to_numpy(),
        "row_status": meta["op"].to_numpy(),
        "image": [
            None if op == "D" else images.get((r, p), {})
            for r, p, op in zip(meta["repo"].to_numpy(), meta["path"].to_numpy(), meta["op"].to_numpy())
        ],
        "full_image": _full_image_flags(pdf, meta),
        "gtid_seq": meta["gtid_seq"].to_numpy(),
        "schema_version": meta["schema_version"].to_numpy(),
        "updated_ts": meta["ts"].to_numpy(),
    }
    return pd.DataFrame(out, columns=cols)


def collapse_events_sql(events: DataFrame, *, join_prefilter: bool = False) -> DataFrame:
    """Pure-Catalyst collapse: no Python, cell-level parallel LWW.

    Two physical shapes, bit-identical output (parity- and oracle-gated):

    ``join_prefilter=True`` — the BATCH regime shape: the per-key
    aggregate's reset bound is joined back against the raw events to drop
    dead (pre-reset) events BEFORE the cell explode. Under batch AQE the
    key-sized aggregate side becomes a broadcast, so the join costs no
    exchange of the raw stream and the explode + per-cell aggregate then
    run over the post-reset survivors only (a 2-10x row reduction on
    churny logs). This was the round-5 shape; round 6's aggregate-first
    rewrite cost the batch leg ~1.3x (BENCH_r06 4.80 s vs r5 3.85 s), so
    the regime split is now explicit instead of one-shape-fits-both.

    ``join_prefilter=False`` (default) — the STREAMING shape,
    AGGREGATE-FIRST — no operator ever exchanges raw events:

    1. per key: the last event + last reset (I or D) order key, one
       map-side-combinable ``max_by`` aggregate (shuffle carries ~keys);
    2. per (key, cell): the last write and its order key over ALL non-D
       events — also map-side combined (shuffle carries ~keys x cells).
       A cell is live iff its LAST write is at-or-after the key's last
       reset: any earlier write is superseded either by the reset or by
       the later write itself, so filtering the per-cell aggregate
       AGAINST the reset bound afterwards is exactly equivalent to
       pre-filtering events — but needs no join against the raw stream;
    3. join the two aggregate outputs (both ~key-sized) and reassemble
       the image with ``map_from_entries``.

    Inside a STREAMING micro-batch AQE is unavailable, so the
    join_prefilter shape would plan a full SortMergeJoin — a full-data
    exchange+sort per epoch that capped streaming N->4N efficiency at
    0.36 (BENCH/STREAM_SCALING_r6.md). The aggregate-first shape never
    materializes that exchange; the streaming sql escalation keeps it.
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

    if join_prefilter:
        # batch shape: drop dead events before the explode — AQE turns the
        # key-sized aggregate side into a broadcast, so the raw stream is
        # never exchanged for this join
        live_cells = (
            ev.join(last.select("repo", "path", "_last_reset"), ["repo", "path"])
            .where(
                F.col("_last_reset").isNull()
                | (F.col("_ord") >= F.col("_last_reset"))
            )
            .where(F.col("op") != "D")
            .select("repo", "path", "_ord", F.explode_outer("after").alias("k", "v"))
            .where(F.col("k").isNotNull())
            .groupBy("repo", "path", "k")
            .agg(F.max_by("v", F.col("_ord")).alias("v"))
        )
    else:
        cells = (
            ev.where(F.col("op") != "D")
            .select("repo", "path", "_ord", F.explode_outer("after").alias("k", "v"))
            .where(F.col("k").isNotNull())
            .groupBy("repo", "path", "k")
            .agg(
                F.max_by("v", F.col("_ord")).alias("v"),
                F.max(F.col("_ord")).alias("_cell_ord"),
            )
        )
        # a cell is live iff its LAST write is at-or-after the key's last
        # reset (any earlier write is superseded either way), so filtering
        # the per-cell aggregate against the reset bound is exact
        live_cells = (
            cells.join(last.select("repo", "path", "_last_reset"), ["repo", "path"])
            .where(
                F.col("_last_reset").isNull()
                | (F.col("_cell_ord") >= F.col("_last_reset"))
            )
        )

    images = live_cells.groupBy("repo", "path").agg(
        F.map_from_entries(F.collect_list(F.struct("k", "v"))).alias("image")
    )

    return (
        last.join(images, ["repo", "path"], "left")
        .select(
            "repo",
            "path",
            F.col("_last.op").alias("row_status"),
            # a live key with NO surviving cells (e.g. an INSERT carrying an
            # empty post-image) is an EMPTY map, not NULL — only deletes are
            # NULL (kernel-equality invariant with the pandas kernels)
            F.when(
                F.col("_last.op") == "D", F.lit(None).cast("map<string,string>")
            ).otherwise(
                F.coalesce(
                    F.col("image"),
                    F.map_from_arrays(
                        F.array().cast("array<string>"), F.array().cast("array<string>")
                    ),
                )
            ).alias("image"),
            # a surviving I/D means the image is the FULL post-reset row
            # state: the sink replaces instead of cell-merging
            F.col("_last_reset").isNotNull().alias("full_image"),
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
    from mysql_time_machine_spark.functions.core import materialize_cell

    cols = [F.col("repo"), F.col("path")]
    for name, typ in business_columns:
        cols.append(materialize_cell("image", name, typ))
    cols += [
        F.col("row_status"),
        F.col("gtid_seq"),
        F.col("schema_version"),
        F.col("updated_ts"),
    ]
    return collapsed.select(*cols)
