"""Sink interface (SURVEY.md §2.1 S5-S8).

The reference's applier layer is pluggable across HBase / Kafka / STDOUT
(/root/reference/README.md:18-20, CHANGES.txt:75,143); ours mirrors that:

* ``ManifestParquetSink`` — the default lake sink (HBase-applier analogue,
  with Iceberg-style snapshot commits).
* ``IcebergSink``        — real Iceberg MERGE INTO when the runtime jar is
  on the classpath (not present in this sandbox).
* ``ConsoleSink``        — STDOUT/JSON debug applier (CHANGES.txt:143).
* ``NoopSink``           — dry-run mode: full pipeline, no writes
  (CHANGES.txt:43).
"""

from __future__ import annotations

import abc
import re
from typing import Any

from pyspark.sql import DataFrame


def route_sink_root(base_root: str, table: str, rules: list[tuple[str, str]] | None, default: str = "default") -> str:
    """F3 namespace routing at sink-construction time: pick the namespace
    of ``table`` by the first matching (regex, namespace) rule and return
    ``<base_root>/<namespace>/<table>`` — the lake analogue of the
    reference's HBase namespace routing. The same rule set is expressible
    column-wise with functions.core.namespace_route."""
    ns = default
    for pattern, candidate in rules or []:
        if re.search(pattern, table):
            ns = candidate
            break
    return f"{base_root.rstrip('/')}/{ns}/{table}"


class Sink(abc.ABC):
    """One `merge` call per micro-batch/epoch; must be idempotent per epoch
    (exactly-once via fencing, CHANGES.txt:3-7,37)."""

    @abc.abstractmethod
    def merge(self, batch: DataFrame, epoch_id: int, lineage: dict[str, Any] | None = None, changelog: DataFrame | None = None) -> bool:
        """Apply a collapsed, materialized batch. Returns False if the epoch
        was fenced off (already committed)."""

    def close(self) -> None:  # pragma: no cover - default no-op
        pass


class ConsoleSink(Sink):
    def __init__(self, n: int = 20):
        self.n = n
        self.epochs: list[int] = []

    def merge(self, batch: DataFrame, epoch_id: int, lineage=None, changelog=None) -> bool:
        self.epochs.append(epoch_id)
        batch.show(self.n, truncate=40)
        return True


class NoopSink(Sink):
    """Dry-run: forces the plan (so metrics/observe fire) without writing."""

    def __init__(self):
        self.rows_seen = 0
        self.epochs: list[int] = []

    def merge(self, batch: DataFrame, epoch_id: int, lineage=None, changelog=None) -> bool:
        self.epochs.append(epoch_id)
        self.rows_seen += batch.count()
        return True
