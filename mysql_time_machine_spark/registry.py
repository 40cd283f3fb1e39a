"""Active-schema registry (SURVEY.md §1.1c, §2.4 J0).

The reference maintains a shadow "active schema" per MySQL schema and
replays DDL onto it so row events can be augmented with the column set
valid at their binlog position (/root/reference/CHANGES.txt:57
loadActiveSchema; :44-46 schema history persisted as a table alongside the
data). Ours is a versioned list `(schema_version, valid_from_gtid_seq,
ddl, columns)` persisted inside every sink manifest — schema history and
data share one atomic commit, as the reference required the history table
to live in the same namespace as its data.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mysql_time_machine_spark.schema import BASE_COLUMNS, REGISTRY_SCHEMA

_ADD_COLUMN_RE = re.compile(
    r"(?is)^\s*ALTER\s+TABLE\s+(\w+)\s+ADD\s+COLUMN\s+(\w+)\s+(.+?)\s*$"
)
_DROP_COLUMN_RE = re.compile(r"(?is)^\s*ALTER\s+TABLE\s+(\w+)\s+DROP\s+COLUMN\s+(\w+)")
_ENUM_RE = re.compile(r"(?is)enum\s*\((.*?)\)")
_LATIN1_RE = re.compile(r"(?i)(character\s+set|charset)\s+latin1")

_TYPE_MAP = {
    "string": "string", "varchar": "string", "text": "string", "char": "string",
    "long": "long", "bigint": "long", "int": "int", "integer": "int",
    "timestamp": "timestamp", "datetime": "timestamp", "double": "double",
    "float": "double", "enum": "string",
    # fractional-second TIME: canonicalized by functions.core.time2_canonical
    "time": "time2", "time2": "time2",
}


def parse_enum_labels(column_definition: str) -> list[str] | None:
    """ENUM labels are regex-parsed from the column *definition*, exactly
    the reference's approach (CHANGES.txt:182)."""
    m = _ENUM_RE.search(column_definition)
    if not m:
        return None
    return [p.strip().strip("'\"") for p in m.group(1).split(",")]


def parse_column_type(column_definition: str) -> str:
    """Column DEFINITION (everything after the name) -> engine type string.
    ENUM label lists are folded into the type ('enum(a|b|c)') so the
    as-of schema alone is enough to decode values (CHANGES.txt:182);
    latin1-charset columns decode through the P2 path (CHANGES.txt:160);
    TIME/TIME(fsp) through the TIME2 canonicalizer (CHANGES.txt:183)."""
    labels = parse_enum_labels(column_definition)
    if labels:
        return "enum(" + "|".join(labels) + ")"
    if _LATIN1_RE.search(column_definition):
        return "latin1"
    m = re.match(r"\s*(\w+)", column_definition)
    base = m.group(1).lower() if m else "string"
    return _TYPE_MAP.get(base, "string")


@dataclass
class SchemaRegistry:
    versions: list[dict] = field(default_factory=list)

    @classmethod
    def initial(cls) -> "SchemaRegistry":
        return cls(
            versions=[
                {
                    "schema_version": 1,
                    "valid_from_gtid_seq": 0,
                    "ddl": None,
                    "columns": [list(c) for c in BASE_COLUMNS],
                }
            ]
        )

    @classmethod
    def from_manifest(cls, registry_field: list[dict]) -> "SchemaRegistry":
        return cls(versions=list(registry_field)) if registry_field else cls.initial()

    # -- DDL application (driver-side control flow, tiny) --------------------
    def apply_ddl(self, ddl: str, gtid_seq: int) -> bool:
        """Replay one DDL statement onto the active schema. Idempotent:
        re-applying an already-recorded (ddl, gtid) is a no-op — required
        because a crashed epoch replays its DDL events."""
        for v in self.versions:
            if v["ddl"] == ddl and v["valid_from_gtid_seq"] == gtid_seq:
                return False
        cur = [list(c) for c in self.versions[-1]["columns"]]
        m = _ADD_COLUMN_RE.match(ddl)
        if m:
            _tbl, name, defn = m.groups()
            if any(c[0] == name for c in cur):
                return False
            cur.append([name, parse_column_type(defn)])
        else:
            m2 = _DROP_COLUMN_RE.match(ddl)
            if m2:
                _tbl, name = m2.groups()
                cur = [c for c in cur if c[0] != name]
            else:
                return False  # non-structural DDL (comments, traps): ignored
        self.versions.append(
            {
                "schema_version": self.versions[-1]["schema_version"] + 1,
                "valid_from_gtid_seq": int(gtid_seq),
                "ddl": ddl,
                "columns": cur,
            }
        )
        return True

    # -- queries --------------------------------------------------------------
    @property
    def current_columns(self) -> list[tuple[str, str]]:
        return [tuple(c) for c in self.versions[-1]["columns"]]

    @property
    def current_version(self) -> int:
        return self.versions[-1]["schema_version"]

    def columns_at(self, gtid_seq: int) -> list[tuple[str, str]]:
        """As-of resolution: latest version with valid_from <= gtid (W2)."""
        best = self.versions[0]
        for v in self.versions:
            if v["valid_from_gtid_seq"] <= gtid_seq:
                best = v
        return [tuple(c) for c in best["columns"]]

    def to_df(self, spark: SparkSession) -> DataFrame:
        rows = [
            (
                v["schema_version"],
                v["valid_from_gtid_seq"],
                v["ddl"],
                [(c[0], c[1], None) for c in v["columns"]],
            )
            for v in self.versions
        ]
        return spark.createDataFrame(rows, REGISTRY_SCHEMA)


def stamp_schema_version(
    events: DataFrame, registry: "SchemaRegistry", case_fold_max: int = 100
) -> DataFrame:
    """As-of resolution of J0: stamp each event with the schema version
    valid at its position — latest version with valid_from <= gtid_seq.

    The registry is tiny (it IS the broadcast side of the reference's
    schema-augmentation join), so up to ``case_fold_max`` versions it is
    folded into a single Catalyst CASE expression: zero shuffle, zero
    Python, fully codegen'd — the degenerate-but-optimal form of a
    broadcast as-of join.

    DDL-heavy histories (thousands of ALTERs) would make that expression
    tree defeat codegen (the 64 KB JVM method limit drops the whole stage
    to interpreted mode), so above the threshold the SAME semantics run as
    a broadcast RANGE join: the version table becomes half-open intervals
    [valid_from, next_valid_from) and each event left-joins the one
    interval containing its gtid_seq. Still zero shuffle (broadcast
    nested-loop), plan size constant in the version count, per-row cost
    bounded by V on the tiny broadcast side. Both paths resolve a NULL
    gtid_seq to NULL and are pairwise-equivalent by test.
    """
    if len(registry.versions) <= case_fold_max:
        # ascending fold: each later version wraps the chain, so the
        # HIGHEST matching version is the outermost WHEN and takes
        # precedence
        expr = F.lit(None).cast("int")
        for v in registry.versions:
            expr = F.when(
                F.col("gtid_seq") >= F.lit(v["valid_from_gtid_seq"]),
                F.lit(v["schema_version"]),
            ).otherwise(expr)
        return events.withColumn("resolved_schema_version", expr)

    # CASE-fold semantics as intervals: version i wins gtid g iff
    # vf_i <= g AND g < min(vf_j for every LATER list entry j) — the
    # SUFFIX minimum, not just the next entry, so the intervals are
    # disjoint (at most one match per event: no row duplication) even if
    # the version list is not ascending in valid_from. A version
    # superseded at the same gtid (two DDLs in one transaction) gets an
    # empty interval and can never match — the later-wins rule.
    vs = registry.versions
    suffix_min: list[int | None] = [None] * len(vs)
    running: int | None = None
    for i in range(len(vs) - 1, 0, -1):
        vf = int(vs[i]["valid_from_gtid_seq"])
        running = vf if running is None else min(running, vf)
        suffix_min[i - 1] = running
    rows = [
        (int(v["schema_version"]), int(v["valid_from_gtid_seq"]), suffix_min[i])
        for i, v in enumerate(vs)
    ]
    vdf = events.sparkSession.createDataFrame(
        rows, "resolved_schema_version int, _vf long, _nvf long"
    )
    cond = (F.col("gtid_seq") >= F.col("_vf")) & (
        F.col("_nvf").isNull() | (F.col("gtid_seq") < F.col("_nvf"))
    )
    return events.join(F.broadcast(vdf), cond, "left").drop("_vf", "_nvf")
