"""Deduplication operators for training-data pipelines.

Five strategies, cheapest-first — the standard web-corpus dedup ladder:

1. ``exact_dedup``          — hash-groupBy on the raw text
2. ``fingerprint_dedup``    — hash-groupBy on the canonicalized token stream
3. ``ngram_jaccard_pairs``  — blocked pairwise n-gram Jaccard (near-dup)
4. ``minhash_lsh_pairs``    — MinHash + banded LSH (near-dup at scale)
5. ``simhash_pairs``        — SimHash fingerprints + Hamming distance
6. ``embedding_dup_pairs``  — cosine near-dup over an embedding column

Scale notes (the part that matters at 100 TB):
- 1/2 are single-shuffle groupBys with map-side partial aggregation.
- 3 never goes quadratic: the self-join is blocked on (lang, length
  bucket) so candidate pairs stay bounded per block.
- 4 is the linear-time path: K minhashes per doc (one projection), bands
  of R hashes bucket-join candidates; only bucket collisions are verified.
  Hash fn is md5(seed || shingle) so the DuckDB oracle can reproduce it
  bit-for-bit (xxhash64 would be faster but is not portable to the gate).
- 5 compresses each doc to one 60-bit integer; near-dup = small Hamming
  distance, verified with bit_count(xor) — both Spark and DuckDB builtins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mysql_time_machine_spark.functions.similarity import cosine
from mysql_time_machine_spark.functions.text import fingerprint, tokens

# ---------------------------------------------------------------------------
# 1 + 2: exact & canonicalized
# ---------------------------------------------------------------------------


def exact_dedup(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """One row per distinct text: canonical (min) id + duplicate count."""
    return (
        docs.groupBy(F.md5(F.col(text_col)).alias("text_md5"))
        .agg(F.min(id_col).alias("canonical_id"), F.count("*").alias("n_copies"))
    )


def fingerprint_dedup(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Near-exact: identical after lowercase/punct/whitespace canon."""
    return (
        docs.groupBy(fingerprint(F.col(text_col)).alias("fp"))
        .agg(F.min(id_col).alias("canonical_id"), F.count("*").alias("n_copies"))
    )


# ---------------------------------------------------------------------------
# 3: blocked pairwise n-gram Jaccard
# ---------------------------------------------------------------------------


def word_shingles(text_col: str, n: int = 3) -> F.Column:
    """Distinct word n-grams (joined with single spaces)."""
    t = tokens(F.col(text_col))
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(t) - n, F.lit(0))),
        lambda i: F.array_join(F.slice(t, i + 1, n), " "),
    )
    return F.when(F.size(t) >= n, F.array_distinct(grams)).otherwise(
        F.array(F.array_join(t, " "))
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    threshold: float = 0.6,
    n: int = 3,
    length_bucket: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
    block_cols: tuple[str, ...] = ("lang",),
) -> DataFrame:
    """Candidate near-dup pairs (a_id < b_id) with their Jaccard similarity.

    Blocking: same block_cols + same-or-adjacent length bucket. The
    quadratic blow-up is bounded per block; at corpus scale you shrink
    ``length_bucket`` / add block columns rather than widen the join.
    """
    base = docs.select(
        F.col(id_col).alias("id"),
        *[F.col(c) for c in block_cols],
        word_shingles(text_col, n).alias("sh"),
        F.floor(F.length(text_col) / length_bucket).alias("lb"),
    )
    a = base.select(
        F.col("id").alias("a_id"), *[F.col(c).alias(f"a_{c}") for c in block_cols],
        F.col("sh").alias("a_sh"), F.col("lb").alias("a_lb"),
    )
    b = base.select(
        F.col("id").alias("b_id"), *[F.col(c).alias(f"b_{c}") for c in block_cols],
        F.col("sh").alias("b_sh"), F.col("lb").alias("b_lb"),
    )
    cond = (F.col("a_id") < F.col("b_id")) & (F.abs(F.col("a_lb") - F.col("b_lb")) <= 1)
    for c in block_cols:
        cond = cond & (F.col(f"a_{c}") == F.col(f"b_{c}"))
    inter = F.size(F.array_intersect("a_sh", "b_sh"))
    union = F.size(F.array_union("a_sh", "b_sh"))
    return (
        a.join(b, cond)
        .select(
            "a_id", "b_id",
            (inter / F.greatest(union, F.lit(1))).cast("double").alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


# ---------------------------------------------------------------------------
# 4: MinHash + banded LSH
# ---------------------------------------------------------------------------


def minhash_signature(text_col: str, n_hashes: int = 16, n: int = 3) -> F.Column:
    """K minhashes: min over shingles of md5(k || ':' || md5(shingle)).

    The inner md5 runs ONCE per shingle; the K outer hashes then digest a
    fixed 32-char string instead of re-hashing arbitrarily long shingles K
    times — ~K-fold less hashing on long documents. Portable (md5-only) so
    the DuckDB oracle reproduces signatures exactly."""
    base = F.transform(word_shingles(text_col, n), lambda s: F.md5(s))
    return F.array(
        *[
            F.array_min(F.transform(base, lambda m: F.md5(F.concat(F.lit(f"{k}:"), m))))
            for k in range(n_hashes)
        ]
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    n_hashes: int = 16,
    bands: int = 4,
    threshold: float = 0.5,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Near-dup pairs via banded LSH, verified with true shingle Jaccard.

    rows-per-band R = n_hashes/bands; collision prob ≈ 1-(1-j^R)^bands.
    Candidates come from an equi-join on (band, band-hash) — a plain
    shuffle join, no quadratic scan anywhere.
    """
    rows_per_band = n_hashes // bands
    # materialize shingles ONCE; the k hash passes then transform the
    # md5-digest array (short fixed-width strings), never the raw text —
    # without this projection boundary Catalyst re-derives the shingle
    # array for every consumer (no CSE across array HOFs)
    sh_df = docs.select(F.col(id_col).alias("id"), word_shingles(text_col, n).alias("sh"))
    shm_df = sh_df.select("id", "sh", F.transform("sh", lambda s: F.md5(s)).alias("shm"))
    sig = shm_df.select(
        "id",
        "sh",
        F.array(
            *[
                F.array_min(F.transform("shm", lambda m: F.md5(F.concat(F.lit(f"{k}:"), m))))
                for k in range(n_hashes)
            ]
        ).alias("mh"),
    )
    sig.persist()
    # the banded join carries ONLY (id, band, bucket) — candidate discovery
    # shuffles ~bands rows per doc, never the shingle arrays; shingles are
    # re-attached afterwards for the (much smaller) verification join
    banded = sig.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bi).alias("band"),
                        F.md5(
                            F.array_join(
                                F.slice("mh", bi * rows_per_band + 1, rows_per_band), "|"
                            )
                        ).alias("bucket"),
                    )
                    for bi in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("id", "bb.band", "bb.bucket")
    cand = (
        banded.alias("a")
        .join(banded.alias("b"), ["band", "bucket"])
        .where(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("a_id"), F.col("b.id").alias("b_id"))
        .distinct()
    )
    sh_only = sig.select("id", "sh")
    verified = (
        cand.join(sh_only.select(F.col("id").alias("a_id"), F.col("sh").alias("a_sh")), "a_id")
        .join(sh_only.select(F.col("id").alias("b_id"), F.col("sh").alias("b_sh")), "b_id")
    )
    inter = F.size(F.array_intersect("a_sh", "b_sh"))
    union = F.size(F.array_union("a_sh", "b_sh"))
    return verified.select(
        "a_id", "b_id",
        (inter / F.greatest(union, F.lit(1))).cast("double").alias("jaccard"),
    ).where(F.col("jaccard") >= threshold)


# ---------------------------------------------------------------------------
# 5: SimHash
# ---------------------------------------------------------------------------

SIMHASH_BITS = 32  # md5-hex prefix parsed to a non-negative int32-ish value


def simhash(text_col: str) -> F.Column:
    """SimHash over word tokens: per-token md5 -> SIMHASH_BITS bits; each
    bit position accumulates +1/-1; fingerprint bit = sign. Pure SQL
    (portable to the DuckDB oracle)."""
    t = F.array_distinct(tokens(F.col(text_col)))
    th = F.transform(t, lambda x: F.conv(F.substring(F.md5(x), 1, 8), 16, 10).cast("long"))
    bit_exprs = []
    for bit in range(SIMHASH_BITS):
        votes = F.aggregate(
            th,
            F.lit(0),
            lambda acc, h: acc
            + F.when(F.shiftright(h, bit).bitwiseAND(F.lit(1)) == 1, F.lit(1)).otherwise(F.lit(-1)),
        )
        bit_exprs.append(F.when(votes > 0, F.lit(2**bit)).otherwise(F.lit(0)).cast("long"))
    out = bit_exprs[0]
    for e in bit_exprs[1:]:
        out = out + e
    return out


def simhash_pairs(
    docs: DataFrame,
    max_hamming: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    block_cols: tuple[str, ...] = ("lang",),
) -> DataFrame:
    """Near-dup pairs where hamming(simhash_a, simhash_b) <= max_hamming,
    blocked like ngram_jaccard_pairs to bound the join."""
    base = docs.select(
        F.col(id_col).alias("id"), *[F.col(c) for c in block_cols], simhash(text_col).alias("sh64")
    )
    a = base.select(F.col("id").alias("a_id"), *[F.col(c).alias(f"a_{c}") for c in block_cols], F.col("sh64").alias("a_h"))
    b = base.select(F.col("id").alias("b_id"), *[F.col(c).alias(f"b_{c}") for c in block_cols], F.col("sh64").alias("b_h"))
    cond = F.col("a_id") < F.col("b_id")
    for c in block_cols:
        cond = cond & (F.col(f"a_{c}") == F.col(f"b_{c}"))
    return (
        a.join(b, cond)
        .select(
            "a_id", "b_id",
            F.bit_count(F.col("a_h").bitwiseXOR(F.col("b_h"))).alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
    )


# ---------------------------------------------------------------------------
# 6: embedding cosine near-dup
# ---------------------------------------------------------------------------


def embedding_dup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_col: str | None = "label",
) -> DataFrame:
    """Pairs with cosine >= threshold. Blocked on ``block_col`` when given
    (at scale: LSH bucket or IVF centroid id); brute-force inside blocks."""
    a = embeddings.select(
        F.col(id_col).alias("a_id"), F.col(vec_col).alias("a_v"),
        *( [F.col(block_col).alias("blk")] if block_col else [] ),
    )
    b = embeddings.select(
        F.col(id_col).alias("b_id"), F.col(vec_col).alias("b_v"),
        *( [F.col(block_col).alias("blk")] if block_col else [] ),
    )
    cond = F.col("a_id") < F.col("b_id")
    join_on = ["blk"] if block_col else []
    j = a.join(b, join_on) if join_on else a.crossJoin(b)
    return (
        j.where(cond)
        .select("a_id", "b_id", cosine("a_v", "b_v").alias("cos"))
        .where(F.col("cos") >= threshold)
    )
