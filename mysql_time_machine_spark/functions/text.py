"""Text-analysis functions for training-data pipelines.

All pure Catalyst column expressions (JVM-side, codegen'd) so they run at
100-TB scan speed — no Python in the hot path. Each has an exact ANSI-SQL
twin in ``__spark_entry__.oracle_sql`` for the DuckDB correctness gate.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# small, deterministic stopword sets per language (shared verbatim with the
# SQL oracles — keep sorted, lowercase)
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "for", "with", "as"],
    "de": ["der", "die", "das", "und", "ist", "von", "mit", "auf", "ein", "zu"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "es", "por", "con"],
    "fr": ["le", "la", "de", "et", "les", "des", "est", "un", "une", "dans"],
}

#: word tokenizer shared by all text ops: lowercase, split on non-word runs
TOKEN_SPLIT_RE = r"[^a-z0-9]+"


def tokens(col: Column | str) -> Column:
    """Lowercased word tokens; empty strings filtered."""
    col = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(F.lower(col), TOKEN_SPLIT_RE), lambda t: t != "")


def token_count(col: Column | str) -> Column:
    """Whitespace-word token count (the cheap pre-BPE length signal)."""
    return F.size(tokens(col))


def bpe_ish_token_count(col: Column | str) -> Column:
    """BPE-ish upper bound: words + standalone punctuation both count —
    approximates subword token budgets for training-data sizing."""
    col = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(F.lower(col), F.lit(r"([a-z0-9]+|[^a-z0-9\s])"), 1))


def stopword_ratio(col: Column | str, lang: str = "en") -> Column:
    """fraction of tokens that are (lang) stopwords — a fluency signal."""
    t = tokens(col)
    sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    hits = F.size(F.filter(t, lambda x: F.array_contains(sw, x)))
    return (hits / F.greatest(F.size(t), F.lit(1))).cast("double")


def punct_ratio(col: Column | str) -> Column:
    col = F.col(col) if isinstance(col, str) else col
    punct = F.length(F.regexp_replace(col, r"[^.,;:!?'\"()\[\]{}]", ""))
    return (punct / F.greatest(F.length(col), F.lit(1))).cast("double")


def quality_score(col: Column | str, lang: str = "en") -> Column:
    """Composite [0,1] quality heuristic: length band + stopword presence +
    moderate punctuation. Deterministic and SQL-mirrorable; replace the
    weights per-corpus."""
    col_ = F.col(col) if isinstance(col, str) else col
    n = token_count(col_)
    len_band = F.when((n >= 10) & (n <= 5000), F.lit(1.0)).otherwise(F.lit(0.3))
    sw = stopword_ratio(col_, lang)
    sw_band = F.when((sw >= 0.05) & (sw <= 0.6), F.lit(1.0)).otherwise(F.lit(0.4))
    pr = punct_ratio(col_)
    punct_band = F.when(pr <= 0.2, F.lit(1.0)).otherwise(F.lit(0.5))
    return ((len_band * 0.4) + (sw_band * 0.4) + (punct_band * 0.2)).cast("double")


def lang_id(col: Column | str) -> Column:
    """Heuristic language ID: argmax stopword-hit count across the known
    sets; 'und' (undetermined) when nothing hits. N-gram-free but the same
    shape as real fasttext-style scoring — swap the scorer, keep the plan."""
    t = tokens(col)
    scores = []
    for lang, words in STOPWORDS.items():
        sw = F.array(*[F.lit(w) for w in words])
        scores.append((lang, F.size(F.filter(t, lambda x: F.array_contains(sw, x)))))
    best = F.greatest(*[s for _, s in scores])
    expr = F.lit("und")
    # deterministic tie-break: first language (dict order) with the max score
    for lang, s in reversed(scores):
        expr = F.when((best > 0) & (s == best), F.lit(lang)).otherwise(expr)
    return expr


def fingerprint(col: Column | str) -> Column:
    """Document fingerprint: md5 over the canonicalized token stream
    (lowercase, punctuation-free, single-space). Near-identical docs that
    differ only in spacing/punct collide — the cheap first-pass dedup key."""
    col = F.col(col) if isinstance(col, str) else col
    return F.md5(F.array_join(tokens(col), " "))
