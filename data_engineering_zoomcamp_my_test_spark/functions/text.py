"""Text-analysis column expressions (LLM-data-pipeline primitives).

All JVM-side built-ins (split / regexp / higher-order array functions) — no
Python UDFs in these hot paths, so they stay inside whole-stage codegen and
scale linearly with executors.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Small English function-word list used by the language-ID heuristic and the
# quality score. Kept tiny and fixed so the same list can be inlined into
# oracle SQL.
ENGLISH_STOPWORDS: tuple[str, ...] = (
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "for", "on", "with", "as", "at", "by", "be", "this", "that", "are",
)

# BPE-ish tokenizer: runs of letters, runs of digits, or single
# non-alphanumeric-non-space characters. Same regex works in Spark and
# DuckDB (RE2/PCRE common subset).
TOKEN_REGEX = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"


def tokens(col: Column | str, sep: str = " ") -> Column:
    """Whitespace tokens of a text column."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(c, sep)


def token_count(col: Column | str) -> Column:
    """Whitespace token count."""
    return F.size(tokens(col))


def regex_token_count(col: Column | str) -> Column:
    """BPE-ish token count via regexp_extract_all."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(TOKEN_REGEX), 0))


def normalized_text(col: Column | str) -> Column:
    """Canonical text form for near-dup detection: lowercase, strip
    non-alphanumerics, collapse whitespace."""
    c = F.col(col) if isinstance(col, str) else col
    c = F.lower(c)
    c = F.regexp_replace(c, "[^a-z0-9 ]", "")
    c = F.regexp_replace(c, " +", " ")
    return F.trim(c)


def english_stopword_hits(col: Column | str) -> Column:
    """Number of whitespace tokens that are English function words —
    the language-ID signal. Higher-order ``filter`` keeps it JVM-side."""
    quoted = ", ".join(f"'{w}'" for w in ENGLISH_STOPWORDS)
    name = col if isinstance(col, str) else None
    if name is None:
        raise ValueError("english_stopword_hits requires a column name")
    return F.expr(f"size(filter(split({name}, ' '), t -> t in ({quoted})))")


def quality_score_cols(text_col: str, n_chars_col: str) -> dict[str, Column]:
    """Document quality-signal columns: length, token stats, stopword ratio,
    a composite score. Pure arithmetic over JVM-side primitives, so the same
    formulas are expressible in oracle SQL."""
    ntok = token_count(text_col).cast("double")
    hits = english_stopword_hits(text_col).cast("double")
    nchars = F.col(n_chars_col).cast("double")
    avg_word_len = nchars / ntok
    stop_ratio = hits / ntok
    return {
        "n_tokens": token_count(text_col),
        "stopword_ratio": stop_ratio,
        "avg_word_len": avg_word_len,
        "quality_score": stop_ratio * F.lit(0.5)
        + (F.lit(1.0) / (F.lit(1.0) + F.abs(avg_word_len - F.lit(5.0)))) * F.lit(0.5),
    }
