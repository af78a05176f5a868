"""Text-analysis operators for large-scale training-data pipelines.

All hot-path expressions are Catalyst built-ins (regexp, array lambdas,
integer arithmetic) — no Python in the data path, so whole-stage codegen
applies and the operators scale linearly with input splits.  Each has an
exact SQL twin used by the DuckDB oracle (same arithmetic, same hash).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .hashing import P, hash_mod_p_expr, sql_hash_mod_p

# language -> stopword list (order = argmax tie-break priority)
LANG_STOPWORDS: list[tuple[str, tuple[str, ...]]] = [
    ("en", ("the", "a", "and", "of", "to", "in", "is")),
    ("es", ("el", "la", "de", "que", "y", "en", "un")),
    ("de", ("der", "die", "das", "und", "ist", "von", "ein")),
    ("fr", ("le", "la", "les", "et", "de", "un", "est")),
]

PUNCT_RE = r"[.,;:!?]"
TOKEN_RE = r"\S+"


def tokens_expr(text: Column) -> Column:
    """Whitespace tokens (regexp '\\S+' — matches the oracle exactly,
    including leading/trailing whitespace edge cases)."""
    return F.regexp_extract_all(text, F.lit(TOKEN_RE), 0)


def token_count_expr(text: Column) -> Column:
    return F.size(tokens_expr(text)).cast("long")


def stopword_hits_expr(toks: Column, words: tuple[str, ...]) -> Column:
    """Number of tokens that are stopwords (multiset count)."""
    return F.size(F.filter(toks, lambda t: t.isin(*words))).cast("long")


def lang_id_expr(toks: Column) -> Column:
    """Argmax of per-language stopword hit counts, first-listed wins ties;
    'und' (undetermined) when no stopwords hit at all."""
    hits = [stopword_hits_expr(toks, words) for _, words in LANG_STOPWORDS]
    total = hits[0]
    for h in hits[1:]:
        total = total + h
    expr = F.lit(LANG_STOPWORDS[-1][0])
    # fold back-to-front so earlier languages win ties
    for i in range(len(LANG_STOPWORDS) - 2, -1, -1):
        rest = hits[i + 1 :]
        best_rest = F.greatest(*rest) if len(rest) > 1 else rest[0]
        expr = F.when(hits[i] >= best_rest, F.lit(LANG_STOPWORDS[i][0])).otherwise(
            expr
        )
    return F.when(total == 0, F.lit("und")).otherwise(expr)


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document quality metrics, all integer/IEEE-deterministic."""
    text = F.col(text_col)
    toks = tokens_expr(text)
    n_tok = F.size(toks).cast("long")
    sum_tok_len = F.aggregate(
        toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)
    )
    n_punct = F.size(F.regexp_extract_all(text, F.lit(PUNCT_RE), 0)).cast("long")
    en_hits = stopword_hits_expr(toks, LANG_STOPWORDS[0][1])
    return df.withColumns(
        {
            "n_chars_calc": F.length(text).cast("long"),
            "n_tokens": n_tok,
            "avg_token_len": F.when(
                n_tok > 0, sum_tok_len.cast("double") / n_tok.cast("double")
            ).otherwise(F.lit(0.0)),
            "punct_count": n_punct,
            "stopword_ratio": F.when(
                n_tok > 0, en_hits.cast("double") / n_tok.cast("double")
            ).otherwise(F.lit(0.0)),
        }
    )


def fingerprint_expr(toks: Column) -> Column:
    """Position-weighted rolling fingerprint:
    ``sum_i (H(tok_i) * i) mod P`` (i is 1-based).

    Order-sensitive (reordering tokens changes the value) yet computed with
    exact integer arithmetic, so any partitioning gives the same result.
    """
    weighted = F.transform(
        toks, lambda t, i: hash_mod_p_expr(t) * (i + F.lit(1))  # 0-based -> 1-based
    )
    total = F.aggregate(weighted, F.lit(0).cast("long"), lambda acc, v: acc + v)
    return (total % F.lit(P)).cast("long")


# -- SQL twins ---------------------------------------------------------------


def sql_tokens(text_expr: str) -> str:
    return f"regexp_extract_all({text_expr}, '\\S+')"


def sql_stopword_hits(toks_expr: str, words: tuple[str, ...]) -> str:
    inlist = ", ".join(f"'{w}'" for w in words)
    return f"len(list_filter({toks_expr}, t -> t IN ({inlist})))"


def sql_lang_id(toks_expr: str) -> str:
    hits = [sql_stopword_hits(toks_expr, w) for _, w in LANG_STOPWORDS]
    total = " + ".join(hits)
    expr = f"'{LANG_STOPWORDS[-1][0]}'"
    for i in range(len(LANG_STOPWORDS) - 2, -1, -1):
        rest = hits[i + 1 :]
        best_rest = f"greatest({', '.join(rest)})" if len(rest) > 1 else rest[0]
        expr = (
            f"CASE WHEN {hits[i]} >= {best_rest} THEN "
            f"'{LANG_STOPWORDS[i][0]}' ELSE {expr} END"
        )
    return f"CASE WHEN ({total}) = 0 THEN 'und' ELSE {expr} END"


def sql_fingerprint(toks_expr: str) -> str:
    return (
        f"CAST(list_sum(list_transform({toks_expr}, "
        f"(t, i) -> {sql_hash_mod_p('t')} * i)) % {P} AS BIGINT)"
    )


# -- BPE-ish subword counting ------------------------------------------------

# GPT-2-style pre-tokenizer approximation, engine-portable (Java regex and
# RE2 agree on this subset): letter runs, single digits, single symbols.
BPE_RE = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"


def bpe_token_count_expr(text: Column) -> Column:
    """Subword-ish token count (the cost estimator for LLM training data)."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_RE), 0)).cast("long")


def sql_bpe_token_count(text_expr: str) -> str:
    return (
        f"CAST(len(regexp_extract_all({text_expr}, "
        f"'[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]')) AS BIGINT)"
    )
