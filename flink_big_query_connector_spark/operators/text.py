"""Text-analysis operators for large-scale training-data pipelines.

All hot-path expressions are Catalyst built-ins (regexp, array lambdas,
integer arithmetic) — no Python in the data path, so whole-stage codegen
applies and the operators scale linearly with input splits.  Each has an
exact SQL twin used by the DuckDB oracle (same arithmetic, same hash).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.numeric import round6_ratio_expr
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
    including leading/trailing whitespace edge cases).  NULL text tokens
    to the EMPTY list, not NULL: Spark's legacy ``size(NULL) = -1`` would
    otherwise leak -1 token counts (and NULL scores) into downstream
    arithmetic while the DuckDB twin yields NULL — the sql_tokens twin
    coalesces identically, so both engines agree on dirty data."""
    return F.regexp_extract_all(
        F.coalesce(text, F.lit("")), F.lit(TOKEN_RE), 0
    )


def token_count_expr(text: Column) -> Column:
    return F.size(tokens_expr(text)).cast("long")


def punct_count_expr(text: Column) -> Column:
    """Punctuation-mark count; NULL text counts 0 (null-safe twin of
    ``sql_punct_count``)."""
    return F.size(
        F.regexp_extract_all(
            F.coalesce(text, F.lit("")), F.lit(PUNCT_RE), 0
        )
    ).cast("long")


def sql_punct_count(text_expr: str) -> str:
    return (
        f"CAST(len(regexp_extract_all(COALESCE({text_expr}, ''), "
        f"'[.,;:!?]')) AS BIGINT)"
    )


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
    n_punct = punct_count_expr(text)
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
    return f"regexp_extract_all(COALESCE({text_expr}, ''), '\\S+')"


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
    """DuckDB twin of :func:`fingerprint_expr`.  ``list_sum([])`` is NULL
    in DuckDB while the Spark fold's init value makes an empty document
    sum to 0 — coalesce so BOTH engines fingerprint empty/NULL text as
    0 (caught by the NULL-injection sweep, tests/test_robustness.py)."""
    return (
        f"CAST(COALESCE(list_sum(list_transform({toks_expr}, "
        f"(t, i) -> {sql_hash_mod_p('t')} * i)), 0) % {P} AS BIGINT)"
    )


# -- BPE-ish subword counting ------------------------------------------------

# GPT-2-style pre-tokenizer approximation, engine-portable (Java regex and
# RE2 agree on this subset): letter runs, single digits, single symbols.
BPE_RE = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"


def bpe_token_count_expr(text: Column) -> Column:
    """Subword-ish token count (the cost estimator for LLM training data).
    Null-safe: NULL text counts 0 tokens in both engines."""
    return F.size(
        F.regexp_extract_all(
            F.coalesce(text, F.lit("")), F.lit(BPE_RE), 0
        )
    ).cast("long")


def sql_bpe_token_count(text_expr: str) -> str:
    return (
        f"CAST(len(regexp_extract_all(COALESCE({text_expr}, ''), "
        f"'[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]')) AS BIGINT)"
    )


# -- Repetition features (corpus boilerplate detection) ----------------------


def repetition_features(df: DataFrame, id_col: str = "doc_id",
                        text_col: str = "text") -> DataFrame:
    """Per-document repetition signals used by corpus quality filters
    (duplicate-content heuristics over words and word 2-grams):

    - ``distinct_ratio``     distinct tokens / tokens (low = repetitive)
    - ``top_word_frac``      occurrences of the most frequent token / tokens
    - ``top_bigram_frac``    occurrences of the most frequent 2-gram / 2-grams

    Scale shape: explode -> two-level aggregation.  The shuffle carries
    (doc_id, token) pairs — corpus-linear — and both aggregation levels
    have map-side partial combine; no per-document state exceeds a few
    counters.  A single-pass array-lambda version would avoid the shuffle
    but does O(n^2) comparisons per row; explode+groupBy is the form that
    survives books-sized documents.
    """
    toks = tokens_expr(F.col(text_col))
    base = df.select(F.col(id_col), toks.alias("toks")).filter(F.size("toks") > 0)
    words = base.select(id_col, F.explode("toks").alias("w"))
    word_stats = (
        words.groupBy(id_col, "w")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy(id_col)
        .agg(
            F.sum("c").alias("n_tokens"),
            F.count(F.lit(1)).alias("n_distinct"),
            F.max("c").alias("top_word_c"),
        )
    )
    # size >= 2 guard matters: sequence(0, -1) would count DOWN and index 0
    # into the array (1-token docs crash without it)
    bigrams = base.filter(F.size("toks") >= 2).select(
        F.col(id_col),
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.size("toks") - 2),
                lambda i: F.concat_ws(" ", F.element_at(F.col("toks"), i + 1),
                                      F.element_at(F.col("toks"), i + 2)),
            )
        ).alias("bg"),
    )
    bigram_stats = (
        bigrams.groupBy(id_col, "bg")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy(id_col)
        .agg(F.sum("c").alias("n_bigrams"), F.max("c").alias("top_bigram_c"))
    )
    return (
        word_stats.join(bigram_stats, id_col, "left")
        .select(
            F.col(id_col),
            F.col("n_tokens").cast("long").alias("n_tokens"),
            (F.col("n_distinct").cast("double") / F.col("n_tokens"))
            .alias("distinct_ratio"),
            (F.col("top_word_c").cast("double") / F.col("n_tokens"))
            .alias("top_word_frac"),
            F.when(
                F.col("n_bigrams").isNull() | (F.col("n_bigrams") == 0), 0.0
            )
            .otherwise(
                F.col("top_bigram_c").cast("double") / F.col("n_bigrams")
            )
            .alias("top_bigram_frac"),
        )
    )


# -- PII scrubbing -----------------------------------------------------------

# Engine-portable patterns (Java regex and RE2 agree on this subset).
PII_PATTERNS: tuple[tuple[str, str], ...] = (
    # email addresses
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    # long digit runs (ids, account / phone numbers)
    (r"[0-9]{4,}", "<NUM>"),
)


def dup_ngram_coverage(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 5
) -> DataFrame:
    """Gopher-style duplicate-n-gram CHARACTER coverage per document
    (Rae et al. 2021 repetition filters): the fraction of token
    characters lying inside at least one word n-gram that occurs >= 2
    times WITHIN the document.  Coverage, not occurrence counting — a
    character under three overlapping duplicate grams counts once — so
    the metric is the share of the document a deduplicator could blame
    on internal repetition, directly comparable across documents.

    Relational plan (the spans-family explode shape, NOT nested
    higher-order lambdas — Catalyst's projection collapse re-inlines
    shared array subexpressions, turning a per-row O(grams^2) duplicate
    test into O(positions x grams^2) recomputation): token positions
    and gram starts explode once, duplicate grams fall out of one
    (doc, gram) hash aggregate, the coverage union is a distinct over
    exploded [i, i+n-1] ranges, and character sums join back on
    (doc, position).  Every stage is a linear hash shuffle keyed by
    doc/gram — the llm_dedup_spans scale shape.  Integer character
    counts cross engines exactly; the fraction rounds to 6dp (0.0 for
    token-less docs — the CASE guard both engines share)."""
    toks_df = df.select(
        F.col(id_col), tokens_expr(F.col(text_col)).alias("toks")
    )
    pos = toks_df.select(
        id_col, F.posexplode_outer("toks").alias("p", "tok")
    ).select(
        id_col, "p", F.length("tok").cast("long").alias("tok_chars")
    )
    grams = toks_df.filter(F.size("toks") >= n).select(
        id_col,
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.size("toks") - n),
                lambda i: F.concat_ws(" ", F.slice(toks_df["toks"], i + 1, n)),
            )
        ).alias("i", "gram"),
    )
    dup_starts = (
        grams.groupBy(id_col, "gram")
        .agg(F.collect_list("i").alias("starts"), F.count("*").alias("c"))
        .filter(F.col("c") >= 2)
        .select(id_col, F.explode("starts").alias("i"))
    )
    covered = dup_starts.select(
        id_col, F.explode(F.sequence(F.col("i"), F.col("i") + (n - 1))).alias("p")
    ).distinct()
    totals = pos.groupBy(id_col).agg(
        F.coalesce(F.sum("tok_chars"), F.lit(0)).alias("total_chars")
    )
    cov = (
        pos.join(covered, [id_col, "p"], "left_semi")
        .groupBy(id_col)
        .agg(F.sum("tok_chars").alias("covered_chars"))
    )
    return (
        totals.join(cov, id_col, "left")
        .select(
            id_col,
            F.col("total_chars"),
            F.coalesce("covered_chars", F.lit(0)).alias("covered_chars"),
        )
        .select(
            id_col,
            "total_chars",
            "covered_chars",
            F.when(
                F.col("total_chars") > 0,
                round6_ratio_expr(
                    F.col("covered_chars"), F.col("total_chars")
                ),
            )
            .otherwise(F.lit(0.0))
            .alias("dup_char_frac"),
        )
    )


def sql_dup_ngram_coverage(text_expr: str, n: int = 5) -> str:
    """DuckDB twin of :func:`dup_ngram_coverage` — WITH-body fragment
    ending in ``dupstats(doc_id, total_chars, covered_chars)``, shaped
    exactly like the Spark plan (explode positions and gram starts,
    duplicate grams via GROUP BY HAVING, DISTINCT coverage union, sums
    joined back) so every intermediate computes once on both engines
    (length() = chars on both; empty docs coalesce to 0)."""
    g = (
        f"CASE WHEN len(toks) >= {n} THEN "
        f"list_transform(range(0, len(toks) - {n - 1}), "
        f"i -> array_to_string(toks[i + 1 : i + {n}], ' ')) "
        f"ELSE []::VARCHAR[] END"
    )
    return f"""
        toksed AS (SELECT doc_id, {text_expr} AS toks FROM documents),
        gramed AS (SELECT doc_id, {g} AS grams FROM toksed),
        gstart AS (SELECT doc_id, t.i, grams[t.i + 1] AS gram
                   FROM gramed, UNNEST(range(0, len(grams))) AS t(i)),
        dupg AS (SELECT doc_id, gram FROM gstart
                 GROUP BY 1, 2 HAVING COUNT(*) >= 2),
        dstart AS (SELECT g.doc_id, g.i
                   FROM gstart g JOIN dupg USING (doc_id, gram)),
        cov AS (SELECT DISTINCT doc_id, i + r.j AS p
                FROM dstart, UNNEST(range(0, {n})) AS r(j)),
        poss AS (SELECT doc_id, t.p, length(toks[t.p + 1]) AS tok_chars
                 FROM toksed, UNNEST(range(0, len(toks))) AS t(p)),
        totals AS (SELECT tk.doc_id,
                          CAST(COALESCE(SUM(p2.tok_chars), 0) AS BIGINT)
                              AS total_chars
                   FROM toksed tk LEFT JOIN poss p2 USING (doc_id)
                   GROUP BY 1),
        covch AS (SELECT p2.doc_id,
                         CAST(SUM(p2.tok_chars) AS BIGINT) AS covered_chars
                  FROM poss p2 JOIN cov USING (doc_id, p)
                  GROUP BY 1),
        dupstats AS (
          SELECT t2.doc_id, t2.total_chars,
                 COALESCE(c2.covered_chars, 0) AS covered_chars
          FROM totals t2 LEFT JOIN covch c2 USING (doc_id))
    """


def pii_scrub_expr(col: Column) -> Column:
    """Chained redaction of the PII patterns — pure regexp_replace
    pipeline, whole-stage codegen, no Python in the data path."""
    out = col
    for pat, repl in PII_PATTERNS:
        out = F.regexp_replace(out, pat, repl)
    return out


def pii_hits_expr(col: Column) -> Column:
    """Total number of redacted spans across all patterns (NULL input
    counts 0, matching ``sql_pii_hits``)."""
    safe = F.coalesce(col, F.lit(""))
    total = F.lit(0)
    for pat, _ in PII_PATTERNS:
        total = total + F.size(F.regexp_extract_all(safe, F.lit(pat), 0))
    return total.cast("long")


def sql_pii_scrub(col_expr: str) -> str:
    out = col_expr
    for pat, repl in PII_PATTERNS:
        out = f"regexp_replace({out}, '{pat}', '{repl}', 'g')"
    return out


def sql_pii_hits(col_expr: str) -> str:
    parts = [
        f"len(regexp_extract_all(COALESCE({col_expr}, ''), '{pat}'))"
        for pat, _ in PII_PATTERNS
    ]
    return f"CAST({' + '.join(parts)} AS BIGINT)"


# -- Training-sequence preparation -------------------------------------------


def cdc_chunks(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Content-defined chunking (the LBFS/FastCDC idiom on tokens): a token
    is a chunk BOUNDARY iff md5(token) starts with '0' (expected chunk
    length 16 tokens); the boundary token closes its chunk.  Unlike
    fixed-width chunking, an insertion only perturbs chunks up to the next
    surviving boundary — every later boundary re-synchronizes (asserted by
    tests/test_llm_operators.py's resync property test), which is what
    makes CDC the storage-dedup standard.

    100% row-local: tokens -> boundary positions -> slice bounds, all as
    array higher-order functions (scan -> project -> generate; no per-token
    shuffle, no window).  Emits ``(id, chunk_text, n_tokens)``.
    """
    toks = tokens_expr(F.col(text_col))
    base = df.select(F.col(id_col), toks.alias("toks")).filter(
        F.size("toks") > 0
    )
    # 1-based boundary positions; boundary token ENDS its chunk
    bpos = F.filter(
        F.sequence(F.lit(1), F.size("toks")),
        lambda i: F.md5(F.element_at(F.col("toks"), i)).startswith("0"),
    )
    starts = F.concat(
        F.array(F.lit(1)), F.transform(bpos, lambda p: p + F.lit(1))
    )
    ends = F.concat(bpos, F.array(F.size("toks")))
    # zip starts/ends; the trailing (n+1, n) pair appears iff the last
    # token is itself a boundary — drop it with the s <= e filter
    chunks = F.filter(
        F.zip_with(
            starts,
            ends,
            lambda s, e: F.struct(s.alias("s"), e.alias("e")),
        ),
        lambda c: c["s"] <= c["e"],
    )
    return base.select(
        F.col(id_col),
        F.explode(
            F.transform(
                chunks,
                lambda c: F.struct(
                    F.concat_ws(
                        " ", F.slice(F.col("toks"), c["s"], c["e"] - c["s"] + 1)
                    ).alias("chunk_text"),
                    (c["e"] - c["s"] + 1).cast("long").alias("n_tokens"),
                ),
            )
        ).alias("ch"),
    ).select(F.col(id_col), F.col("ch.chunk_text"), F.col("ch.n_tokens"))


def chunk_documents(
    df: DataFrame,
    chunk_tokens: int,
    overlap: int = 0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Split each document into fixed-size token chunks with optional
    overlap (context-window preparation for LLM training / RAG indexing).

    Pure Catalyst: tokens -> ``sequence`` of chunk starts -> ``transform``
    + ``slice`` -> ``explode``.  Row-local (no shuffle at all — the plan
    is scan -> project -> generate), so it scales with input splits and
    the only cost is the output fan-out.  Emits ``(id, chunk_index,
    chunk_text, n_chunk_tokens)``; a document shorter than one chunk
    yields itself whole.
    """
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be < chunk_tokens")
    stride = chunk_tokens - overlap
    toks = tokens_expr(F.col(text_col))
    base = df.select(F.col(id_col), toks.alias("toks")).filter(F.size("toks") > 0)
    # chunk starts: 0, stride, 2*stride, ... while start < n (ensures the
    # final partial chunk is emitted; a start inside the last overlap
    # window would duplicate a full suffix, hence the ceil on (n - overlap))
    n = F.size("toks")
    n_chunks = F.greatest(
        F.lit(1), F.ceil((n - F.lit(overlap)) / F.lit(stride)).cast("int")
    )
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.slice(F.col("toks"), i * stride + 1, chunk_tokens),
    )
    return (
        base.select(
            F.col(id_col),
            F.posexplode(chunks).alias("chunk_index", "chunk_toks"),
        )
        .select(
            F.col(id_col),
            F.col("chunk_index").cast("long").alias("chunk_index"),
            F.concat_ws(" ", F.col("chunk_toks")).alias("chunk_text"),
            F.size("chunk_toks").cast("long").alias("n_chunk_tokens"),
        )
    )


def sql_chunk_documents(chunk_tokens: int, overlap: int) -> str:
    """DuckDB twin of :func:`chunk_documents` over ``documents``."""
    stride = chunk_tokens - overlap
    return f"""
        WITH d AS (
          SELECT doc_id,
                 regexp_extract_all(COALESCE(text, ''), '\\S+') AS toks
          FROM documents
          WHERE len(regexp_extract_all(COALESCE(text, ''), '\\S+')) > 0
        ),
        idx AS (
          SELECT doc_id, toks,
                 unnest(generate_series(0,
                     GREATEST(1, CAST(CEIL((len(toks) - {overlap})
                         / CAST({stride} AS DOUBLE)) AS INT)) - 1)) AS chunk_index
          FROM d
        )
        SELECT doc_id, CAST(chunk_index AS BIGINT) AS chunk_index,
               array_to_string(toks[chunk_index * {stride} + 1 :
                               chunk_index * {stride} + {chunk_tokens}], ' ')
                   AS chunk_text,
               CAST(len(toks[chunk_index * {stride} + 1 :
                    chunk_index * {stride} + {chunk_tokens}]) AS BIGINT)
                   AS n_chunk_tokens
        FROM idx
    """


def pack_sequences(
    df: DataFrame,
    budget_tokens: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Offset-striped packing of documents into token-budget training
    sequences (per ``source`` stream, ordered by id): each doc's sequence
    is ``floor(exclusive_token_offset / budget)`` — the concatenated
    stream cut into fixed strides.

    Same running-sum bucketing shape as the size batch trigger — one
    shuffle on the stream key, window cumsum, integer division; fully
    parallel and stateless, which is why it's the default at 100 TB.
    NOT strict next-fit: a document straddling a stride boundary is
    assigned by its START offset, so a sequence's token total may exceed
    ``budget_tokens`` by up to one clamped document — acceptable when the
    trainer truncates/continues across boundaries (packed-sequence
    pretraining), NOT when each sequence must fit a hard context window.
    For the hard guarantee use :func:`pack_sequences_nextfit`, which
    never overflows but scans each source stream sequentially.
    Documents longer than the budget are clamped to ``budget_tokens``
    (standard practice: they are truncated downstream).
    """
    from pyspark.sql.window import Window

    n_toks = token_count_expr(F.col(text_col))
    base = df.select(
        F.col(id_col),
        F.col("source"),
        F.least(n_toks, F.lit(budget_tokens)).alias("n_tokens"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # stride assignment via exclusive prefix sum over CLAMPED sizes
    cum = F.sum("n_tokens").over(w) - F.col("n_tokens")
    return base.select(
        F.col(id_col),
        F.col("source"),
        F.col("n_tokens"),
        F.floor(cum / F.lit(budget_tokens)).cast("long").alias("seq_index"),
    )


def pack_sequences_nextfit(
    df: DataFrame,
    budget_tokens: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """TRUE greedy next-fit packing: a new sequence starts exactly when
    adding the next document would overflow ``budget_tokens``, so every
    sequence's token total is <= the budget (documents are clamped to the
    budget first) — the hard context-window guarantee
    :func:`pack_sequences` trades away for statelessness.

    Next-fit is inherently a sequential scan of each source stream
    (seq_index depends on every prior fill decision), so it runs as one
    Arrow-batched ``applyInPandas`` pass per ``source`` group:
    parallelism = |sources|, state = two integers per group.  At 100 TB
    source streams are the natural packing unit anyway (curriculum /
    domain mixing packs within a domain); a skewed mega-source can be
    pre-split into shards upstream without changing semantics beyond the
    shard boundaries.
    """
    import pandas as pd

    from ..session import ensure_package_on_executors

    ensure_package_on_executors(df.sparkSession)
    n_toks = token_count_expr(F.col(text_col))
    base = df.select(
        F.col(id_col),
        F.col("source"),
        F.least(n_toks, F.lit(budget_tokens)).cast("long").alias("n_tokens"),
    )
    out_schema = f"{id_col} long, source string, n_tokens long, seq_index long"

    def assign(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col).reset_index(drop=True)
        seq = 0
        fill = 0
        idx = []
        for n in pdf["n_tokens"]:
            if fill + n > budget_tokens and fill > 0:
                seq += 1
                fill = 0
            fill += int(n)
            idx.append(seq)
        pdf["seq_index"] = pd.Series(idx, dtype="int64")
        return pdf[[id_col, "source", "n_tokens", "seq_index"]]

    return base.groupBy("source").applyInPandas(assign, out_schema)


# -- hashed linear quality classifier ---------------------------------------

CLASSIFIER_DIM = 64  # feature-hashing buckets


def _classifier_weights(dim: int = CLASSIFIER_DIM) -> list[int]:
    """Deterministic integer weight vector in [-1000, 1000] derived from
    md5 of the bucket index — a stand-in for trained fastText-style
    weights with the same shape and plumbing.  Integer domain keeps the
    per-doc score an exact sum (no float-order hazard in either engine);
    /1000 recovers the [-1, 1] float weight only at the final division."""
    import hashlib

    return [
        int(hashlib.md5(f"w:{j}".encode()).hexdigest()[:15], 16) % 2001 - 1000
        for j in range(dim)
    ]


def classifier_score_expr(toks: Column) -> Column:
    """Integer logit sum over hashed-token features: each token hashes to
    one of CLASSIFIER_DIM buckets (feature hashing / the "hashing trick"),
    and contributes that bucket's literal weight.  The model ships in the
    plan as a CLASSIFIER_DIM-int literal array — no join, no shuffle, no
    Python; per-row Catalyst fold like every other text score here."""
    from .hashing import hash60_expr

    w = F.array(*[F.lit(x) for x in _classifier_weights()])
    return F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, t: acc
        + F.element_at(w, (hash60_expr(t) % F.lit(CLASSIFIER_DIM) + 1).cast("int")),
    )


def sql_classifier_score(toks_expr: str) -> str:
    """DuckDB twin of :func:`classifier_score_expr` (same literal weights,
    same md5-derived bucket ids, exact integer sum)."""
    from .hashing import sql_hash60

    w = "[" + ",".join(str(x) for x in _classifier_weights()) + "]"
    h = f"({sql_hash60('t')} % {CLASSIFIER_DIM})"
    return (
        f"CAST(coalesce(list_sum(list_transform({toks_expr}, "
        f"t -> ({w})[{h} + 1])), 0) AS BIGINT)"
    )


# -- Arrow-vectorized shared doc profile -------------------------------------

# Gopher stopword set used by the rule gate (llm_text_gopher_rules); the
# profile carries the distinct-stopword count so the gate never re-scans.
GOPHER_STOPS = ("the", "be", "to", "of", "and", "that", "have", "with")

DOC_PROFILE_SCHEMA = (
    "n_tokens bigint, sum_tok_len bigint, punct_count bigint, "
    "alpha_cnt bigint, n_stops bigint, logit_sum bigint"
)


def doc_profile_pandas_expr(text_col: Column) -> Column:
    """Arrow-batched per-document profile: ONE vectorized pass computing
    every integer feature the quality/contamination family shares —

      n_tokens      size of the '\\S+' token list (tokens_expr twin)
      sum_tok_len   total token characters (mean word length numerator)
      punct_count   '[.,;:!?]' matches in the raw text (punct_count_expr)
      alpha_cnt     tokens containing an ASCII letter (the Gopher
                    alpha-fraction numerator)
      n_stops       DISTINCT lowered tokens that are Gopher stopwords
      logit_sum     hashed-token linear classifier logit
                    (classifier_score_expr twin: md5-bucket -> literal
                    integer weight, exact integer sum)

    This is the r12 BPE-encode pattern (``bpe_encode_pandas_expr`` bought
    4.2x at sf10) applied to the family's shared scan: the Catalyst
    originals are higher-order ``F.aggregate``/``F.filter`` lambdas that
    run INTERPRETED per token (md5 + conv per token in the classifier),
    which round 12's decade sweep measured as the family's dominant
    sf10 cost (cascade/funnel/ablation/domain-contamination all
    re-tokenize + re-hash the corpus).  Here the same arithmetic runs as
    C regex scans plus a memoized per-UNIQUE-token table (md5 once per
    vocabulary word per worker, not once per occurrence).

    Bitwise parity is engineered, every field an exact integer:
    Python ``re`` and Java regex agree on '\\S+' and '[.,;:!?]';
    ``len(str)`` counts code points exactly like Spark ``length``;
    the md5-bucket weight is the same ``int(md5(utf8)[:15],16) % 64``
    integer in both engines; NULL text profiles as the empty document
    (the tokens_expr COALESCE contract).  Verified field-by-field
    against the Catalyst originals over the corpus plus adversarial
    strings in tests/test_llm_operators.py.

    Scale shape: a zero-shuffle ArrowEvalPython projection — one narrow
    struct column out; the weight vector and memo live in the worker
    closure, nothing joins, nothing shuffles."""
    import re as _re

    from pyspark.sql.functions import pandas_udf

    token_re = _re.compile(TOKEN_RE)
    punct_re = _re.compile(PUNCT_RE)
    alpha_re = _re.compile(r"[a-zA-Z]")
    weights = _classifier_weights()
    dim = CLASSIFIER_DIM
    stops = frozenset(GOPHER_STOPS)

    @pandas_udf(DOC_PROFILE_SCHEMA)
    def _profile(texts: pd.Series) -> pd.DataFrame:
        import hashlib
        from collections import Counter

        # (weight, len, has_alpha, lowered-if-stopword-else-None) per
        # unique token — persists across Arrow batches in this worker
        memo: dict = {}

        def tok_info(t):
            info = memo.get(t)
            if info is None:
                b = int(hashlib.md5(t.encode()).hexdigest()[:15], 16) % dim
                lo = t.lower()
                info = (
                    weights[b],
                    len(t),
                    1 if alpha_re.search(t) else 0,
                    lo if lo in stops else None,
                )
                memo[t] = info
            return info

        n_tok, sum_len, punct, alpha, nstop, logit = [], [], [], [], [], []
        for raw in texts:
            s = raw if isinstance(raw, str) else ""
            cnt = Counter(token_re.findall(s))
            n = s_len = a = lg = 0
            stop_seen = set()
            for t, c in cnt.items():
                w, ln, ha, st = tok_info(t)
                n += c
                s_len += ln * c
                a += ha * c
                lg += w * c
                if st is not None:
                    stop_seen.add(st)
            n_tok.append(n)
            sum_len.append(s_len)
            punct.append(len(punct_re.findall(s)))
            alpha.append(a)
            nstop.append(len(stop_seen))
            logit.append(lg)
        return pd.DataFrame(
            {
                "n_tokens": pd.Series(n_tok, dtype="int64"),
                "sum_tok_len": pd.Series(sum_len, dtype="int64"),
                "punct_count": pd.Series(punct, dtype="int64"),
                "alpha_cnt": pd.Series(alpha, dtype="int64"),
                "n_stops": pd.Series(nstop, dtype="int64"),
                "logit_sum": pd.Series(logit, dtype="int64"),
            }
        )

    return _profile(text_col)


def nb_bucket_counts_pandas_expr(text_col: Column) -> Column:
    """Arrow-batched per-document hashed-token bucket COUNTS — the
    optimization-r13 twin of the NB family's per-occurrence explode
    (``_nb_token_buckets``): instead of one row per token occurrence
    with an md5+conv per occurrence, one vectorized pass counts tokens
    per document (C regex + Counter), hashes each UNIQUE token once per
    worker (the doc-profile memo), and emits the per-doc (bucket,
    count) pairs.  Downstream aggregates switch COUNT(*) -> SUM(c) and
    SUM(w) -> SUM(w * c) — exact integer/decimal arithmetic, so scores
    are bitwise unchanged while the exploded row count drops from token
    occurrences to distinct buckets per document and the md5 cost drops
    to once per vocabulary word per worker.

    Bucket parity: ``int(md5(utf8)[:15], 16) % CLASSIFIER_DIM`` is the
    same integer as ``conv(substring(md5(tk), 1, 15), 16, 10) % dim``
    (hash60_expr) — both operands nonnegative.  NULL/empty text yields
    the empty array (tokens_expr COALESCE contract; explode drops the
    row, exactly like the old explode of zero tokens)."""
    import re as _re

    from pyspark.sql.functions import pandas_udf

    token_re = _re.compile(TOKEN_RE)
    dim = CLASSIFIER_DIM

    @pandas_udf("array<struct<j: bigint, c: bigint>>")
    def _buckets(texts: pd.Series) -> pd.Series:
        import hashlib
        from collections import Counter

        memo: dict = {}  # token -> bucket, per worker

        def bucket(t):
            j = memo.get(t)
            if j is None:
                j = int(hashlib.md5(t.encode()).hexdigest()[:15], 16) % dim
                memo[t] = j
            return j

        out = []
        for raw in texts:
            s = raw if isinstance(raw, str) else ""
            per: Counter = Counter()
            for t, c in Counter(token_re.findall(s)).items():
                per[bucket(t)] += c
            out.append([(j, c) for j, c in per.items()])
        return pd.Series(out)

    return _buckets(text_col)


def nb_profile_score_pandas_expr(
    text_col: Column,
    w_scaled: list[int] | None,
    with_profile: bool = False,
) -> Column:
    """Arrow-batched per-document TRAINED-NB score — optimization r13's
    collect-IS-the-model shape for the Naive-Bayes classifier family
    (the BM25 query-term precedent): the trained per-bucket weights are
    a CLASSIFIER_DIM-row model, so they ship in the UDF closure as
    scale-9 integers and the score is computed per document inside the
    same pass that tokenizes — no per-(doc, bucket) explode, no weight
    join, no nested bucket-count arrays crossing Arrow (measured 7.2 s
    for the bucket pass alone at the sf10 decade).

    ``w_scaled`` is the 64-long list of scale-9 scaled-int weights with
    the unseen-bucket fallback already baked in (``int(w.scaleb(9))`` of
    the engine-computed DECIMAL(20,9) log-count ratios — ln stays
    ENGINE-side, so cross-engine ln parity is untouched), or ``None``
    for the degenerate empty-seed model (every weight NULL): then nb9 is
    NULL for every document, exactly the old all-NULL weight sum.

    Exactness: the old score was ``SUM(w * c)`` in the decimal domain —
    with every w a scale-9 integer and c an integer count, that sum IS
    the Python integer ``sum(W[bucket(t)] * c)`` rendered at scale 9;
    the ``nb9`` string casts back to DECIMAL(38,9) losslessly.
    ``n_tokens`` is the same token count as the old SUM(c).  With
    ``with_profile`` the struct additionally carries every
    :func:`doc_profile_pandas_expr` field computed from the same
    tokenize + memo — one corpus scan where the trained cascade
    previously ran two (profile + bucket counts)."""
    import re as _re

    from pyspark.sql.functions import pandas_udf

    token_re = _re.compile(TOKEN_RE)
    punct_re = _re.compile(PUNCT_RE)
    alpha_re = _re.compile(r"[a-zA-Z]")
    weights = _classifier_weights()
    dim = CLASSIFIER_DIM
    stops = frozenset(GOPHER_STOPS)
    W = list(w_scaled) if w_scaled is not None else None
    prof = bool(with_profile)
    schema = (
        (DOC_PROFILE_SCHEMA + ", nb9 string")
        if prof
        else "n_tokens bigint, nb9 string"
    )

    @pandas_udf(schema)
    def _score(texts: pd.Series) -> pd.DataFrame:
        import hashlib
        from collections import Counter

        memo: dict = {}

        def tok_info(t):
            info = memo.get(t)
            if info is None:
                b = int(hashlib.md5(t.encode()).hexdigest()[:15], 16) % dim
                lo = t.lower()
                info = (
                    b,
                    weights[b],
                    len(t),
                    1 if alpha_re.search(t) else 0,
                    lo if lo in stops else None,
                )
                memo[t] = info
            return info

        cols: dict = {"n_tokens": [], "nb9": []}
        if prof:
            for f in (
                "sum_tok_len", "punct_count", "alpha_cnt",
                "n_stops", "logit_sum",
            ):
                cols[f] = []
        for raw in texts:
            s = raw if isinstance(raw, str) else ""
            cnt = Counter(token_re.findall(s))
            n = s_len = a = lg = 0
            nb = 0
            stop_seen = set()
            for t, c in cnt.items():
                b, w, ln, ha, st = tok_info(t)
                n += c
                if W is not None:
                    nb += W[b] * c
                if prof:
                    s_len += ln * c
                    a += ha * c
                    lg += w * c
                    if st is not None:
                        stop_seen.add(st)
            cols["n_tokens"].append(n)
            if W is None:
                cols["nb9"].append(None)
            else:
                sign = "-" if nb < 0 else ""
                an = abs(nb)
                cols["nb9"].append(f"{sign}{an // 10**9}.{an % 10**9:09d}")
            if prof:
                cols["sum_tok_len"].append(s_len)
                cols["punct_count"].append(len(punct_re.findall(s)))
                cols["alpha_cnt"].append(a)
                cols["n_stops"].append(len(stop_seen))
                cols["logit_sum"].append(lg)
        out = {
            k: pd.Series(v, dtype="object" if k == "nb9" else "int64")
            for k, v in cols.items()
        }
        order = (
            ["n_tokens", "sum_tok_len", "punct_count", "alpha_cnt",
             "n_stops", "logit_sum", "nb9"]
            if prof
            else ["n_tokens", "nb9"]
        )
        return pd.DataFrame({k: out[k] for k in order})

    # asNondeterministic: consumers filter on UDF-derived columns
    # (n_tokens > 0, the cascade's s1/s2 gates); pushed below the
    # projection the optimizer DUPLICATES the Arrow node and the corpus
    # tokenizes once per copy (guide §4.4 — measured 8 ArrowEvalPython
    # nodes / 2.4x on the trained classifier before the mark).  The
    # function is pure; the mark only pins a single evaluation.  It must
    # therefore be referenced ONCE, in its own projection, with fields
    # extracted a level above (the sh60 discipline).
    return _score.asNondeterministic()(text_col)


def query_tf_pandas_expr(text_col: Column, qwords: list[str]) -> Column:
    """Arrow-batched per-document (dl, tf-per-query-term) — optimization
    r13's BM25 scoring input.  The query-term list is model-sized (the
    3 collected top-df words), so it ships in the UDF closure and the
    pass returns ONLY int64 columns: document length plus the exact
    term frequency of each query word.  No strings cross the Python
    boundary (an earlier variant returning full (word, tf) postings
    spent ~49 s at sf10 just serializing them), nothing corpus-sized
    shuffles, and tf/dl are exact integers so the decimal scoring
    arithmetic downstream is bitwise unchanged."""
    import re as _re

    from pyspark.sql.functions import pandas_udf

    token_re = _re.compile(TOKEN_RE)
    qws = list(qwords)
    fields = ", ".join(
        ["dl bigint"] + [f"tf{i} bigint" for i in range(len(qws))]
    )

    @pandas_udf(f"struct<{fields}>")
    def _qtf(texts: pd.Series) -> pd.DataFrame:
        cols: dict = {"dl": []}
        for i in range(len(qws)):
            cols[f"tf{i}"] = []
        for raw in texts:
            toks = token_re.findall(raw) if isinstance(raw, str) else []
            cols["dl"].append(len(toks))
            for i, w in enumerate(qws):
                cols[f"tf{i}"].append(toks.count(w))
        return pd.DataFrame(
            {k: pd.Series(v, dtype="int64") for k, v in cols.items()}
        )

    return _qtf(text_col)


REPETITION_PROFILE_SCHEMA = (
    "n_words bigint, total_chars bigint, n_segments bigint, "
    "dup_occ bigint, tot_sc bigint, dup_sc bigint, "
    "topc2 bigint, topc3 bigint"
)


def repetition_profile_pandas_expr(text_col: Column, seg_tokens: int) -> Column:
    """Arrow-batched per-document repetition profile — optimization r13's
    single-pass twin of llm_text_gopher_repetition's five-shuffle
    relational pipeline (two explode+groupBy gram counts, one segment
    count, one per-doc window per gram width, three joins back to base).
    Every output is a per-document integer depending ONLY on that
    document's tokens, so the whole computation is row-local (guide
    §2.4: the shuffles existed for the relational formulation, not the
    data): one ArrowEvalPython projection, zero Exchange.

      n_words      len of the '\\S+' token list
      total_chars  len(' '.join(toks))  (array_join twin)
      n_segments   ceil(n_words / seg_tokens) pseudo-paragraphs
      dup_occ      occurrences of segments appearing >= 2 times
      tot_sc       sum over segments of char length (every occurrence)
      dup_sc       same, restricted to duplicated segments
      topc2/topc3  count * len of the most frequent word 2-/3-gram
                   (count desc, gram asc tie-break); NULL when the doc
                   has fewer than 2/3 tokens (the old left-join NULL)

    Bitwise parity with the Catalyst original: Python ``re`` and Java
    regex agree on '\\S+'; ``len(str)`` counts code points like Spark
    ``length``; tie-breaks use tuple ordering ``(-count, gram)`` which
    equals the window's (c DESC, g ASC); NULL text profiles as the
    empty document (tokens_expr COALESCE contract).  All fields exact
    integers — the round6 ratio arithmetic stays in Catalyst, so the
    float path is unchanged.  Verified field-by-field against the
    relational form in tests/test_llm_operators.py."""
    import re as _re

    from pyspark.sql.functions import pandas_udf

    token_re = _re.compile(TOKEN_RE)
    k = seg_tokens

    @pandas_udf(REPETITION_PROFILE_SCHEMA)
    def _rep(texts: pd.Series) -> pd.DataFrame:
        from collections import Counter

        cols: dict = {
            n: []
            for n in (
                "n_words",
                "total_chars",
                "n_segments",
                "dup_occ",
                "tot_sc",
                "dup_sc",
                "topc2",
                "topc3",
            )
        }

        def topc(toks, n):
            if len(toks) < n:
                return None
            cnt = Counter(
                " ".join(toks[i : i + n])
                for i in range(len(toks) - n + 1)
            )
            # (c DESC, g ASC) winner — the window's total order
            g, c = min(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
            return c * len(g)

        for raw in texts:
            toks = token_re.findall(raw) if isinstance(raw, str) else []
            nw = len(toks)
            cols["n_words"].append(nw)
            cols["total_chars"].append(
                sum(len(t) for t in toks) + max(0, nw - 1)
            )
            if nw > 0:
                segs = Counter(
                    " ".join(toks[i : i + k]) for i in range(0, nw, k)
                )
                nseg = doc = tsc = dsc = 0
                for seg, c in segs.items():
                    ln = len(seg)
                    nseg += c
                    tsc += c * ln
                    if c >= 2:
                        doc += c
                        dsc += c * ln
                cols["n_segments"].append(nseg)
                cols["dup_occ"].append(doc)
                cols["tot_sc"].append(tsc)
                cols["dup_sc"].append(dsc)
            else:
                cols["n_segments"].append(0)
                cols["dup_occ"].append(0)
                cols["tot_sc"].append(0)
                cols["dup_sc"].append(0)
            cols["topc2"].append(topc(toks, 2))
            cols["topc3"].append(topc(toks, 3))
        return pd.DataFrame(
            {
                # topc2/topc3 carry NULLs (short docs) -> object dtype
                n: pd.Series(
                    v, dtype="object" if n.startswith("topc") else "int64"
                )
                for n, v in cols.items()
            }
        )

    return _rep(text_col)


# -- BPE tokenizer training --------------------------------------------------

BPE_DELIM = "\x01"  # symbol separator; cannot occur inside \S+ tokens? it
# CAN in adversarial text — both engines treat it identically, so parity
# holds regardless; real deployments pre-strip control chars.


def bpe_symbols_expr(s: Column) -> Column:
    """Non-empty symbol list from a delimiter-joined symbol string."""
    return F.filter(F.split(s, BPE_DELIM), lambda x: x != F.lit(""))


def bpe_initial_expr(toks: Column) -> Column:
    """Initial symbol string: one symbol per whitespace token, each
    preceded by the delimiter ('' for empty docs)."""
    return F.when(
        F.size(toks) > 0,
        F.concat(F.lit(BPE_DELIM), F.array_join(toks, BPE_DELIM)),
    ).otherwise(F.lit(""))


def bpe_merge_expr(s: Column, a: str, b: str) -> Column:
    """Apply ONE BPE merge (a, b) with exact left-to-right greedy
    semantics as a string fold: walking the symbols, if the accumulator
    currently ends with <delim>a and the next symbol is b, append b
    directly (turning the trailing 'a' into 'ab'); else append
    <delim>symbol.  A symbol produced by a merge can never merge again in
    the same pass (the trailing symbol is then 'ab', not 'a') — exactly
    the non-overlapping greedy scan BPE specifies.  The same fold runs in
    DuckDB via list_reduce, so training is engine-exact."""
    return F.aggregate(
        bpe_symbols_expr(s),
        F.lit(""),
        lambda acc, x: F.when(
            F.endswith(acc, F.lit(BPE_DELIM + a)) & (x == F.lit(b)),
            F.concat(acc, x),
        ).otherwise(F.concat(acc, F.lit(BPE_DELIM), x)),
    )


def bpe_top_pair(sym_df: DataFrame) -> tuple[str, str]:
    """The corpus-wide most frequent adjacent symbol pair (ties: lower
    (a, b) lexicographically) — one distributed count + a 2-string
    collect (the collect IS this iteration's model update).

    Scale note: strict BPE is inherently sequential — every merge
    changes the pair counts the next merge ranks on — so exact training
    costs ONE distributed count job per merge; a production 32k-merge
    vocab would be 32k Spark jobs.  That is a TRAINING-side cost on a
    sampled corpus, not a corpus-processing cost; for full-vocab
    training at scale use :func:`bpe_train_batched`, which applies K
    symbol-disjoint candidates per count."""
    syms = bpe_symbols_expr(F.col("s"))
    n = F.size(syms)
    head = F.slice(syms, 1, F.greatest(n - 1, F.lit(0)))
    tail = F.slice(syms, 2, F.greatest(n - 1, F.lit(0)))
    pairs = (
        sym_df.select(
            F.explode(
                F.zip_with(
                    head, tail, lambda a, b: F.struct(a.alias("a"), b.alias("b"))
                )
            ).alias("p")
        )
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.col("c").desc(), "a", "b")
        .limit(1)
        .collect()
    )
    if not pairs:
        return ("", "")  # no pairs anywhere: the ('','') merge is a no-op
    return (pairs[0].a, pairs[0].b)


def sql_bpe_symbols(s_expr: str) -> str:
    return f"list_filter(string_split({s_expr}, chr(1)), x -> x <> '')"


def sql_bpe_merge(s_expr: str, a_expr: str, b_expr: str) -> str:
    """DuckDB twin of :func:`bpe_merge_expr` (list_reduce fold; the ''
    prepend supplies the empty-accumulator init)."""
    return (
        f"list_reduce(list_prepend('', {sql_bpe_symbols(s_expr)}), "
        f"(acc, x) -> CASE WHEN ends_with(acc, chr(1)||{a_expr}) "
        f"AND x = {b_expr} THEN acc||x "
        f"ELSE acc||chr(1)||x END)"
    )


def bpe_top_pairs(sym_df: DataFrame, k: int) -> list[tuple[str, str]]:
    """Top-K candidate merges for BATCHED BPE training: the K most
    frequent adjacent pairs whose symbols are pairwise DISJOINT, picked
    greedily from the count ranking (ties: lower (a, b)).  Disjointness
    makes the chained one-pass application well defined — no pair can
    consume or produce a symbol another pair in the batch matches on.

    This is the standard large-scale BPE approximation: strict BPE
    re-counts after every merge (the merge IS sequential), so exact
    training costs one distributed count per merge — a 32k-merge vocab
    is 32k Spark jobs.  Batching applies K merges per count at the cost
    of using slightly stale ranks for merges 2..K of each batch; corpus
    statistics dominate at scale, so the learned vocab is near-identical
    while the job count drops by Kx.  Exact single-pair training
    (:func:`bpe_top_pair`) remains the oracle-checked reference path."""
    syms = bpe_symbols_expr(F.col("s"))
    n = F.size(syms)
    head = F.slice(syms, 1, F.greatest(n - 1, F.lit(0)))
    tail = F.slice(syms, 2, F.greatest(n - 1, F.lit(0)))
    ranked = (
        sym_df.select(
            F.explode(
                F.zip_with(
                    head, tail, lambda a, b: F.struct(a.alias("a"), b.alias("b"))
                )
            ).alias("p")
        )
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.col("c").desc(), "a", "b")
        .limit(8 * k)  # candidate pool; the greedy filter thins it
        .collect()
    )
    out: list[tuple[str, str]] = []
    used: set[str] = set()
    for r in ranked:
        if len(out) == k:
            break
        if r.a in used or r.b in used or (r.a + r.b) in used:
            continue
        out.append((r.a, r.b))
        used.update({r.a, r.b, r.a + r.b})
    return out


def bpe_train_batched(
    sym_df: DataFrame,
    n_merges: int,
    batch_k: int = 8,
    max_rounds: int | None = None,
) -> tuple[DataFrame, list[tuple[str, str]]]:
    """Train ``n_merges`` BPE merges in ceil(n/k) distributed counts
    instead of n: each round collects :func:`bpe_top_pairs` (a KB-sized
    model update, like the IVF centroid collect) and applies the whole
    batch as ONE chained fold pass — expression composition keeps the
    application a single zero-shuffle map stage, the same shape
    ``llm_bpe_encode`` uses for its pretrained 8-merge chain.  Returns
    (final symbol frame, learned merge list).

    The merge list MAY be shorter than ``n_merges``: when the corpus
    runs out of adjacent pairs, training stops and a ``UserWarning``
    says so.  Overlap-thinning of a round's candidate pool can shrink a
    batch but never to zero while any pair remains (the greedy filter
    always accepts the first ranked candidate); an empty batch is
    re-probed with the exact top-1 counter before exhaustion is
    declared, so early stop is never a pool artifact.

    ``max_rounds`` bounds the number of DISTRIBUTED COUNT rounds (the
    expensive side of training) rather than the merge count: with
    ``max_rounds=R`` the job graph has a fixed shape — exactly R pair
    counts, each applying up to ``batch_k`` merges — which also makes
    the computation expressible as a fixed unrolled SQL oracle
    (``llm_bpe_train_batched``)."""
    import warnings

    merges: list[tuple[str, str]] = []
    cur = sym_df
    rounds = 0
    while len(merges) < n_merges and (
        max_rounds is None or rounds < max_rounds
    ):
        rounds += 1
        k = min(batch_k, n_merges - len(merges))
        batch = bpe_top_pairs(cur, k)
        if not batch:
            exact = bpe_top_pair(cur)
            if exact == ("", ""):
                warnings.warn(
                    f"bpe_train_batched: corpus has no adjacent pairs "
                    f"left after {len(merges)} merges "
                    f"(requested {n_merges}); returning the short list",
                    stacklevel=2,
                )
                break
            batch = [exact]
        col = F.col("s")
        for a, b in batch:
            col = bpe_merge_expr(col, a, b)
        cur = cur.select("doc_id", col.alias("s"))
        merges.extend(batch)
    return cur, merges


def bpe_encode_pandas_expr(text_col: Column, merges) -> Column:
    """Arrow-batched pretrained-BPE encoder: the full
    tokens→initial-symbols→merge-chain pipeline of
    :func:`bpe_initial_expr` + chained :func:`bpe_merge_expr`, executed
    as vectorized C regex passes instead of interpreted Catalyst folds
    (r12; the fold chain was the slowest row-linear key in the decade
    table — 96 s at sf10 — because higher-order ``F.aggregate`` folds
    run interpreted per symbol).

    Equivalence to the fold (verified bitwise by
    ``tests/test_llm_operators.py`` against the whole corpus and by the
    randomized chain tests): applying merge (a, b) to the
    delimiter-joined symbol string is exactly one left-to-right
    non-overlapping regex substitution
    ``\\x01a\\x01b(?=\\x01|$)  ->  \\x01ab`` —

    - the left symbol is delimiter-anchored, so a symbol merely ENDING
      in ``a`` can never match (same as the fold's
      ``endswith(DELIM + a)`` on an accumulator that always ends at a
      symbol boundary);
    - the zero-width right lookahead pins ``b`` as a COMPLETE symbol
      (the fold compares ``x == b`` exactly);
    - ``re.sub`` resumes scanning after each replacement without
      re-examining the replaced text, which is precisely the fold's
      a-symbol-produced-by-a-merge-cannot-merge-again-this-pass rule.

    Scale shape: still one narrow zero-shuffle projection per row —
    only the execution engine of that projection changes (Arrow batch
    in, 8 vectorized substitutions, Arrow batch out); the merge table
    rides the serialized closure exactly like the IVF/PQ plan-literal
    models ride the plan."""
    import re as _re

    from pyspark.sql.functions import pandas_udf

    compiled = [
        (
            _re.compile(
                BPE_DELIM
                + _re.escape(a)
                + BPE_DELIM
                + _re.escape(b)
                + f"(?={BPE_DELIM}|$)"
            ),
            BPE_DELIM + a + b,
        )
        for a, b in merges
    ]
    token_re = _re.compile(TOKEN_RE)

    @pandas_udf("string")
    def _encode(texts: pd.Series) -> pd.Series:
        def initial(t):
            toks = token_re.findall(t) if t else []
            return BPE_DELIM + BPE_DELIM.join(toks) if toks else ""

        s = texts.fillna("").map(initial)
        for pat, repl in compiled:
            s = s.str.replace(pat, repl, regex=True)
        return s

    return _encode(text_col)
