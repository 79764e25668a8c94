"""Parametric text-quality / text-analysis operators.

Round-5 extraction (VERDICT r4 item #1): the H5-family text-analysis
measures — token counting, quality heuristics, language ID, rolling
fingerprints — as schema-agnostic functions over any (id, text) frame:

    from dataframe_differ_spark.operators.textquality import quality_features
    scored = quality_features(df, text_col="body")

Everything here is built-in expressions / HOFs (zero UDFs): the per-row
measures run at parquet-scan speed with no shuffle at all, and the
corpus-level ones (language profiles) are one map-side-combinable groupBy
plus a broadcast — the shapes that are scan-bound at 100 TB.

Fixture bindings + full DuckDB oracles: ``text_quality``,
``text_token_count``, ``text_lang_id``, ``text_fingerprint``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "token_counts",
    "quality_features",
    "language_id",
    "rolling_fingerprint",
    "bm25_scores",
]


def _toks(text_col: str) -> Column:
    return F.split(F.col(text_col), " ")


def token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append ``ws_tokens`` (whitespace split), ``word_tokens`` (regex
    ``[a-z0-9]+`` runs) and ``bpe_est_tokens`` (ceil(len/4) subword pieces
    per token — the ~4-chars-per-token LLM budget heuristic). Per-row
    expressions only; embarrassingly parallel.
    """
    return (
        df.withColumn("ws_tokens", F.size(_toks(text_col)))
        .withColumn(
            "word_tokens",
            F.size(F.regexp_extract_all(text_col, F.lit("[a-z0-9]+"), 0)),
        )
        .withColumn(
            "bpe_est_tokens",
            F.expr(
                f"aggregate(split({text_col}, ' '), CAST(0 AS BIGINT), "
                "(acc, t) -> acc + CAST(ceil(length(t) / 4.0) AS BIGINT))"
            ),
        )
    )


def quality_features(
    df: DataFrame,
    text_col: str = "text",
    *,
    chars_col: str | None = None,
    min_tokens: int = 20,
    min_ttr: float = 0.3,
) -> DataFrame:
    """Append quality heuristics: ``n_tokens``, ``n_distinct``, ``ttr``
    (type-token ratio), ``avg_token_len`` and the boolean-int
    ``passes_quality`` gate (``n_tokens ≥ min_tokens AND ttr ≥ min_ttr``).

    ``chars_col`` names a precomputed character-count column; default is
    ``length(text_col)``. Pure per-row expressions — no shuffle; at 100 TB
    this is the cheap first-stage filter of a data-quality cascade (run it
    before anything that shuffles).
    """
    toks = _toks(text_col)
    n_tokens = F.size(toks)
    n_distinct = F.size(F.array_distinct(toks))
    ttr = n_distinct.cast("double") / n_tokens
    n_chars = (
        F.col(chars_col) if chars_col is not None else F.length(F.col(text_col))
    )
    return (
        df.withColumn("n_tokens", n_tokens)
        .withColumn("n_distinct", n_distinct)
        .withColumn("ttr", ttr)
        .withColumn("avg_token_len", n_chars.cast("double") / n_tokens)
        .withColumn(
            "passes_quality",
            ((n_tokens >= min_tokens) & (ttr >= min_ttr)).cast("int"),
        )
    )


def language_id(
    df: DataFrame,
    id_col: str,
    text_col: str,
    lang_col: str,
    *,
    profile_size: int = 8,
    out_col: str = "predicted_lang",
) -> DataFrame:
    """Train-free language ID: ``(id_col, out_col)`` per input row.

    Builds a top-``profile_size`` token profile per language from the
    corpus itself (rows with non-null ``lang_col`` act as the labeled
    pool), then classifies every row by distinct-token overlap with each
    profile (ties break lexicographically — deterministic end to end,
    which is what lets a classifier carry a full SQL oracle). The profile
    table is tiny → broadcast; the corpus-side explode + groupBy carries
    the scale.
    """
    tok = df.select(
        id_col, lang_col, F.explode(_toks(text_col)).alias("token")
    )
    freq = (
        tok.filter(F.col(lang_col).isNotNull())
        .groupBy(lang_col, "token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.partitionBy(lang_col).orderBy(F.col("cnt").desc(), F.col("token"))
    prof = (
        freq.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= profile_size)
        .select(F.col(lang_col).alias("_tq_plang"), "token")
    )
    dtok = tok.select(id_col, "token").distinct()
    scores = (
        dtok.join(F.broadcast(prof), "token")
        .groupBy(id_col, "_tq_plang")
        .agg(F.count(F.lit(1)).alias("hits"))
    )
    wb = Window.partitionBy(id_col).orderBy(
        F.col("hits").desc(), F.col("_tq_plang")
    )
    return (
        scores.withColumn("rn", F.row_number().over(wb))
        .filter(F.col("rn") == 1)
        .select(id_col, F.col("_tq_plang").alias(out_col))
    )


def rolling_fingerprint(
    text_col: str, *, mod: int = 1_000_000_007, mult: int = 31
) -> Column:
    """Order-sensitive polynomial rolling hash of the token stream:
    ``h = fold(tokens, h*mult + (len(t)*131 + ascii(t))) mod mod`` — pure
    integer arithmetic via the ``aggregate`` HOF, bit-identical across
    engines. Detects exact and prefix-shifted duplicates cheaply.
    """
    code = "CAST(length(t) * 131 + ascii(t) AS BIGINT)"
    return F.expr(
        f"aggregate(split({text_col}, ' '), CAST(0 AS BIGINT), "
        f"(acc, t) -> (acc * {mult} + {code}) % {mod})"
    )


def bm25_scores(
    df,
    id_col: str,
    text_col: str,
    *,
    k1: float = 1.2,
    b: float = 0.75,
    min_tf: int = 1,
    round_dp: int | None = 6,
):
    """BM25 term relevance over a corpus → ``(id, token, bm25)`` — the
    IR-standard upgrade over TF-IDF for retrieval-quality filtering.

    Robertson/Sparck-Jones BM25 with the standard (k1, b) defaults:
    idf = ln(1 + (N − df + 0.5)/(df + 0.5)), tf saturation k1+1 over
    k1·(1 − b + b·dl/avgdl). Plan shape: one corpus shuffle for per-doc
    term frequencies; the per-document length table and the per-term df
    table join back by SHUFFLE join (round 7: both grow with the corpus
    — one row per document / per vocabulary term — so a forced
    broadcast would OOM at scale; AQE still picks broadcast at small
    sizes on its own). Only the true 1-row corpus stats (N, avgdl) stay
    a broadcast crossJoin, kept IN the plan (a collect() here would
    force an eager job per call). ``min_tf`` prunes the long tf tail
    before the joins. The one ``ln`` per (doc, term) is
    libm-tainted, so scores are rounded to ``round_dp`` for cross-engine
    replays (``round_dp=None`` leaves them raw).
    """
    from pyspark.sql import functions as F

    for c in df.columns:
        if c.startswith("_tx_"):
            raise ValueError(f"input column {c!r} collides with _tx_ internals")
    tok = df.select(
        F.col(id_col).alias("_tx_id"),
        F.explode(F.split(F.col(text_col), " ")).alias("token"),
    )
    tf = tok.groupBy("_tx_id", "token").agg(
        F.count(F.lit(1)).cast("double").alias("_tx_tf")
    )
    dl = df.select(
        F.col(id_col).alias("_tx_id"),
        F.size(F.split(F.col(text_col), " ")).cast("double").alias("_tx_dl"),
    )
    stats = df.agg(
        F.count(F.lit(1)).cast("double").alias("_tx_n"),
        (
            F.sum(F.size(F.split(F.col(text_col), " "))).cast("double")
            / F.count(F.lit(1))
        ).alias("_tx_avgdl"),
    )
    dfreq = tok.groupBy("token").agg(
        F.countDistinct("_tx_id").cast("double").alias("_tx_df")
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("_tx_n") - F.col("_tx_df") + 0.5) / (F.col("_tx_df") + 0.5)
    )
    score = (
        idf
        * (F.col("_tx_tf") * F.lit(k1 + 1.0))
        / (
            F.col("_tx_tf")
            + F.lit(k1)
            * (F.lit(1.0 - b) + F.lit(b) * F.col("_tx_dl") / F.col("_tx_avgdl"))
        )
    )
    out = (
        tf.filter(F.col("_tx_tf") >= min_tf)
        .join(dfreq, "token")
        .join(dl, "_tx_id")
        .crossJoin(F.broadcast(stats))
    )
    bm25 = F.round(score, round_dp) if round_dp is not None else score
    return out.select(
        F.col("_tx_id").alias(id_col), "token", bm25.alias("bm25")
    )
