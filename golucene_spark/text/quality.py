"""Text-analysis operators for training-data pipelines.

All pure Catalyst column expressions (JVM regex + arithmetic): language
ID heuristic, quality scoring, token counting, document fingerprinting.
SQL-oracle-expressible by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..analysis.analyzers import ENGLISH_STOP_WORDS

TOKEN_PATTERN = "[a-z0-9_]+"
STOP_ARRAY = sorted(ENGLISH_STOP_WORDS)


def _tokens(col):
    return F.expr(f"regexp_extract_all(lower({col}), '{TOKEN_PATTERN}', 0)")


def token_quality(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-doc quality features: token counts, mean token length,
    alpha/space/punct character ratios, stopword ratio, and a composite
    quality score in [0,1] (heuristic in the C4/Gopher-rules style)."""
    toks = _tokens(text_col)
    n_tok = F.size(toks)
    n_chars = F.length(text_col)
    alpha = n_chars - F.length(F.regexp_replace(F.col(text_col), "[A-Za-z]", ""))
    spaces = n_chars - F.length(F.regexp_replace(F.col(text_col), " ", ""))
    stops = F.size(F.filter(toks, lambda t: t.isin(*STOP_ARRAY)))
    mean_len = F.when(
        n_tok > 0,
        F.aggregate(toks, F.lit(0).cast("long"), lambda a, t: a + F.length(t)).cast("double") / n_tok,
    ).otherwise(F.lit(0.0))
    stop_ratio = F.when(n_tok > 0, stops.cast("double") / n_tok).otherwise(F.lit(0.0))
    alpha_ratio = F.when(n_chars > 0, alpha.cast("double") / n_chars).otherwise(F.lit(0.0))
    space_ratio = F.when(n_chars > 0, spaces.cast("double") / n_chars).otherwise(F.lit(0.0))
    # composite: favor mid-length tokens, alphabetic content, nonzero size
    quality = (
        F.least(n_tok.cast("double") / 100.0, F.lit(1.0)) * 0.25
        + alpha_ratio * 0.5
        + F.when((mean_len >= 3.0) & (mean_len <= 10.0), 0.25).otherwise(0.0)
    )
    return df.select(
        F.col(id_col),
        n_tok.cast("long").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_unique"),
        mean_len.alias("mean_tok_len"),
        alpha_ratio.alias("alpha_ratio"),
        space_ratio.alias("space_ratio"),
        stop_ratio.alias("stop_ratio"),
        quality.alias("quality"),
    )


# GPT-2-style pre-tokenizer, simplified to the RE2-compatible subset
# (no lookahead; lowercase ASCII corpus): contractions, space-prefixed
# letter runs, space-prefixed digit runs, space-prefixed punct runs.
BPE_PATTERN = r"'s|'t|'re|'ve|'m|'ll|'d| ?[a-zA-Z]+| ?[0-9]+| ?[^\sa-zA-Z0-9]+"


def bpe_token_count(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-doc token counts under a BPE-ish pre-tokenizer regex (the
    pre-merge segmentation a GPT-2-style tokenizer applies) next to the
    plain whitespace count — the cost-estimation numbers a training
    pipeline budgets with.  Pure Catalyst; identical regex runs in the
    DuckDB oracle."""
    ws = F.size(F.split(F.trim(F.col(text_col)), r"\s+"))
    ws = F.when(F.length(F.trim(F.col(text_col))) > 0, ws).otherwise(F.lit(0))
    # Column-typed pattern avoids SQL string-literal backslash mangling
    bpe = F.size(F.regexp_extract_all(F.col(text_col), F.lit(BPE_PATTERN), F.lit(0)))
    return df.select(
        F.col(id_col),
        ws.cast("long").alias("ws_tokens"),
        bpe.cast("long").alias("bpe_tokens"),
        (F.length(text_col).cast("double") / F.greatest(bpe, F.lit(1)).cast("double")).alias("chars_per_token"),
    )


def language_id(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Heuristic language ID: English stopword hit-rate vs small
    German/French/Spanish function-word sets (n-gram-free, vectorized).
    Emits per-language scores and the argmax label."""
    sets = {
        "en": STOP_ARRAY,
        "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "von"],
        "fr": ["le", "la", "les", "et", "est", "pas", "une", "dans", "pour", "que"],
        "es": ["el", "los", "las", "es", "una", "con", "para", "por", "del", "como"],
    }
    toks = _tokens(text_col)
    n_tok = F.greatest(F.size(toks), F.lit(1))
    cols = {
        lang: (F.size(F.filter(toks, lambda t: t.isin(*words))).cast("double") / n_tok).alias(f"score_{lang}")
        for lang, words in sets.items()
    }
    out = df.select(F.col(id_col), *cols.values())
    pairs = [x for lang in sets for x in (F.col(f"score_{lang}"), F.lit(lang))]
    # argmax with deterministic tie-break by set order
    best = F.greatest(*[F.col(f"score_{lang}") for lang in sets])
    label = F.coalesce(
        *[F.when(F.col(f"score_{lang}") == best, F.lit(lang)) for lang in sets]
    )
    return out.withColumn("lang_pred", F.when(best > 0, label).otherwise(F.lit("unknown")))


def doc_fingerprint(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Normalized-content fingerprint: md5 over the space-joined token
    stream (whitespace/punct/case-insensitive content identity)."""
    return df.select(
        F.col(id_col),
        F.md5(F.concat_ws(" ", _tokens(text_col))).alias("fingerprint"),
    )
