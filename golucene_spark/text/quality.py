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


def repetition_signals(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id",
                       line_delim: str = "\n") -> DataFrame:
    """Intra-document repetition filters in the Gopher/MassiveText style
    (Rae et al. 2021, arXiv:2112.11446 Table A1): per doc,

    - dup_line_frac: 1 - distinct_lines / lines (lines split on
      ``line_delim``, trimmed, empties dropped)
    - dup_line_char_frac: chars inside line-groups occurring >1 time /
      total line chars
    - top2gram_char_frac / top3gram_char_frac: characters covered by
      the most frequent word n-gram (count * gram length) / total
      token chars

    Scale shape: explode + groupBy per signal family (keys are
    (doc, line) / (doc, gram) — per-doc cardinality, no global hot
    keys), window max for the mode, left-joins back onto the doc list.
    No per-doc quadratic array loops.
    """
    from pyspark.sql import Window

    toks = _tokens(text_col)
    base = df.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("_t"),
                     toks.alias("toks"))

    # --- line signals ---
    lines = base.select(
        "doc_id",
        F.explode(F.split("_t", line_delim)).alias("raw"),
    ).select("doc_id", F.trim("raw").alias("line")).filter(F.length("line") > 0)
    lg = lines.groupBy("doc_id", "line").agg(F.count("*").alias("cnt"))
    line_stats = lg.groupBy("doc_id").agg(
        F.sum("cnt").alias("n_lines"),
        F.count("*").alias("n_uniq_lines"),
        F.sum(F.col("cnt") * F.length("line")).alias("line_chars"),
        F.sum(F.when(F.col("cnt") > 1, F.col("cnt") * F.length("line"))
              .otherwise(F.lit(0))).alias("dup_line_chars"),
    )

    # --- word n-gram signals ---
    def _top_gram(n: int, out: str):
        grams = base.select(
            "doc_id",
            F.explode(
                F.when(
                    F.size("toks") >= n,
                    F.transform(
                        F.sequence(F.lit(1), F.size("toks") - n + 1),
                        lambda i: F.concat_ws(" ", F.slice(F.col("toks"), i, n)),
                    ),
                ).otherwise(F.array().cast("array<string>"))
            ).alias("gram"),
        )
        gg = grams.groupBy("doc_id", "gram").agg(F.count("*").alias("cnt"))
        # gram chars exclude the joining spaces: count * (len - (n-1))
        covered = F.col("cnt") * (F.length("gram") - (n - 1))
        w = Window.partitionBy("doc_id").orderBy(
            F.desc(covered), F.asc("gram")
        )
        return (
            gg.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("doc_id", covered.alias(out))
        )

    tok_chars = F.aggregate(
        F.col("toks"), F.lit(0).cast("long"), lambda a, t: a + F.length(t)
    )
    docs = base.select("doc_id", F.size("toks").cast("long").alias("n_tokens"),
                       tok_chars.alias("tok_chars"))
    out = (
        docs.join(line_stats, "doc_id", "left")
        .join(_top_gram(2, "top2_chars"), "doc_id", "left")
        .join(_top_gram(3, "top3_chars"), "doc_id", "left")
    )
    nz = lambda c: F.coalesce(c, F.lit(0))
    frac = lambda num, den: F.when(den > 0, num.cast("double") / den).otherwise(F.lit(0.0))
    return out.select(
        "doc_id",
        "n_tokens",
        nz(F.col("n_lines")).cast("long").alias("n_lines"),
        frac(nz(F.col("n_lines")) - nz(F.col("n_uniq_lines")), nz(F.col("n_lines"))).alias("dup_line_frac"),
        frac(nz(F.col("dup_line_chars")), nz(F.col("line_chars"))).alias("dup_line_char_frac"),
        frac(nz(F.col("top2_chars")), F.col("tok_chars")).alias("top2gram_char_frac"),
        frac(nz(F.col("top3_chars")), F.col("tok_chars")).alias("top3gram_char_frac"),
    )


def unigram_logppl(df: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """Unigram language-model perplexity proxy — the CCNet-style
    quality bucketing signal (Wenzek et al. 2020, arXiv:1911.00359,
    which buckets Common Crawl by LM perplexity; the unigram MLE is the
    SQL-exact stand-in for the KenLM there):

        logppl(doc) = -(1/n) * sum_i ln P(t_i | corpus),
        P(t|corpus) = corpus_tf(t) / total_tokens.

    Lower = more typical text; token-dup-heavy or boilerplate docs
    score low, rare-garbage docs high.  Scale shape: one token explode,
    one groupBy(term) for the corpus LM (hot terms collapse to one
    row), a broadcast-friendly term join back, and one per-doc
    aggregation whose ln-prob fold is POSITION-ORDERED (sort_array +
    sequential aggregate) so the float sum is deterministic and
    twin-exact."""
    toks = _tokens(text_col)
    tok_rows = df.select(
        F.col(id_col).alias("doc_id"), F.posexplode(toks).alias("pos", "term")
    )
    lm = tok_rows.groupBy("term").agg(F.count("*").alias("tf"))
    total = lm.agg(F.sum("tf").alias("total"))
    lnp = (
        tok_rows.join(lm, "term")
        .crossJoin(F.broadcast(total))
        .withColumn("lnp", F.log(F.col("tf").cast("double") / F.col("total")))
    )
    per_doc = lnp.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_tokens"),
        F.aggregate(
            F.sort_array(F.collect_list(F.struct("pos", "lnp"))),
            F.lit(0.0),
            lambda a, x: a + x["lnp"],
        ).alias("s"),
    )
    return (
        df.select(F.col(id_col).alias("doc_id"))
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_tokens", F.lit(0)).cast("long").alias("n_tokens"),
            F.when(F.col("n_tokens") > 0, -(F.col("s") / F.col("n_tokens")))
            .otherwise(F.lit(0.0)).alias("logppl"),
        )
    )
