"""Deterministic synthetic source-code corpus (FIXTURES.md F1).

Generates the input-table shape demanded by BASELINE.json input_hint:
(repo:string, path:string, commit:string, lang:string, content:string),
seed=42, Zipf token distribution so hot-term skew exists.  Pure
NumPy — fast enough to generate 200k rows for the scaling bench.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

KEYWORDS = "if return func for while import class def else break continue switch case".split()
IDENTS = [
    "parse", "tokenize", "buffer", "index", "writer", "reader", "scorer",
    "camelCase", "snake_case", "foo.bar", "qualified.name.attr", "goroutine",
    "channel", "mutex", "handler", "request", "response", "config", "logger",
    "metric", "shard", "segment", "query", "filter", "merge", "flush",
    "commit2", "branch", "vector", "matrix", "tensor", "batch", "stream",
]
LITERALS = ["3.14", "1024", "0.5", "42", "2.718", "1,024", "999"]
STOPS = "the a an and of to in is that it for on with as at by".split()
COMMENT_WORDS = [
    "returns", "value", "error", "when", "input", "empty", "computes",
    "result", "given", "list", "items", "must", "never", "always",
]
RARE = [f"zyzzyva_rare{i}" for i in range(20)]
LANGS = ["go", "py", "java", "js", "rs", "c"]
EXT = {"go": "go", "py": "py", "java": "java", "js": "js", "rs": "rs", "c": "c"}

VOCAB = KEYWORDS + IDENTS + LITERALS + STOPS + COMMENT_WORDS + RARE


def make_corpus(n_rows: int, seed: int = 42, min_tokens: int = 50, max_tokens: int = 600) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    vocab = np.array(VOCAB, dtype=object)
    # Zipf ranks over the vocab: keywords are hottest
    ranks = np.arange(1, len(vocab) + 1, dtype=np.float64)
    probs = 1.0 / ranks**1.1
    probs /= probs.sum()

    lens = rng.integers(min_tokens, max_tokens + 1, size=n_rows)
    total = int(lens.sum())
    toks = rng.choice(vocab, size=total, p=probs)
    offs = np.zeros(n_rows + 1, dtype=np.int64)
    np.cumsum(lens, out=offs[1:])

    lang_idx = rng.integers(0, len(LANGS), size=n_rows)
    rows = []
    for i in range(n_rows):
        content = " ".join(toks[offs[i]:offs[i + 1]].tolist())
        # sprinkle one rare term into a deterministic subset of docs
        if i % 97 == 0:
            content += " " + RARE[(i // 97) % len(RARE)]
        lang = LANGS[lang_idx[i]]
        repo = f"org{i % 7}/repo{i % 41}"
        path = f"src/dir{i % 13}/file{i}.{EXT[lang]}"
        commit = hashlib.sha1(f"{repo}|{path}|{i}".encode()).hexdigest()
        rows.append((repo, path, commit, lang, content))
    return pd.DataFrame(rows, columns=["repo", "path", "commit", "lang", "content"])


def corpus_df(spark, n_rows: int, seed: int = 42, partitions: int | None = None, **kw):
    pdf = make_corpus(n_rows, seed, **kw)
    df = spark.createDataFrame(pdf)
    return df.repartition(partitions) if partitions else df
