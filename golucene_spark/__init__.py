"""golucene_spark — a PySpark-native inverted-index + BM25 search engine.

A from-scratch re-expression of the capabilities of ironsweet/golucene
(a Go port of Apache Lucene 4.10) on top of the PySpark DataFrame API:

- ``analysis``  : vectorized StandardAnalyzer chain (UAX#29 word-break ->
                  lowercase -> stop filter), cf. reference
                  analysis/standard/analyzer.go:49-63.
- ``index``     : partition-parallel inverted-index build with blocked
                  posting lists, per-partition segment manifest
                  (checkpoint/resume), tiered merge with salting.
- ``search``    : TermQuery / BooleanQuery(AND/OR/NOT) with BM25 and
                  classic TF-IDF scoring, top-k with docID tie-break,
                  block-max pruning.
- ``text``      : large-scale corpus operators (dedup, minhash-LSH,
                  simhash, language-id, quality scoring, ANN search).

Everything is DataFrame-first: tokenization runs in Arrow-batched pandas
UDFs; postings construction, intersection (AND), union (OR), anti-join
(NOT) and top-k are plain Catalyst plans so predicate pushdown, partial
aggregation, broadcast joins and AQE apply unchanged at cluster scale.
"""

__version__ = "0.1.0"
