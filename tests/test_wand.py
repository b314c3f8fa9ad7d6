"""Block-max WAND pruning: results identical to exhaustive scoring."""

import pytest

from golucene_spark.corpus import make_corpus
from golucene_spark.index import CorpusSpec, IndexBuilder, MaterializedIndex
from golucene_spark.search import Searcher, parse_query
from golucene_spark.search.wand import wand_topk


@pytest.fixture(scope="module")
def mat_index(spark, tmp_path_factory):
    pdf = make_corpus(600, seed=42)
    df = spark.createDataFrame(pdf).repartition(4)
    ixdir = str(tmp_path_factory.mktemp("ixw"))
    IndexBuilder(spark, CorpusSpec.source_code(), num_segments=4).build(df, ixdir)
    return MaterializedIndex(spark, ixdir)


@pytest.mark.parametrize(
    "qs",
    [
        "content:return",                    # hot single term
        "content:zyzzyva_rare0",             # singleton
        "content:parse OR content:tokenize",
        "content:return OR content:func OR content:import",
        "content:missingterm123",
        "content:parse AND content:buffer",  # non-prunable shape -> fallback
    ],
)
def test_wand_equals_exhaustive(mat_index, qs):
    s = Searcher(mat_index, "bm25")
    q = parse_query(qs)
    exact = [(r["doc_id"], round(r["score"], 9)) for r in s.search(q, 10).collect()]
    pruned = [(r["doc_id"], round(r["score"], 9)) for r in wand_topk(s, q, 10).collect()]
    assert exact == pruned, qs
