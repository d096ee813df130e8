"""Driver-contract regression tests: queries vs DuckDB oracles at sf0.001.

A fast subset of tools/check_oracles.py wired into pytest so oracle
drift is caught by the ordinary test run. The full sweep (all queries,
sf0.01) stays in tools/check_oracles.py.
"""

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entry_mod

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

FAST_QUERIES = [
    "filter_dsl",
    "concat_tall",
    "concat_wide",
    "reindex",
    "dedupe_keep_first",
    "profile",
    "tpch_q1",
    "tpch_q6",
    "events_hourly",
    "events_sessionize",
    "window_running",
    "rollup_revenue",
    "lang_id",
    "fingerprint",
    "text_stats",
    "ngram_jaccard",
    "embedding_sim_pairs",
    "ann_topk",
    "multimodal_frames",
]


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    yield con
    con.close()


def _normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    for c in pdf.columns:
        if pdf[c].dtype == object:
            pdf[c] = pdf[c].astype(str)
    return pdf.sort_values(list(pdf.columns), ignore_index=True)


@pytest.mark.parametrize("name", FAST_QUERIES)
def test_query_matches_oracle(spark, sf_dir, duck, name):
    spdf = entry_mod.queries()[name](spark, sf_dir).toPandas()
    opdf = duck.execute(entry_mod.oracle_sql()[name]).df()
    assert len(spdf) == len(opdf)
    assert sorted(spdf.columns) == sorted(opdf.columns)
    pd.testing.assert_frame_equal(
        _normalize(spdf), _normalize(opdf), check_dtype=False, check_exact=True
    )


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() == 6
    assert "sum_disc_price" in df.columns


def test_every_query_has_callable_and_oracle_keys_align(spark):
    qs = entry_mod.queries()
    os_ = entry_mod.oracle_sql()
    assert set(os_) <= set(qs)
    assert len(qs) >= 40
    assert len(os_) >= 35
