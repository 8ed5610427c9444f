"""Mimic the driver's correctness gate: every queries() entry with an
oracle_sql() twin must match DuckDB (row count + sorted-column value equality)
on the sf0.001 tables."""

import math
import os
import sys

import duckdb
import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import __ray_entry__ as entrymod

SF_DIR = os.environ.get("GRAFT_TEST_SF", "/root/testdata/sf0.001")
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def to_pandas(result):
    import pyarrow as pa
    import ray.data as rd

    if isinstance(result, rd.Dataset):
        return result.to_pandas()
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result


def oracle_df(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con.execute(sql).df()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(name):
    got = normalize(to_pandas(QUERIES[name](SF_DIR)))
    want = normalize(oracle_df(ORACLES[name]))
    assert list(got.columns) == list(want.columns), (got.columns, want.columns)
    assert len(got) == len(want), (len(got), len(want))
    pd.testing.assert_frame_equal(got, want, check_dtype=False, atol=1e-6, rtol=1e-9)


def test_rows_only_queries_run():
    for name in ["cc_labels", "cc_component_sizes", "triangle_count"]:
        df = to_pandas(QUERIES[name](SF_DIR))
        assert len(df) >= 1, name


def test_entry_smoke():
    labels = to_pandas(entrymod.entry())
    assert len(labels) > 0
    assert set(labels.columns) == {"vertex", "label"}


def test_self_gating_no_oracle_entries_certify():
    """The four no-oracle entries are self-gating by construction
    (VERDICT r4 #4): each result row carries its own pass/fail evidence
    the driver can eyeball."""
    lang = to_pandas(QUERIES["lang_id"](SF_DIR))
    assert bool(lang["passed"].iloc[0]) and lang["accuracy"].iloc[0] >= 0.95
    hll = to_pandas(QUERIES["hll_distinct_users"](SF_DIR))
    assert bool(hll["within_3sigma"].iloc[0])
    hllk = to_pandas(QUERIES["hll_users_per_event_type"](SF_DIR))
    assert hllk["within_3sigma"].all()
    rec = to_pandas(QUERIES["knn_ivf_recall"](SF_DIR))
    assert (rec["recall"] >= 0.0).all() and len(rec) > 0
