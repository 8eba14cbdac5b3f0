"""Driver-contract parity inside pytest: run a representative subset
of queries() against their DuckDB oracle_sql() twins at sf0.001 (the
full 22-query sweep lives in tools/check_oracles.py and runs at
sf0.01/0.1)."""

import duckdb
import numpy as np
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

SUBSET = [
    "inject_canonicalize",
    "url_reverse",
    "generate_topn",
    "opic_distribute",
    "opic_update",
    "adaptive_schedule",
    "status_counters",
    "urlseen_antijoin",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "embedding_topk",
    "host_queue_order",
    "text_quality_gopher",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


@pytest.mark.parametrize("name", SUBSET)
def test_query_matches_oracle(spark, duck, name):
    from warps_nutch_spark.queries import ORACLES, QUERIES

    got = _normalize(QUERIES[name](spark, SF_DIR).toPandas())
    want = _normalize(duck.sql(ORACLES[name]).df())
    assert list(got.columns) == list(want.columns), name
    assert len(got) == len(want), name
    for c in got.columns:
        a, b = got[c], want[c]
        if pd.api.types.is_float_dtype(a) or pd.api.types.is_float_dtype(b):
            assert np.allclose(
                a.astype(float), b.astype(float), rtol=1e-6, atol=1e-6, equal_nan=True
            ), (name, c)
        else:
            assert a.astype(str).equals(b.astype(str)), (name, c)


def test_driver_window_rotation():
    """The driver checks only the first DRIVER_WINDOW entries of queries();
    every _FRONT entry (never-checked or modified this round) must sit
    inside that window, and every query key must still be present exactly
    once after rotation."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", "/root/repo/__spark_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    q = mod.queries()
    order = list(q)
    window = set(order[: mod.DRIVER_WINDOW])
    for name in mod._FRONT:
        if name not in q:
            continue  # listed ahead of implementation landing this round
        assert name in window, f"{name} fell outside the driver's 50-row window"
    # rotation must not drop or duplicate anything
    from warps_nutch_spark.queries import ORACLES, QUERIES

    assert set(order) == set(QUERIES) | {"crawl_round"}
    assert len(order) == len(QUERIES) + 1
    # oracle dict mirrors the rotation and stays aligned with queries()
    # (crawl_round gained a constant-VALUES oracle in r5: the SimWeb
    # round is deterministic)
    o = mod.oracle_sql()
    assert set(o) == set(ORACLES) | {"crawl_round"}
    # any query with an oracle that is inside the window in queries() must
    # exist in oracle_sql() so the driver hashes it rather than rows-only
    for name in window & set(ORACLES):
        assert name in o


def test_rotation_hashes():
    """Mechanical rotation-safety invariant (VERDICT r4 item 2): every
    query rotated out of the driver window (not in _FRONT) must be
    byte-identical to the revision pinned at rotation time in
    tools/rotation_hashes.json. Editing a rotated-out query without
    moving it to _FRONT (back under driver eyes) fails here instead of
    going driver-unseen for a round. Regenerate the pin file ONLY at
    rotation time: python tools/pin_rotation.py"""
    import json

    sys_path_tools = "/root/repo/tools"
    import sys

    if sys_path_tools not in sys.path:
        sys.path.insert(0, sys_path_tools)
    import pin_rotation

    with open("/root/repo/tools/rotation_hashes.json") as f:
        pinned = json.load(f)
    live = pin_rotation.compute()
    assert set(live) == set(pinned), (
        "rotated-out query set drifted from the pin file; if you moved "
        "queries between _FRONT/_BACK, rerun tools/pin_rotation.py"
    )
    stale = [n for n in live if live[n] != pinned[n]]
    assert not stale, (
        f"rotated-out queries modified without moving to _FRONT: {stale} "
        "(move them to _FRONT in __spark_entry__.py so the driver "
        "re-checks them, then rerun tools/pin_rotation.py)"
    )
