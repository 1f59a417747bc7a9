"""Driver-contract conformance: every queries() entry runs; SQL-oracled
entries match DuckDB exactly (row count + sorted-value equality — stricter
than the driver's hash compare)."""

import os

import duckdb
import pandas as pd
import pytest

from tests.conftest import SF_DIR

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def entry_mod(ray_session):
    import __ray_entry__ as e

    return e


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con


def _to_df(result) -> pd.DataFrame:
    if isinstance(result, pd.DataFrame):
        return result
    if hasattr(result, "to_pandas"):
        return result.to_pandas()
    raise TypeError(type(result))


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def test_entry_smoke(entry_mod):
    out = _to_df(entry_mod.entry())
    assert len(out) > 0
    assert set(out.columns) == {"query", "rank", "doc_id", "score"}


def test_all_queries_run(entry_mod):
    qs = entry_mod.queries()
    assert len(qs) >= 12
    for name, fn in qs.items():
        out = _to_df(fn(SF_DIR))
        assert out is not None, name


# every ORACLE_SQL entry is gated here — a new oracle claim that is never
# CI-compared would let regressions slip to the driver run (ADVICE r2)
from poseidon_ray.pipelines.ops import ORACLE_SQL as _ORACLE_SQL


@pytest.mark.parametrize("name", sorted(_ORACLE_SQL))
def test_oracle_match(entry_mod, ddb, name):
    qs, sqls = entry_mod.queries(), entry_mod.oracle_sql()
    assert name in sqls
    mine = _canon(_to_df(qs[name](SF_DIR)))
    oracle = _canon(ddb.execute(sqls[name]).df())
    assert len(mine) == len(oracle), f"{name}: {len(mine)} vs {len(oracle)}"
    pd.testing.assert_frame_equal(mine, oracle, check_dtype=False)


def test_every_oracle_has_query(entry_mod):
    qs, sqls = entry_mod.queries(), entry_mod.oracle_sql()
    assert set(sqls) <= set(qs)
