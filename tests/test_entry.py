"""Driver-contract smoke: entry()/queries()/oracle_sql() shape checks."""

import sys

import pytest


@pytest.fixture(scope="module")
def entry_mod():
    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as e

    return e


def test_entry_runs(entry_mod):
    ds = entry_mod.entry()
    n = ds.count()
    assert n > 0
    names = set(ds.schema().names)
    assert {"id", "rank", "out_degree", "in_degree"} == names


def test_registries_consistent(entry_mod):
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    assert len(qs) >= 40
    # every oracle key has a query; SQL strings are non-trivial
    assert set(oracles) <= set(qs)
    assert all(isinstance(s, str) and "SELECT" in s.upper() for s in oracles.values())
    assert all(callable(f) for f in qs.values())


def test_one_query_smoke(entry_mod):
    out = entry_mod.queries()["degree_out"]("/root/testdata/sf0.001")
    df = out.to_pandas() if hasattr(out, "to_pandas") else out
    assert len(df) > 0 and set(df.columns) == {"id", "out_degree"}
