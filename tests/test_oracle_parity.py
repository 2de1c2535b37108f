"""Driver-gate rehearsal: every queries() entry vs its DuckDB oracle.

Mimics the graft driver's correctness check: run the Ray pipeline and the
oracle SQL on the same sf directory, sort columns by name and rows by all
columns, and compare values exactly.
"""

import duckdb
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"


def _oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')")
    return con.execute(sql).df()


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(list(df.columns), na_position="first")
    return df.reset_index(drop=True)


def _to_df(res) -> pd.DataFrame:
    if isinstance(res, pd.DataFrame):
        return res
    if hasattr(res, "to_pandas"):
        return res.to_pandas()
    return pd.DataFrame(res)


def test_documents_text_is_ascii():
    # the winnow_fingerprints SQL oracle uses ascii(substr(text, i, 1)) as
    # the BYTE at position i — exact only while the synthetic documents
    # texts are pure ASCII (they are; this pins the assumption)
    con = duckdb.connect()
    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        ok, min_len = con.execute(
            "SELECT bool_and(text = encode(text)::VARCHAR), min(len(text)) "
            f"FROM read_parquet('{sf}/documents.parquet')").fetchone()
        assert ok, f"non-ASCII document text in {sf}"
        assert min_len >= 5, "sub-k-gram text would hit the non-SQL path"


@pytest.mark.usefixtures("ray_session")
def test_all_queries_match_oracles():
    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if name not in oracles:
            # rows-only check (may contain list columns → no sort)
            assert len(_to_df(fn(SF_DIR))) >= 0
            continue
        got = _norm(_to_df(fn(SF_DIR)))
        want = _norm(_oracle(oracles[name], SF_DIR))
        if list(got.columns) != list(want.columns):
            failures.append((name, f"columns {list(got.columns)} != {list(want.columns)}"))
            continue
        if len(got) != len(want):
            failures.append((name, f"rows {len(got)} != {len(want)}"))
            continue
        for col in got.columns:
            a, b = got[col], want[col]
            if a.dtype != object and b.dtype != object:
                same = (a.fillna(-1) == b.fillna(-1)).all() \
                    if a.isna().any() or b.isna().any() else (a == b).all()
            else:
                same = (a.fillna("\0") == b.fillna("\0")).all()
            if not same:
                diff = (a.fillna("\0") != b.fillna("\0")) if a.dtype == object \
                    else (a.fillna(-1) != b.fillna(-1))
                i = diff[diff].index[0]
                failures.append((name, f"col {col} row {i}: {a[i]!r} != {b[i]!r}"))
                break
    assert not failures, failures
