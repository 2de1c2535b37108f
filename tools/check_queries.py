"""Ad-hoc driver-gate check for a subset of queries.

Usage: python tools/check_queries.py q1 q2 ... [--sf /root/testdata/sf0.01]
Mirrors the driver compare: sort columns by name, rows by all columns,
compare values exactly.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

import ray


def _oracle(sql, sf_dir):
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")
    return con.execute(sql).df()


def _norm(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(list(df.columns), na_position="first")
    return df.reset_index(drop=True)


def _to_df(res):
    if isinstance(res, pd.DataFrame):
        return res
    if hasattr(res, "to_pandas"):
        return res.to_pandas()
    return pd.DataFrame(res)


def main():
    args = sys.argv[1:]
    sf = "/root/testdata/sf0.001"
    if "--sf" in args:
        i = args.index("--sf")
        sf = args[i + 1]
        del args[i:i + 2]
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=16, include_dashboard=False,
                 ignore_reinit_error=True)
    import __ray_entry__ as entrymod
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    names = args or list(qs)
    bad = 0
    for name in names:
        fn = qs[name]
        try:
            got = _norm(_to_df(fn(sf)))
        except Exception as e:
            print(f"{name}: ENGINE ERROR {e!r}")
            bad += 1
            continue
        if name not in oracles:
            print(f"{name}: rows-only, {len(got)} rows")
            continue
        try:
            want = _norm(_oracle(oracles[name], sf))
        except Exception as e:
            print(f"{name}: ORACLE ERROR {e!r}")
            bad += 1
            continue
        if list(got.columns) != list(want.columns):
            print(f"{name}: COLS {list(got.columns)} != {list(want.columns)}")
            bad += 1
        elif len(got) != len(want):
            print(f"{name}: ROWS {len(got)} != {len(want)}")
            bad += 1
        else:
            ok = True
            for col in got.columns:
                a, b = got[col].fillna("\0").astype(str), \
                    want[col].fillna("\0").astype(str)
                if not (a == b).all():
                    print(f"{name}: VALUES differ in {col}")
                    print(pd.concat([got[col][a != b].head(3),
                                     want[col][a != b].head(3)], axis=1))
                    ok = False
                    bad += 1
                    break
            if ok:
                print(f"{name}: exact ({len(got)} rows)")
    ray.shutdown()
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
