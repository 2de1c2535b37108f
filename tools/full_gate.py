"""Full-gate rehearsal: EVERY queries() entry vs its DuckDB oracle at the
driver's gate scale, written as a committed JSON artifact (the
reproducible evidence ADVICE r4 #4 asked for).

Usage: python tools/full_gate.py [--sf DIR] [--out FILE]
Record format mirrors the driver's CORRECTNESS files: per-query
rows/schema/value-match plus row counts.
"""
import json
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
    sf = "/root/testdata/sf0.01"
    out_path = "FULLGATE_r05.json"
    if "--sf" in args:
        sf = args[args.index("--sf") + 1]
    if "--out" in args:
        out_path = args[args.index("--out") + 1]
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=32, include_dashboard=False,
                 ignore_reinit_error=True)
    import __ray_entry__ as entrymod
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    results = {}
    n_exact = n_rowsonly = n_fail = 0
    for name, fn in qs.items():
        rec = {"rows_match": None, "schema_match": None,
               "hash_match": None, "engine_rows": None,
               "oracle_rows": None, "err": None}
        try:
            got = _norm(_to_df(fn(sf)))
            rec["engine_rows"] = int(len(got))
        except Exception as e:
            rec["err"] = f"engine: {e!r}"[:300]
            n_fail += 1
            results[name] = rec
            print(f"{name}: ENGINE FAIL", flush=True)
            continue
        if name not in oracles:
            rec["err"] = "no_oracle"
            n_rowsonly += 1
            results[name] = rec
            continue
        try:
            want = _norm(_oracle(oracles[name], sf))
            rec["oracle_rows"] = int(len(want))
        except Exception as e:
            rec["err"] = f"oracle: {e!r}"[:300]
            n_fail += 1
            results[name] = rec
            print(f"{name}: ORACLE FAIL", flush=True)
            continue
        rec["schema_match"] = list(got.columns) == list(want.columns)
        rec["rows_match"] = len(got) == len(want)
        if rec["schema_match"] and rec["rows_match"]:
            ok = True
            for col in got.columns:
                a = got[col].fillna("\0").astype(str)
                b = want[col].fillna("\0").astype(str)
                if not (a == b).all():
                    ok = False
                    break
            rec["hash_match"] = ok
        else:
            rec["hash_match"] = False
        if rec["hash_match"]:
            n_exact += 1
        else:
            n_fail += 1
            print(f"{name}: MISMATCH", flush=True)
        results[name] = rec
    summary = {"sf": sf, "total": len(qs), "exact": n_exact,
               "rows_only": n_rowsonly, "fail": n_fail}
    with open(out_path, "w") as f:
        json.dump({"summary": summary, "queries": results}, f, indent=1)
    print(json.dumps(summary))
    ray.shutdown()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
