"""Round-5 regression tests for the ADVICE-r4 fixes.

- recency_weighted_value: corpora spanning >= 63 days must not rely on
  shift-beyond-width behavior (engine) or overflow BIGINT (oracle).
- byte_inventory_by_lang: oracle now counts UTF-8 BYTES (derived from
  codepoints), so non-ASCII corpora stay byte-exact.
"""
import duckdb
import numpy as np
import pandas as pd
import pytest


@pytest.mark.usefixtures("ray_session")
def test_recency_weighted_value_clamps_old_events(tmp_path):
    import ray.data

    from pdf2doi_ray.stages.aggs import recency_weighted_value

    base = pd.Timestamp("2025-01-01")
    rows = []
    # ages 0, 1, 62, 63, 100, 200 days back from the max day
    for uid, age in [(1, 0), (1, 1), (2, 62), (2, 63), (3, 100), (3, 200)]:
        rows.append({"event_id": len(rows), "user_id": uid,
                     "event_type": "view", "value": 8.0,
                     "ts": base + pd.Timedelta(days=200 - age)})
    ev = pd.DataFrame(rows)
    got = recency_weighted_value(
        ray.data.from_pandas(ev).repartition(3)).to_pandas() \
        .set_index("user_id")["recency_score_milli"].to_dict()
    # 8000 milli: age0 → 8000, age1 → 4000, age62 → 8000 >> 62 == 0,
    # age>=63 → exactly 0 (clamped, not undefined)
    assert got == {1: 12000, 2: 0, 3: 0}

    # oracle side: the capped CASE must not overflow BIGINT
    p = tmp_path / "events.parquet"
    ev.to_parquet(p)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM read_parquet('{p}')")
    import __ray_entry__ as entrymod
    want = con.execute(entrymod.oracle_sql()["recency_weighted_value"]) \
        .df().set_index("user_id")["recency_score_milli"].to_dict()
    assert want == got


@pytest.mark.usefixtures("ray_session")
def test_byte_inventory_by_lang_non_ascii_oracle_parity(tmp_path):
    import ray.data

    from pdf2doi_ray.stages.textstats import byte_inventory_by_lang

    docs = pd.DataFrame({
        "doc_id": [0, 1, 2, 3],
        "text": ["héllo wörld", "中文测试 numbers 123",
                 "naïve — em dash \U0001F389", "plain ascii"],
        "lang": ["de", "zh", "fr", "en"],
        "source": ["s"] * 4,
    })
    got = byte_inventory_by_lang(
        ray.data.from_pandas(docs).repartition(2)).to_pandas() \
        .sort_values("lang").reset_index(drop=True)

    p = tmp_path / "documents.parquet"
    docs.to_parquet(p)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{p}')")
    import __ray_entry__ as entrymod
    want = con.execute(entrymod.oracle_sql()["byte_inventory_by_lang"]) \
        .df().sort_values("lang").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], want[sorted(want.columns)],
        check_dtype=False)
    # sanity vs python truth for one lang
    zh = docs.loc[1, "text"].encode()
    row = got.set_index("lang").loc["zh"]
    assert row["n_bytes"] == len(zh)
    assert row["n_distinct_bytes"] == len(set(zh))
