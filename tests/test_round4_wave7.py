"""Round-4 wave-7 relational operators: Q9 profit, Q2 argmin, Q16 counts."""

import datetime

import pandas as pd
import pytest


def _rd(df, blocks=3):
    import ray.data
    return ray.data.from_pandas(df).repartition(blocks)


@pytest.mark.usefixtures("ray_session")
def test_cheapest_supplier_tiebreak_smallest_suppkey():
    """Equal-price offers resolve to the smallest supplier key, at every
    block split (the composite Min must be split-invariant)."""
    from pdf2doi_ray.stages.joins import cheapest_supplier_per_part

    li = pd.DataFrame({
        "l_partkey": [1, 1, 1, 2, 2, 3],
        "l_suppkey": [9, 4, 7, 5, 6, 8],
        # part 1: 9 and 4 tie at the min price; part 2: 6 is cheaper
        "l_extendedprice": [10.0, 10.0, 12.5, 20.0, 19.99, 7.0]})
    part = pd.DataFrame({"p_partkey": [1, 2, 3], "p_size": [5, 5, 50]})

    for blocks in (1, 4):
        got = cheapest_supplier_per_part(
            _rd(li, blocks), _rd(part, 1), max_size=10) \
            .to_pandas().sort_values("p_partkey").reset_index(drop=True)
        assert got["p_partkey"].tolist() == [1, 2]  # part 3 too big
        assert got["best_suppkey"].tolist() == [4, 6]
        assert got["best_price_milli"].tolist() == [10000, 19990]


@pytest.mark.usefixtures("ray_session")
def test_supplier_counts_dedup_across_parts_of_one_class():
    """A supplier supplying TWO parts of the same (brand, type, size)
    class counts once — the dedup key is the class, not the part."""
    from pdf2doi_ray.stages.joins import supplier_counts_by_part_class

    part = pd.DataFrame({
        "p_partkey": [1, 2, 3],
        "p_brand": ["B2", "B2", "B1"],
        "p_type": ["T", "T", "T"],
        "p_size": pd.array([7, 7, 7], dtype="int32")})
    li = pd.DataFrame({
        "l_partkey": [1, 2, 1, 2, 3],
        "l_suppkey": [100, 100, 101, 102, 100]})

    got = supplier_counts_by_part_class(
        _rd(li), _rd(part, 1), exclude_brand="B1") \
        .to_pandas().reset_index(drop=True)
    assert len(got) == 1
    assert got.loc[0, "supplier_cnt"] == 3  # 100 once, 101, 102
    assert str(got["p_size"].dtype) == "int64"


@pytest.mark.usefixtures("ray_session")
def test_profit_by_nation_year_handbuilt():
    """Exact milli-profit on a handbuilt star: revenue kernel minus
    retail_milli*qty, grouped by supplier nation and ship year."""
    from pdf2doi_ray.stages.joins import profit_by_nation_year

    nation = pd.DataFrame({"n_nationkey": [0, 1],
                           "n_name": ["ALPHA", "BETA"],
                           "n_regionkey": [0, 0]})
    supplier = pd.DataFrame({"s_suppkey": [10, 11],
                             "s_nationkey": [0, 1]})
    part = pd.DataFrame({"p_partkey": [1, 2],
                         "p_name": ["red widget", "blue bolt"],
                         "p_retailprice": [5.00, 9.99]})
    li = pd.DataFrame({
        "l_partkey": [1, 1, 2],
        "l_suppkey": [10, 11, 10],
        "l_quantity": [2.0, 1.0, 3.0],
        "l_extendedprice": [20.00, 8.00, 30.00],
        "l_discount": [0.0, 0.5, 0.1],
        "l_shipdate": [datetime.datetime(1995, 3, 1),
                       datetime.datetime(1996, 7, 1),
                       datetime.datetime(1995, 1, 1)]})

    got = profit_by_nation_year(
        _rd(nation, 1), _rd(supplier, 1), _rd(li), _rd(part, 1),
        name_substr="widget").to_pandas() \
        .sort_values(["n_name", "o_year"]).reset_index(drop=True)
    # part 2 is not a widget; row1: 20000 - 5000*2 = 10000 (ALPHA 1995);
    # row2: floor(8*0.5*1000)=4000 - 5000*1 = -1000 (BETA 1996)
    assert got.values.tolist() == [["ALPHA", 1995, 10000],
                                   ["BETA", 1996, -1000]]


@pytest.mark.usefixtures("ray_session")
def test_longest_streak_fuzz_vs_python_oracle():
    """Sorted-block streak engine == brute-force per-user scan, under
    many users spanning many blocks (edge-user stitch exercised)."""
    import numpy as np
    import ray.data

    from pdf2doi_ray.stages.windows import longest_streak_per_user

    rng = np.random.default_rng(407)
    n = 3000
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": rng.integers(0, 40, n).astype(np.int64),
        "ts": pd.to_datetime(
            rng.integers(0, 86400, n) * 1_000_000, unit="us"),
        "event_type": rng.choice(["a", "b", "c"], n)})

    want = {}
    srt = df.sort_values(["user_id", "ts", "event_id"])
    for uid, g in srt.groupby("user_id"):
        best = run = 0
        prev = None
        for t in g["event_type"]:
            run = run + 1 if t == prev else 1
            prev = t
            best = max(best, run)
        want[uid] = best

    for blocks in (1, 7):
        got = longest_streak_per_user(
            ray.data.from_pandas(df).repartition(blocks)).to_pandas()
        got = dict(zip(got["user_id"], got["longest_streak"]))
        assert got == want


@pytest.mark.usefixtures("ray_session")
def test_peak_hour_tiebreak_earlier_hour():
    """Equal peak counts resolve to the smaller hour of day."""
    import ray.data

    from pdf2doi_ray.stages.windows import peak_hour_by_type

    ts = pd.to_datetime([
        "2024-01-01 03:10", "2024-01-01 03:20",   # hour 3 ×2
        "2024-01-02 01:00", "2024-01-02 01:30",   # hour 1 ×2 (tie → 1)
        "2024-01-01 22:00"])
    df = pd.DataFrame({"ts": ts, "event_type": ["x"] * 5})
    got = peak_hour_by_type(ray.data.from_pandas(df).repartition(2)) \
        .to_pandas()
    assert got.values.tolist() == [["x", 1, 2]]


@pytest.mark.usefixtures("ray_session")
def test_reciprocal_pairs_handbuilt():
    """Only both-direction pairs survive; self-loops drop; counts land
    on the canonical (min, max) orientation."""
    import ray.data

    from pdf2doi_ray.stages.graph import reciprocal_pairs

    edges = pd.DataFrame({
        "src": ["a", "b", "a", "c", "c"],
        "dst": ["b", "a", "c", "c", "d"],
        "n_links": [3, 2, 1, 9, 4]})
    got = reciprocal_pairs(ray.data.from_pandas(edges).repartition(3)) \
        .to_pandas().sort_values(["host_a", "host_b"]) \
        .reset_index(drop=True)
    # a<->b reciprocal; a->c one-way; c->c self-loop; c->d one-way
    assert got.values.tolist() == [["a", "b", 3, 2]]


@pytest.mark.usefixtures("ray_session")
def test_out_degree_histogram_handbuilt():
    import ray.data

    from pdf2doi_ray.stages.graph import out_degree_histogram

    edges = pd.DataFrame({
        "src": ["a", "a", "a", "b", "c", "d"],
        "dst": ["x", "y", "z", "x", "x", "y"],
        "n_links": [1] * 6})
    got = out_degree_histogram(
        ray.data.from_pandas(edges).repartition(3)).to_pandas() \
        .sort_values("out_degree").reset_index(drop=True)
    # a: degree 3; b, c, d: degree 1
    assert got.values.tolist() == [[1, 3], [3, 1]]


@pytest.mark.usefixtures("ray_session")
def test_hapax_stats_handbuilt():
    import ray.data

    from pdf2doi_ray.stages.corpus import hapax_stats_by_lang

    docs = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "lang": ["en", "en", "de"],
        "text": ["cat dog  cat", "dog fish", "cat"]})
    got = hapax_stats_by_lang(
        ray.data.from_pandas(docs).repartition(3)).to_pandas() \
        .sort_values("lang").reset_index(drop=True)
    # de: {cat:1} → 1 hapax / 1 vocab
    # en: {cat:2, dog:2, fish:1} → 1 hapax / 3 vocab
    assert got.values.tolist() == [["de", 1, 1], ["en", 1, 3]]


@pytest.mark.usefixtures("ray_session")
def test_scd2_fuzz_vs_python_oracle():
    """SCD2 intervals == brute-force per-user collapse under many users
    spanning blocks; open intervals carry NULL valid_to."""
    import numpy as np
    import ray.data

    from pdf2doi_ray.stages.windows import scd2_user_state

    rng = np.random.default_rng(1311)
    n = 2500
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": rng.integers(0, 30, n).astype(np.int64),
        "ts": pd.to_datetime(
            rng.integers(0, 86400, n) * 1_000_000, unit="us"),
        "event_type": rng.choice(["a", "b"], n)})

    want = set()
    srt = df.sort_values(["user_id", "ts", "event_id"])
    for uid, g in srt.groupby("user_id"):
        rows = list(zip(g["event_type"],
                        g["ts"].astype("int64") // 1000))
        changes = [(t, us) for i, (t, us) in enumerate(rows)
                   if i == 0 or rows[i - 1][0] != t]
        for i, (t, us) in enumerate(changes):
            to = changes[i + 1][1] if i + 1 < len(changes) else None
            want.add((uid, t, us, to))

    for blocks in (1, 6):
        got = scd2_user_state(
            ray.data.from_pandas(df).repartition(blocks)).to_pandas()
        gset = set(
            (r.user_id, r.event_type, r.valid_from_us,
             None if pd.isna(r.valid_to_us) else int(r.valid_to_us))
            for r in got.itertuples())
        assert gset == want


@pytest.mark.usefixtures("ray_session")
def test_bibliographic_coupling_handbuilt_and_fanout_cap():
    import ray.data

    from pdf2doi_ray.stages.graph import bibliographic_coupling

    edges = pd.DataFrame({
        "src": ["a", "a", "b", "b", "c", "a"],
        "dst": ["x", "y", "x", "z", "x", "x"],   # a→x duplicated
        "n_links": [1, 1, 1, 1, 1, 1]})
    got = bibliographic_coupling(
        ray.data.from_pandas(edges).repartition(3)).to_pandas() \
        .sort_values(["host_a", "host_b"]).reset_index(drop=True)
    # common dsts: (a,b): {x}; (a,c): {x}; (b,c): {x}
    # degrees: a=2, b=2, c=1
    assert got.values.tolist() == [["a", "b", 1, 3], ["a", "c", 1, 2],
                                   ["b", "c", 1, 2]]

    with pytest.raises(Exception, match="max_fanout"):
        bibliographic_coupling(
            ray.data.from_pandas(edges), max_fanout=2).to_pandas()


@pytest.mark.usefixtures("ray_session")
def test_gap_histogram_fuzz_vs_python_oracle():
    """Gap buckets == brute-force lag over per-user sorted events,
    including cross-block user boundaries; bucketing is pure-integer."""
    import numpy as np
    import ray.data

    from pdf2doi_ray.stages.windows import user_gap_histogram

    rng = np.random.default_rng(733)
    n = 2000
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": rng.integers(0, 25, n).astype(np.int64),
        "ts": pd.to_datetime(
            rng.integers(0, 10**9, n) * 1_000_000, unit="us")})

    want = {}
    srt = df.sort_values(["user_id", "ts", "event_id"])
    for _, g in srt.groupby("user_id"):
        us = (g["ts"].astype("int64") // 1000).to_numpy()
        for gap in (us[1:] - us[:-1]):
            b = (int(gap) // 1_000_000 + 1).bit_length() - 1
            want[b] = want.get(b, 0) + 1

    for blocks in (1, 5):
        got = user_gap_histogram(
            ray.data.from_pandas(df).repartition(blocks)).to_pandas()
        assert dict(zip(got["gap_bucket"], got["n_gaps"])) == want


@pytest.mark.usefixtures("ray_session")
def test_impute_group_median_handbuilt():
    """NULLs fill with the group's exact lower median of non-nulls."""
    import ray.data

    from pdf2doi_ray.stages.aggs import impute_with_group_medians

    df = pd.DataFrame({
        "id": [1, 2, 3, 4, 5, 6],
        "grp": ["a", "a", "a", "a", "b", "b"],
        "val": [10.0, None, 30.0, 20.0, None, 7.5]})
    got = impute_with_group_medians(
        ray.data.from_pandas(df).repartition(3), "grp", "val", "id") \
        .to_pandas().sort_values("id").reset_index(drop=True)
    # a non-null: [10, 30, 20] → lower median 20; b: [7.5] → 7.5
    assert got["value_milli"].tolist() == [10000, 20000, 30000, 20000,
                                           7500, 7500]
    assert got["was_imputed"].tolist() == [False, True, False, False,
                                           True, False]


@pytest.mark.usefixtures("ray_session")
def test_clustering_coefficients_handbuilt():
    """K4 minus one edge: triangle membership and wedge counts exact;
    degree-ordered orientation never double-counts a triangle."""
    import ray.data

    from pdf2doi_ray.stages.graph import clustering_coefficients

    # nodes a,b,c,d; edges: ab, ac, bc, bd, cd (two triangles abc, bcd)
    edges = pd.DataFrame({
        "src": ["a", "c", "b", "d", "c", "a"],   # directions mixed, one dup
        "dst": ["b", "a", "c", "b", "d", "b"],
        "n_links": [1] * 6})
    got = clustering_coefficients(
        ray.data.from_pandas(edges).repartition(3)).to_pandas() \
        .sort_values("host").reset_index(drop=True)
    # deg: a=2, b=3, c=3, d=2 → wedges 1, 3, 3, 1
    # triangles per node: a∈{abc}=1, b∈{abc,bcd}=2, c=2, d=1
    assert got.values.tolist() == [["a", 1, 1], ["b", 2, 3],
                                   ["c", 2, 3], ["d", 1, 1]]


@pytest.mark.usefixtures("ray_session")
def test_clustering_triangle_free_graph_zero():
    import ray.data

    from pdf2doi_ray.stages.graph import clustering_coefficients

    # 4-cycle: wedges exist, no triangles
    edges = pd.DataFrame({
        "src": ["a", "b", "c", "d"],
        "dst": ["b", "c", "d", "a"],
        "n_links": [1] * 4})
    got = clustering_coefficients(
        ray.data.from_pandas(edges)).to_pandas()
    assert got["n_triangles"].tolist() == [0, 0, 0, 0]
    assert got["n_wedges"].tolist() == [1, 1, 1, 1]


@pytest.mark.usefixtures("ray_session")
def test_rate_by_value_decile_handbuilt():
    """Tile = #{boundaries <= v} with the exact rank rule; rates per
    tile are exact integer sums."""
    import ray.data

    from pdf2doi_ray.stages.aggs import rate_by_value_decile

    # 20 rows, values 1..20, found on evens
    df = pd.DataFrame({"value": range(1, 21),
                       "found": [v % 2 == 0 for v in range(1, 21)]})
    df["found"] = df["found"].astype("int64")
    got = rate_by_value_decile(
        ray.data.from_pandas(df).repartition(4), n_tiles=10).to_pandas() \
        .sort_values("decile").reset_index(drop=True)
    # boundaries at ranks ceil(q*20/1000) for q=100..900 → values 2,4,..18
    # decile d covers 2 values; exactly one even in each pair
    assert got["decile"].tolist() == list(range(10))
    assert got["n_pages"].tolist() == [1, 2, 2, 2, 2, 2, 2, 2, 2, 3]
    assert got["n_found"].sum() == 10


@pytest.mark.usefixtures("ray_session")
def test_excess_share_cross_multiplied_rule():
    import ray.data

    from pdf2doi_ray.stages.aggs import excess_share_suppliers

    li = pd.DataFrame({
        "l_partkey": [1, 1, 1, 2, 2],
        "l_suppkey": [7, 8, 9, 7, 8],
        "l_quantity": [10.0, 1.0, 1.0, 5.0, 5.0]})
    part = pd.DataFrame({"p_partkey": [1, 2],
                         "p_name": ["red bolt", "red gear"]})
    got = excess_share_suppliers(
        ray.data.from_pandas(li).repartition(2),
        ray.data.from_pandas(part), name_substr="red").to_pandas()
    # part 1: ns=3 tot=12 → supplier 7: 10*3=30 > 24 → dominant
    # part 2: ns=2 tot=10 → 5*2=10 not > 20
    assert got.values.tolist() == [[1, 7, 10, 12, 3]]


@pytest.mark.usefixtures("ray_session")
def test_minmax_normalize_constant_group_zero():
    import ray.data

    from pdf2doi_ray.stages.aggs import minmax_normalize_by_group

    df = pd.DataFrame({
        "id": [1, 2, 3, 4],
        "grp": ["a", "a", "b", "b"],
        "val": [1.0, 3.0, 5.0, 5.0]})
    got = minmax_normalize_by_group(
        ray.data.from_pandas(df).repartition(2), "grp", "val", "id") \
        .to_pandas().sort_values("id").reset_index(drop=True)
    assert got["norm_permille"].tolist() == [0, 1000, 0, 0]


@pytest.mark.usefixtures("ray_session")
def test_day_over_day_calendar_semantics_across_gap():
    """prev is the previous CALENDAR day: a gap day yields NULL prev,
    not the last existing day's count."""
    import ray.data

    from pdf2doi_ray.stages.windows import day_over_day_change

    day = 86400
    ts = pd.to_datetime([0, 10, day + 5, 3 * day + 1], unit="s")
    df = pd.DataFrame({"ts": ts, "event_type": ["x"] * 4})
    got = day_over_day_change(ray.data.from_pandas(df)).to_pandas() \
        .sort_values("day").reset_index(drop=True)
    assert got["day"].tolist() == [0, 1, 3]
    assert got["n_events"].tolist() == [2, 1, 1]
    prev = got["prev_n_events"].tolist()
    assert pd.isna(prev[0]) and prev[1] == 2 and pd.isna(prev[2])


@pytest.mark.usefixtures("ray_session")
def test_dense_hourly_zero_fill():
    import ray.data

    from pdf2doi_ray.stages.windows import dense_hourly_counts

    ts = pd.to_datetime([0, 3 * 3600, 3 * 3600 + 10], unit="s")
    df = pd.DataFrame({"ts": ts, "event_type": ["a", "a", "b"]})
    got = dense_hourly_counts(ray.data.from_pandas(df)).to_pandas() \
        .sort_values(["event_type", "hour_bucket"]).reset_index(drop=True)
    # hours 0..3 × types a,b = 8 rows; zeros in the middle
    assert len(got) == 8
    assert got[got.event_type == "a"]["n_events"].tolist() == [1, 0, 0, 1]
    assert got[got.event_type == "b"]["n_events"].tolist() == [0, 0, 0, 1]


@pytest.mark.usefixtures("ray_session")
def test_user_ltv_bucket_edges():
    import ray.data

    from pdf2doi_ray.stages.aggs import user_ltv_buckets

    # totals (milli, per-value IEEE floor): u1 = 0 → bucket 0;
    # u2 = 1 → bucket 1; u3 = floor(1.023·1000) = 1022 (binary 1.023 is
    # just under) → 1023 → bucket 9; u4 = 1000 + 47 = 1047 → bucket 10
    df = pd.DataFrame({
        "user_id": [1, 2, 3, 4, 4],
        "value": [0.0, 0.001, 1.023, 1.0, 0.047]})
    got = user_ltv_buckets(ray.data.from_pandas(df).repartition(2)) \
        .to_pandas().sort_values("ltv_bucket").reset_index(drop=True)
    assert got.values.tolist() == [[0, 1], [1, 1], [9, 1], [10, 1]]


@pytest.mark.usefixtures("ray_session")
def test_token_budget_largest_remainder_ties():
    """Quotas sum exactly to the budget; leftover units go to the
    largest remainders, ties to the smaller group name."""
    import ray.data

    from pdf2doi_ray.stages.corpus import token_budget_allocation

    docs = pd.DataFrame({
        "text": ["a b c", "d e", "f g", "h i", "j"],
        "lang": ["en", "de", "fr", "zh", "es"]})
    # counts: en 3, de 2, fr 2, zh 2, es 1 (total 10), budget 7:
    # base = [2,1,1,1,0], rem = [1,4,4,4,7]/10, leftover = 2
    # rank: es(7), then de/fr/zh tie(4) → de wins name tie → es,de +1
    got = token_budget_allocation(
        ray.data.from_pandas(docs).repartition(2), budget=7,
        group_col="lang").set_index("group")["quota"].to_dict()
    assert got == {"en": 2, "de": 2, "fr": 1, "zh": 1, "es": 1}
    assert sum(got.values()) == 7


@pytest.mark.usefixtures("ray_session")
def test_user_growth_curve_handbuilt():
    import ray.data

    from pdf2doi_ray.stages.aggs import user_growth_curve

    day = 86400
    df = pd.DataFrame({
        "user_id": [1, 1, 2, 3, 3],
        "ts": pd.to_datetime([0, 2 * day, 2 * day, day, 3 * day],
                             unit="s")})
    got = user_growth_curve(ray.data.from_pandas(df).repartition(2))
    assert got.values.tolist() == [[0, 1, 1], [1, 1, 2], [2, 1, 3]]


@pytest.mark.usefixtures("ray_session")
def test_url_pattern_collapse():
    import ray.data

    from pdf2doi_ray.stages.corpus import url_pattern_counts

    df = pd.DataFrame({"url": [
        "https://h1.example.org/p/2024/01/a",
        "https://h1.example.org/p/2023/12/a",
        "https://h1.example.org/q"]})
    got = url_pattern_counts(ray.data.from_pandas(df)).to_pandas() \
        .sort_values("pattern").reset_index(drop=True)
    assert got.values.tolist() == [
        ["h1.example.org", "https://hN.example.org/p/N/N/a", 2],
        ["h1.example.org", "https://hN.example.org/q", 1]]


@pytest.mark.usefixtures("ray_session")
def test_session_length_histogram_fuzz():
    """Session-length histogram == brute-force gap-cumsum per user,
    across block splits."""
    import numpy as np
    import ray.data

    from pdf2doi_ray.stages.windows import session_length_histogram

    rng = np.random.default_rng(99)
    n = 1500
    df = pd.DataFrame({
        "user_id": rng.integers(0, 20, n).astype(np.int64),
        "ts": pd.to_datetime(
            rng.integers(0, 5 * 86400, n) * 1_000_000, unit="us")})

    want = {}
    gap_us = 1800 * 1_000_000
    for _, g in df.sort_values(["user_id", "ts"]).groupby("user_id"):
        us = (g["ts"].astype("int64") // 1000).to_numpy()
        ln = 0
        for i in range(len(us)):
            if i == 0 or us[i] - us[i - 1] > gap_us:
                if ln:
                    want[ln] = want.get(ln, 0) + 1
                ln = 0
            ln += 1
        want[ln] = want.get(ln, 0) + 1

    for blocks in (1, 6):
        got = session_length_histogram(
            ray.data.from_pandas(df).repartition(blocks)).to_pandas()
        assert dict(zip(got["session_len"], got["n_sessions"])) == want


@pytest.mark.usefixtures("ray_session")
def test_verbose_docs_gate_handbuilt():
    import ray.data

    from pdf2doi_ray.stages.corpus import verbose_docs_vs_lang_median

    docs = pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "lang": ["en"] * 4,
        # token counts 2, 2, 4, 2 → median 2; only 4 > 1.5×2 = 3
        "text": ["a b", "c d", "e f g h", "i j"]})
    got = verbose_docs_vs_lang_median(
        ray.data.from_pandas(docs).repartition(2)).to_pandas()
    assert got.values.tolist() == [[3, "en", 4, 2]]


@pytest.mark.usefixtures("ray_session")
def test_global_rank_fuzz_across_blocks():
    """Global zipWithIndex == argsort rank, at several block splits,
    including duplicate values (event_id breaks ties)."""
    import numpy as np
    import ray.data

    from pdf2doi_ray.stages.aggs import global_value_rank

    rng = np.random.default_rng(17)
    n = 2000
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "value": rng.integers(0, 50, n) / 10.0})   # heavy ties

    vm = np.floor(df["value"].to_numpy() * 1000).astype(np.int64)
    order = np.lexsort((df["event_id"].to_numpy(), vm))
    want = np.empty(n, dtype=np.int64)
    want[order] = np.arange(1, n + 1)

    for blocks in (1, 8):
        got = global_value_rank(
            ray.data.from_pandas(df).repartition(blocks)).to_pandas()
        got = got.set_index("event_id")["rank"]
        assert (got.loc[df["event_id"]].to_numpy() == want).all()


@pytest.mark.usefixtures("ray_session")
def test_ks_statistic_handbuilt():
    """KS numerator on a handbuilt pair: A = {1,2}, B = {2,3} →
    max |cumA*nB - cumB*nA| = 2 at vm=1000."""
    import ray.data

    from pdf2doi_ray.stages.aggs import ks_statistic_value

    df = pd.DataFrame({
        "event_type": ["click", "click", "purchase", "purchase", "view"],
        "value": [1.0, 2.0, 2.0, 3.0, 9.0]})
    got = ks_statistic_value(ray.data.from_pandas(df).repartition(2))
    assert got.values.tolist() == [[2, 1000, 2, 2]]


@pytest.mark.usefixtures("ray_session")
def test_funnel_steps_strict_order():
    """A purchase BEFORE the first click must not count; equal
    timestamps do not advance the funnel (strictly-after rule)."""
    import ray.data

    from pdf2doi_ray.stages.windows import funnel_steps

    ts = pd.to_datetime([10, 20, 30, 10, 15, 5, 20, 20], unit="s")
    df = pd.DataFrame({
        "user_id": [1, 1, 1, 2, 2, 3, 3, 3],
        "event_type": ["view", "click", "purchase",   # u1 full funnel
                       "purchase", "view",            # u2 buys BEFORE view
                       "view", "click", "purchase"],  # u3 purchase ties click
        "ts": ts})
    got = funnel_steps(ray.data.from_pandas(df).repartition(3))
    assert got["n_users"].tolist() == [3, 2, 1]


@pytest.mark.usefixtures("ray_session")
def test_benford_leading_digit_exact_at_power_boundaries():
    import ray.data

    from pdf2doi_ray.stages.aggs import benford_first_digit_counts

    # milli values: 1, 9, 10, 99, 100, 999, 1000 (+ a zero, excluded)
    df = pd.DataFrame({"value": [0.001, 0.009, 0.010, 0.099, 0.1,
                                 0.999, 1.0, 0.0]})
    got = benford_first_digit_counts(
        ray.data.from_pandas(df).repartition(3)).to_pandas() \
        .sort_values("digit").reset_index(drop=True)
    assert got.values.tolist() == [[1, 4], [9, 3]]


@pytest.mark.usefixtures("ray_session")
def test_moving_range_fuzz_vs_python():
    import numpy as np
    import ray.data

    from pdf2doi_ray.stages.windows import value_moving_range_by_type

    rng = np.random.default_rng(55)
    n = 1200
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "event_type": rng.choice(["a", "b", "c"], n),
        "ts": pd.to_datetime(rng.integers(0, 10**6, n) * 1_000_000,
                             unit="us"),
        "value": rng.integers(0, 10000, n) / 10.0})

    want = {}
    srt = df.sort_values(["event_type", "ts", "event_id"])
    for ty, g in srt.groupby("event_type"):
        vm = np.floor(g["value"].to_numpy() * 1000).astype(np.int64)
        d = np.abs(np.diff(vm))
        want[ty] = (int(d.sum()), len(d))

    for blocks in (1, 5):
        got = value_moving_range_by_type(
            ray.data.from_pandas(df).repartition(blocks)).to_pandas()
        gmap = {r.event_type: (r.sum_abs_diff, r.n_diffs)
                for r in got.itertuples()}
        assert gmap == want


@pytest.mark.usefixtures("ray_session")
def test_event_type_overlap_bitmask_handbuilt():
    import ray.data

    from pdf2doi_ray.stages.aggs import event_type_user_overlap

    df = pd.DataFrame({
        "user_id": [1, 1, 1, 2, 2, 3, 3],
        "event_type": ["click", "view", "click",   # u1: click+view
                       "view", "purchase",          # u2: view+purchase
                       "click", "view"]})           # u3: click+view
    got = event_type_user_overlap(
        ray.data.from_pandas(df).repartition(3),
        types=("click", "purchase", "view"))
    m = {(r.type_a, r.type_b): (r.n_common, r.min_size)
         for r in got.itertuples()}
    assert m[("click", "view")] == (2, 2)      # u1, u3
    assert m[("purchase", "view")] == (1, 1)   # u2
    assert m[("click", "purchase")] == (0, 1)


@pytest.mark.usefixtures("ray_session")
def test_max_burst_fuzz_vs_python():
    """Burst max == brute-force trailing-window count per user, across
    block splits (RANGE semantics: peers at equal ts all count)."""
    import numpy as np
    import ray.data

    from pdf2doi_ray.stages.windowfns import max_burst_per_user

    rng = np.random.default_rng(21)
    n = 1500
    W = 60 * 1_000_000
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": rng.integers(0, 15, n).astype(np.int64),
        "ts": pd.to_datetime(
            rng.integers(0, 3600, n) * 1_000_000, unit="us"),
        "value": np.ones(n)})

    want = {}
    for uid, g in df.sort_values(["user_id", "ts"]).groupby("user_id"):
        us = (g["ts"].astype("int64") // 1000).to_numpy()
        best = 0
        for t in us:
            best = max(best, int(((us >= t - W) & (us <= t)).sum()))
        want[uid] = best

    for blocks in (1, 5):
        got = max_burst_per_user(
            ray.data.from_pandas(df).repartition(blocks),
            window_s=60).to_pandas()
        assert dict(zip(got["user_id"], got["max_burst"])) == want


@pytest.mark.usefixtures("ray_session")
def test_gram_matrix_split_invariant():
    """Gram partials sum identically under any block split; values
    match a single-matrix numpy reference."""
    import numpy as np
    import ray.data

    from pdf2doi_ray.stages.similarity import embedding_gram_matrix

    rng = np.random.default_rng(3)
    m = rng.normal(size=(40, 8)).astype(np.float32)
    df = pd.DataFrame({"embedding": [row.tolist() for row in m]})
    q = np.floor(m.astype(np.float64) * 1000.0).astype(np.int64)
    want = q.T @ q

    for blocks in (1, 4):
        got = embedding_gram_matrix(
            ray.data.from_pandas(df).repartition(blocks), dim=8) \
            .to_pandas()
        for r in got.itertuples():
            assert want[r.i, r.j] == r.gram
        assert len(got) == 36


@pytest.mark.usefixtures("ray_session")
def test_weighted_sssp_prefers_cheap_multihop():
    """A 2-hop path of weight 3 beats a direct edge of weight 10."""
    import ray.data

    from pdf2doi_ray.stages.graph import weighted_sssp

    edges = pd.DataFrame({
        "src": ["s", "s", "m", "x"],
        "dst": ["t", "m", "t", "y"],    # x→y unreachable from s
        "n_links": [10, 1, 2, 5]})
    got = weighted_sssp(ray.data.from_pandas(edges).repartition(2),
                        source="s")
    assert dict(zip(got["node"], got["dist"])) == {"s": 0, "m": 1,
                                                   "t": 3}


@pytest.mark.usefixtures("ray_session")
def test_assortativity_sums_path_graph():
    """Path a-b-c: degrees 1,2,1; edges (a,b) and (b,c) each count both
    orientations."""
    import ray.data

    from pdf2doi_ray.stages.graph import degree_assortativity_sums

    edges = pd.DataFrame({
        "src": ["a", "c"], "dst": ["b", "b"], "n_links": [1, 1]})
    got = degree_assortativity_sums(ray.data.from_pandas(edges)) \
        .to_pandas()
    # pairs (x,y): (1,2) and (2,1) twice → m2=4, Σx = 2*(1+2)=6,
    # Σx² = 2*(1+4)=10, Σxy = 2*(2+2)=8
    assert got.values.tolist() == [[4, 6, 10, 8]]


@pytest.mark.usefixtures("ray_session")
def test_stratified_kfold_balance_and_determinism():
    """Fold sizes within each stratum differ by at most 1; assignment is
    identical across block splits."""
    import ray.data

    from pdf2doi_ray.stages.export import stratified_kfold

    docs = pd.DataFrame({
        "doc_id": range(100),
        "lang": ["en"] * 60 + ["de"] * 40})
    outs = []
    for blocks in (1, 4):
        got = stratified_kfold(
            ray.data.from_pandas(docs).repartition(blocks), k=5) \
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        outs.append(got)
        for lang, g in got.groupby("lang"):
            sizes = g["fold"].value_counts()
            assert sizes.max() - sizes.min() <= 1
            assert set(g["fold"]) <= set(range(5))
    assert outs[0].equals(outs[1])


@pytest.mark.usefixtures("ray_session")
def test_heavy_hitters_exact_2pass_compression_regime():
    """With a vocabulary far above m, the MG candidate pass compresses
    yet every above-threshold value still comes back with its EXACT
    count (the no-loss superset guarantee feeding the verify pass)."""
    import numpy as np
    import ray.data

    from pdf2doi_ray.stages.sketch import heavy_hitters_exact_2pass

    rng = np.random.default_rng(8)
    # 3000 distinct rare values + two genuinely heavy ones
    vals = list(rng.integers(10**6, 10**9, 3000).astype(str))
    vals += ["hot"] * 400 + ["warm"] * 200
    rng.shuffle(vals)
    df = pd.DataFrame({"v": vals})
    total = len(vals)
    got = heavy_hitters_exact_2pass(
        ray.data.from_pandas(df).repartition(4), "v",
        threshold_permille=50, m=64).to_pandas() \
        .sort_values("value").reset_index(drop=True)
    # threshold = 5% of 3600 = 180 → hot (400) and warm (200) qualify
    assert got["value"].tolist() == ["hot", "warm"]
    assert got["n_occurrences"].tolist() == [400, 200]

    with pytest.raises(ValueError, match="no-loss"):
        heavy_hitters_exact_2pass(
            ray.data.from_pandas(df), "v", threshold_permille=5, m=64)


@pytest.mark.usefixtures("ray_session")
def test_validation_report_rules_handbuilt():
    import ray.data

    from pdf2doi_ray.stages.aggs import validation_report

    df = pd.DataFrame({
        "user_id": pd.array([1, None, 3, 4], dtype="Int64"),
        "ts": pd.to_datetime(["2024-01-01", "2024-01-02",
                              "1999-01-01", "2024-01-04"]),
        "event_type": ["click", "bogus", "view", "view"],
        "value": [1.0, -5.0, 2.0, 600.0]})
    got = validation_report(
        ray.data.from_pandas(df).repartition(2)).to_pandas() \
        .set_index("rule")["n_violations"].to_dict()
    assert got == {"null_user_id": 1, "value_out_of_range": 2,
                   "ts_out_of_window": 1, "unknown_event_type": 1}


@pytest.mark.usefixtures("ray_session")
def test_dangling_link_rate_handbuilt():
    import ray.data

    from pdf2doi_ray.stages.graph import dangling_link_rate

    edges = pd.DataFrame({
        "src": ["a", "a", "b"],
        "dst": ["b", "x", "a"],   # x never crawled as a source
        "n_links": [3, 2, 1]})
    got = dangling_link_rate(ray.data.from_pandas(edges).repartition(2)) \
        .to_pandas().sort_values("src_host").reset_index(drop=True)
    assert got.values.tolist() == [["a", 2, 5], ["b", 0, 1]]


@pytest.mark.usefixtures("ray_session")
def test_max_concurrent_touching_intervals_dont_overcount():
    """An interval ending exactly when another starts never counts as
    overlap (ends apply before starts at a tie); earliest attaining
    time reported."""
    import ray.data

    from pdf2doi_ray.stages.windows import max_concurrent_events

    # i1 [0, 10s); i2 [10s, 20s) — touching, max 1 at us=0
    df = pd.DataFrame({
        "event_id": [1, 2],
        "ts": pd.to_datetime([0, 10], unit="s"),
        "value": [10.0, 10.0]})
    got = max_concurrent_events(ray.data.from_pandas(df))
    assert got.values.tolist() == [[1, 0]]

    # three overlapping at [5s, 8s)
    df2 = pd.DataFrame({
        "event_id": [1, 2, 3],
        "ts": pd.to_datetime([0, 5, 6], unit="s"),
        "value": [10.0, 10.0, 1.0]})
    got2 = max_concurrent_events(
        ray.data.from_pandas(df2).repartition(3))
    assert got2.values.tolist() == [[3, 6_000_000]]


def test_host_rate_outlier_rule_discriminates():
    """The cross-multiplied binomial z-rule flags far-off hosts and
    passes a host at the global rate (pure-python check of the same
    arithmetic the query and its HUGEINT oracle use)."""
    # global: F=30 failures of N=300; host at exactly 10% passes,
    # host at 50% on 60 pages is ~10 sigma out
    hosts = [("ok", 10, 100), ("bad", 30, 60), ("tiny", 1, 10)]
    rest_f = 30 - sum(f for _, f, _ in hosts)
    rest_n = 300 - sum(n for _, _, n in hosts)
    hosts.append(("rest", rest_f, rest_n))
    N = 300
    F = 30
    flags = {h: (f * N - n * F) ** 2 * N > 4 * n * F * (N - F)
             for h, f, n in hosts}
    assert flags["bad"] is True
    assert flags["ok"] is False
    assert flags["tiny"] is False   # small n: wide interval, not flagged


@pytest.mark.usefixtures("ray_session")
def test_partitioned_prune_reads_only_target_dir(tmp_path):
    """The pruned read touches only the requested partition directory;
    other partitions' files exist but stay unread (path-level prune)."""
    import os

    import ray.data

    from pdf2doi_ray.stages.export import partitioned_write_prune_read

    docs = pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "lang": ["de", "en", "de", "fr"],
        "text": ["aa", "bbb", "c", "dddd"]})
    root = str(tmp_path / "part")
    got = partitioned_write_prune_read(
        ray.data.from_pandas(docs).repartition(2), root, lang="de") \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert got.values.tolist() == [[1, 2], [3, 1]]
    assert sorted(os.listdir(root)) == ["lang=de", "lang=en", "lang=fr"]


@pytest.mark.usefixtures("ray_session")
def test_target_encode_loo_singleton_and_exactness():
    import ray.data

    from pdf2doi_ray.stages.aggs import target_encode_loo

    df = pd.DataFrame({
        "event_id": [1, 2, 3],
        "event_type": ["a", "a", "b"],
        "value": [1.0, 3.0, 9.0]})
    got = target_encode_loo(ray.data.from_pandas(df).repartition(2)) \
        .to_pandas().sort_values("event_id").reset_index(drop=True)
    # a: sums 4000; row1 → (3000, 1); row2 → (1000, 1); b singleton → den 0
    assert got[["loo_num", "loo_den"]].values.tolist() == \
        [[3000, 1], [1000, 1], [0, 0]]


@pytest.mark.usefixtures("ray_session")
def test_rfm_scores_handbuilt_quintiles():
    """10 customers, one order each, values 1..10 → quintile boundaries
    at ranks 2,4,6,8 (values 2,4,6,8); score = 1 + #{boundaries ≤ v} →
    1,2,2,3,3,4,4,5,5,5 for monetary and recency; frequency all-equal →
    everyone lands in the top band."""
    import ray.data

    from pdf2doi_ray.stages.aggs import rfm_scores

    df = pd.DataFrame({
        "o_custkey": list(range(1, 11)),
        "o_orderdate": pd.to_datetime(
            [f"1995-01-{d:02d}" for d in range(1, 11)]),
        "o_totalprice": [float(1000 * d) for d in range(1, 11)]})
    got = rfm_scores(ray.data.from_pandas(df).repartition(3)) \
        .to_pandas().sort_values("c_custkey").reset_index(drop=True)
    assert got["r_score"].tolist() == [1, 2, 2, 3, 3, 4, 4, 5, 5, 5]
    assert got["m_score"].tolist() == [1, 2, 2, 3, 3, 4, 4, 5, 5, 5]
    # every frequency == 1 → single distinct value at every boundary →
    # score = 1 + 4 boundaries ≤ v = 5 for everyone
    assert got["f_score"].tolist() == [5] * 10


@pytest.mark.usefixtures("ray_session")
def test_rfm_scores_aggregates_multi_order_customers():
    """Two orders for one customer fold: recency = later day, frequency
    2, monetary the sum — verified against a hand computation."""
    import ray.data

    from pdf2doi_ray.stages.aggs import rfm_scores

    df = pd.DataFrame({
        "o_custkey": [1, 1, 2],
        "o_orderdate": pd.to_datetime(
            ["1995-01-01", "1995-03-01", "1995-02-01"]),
        "o_totalprice": [100000.0, 200000.0, 50000.0]})
    got = rfm_scores(ray.data.from_pandas(df).repartition(2)) \
        .to_pandas().sort_values("c_custkey").reset_index(drop=True)
    # cust 1: recency 1995-03-01 > cust 2's 1995-02-01, freq 2 > 1,
    # monetary $300k > $50k (distinct $1k buckets) → cust 1 strictly
    # above cust 2 on every axis
    assert (got.loc[0, "r_score"] > got.loc[1, "r_score"]
            and got.loc[0, "f_score"] > got.loc[1, "f_score"]
            and got.loc[0, "m_score"] > got.loc[1, "m_score"])


@pytest.mark.usefixtures("ray_session")
def test_churned_users_boundary_is_strict():
    """churned ⇔ last_seen_day < gmax − 7: a user last seen exactly 7
    days before the end is NOT churned; 8 days is."""
    import ray.data

    from pdf2doi_ray.stages.aggs import churned_users

    df = pd.DataFrame({
        "user_id": [1, 1, 2, 3],
        "ts": pd.to_datetime([
            "2020-01-01", "2020-01-20",   # u1 active at stream end
            "2020-01-13",                 # u2: gmax-7 exactly → kept
            "2020-01-12"])})              # u3: gmax-8 → churned
    got = churned_users(ray.data.from_pandas(df).repartition(2)) \
        .to_pandas().sort_values("user_id").reset_index(drop=True)
    assert got["churned"].tolist() == [False, False, True]
    # and last_seen aggregates the per-user max, not min
    assert got.loc[0, "last_seen_day"] == got["last_seen_day"].max()


@pytest.mark.usefixtures("ray_session")
def test_kcore_cascade_peels_in_rounds():
    """Path a-b-c-d plus a 3-clique {x,y,z}: 2-core peeling must cascade
    (a drops, then b, then c, then d) leaving exactly the clique — a
    single-round degree filter would wrongly keep b and c."""
    import ray.data

    from pdf2doi_ray.stages.graph import kcore_nodes

    df = pd.DataFrame({
        "a": ["a", "b", "c", "x", "y", "z"],
        "b": ["b", "c", "d", "y", "z", "x"]})
    got = kcore_nodes(ray.data.from_pandas(df).repartition(2), k=2) \
        .to_pandas()
    assert sorted(got["node"]) == ["x", "y", "z"]


@pytest.mark.usefixtures("ray_session")
def test_kcore_round_cap_truncates():
    """With max_rounds=1 the same graph stops after ONE peel: only the
    endpoints a and d drop (the truncated-peel contract the SQL oracle
    shares)."""
    import ray.data

    from pdf2doi_ray.stages.graph import kcore_nodes

    df = pd.DataFrame({
        "a": ["a", "b", "c", "x", "y", "z"],
        "b": ["b", "c", "d", "y", "z", "x"]})
    got = kcore_nodes(ray.data.from_pandas(df).repartition(2), k=2,
                      max_rounds=1).to_pandas()
    assert sorted(got["node"]) == ["b", "c", "x", "y", "z"]


@pytest.mark.usefixtures("ray_session")
def test_ohlc_open_close_tie_rules():
    """Open = value at earliest ms (ties → smaller value); close = at
    latest ms (ties → larger value); high/low independent."""
    import ray.data

    from pdf2doi_ray.stages.aggs import value_ohlc_hourly

    base = pd.Timestamp("2024-01-01 05:00:00")
    df = pd.DataFrame({
        "ts": [base, base,                       # tie at open: 5.0 wins
               base + pd.Timedelta("10min"),     # high 9.0
               base + pd.Timedelta("59min"),
               base + pd.Timedelta("59min")],    # tie at close: 7.0 wins
        "event_type": ["click"] * 5,
        "value": [5.0, 8.0, 9.0, 1.0, 7.0]})
    got = value_ohlc_hourly(ray.data.from_pandas(df).repartition(3)) \
        .to_pandas()
    assert len(got) == 1
    r = got.iloc[0]
    assert (r["open_milli"], r["high_milli"], r["low_milli"],
            r["close_milli"], r["n_events"]) == (5000, 9000, 1000,
                                                 7000, 5)


@pytest.mark.usefixtures("ray_session")
def test_orders_vs_ship_days_full_outer_zeros():
    """Days present on only one side appear with an exact zero on the
    other — the tagged-union merge must not drop or null them."""
    import ray.data

    from pdf2doi_ray.stages.aggs import orders_vs_ship_days

    orders = pd.DataFrame({"o_orderdate": pd.to_datetime(
        ["1995-01-01", "1995-01-01", "1995-01-03"])})
    li = pd.DataFrame({"l_shipdate": pd.to_datetime(
        ["1995-01-03", "1995-01-07"])})
    got = orders_vs_ship_days(
        ray.data.from_pandas(orders).repartition(2),
        ray.data.from_pandas(li).repartition(2)) \
        .to_pandas().sort_values("day").reset_index(drop=True)
    assert got["n_orders"].tolist() == [2, 1, 0]
    assert got["n_shipped"].tolist() == [0, 1, 1]


@pytest.mark.usefixtures("ray_session")
def test_time_weighted_value_floor_and_singletons():
    """Gap floors on the microsecond DIFFERENCE (1.9 s → 1); single-
    event users appear with (0, 0); the last event holds nothing."""
    import ray.data

    from pdf2doi_ray.stages.windows import time_weighted_value_sum

    base = pd.Timestamp("2024-01-01")
    df = pd.DataFrame({
        "user_id": [1, 1, 1, 2],
        "event_id": [1, 2, 3, 4],
        "ts": [base, base + pd.Timedelta(microseconds=1_900_000),
               base + pd.Timedelta(seconds=10), base],
        "value": [2.0, 5.0, 9.0, 3.0]})
    got = time_weighted_value_sum(
        ray.data.from_pandas(df).repartition(2)) \
        .to_pandas().sort_values("user_id").reset_index(drop=True)
    # u1: 2000×floor(1.9)=2000×1, then 5000×floor(8.1)=5000×8 → 42000
    assert got.values.tolist() == [[1, 42000, 2], [2, 0, 0]]


@pytest.mark.usefixtures("ray_session")
def test_time_weighted_value_split_invariant():
    """A user spanning many sorted blocks stitches to the same sums as
    the single-block run (fuzz vs a per-user python scan)."""
    import numpy as np
    import ray.data

    from pdf2doi_ray.stages.windows import time_weighted_value_sum

    rng = np.random.default_rng(2808)
    n = 2000
    df = pd.DataFrame({
        "user_id": rng.integers(0, 25, n).astype(np.int64),
        "event_id": np.arange(n, dtype=np.int64),
        "ts": pd.to_datetime(rng.integers(0, 10**7, n) * 1000, unit="us"),
        "value": rng.uniform(0, 100, n).round(2)})

    want = {}
    srt = df.sort_values(["user_id", "ts", "event_id"])
    for uid, g in srt.groupby("user_id"):
        us = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        vm = np.floor(g["value"].to_numpy() * 1000).astype(np.int64)
        gaps = (us[1:] - us[:-1]) // 1_000_000
        want[uid] = (int((vm[:-1] * gaps).sum()), len(us) - 1)

    for blocks in (1, 9):
        got = time_weighted_value_sum(
            ray.data.from_pandas(df).repartition(blocks)).to_pandas()
        assert {r.user_id: (r.tw_value_sum, r.n_gaps)
                for r in got.itertuples()} == want


@pytest.mark.usefixtures("ray_session")
def test_ship_latency_histogram_handbuilt():
    import ray.data

    from pdf2doi_ray.stages.joins import ship_latency_histogram

    orders = pd.DataFrame({
        "o_orderkey": [1, 2],
        "o_orderdate": pd.to_datetime(["1995-01-01", "1995-01-05"])})
    li = pd.DataFrame({
        "l_orderkey": [1, 1, 2, 2],
        "l_shipdate": pd.to_datetime(
            ["1995-01-03", "1995-01-08", "1995-01-07", "1995-01-05"])})
    got = ship_latency_histogram(
        ray.data.from_pandas(orders).repartition(2),
        ray.data.from_pandas(li).repartition(2), num_partitions=4) \
        .to_pandas().sort_values("latency_days").reset_index(drop=True)
    # latencies: 2, 7, 2, 0
    assert got.values.tolist() == [[0, 1], [2, 2], [7, 1]]


@pytest.mark.usefixtures("ray_session")
def test_contingency_margins_cross_foot():
    """Row and column margins cross-foot to the grand total and to the
    cell sums — on a handbuilt two-type, two-day stream."""
    import ray.data

    from pdf2doi_ray.stages.aggs import type_weekday_contingency

    ts = pd.to_datetime(
        ["1970-01-01 05:00", "1970-01-01 09:00",   # dow7 0 (Thursday)
         "1970-01-02 05:00", "1970-01-02 06:00",   # dow7 1
         "1970-01-02 07:00"])
    df = pd.DataFrame({"ts": ts,
                       "event_type": ["a", "b", "a", "a", "b"]})
    got = type_weekday_contingency(
        ray.data.from_pandas(df).repartition(3)).to_pandas() \
        .sort_values(["event_type", "dow7"]).reset_index(drop=True)
    assert got.values.tolist() == [
        ["a", 0, 1, 3, 2, 5],
        ["a", 1, 2, 3, 3, 5],
        ["b", 0, 1, 2, 2, 5],
        ["b", 1, 1, 2, 3, 5]]


@pytest.mark.usefixtures("ray_session")
def test_zonemap_scan_skips_files_and_matches_brute(tmp_path):
    """The footer-stats pruning must actually skip non-overlapping
    files AND return exactly the brute-force filter result."""
    import numpy as np
    import ray.data

    from pdf2doi_ray.stages.export import zonemap_prune_scan

    rng = np.random.default_rng(2901)
    df = pd.DataFrame({
        "event_id": np.arange(5000, dtype=np.int64),
        "value": rng.uniform(0, 500, 5000).round(3)})
    ds = ray.data.from_pandas(df).repartition(8)
    out, n_files, n_kept = zonemap_prune_scan(
        ds, str(tmp_path / "zm"), lo_milli=100_000, hi_milli=120_000,
        return_stats=True)
    got = out.to_pandas().sort_values("event_id").reset_index(drop=True)
    vm = np.floor(df["value"].to_numpy() * 1000).astype(np.int64)
    want = df.loc[(vm >= 100_000) & (vm <= 120_000), ["event_id"]]
    assert got["event_id"].tolist() == sorted(want["event_id"])
    # ~4% selectivity over 8 range-sorted files → most files skipped
    assert n_files >= 4 and n_kept < n_files


@pytest.mark.usefixtures("ray_session")
def test_zonemap_scan_empty_band(tmp_path):
    """A predicate band outside every zone map reads zero files and
    returns a typed empty table."""
    import ray.data

    from pdf2doi_ray.stages.export import zonemap_prune_scan

    df = pd.DataFrame({"event_id": [1, 2], "value": [1.0, 2.0]})
    out, n_files, n_kept = zonemap_prune_scan(
        ray.data.from_pandas(df), str(tmp_path / "zm2"),
        lo_milli=9_000_000, hi_milli=9_999_999, return_stats=True)
    got = out.to_pandas()
    assert len(got) == 0 and n_kept == 0 and n_files >= 1
    # ray's to_pandas drops columns on 0-row datasets; the dataset
    # schema itself must stay typed
    assert out.schema().names == ["event_id", "vm"]


@pytest.mark.usefixtures("ray_session")
def test_scene_cuts_match_luma_walk():
    """Cuts from the pipeline equal a per-doc python walk of the fake
    luma sequence (threshold strict >)."""
    import numpy as np

    from pdf2doi_ray.stages.multimodal import (synth_frame_luma,
                                               video_scene_cuts)

    got = video_scene_cuts("/root/testdata/sf0.001", threshold=60) \
        .to_pandas()
    by_doc = {k: sorted(g["frame_idx"]) for k, g in
              got.groupby("doc_id")}
    for doc_id in (0, 7, 123, 499):
        luma = synth_frame_luma(doc_id, 8 + doc_id % 8)
        want = [i for i in range(1, len(luma))
                if abs(int(luma[i]) - int(luma[i - 1])) > 60]
        assert by_doc.get(doc_id, []) == want


@pytest.mark.usefixtures("ray_session")
def test_vocab_coverage_curve_handbuilt_and_split_invariant():
    """Four types with counts 5,3,1,1 → cuts 1,2,4 cover 5,8,10 of 10
    occurrences (500‰, 800‰, 1000‰); invariant across block splits."""
    import ray.data

    from pdf2doi_ray.stages.corpus import vocab_coverage_curve

    docs = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": ["a a a b", "a b c", "a b d"]})
    for blocks in (1, 3):
        got = vocab_coverage_curve(
            ray.data.from_pandas(docs).repartition(blocks)) \
            .to_pandas().sort_values("rank_cut").reset_index(drop=True)
        assert got.values.tolist() == [
            [1, 5, 500], [2, 8, 800], [4, 10, 1000]]


@pytest.mark.usefixtures("ray_session")
def test_clamped_balance_never_negative_and_exact():
    """Handbuilt wallet: the clamp engages mid-stream and the closed
    form reproduces the sequential scan exactly."""
    import ray.data

    from pdf2doi_ray.stages.windows import clamped_running_balance

    base = pd.Timestamp("2024-01-01")
    df = pd.DataFrame({
        "event_id": [1, 2, 3, 4, 5],
        "user_id": [7, 7, 7, 7, 8],
        "ts": [base + pd.Timedelta(seconds=s) for s in (0, 1, 2, 3, 0)],
        "event_type": ["purchase", "click", "click", "purchase",
                       "click"],
        "value": [5.0, 3.0, 9.0, 2.0, 4.0]})
    got = clamped_running_balance(
        ray.data.from_pandas(df).repartition(2)) \
        .to_pandas().sort_values("event_id").reset_index(drop=True)
    # u7: +5000→5000; −3000→2000; −9000→clamp 0; +2000→2000
    # u8: −4000→clamp 0
    assert got["balance_milli"].tolist() == [5000, 2000, 0, 2000, 0]


@pytest.mark.usefixtures("ray_session")
def test_clamped_balance_split_invariant_fuzz():
    """Closed-form distributed scan == python sequential scan across
    block splits."""
    import numpy as np
    import ray.data

    from pdf2doi_ray.stages.windows import clamped_running_balance

    rng = np.random.default_rng(3003)
    n = 1500
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": rng.integers(0, 20, n).astype(np.int64),
        "ts": pd.to_datetime(rng.integers(0, 10**6, n) * 1000,
                             unit="us"),
        "event_type": rng.choice(["purchase", "click", "view"], n),
        "value": rng.uniform(0, 50, n).round(2)})

    sub = df[df["event_type"].isin(["purchase", "click"])]
    srt = sub.sort_values(["user_id", "ts", "event_id"])
    want = {}
    state = {}
    for r in srt.itertuples():
        vm = int(np.floor(r.value * 1000))
        d = vm if r.event_type == "purchase" else -vm
        s = max(state.get(r.user_id, 0) + d, 0)
        state[r.user_id] = s
        want[r.event_id] = s

    for blocks in (1, 8):
        got = clamped_running_balance(
            ray.data.from_pandas(df).repartition(blocks)).to_pandas()
        assert dict(zip(got["event_id"], got["balance_milli"])) == want


@pytest.mark.usefixtures("ray_session")
def test_first_touch_window_boundaries_strict():
    """A click exactly at conv_ts − W attributes; a click AT conv_ts
    does not; unattributed conversions drop."""
    import ray.data

    from pdf2doi_ray.stages.windows import first_touch_attribution

    base = pd.Timestamp("2024-01-05")
    W = pd.Timedelta(seconds=86_400)
    df = pd.DataFrame({
        "event_id": [1, 2, 3, 4, 5, 6],
        "user_id": [1, 1, 1, 2, 2, 3],
        "ts": [base - W, base, base,            # u1: click at −W, click@conv
               base - 2 * W, base,              # u2: click too old
               base],                           # u3: purchase, no click
        "event_type": ["click", "click", "purchase",
                       "click", "purchase", "purchase"]})
    got = first_touch_attribution(
        ray.data.from_pandas(df).repartition(2)) \
        .to_pandas().sort_values("purchase_id").reset_index(drop=True)
    # only u1's purchase attributes, to the −W click (the @conv click
    # is excluded by the strict upper bound), 1 click in window
    assert got.values.tolist() == [
        [3, 1, int((base - W).value // 1000), 1]]


@pytest.mark.usefixtures("ray_session")
def test_cusum_changepoint_step_series():
    """A clean level shift: type 'a' runs 1/hour for 6 hours then
    5/hour for 6 hours → |CUSUM| peaks exactly at the shift hour
    (the last low hour); zeros densify for a type missing hours."""
    import ray.data

    from pdf2doi_ray.stages.aggs import cusum_changepoint_by_type

    rows = []
    for h in range(12):
        per = 1 if h < 6 else 5
        for i in range(per):
            rows.append(("a", pd.Timestamp("2024-01-01")
                         + pd.Timedelta(hours=h, minutes=i)))
    rows.append(("b", pd.Timestamp("2024-01-01")))  # 1 event, hour 0
    df = pd.DataFrame(rows, columns=["event_type", "ts"])
    df = df[["ts", "event_type"]]
    got = cusum_changepoint_by_type(
        ray.data.from_pandas(df).repartition(3)).to_pandas() \
        .sort_values("event_type").reset_index(drop=True)
    a = got[got.event_type == "a"].iloc[0]
    h0 = int(pd.Timestamp("2024-01-01").value // (3600 * 10**9))
    # prefix at hour 5 (1-indexed i=6): 6 → |12*6 − 6*36| = 144, the max
    assert (a["change_hour"], a["cusum_abs"], a["n_hours"],
            a["total"]) == (h0 + 5, 144, 12, 36)
    b = got[got.event_type == "b"].iloc[0]
    # b: all 1 event at hour 0 → |12·1 − i·1| grows with i → max at
    # the LAST hour... no: a=|12·1−i| max at i=1 → hour 0? i=1 gives 11;
    # i=12 gives 0 → max 11 at the first hour
    assert (b["change_hour"], b["cusum_abs"]) == (h0, 11)


@pytest.mark.usefixtures("ray_session")
def test_kmv_sample_matches_brute_bottom_k():
    """The distributed KMV equals the brute bottom-k of the full
    distinct vocabulary, at any block split."""
    import hashlib

    import numpy as np
    import ray.data

    from pdf2doi_ray.stages.corpus import kmv_vocab_sample

    rng = np.random.default_rng(3101)
    vocab = [f"tok{i}" for i in range(500)]
    texts = [" ".join(rng.choice(vocab, 30)) for _ in range(60)]
    docs = pd.DataFrame({"doc_id": range(60), "text": texts})

    seen = sorted({t for txt in texts for t in txt.split()})
    hv = {t: int.from_bytes(hashlib.md5(t.encode()).digest()[:8],
                            "big") >> 1 for t in seen}
    want = sorted(((hv[t], t) for t in seen))[:64]

    for blocks in (1, 5):
        got = kmv_vocab_sample(
            ray.data.from_pandas(docs).repartition(blocks), k=64) \
            .to_pandas()
        assert list(zip(got["hash63"], got["token"])) == want


@pytest.mark.usefixtures("ray_session")
def test_template_clusters_structure_not_words():
    """Pages with different words but identical structure cluster;
    different punctuation structure separates; singletons drop."""
    import hashlib

    import ray.data

    from pdf2doi_ray.stages.corpus import template_clusters

    docs = pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": ["nav: home | shop", "nav: cats | dogs",  # same shape
                 "nav: a | b | c",                        # extra cell
                 "totally different."]})
    got = template_clusters(
        ray.data.from_pandas(docs).repartition(2), min_pages=2) \
        .to_pandas()
    norm = "#: # | #"
    want_hash = int.from_bytes(
        hashlib.md5(norm.encode()).digest()[:8], "big") >> 1
    assert got.values.tolist() == [[want_hash, 2]]


@pytest.mark.usefixtures("ray_session")
def test_int8_quantize_endpoints_and_constant_vec():
    """Min maps to 0, max to 255, a constant vector to all-zeros with
    range 0 — exact integer arithmetic."""
    import pyarrow as pa
    import ray.data

    from pdf2doi_ray.stages.similarity import embedding_int8_quantize

    t = pa.table({
        "vec_id": pa.array([1, 2], type=pa.int64()),
        "embedding": pa.array([[0.0, 0.5, 1.0], [0.25, 0.25, 0.25]],
                              type=pa.list_(pa.float32()))})
    got = embedding_int8_quantize(ray.data.from_arrow(t)) \
        .to_pandas().sort_values(["vec_id", "i"]).reset_index(drop=True)
    assert got[got.vec_id == 1]["q"].tolist() == [0, 127, 255]
    assert got[got.vec_id == 1]["min_milli"].tolist() == [0, 0, 0]
    assert got[got.vec_id == 1]["range_milli"].tolist() == [1000] * 3
    assert got[got.vec_id == 2]["q"].tolist() == [0, 0, 0]
    assert got[got.vec_id == 2]["range_milli"].tolist() == [0] * 3


@pytest.mark.usefixtures("ray_session")
def test_day_bitmap_repeated_days_set_one_bit():
    """Three events on one day set exactly one bit; days 31/32 land in
    adjacent words; duplicate days across blocks never double-sum."""
    import ray.data

    from pdf2doi_ray.stages.aggs import day_bitmap_index

    day0 = pd.Timestamp("1970-01-01")
    ts = [day0, day0, day0,                       # day 0 ×3
          day0 + pd.Timedelta(days=31),           # word 0, bit 31
          day0 + pd.Timedelta(days=32)]           # word 1, bit 0
    df = pd.DataFrame({"ts": ts, "event_type": ["a"] * 5})
    got = day_bitmap_index(ray.data.from_pandas(df).repartition(3)) \
        .to_pandas().sort_values("word_idx").reset_index(drop=True)
    assert got.values.tolist() == [["a", 0, 1 + (1 << 31)],
                                   ["a", 1, 1]]


@pytest.mark.usefixtures("ray_session")
def test_supplier_fill_rate_sla_boundary():
    """Exactly-30-days counts on-time; 31 does not; counts are per
    supplier across orders."""
    import ray.data

    from pdf2doi_ray.stages.joins import supplier_fill_rate

    orders = pd.DataFrame({
        "o_orderkey": [1, 2],
        "o_orderdate": pd.to_datetime(["1995-01-01", "1995-02-01"])})
    li = pd.DataFrame({
        "l_orderkey": [1, 1, 2],
        "l_suppkey": [7, 7, 7],
        "l_shipdate": pd.to_datetime(
            ["1995-01-31", "1995-02-01", "1995-02-10"])})
    got = supplier_fill_rate(
        ray.data.from_pandas(orders).repartition(2),
        ray.data.from_pandas(li).repartition(2),
        num_partitions=4).to_pandas()
    # latencies 30 (on time), 31 (late), 9 (on time)
    assert got.values.tolist() == [[7, 2, 3]]


@pytest.mark.usefixtures("ray_session")
def test_copurchase_pairs_distinct_within_order():
    """A part appearing TWICE in one order pairs once; pairs are
    canonical (a<b); threshold prunes singleton pairs."""
    import ray.data

    from pdf2doi_ray.stages.joins import part_copurchase_pairs

    li = pd.DataFrame({
        "l_orderkey": [1, 1, 1, 2, 2, 3, 3],
        "l_partkey": [10, 20, 10, 20, 10, 10, 30]})
    got = part_copurchase_pairs(
        ray.data.from_pandas(li).repartition(3), min_orders=2) \
        .to_pandas()
    # order1: {10,20} → (10,20); order2: {10,20} → (10,20);
    # order3: {10,30} → (10,30) but count 1 < 2 → dropped
    assert got.values.tolist() == [[10, 20, 2]]


@pytest.mark.usefixtures("ray_session")
def test_copurchase_split_invariant_fuzz():
    """Pair counts identical at every block split (edge-order stitch
    exercised) and equal to a pandas brute force."""
    import itertools

    import numpy as np
    import ray.data

    from pdf2doi_ray.stages.joins import part_copurchase_pairs

    rng = np.random.default_rng(3404)
    n = 2000
    li = pd.DataFrame({
        "l_orderkey": np.sort(rng.integers(0, 400, n)).astype(np.int64),
        "l_partkey": rng.integers(0, 40, n).astype(np.int64)})
    want = {}
    for _, g in li.groupby("l_orderkey"):
        for a, b in itertools.combinations(sorted(set(g["l_partkey"])),
                                           2):
            want[(a, b)] = want.get((a, b), 0) + 1
    want = {p: c for p, c in want.items() if c >= 2}

    for blocks in (1, 7):
        got = part_copurchase_pairs(
            ray.data.from_pandas(li).repartition(blocks)).to_pandas()
        assert {(r.part_a, r.part_b): r.n_orders
                for r in got.itertuples()} == want


@pytest.mark.usefixtures("ray_session")
def test_kmv_overlap_flags_consistent():
    """Union bottom-k flags: every row flagged in_a must hash among
    A's own bottom-k (the KMV closure property), and A∩B rows carry
    both flags."""
    import ray.data

    from pdf2doi_ray.stages.aggs import kmv_repeat_customers

    orders = pd.DataFrame({
        "o_custkey": list(range(1, 31)) + list(range(20, 51)),
        "o_orderdate": (
            [pd.Timestamp("1995-06-01")] * 30
            + [pd.Timestamp("1996-06-01")] * 31)})
    got = kmv_repeat_customers(
        ray.data.from_pandas(orders).repartition(3), k=16).to_pandas()
    assert len(got) == 16
    assert got["hash63"].is_monotonic_increasing
    both = got[got.in_a & got.in_b]["c_custkey"]
    assert set(both) <= set(range(20, 31))
    assert (got.in_a | got.in_b).all()


@pytest.mark.usefixtures("ray_session")
def test_two_hop_excludes_self_counts_distinct():
    """a→b→{c,d}, a→c→d: two-hop of a = {c,d} distinct (d via two
    middles counts once); b→a→... excludes b itself."""
    import ray.data

    from pdf2doi_ray.stages.graph import two_hop_neighborhood

    edges = pd.DataFrame({
        "src": ["a", "a", "b", "b", "c", "b"],
        "dst": ["b", "c", "c", "d", "d", "a"]})
    got = two_hop_neighborhood(
        ray.data.from_pandas(edges).repartition(3), num_partitions=4) \
        .to_pandas().sort_values("node").reset_index(drop=True)
    # a: via b → {c,d}, via c → {d} → {c,d} = 2
    # b: via c → {d}, via a → {b,c} minus self → {c} → {c,d} = 2
    # c: via d → {} ; b→a→b self-excluded handled above
    assert dict(zip(got["node"], got["n_two_hop"])) == {"a": 2, "b": 2}


@pytest.mark.usefixtures("ray_session")
def test_daily_periodicity_perfect_cycle():
    """A perfectly 24h-periodic series has lag_dot² = head_dot ·
    tail_dot (r = 1); the window arithmetic is exact."""
    import ray.data

    from pdf2doi_ray.stages.aggs import daily_periodicity_by_type

    rows = []
    for day in range(3):
        for h, per in [(9, 2), (12, 5)]:   # same shape every day
            for i in range(per):
                rows.append(pd.Timestamp("2024-01-01")
                            + pd.Timedelta(days=day, hours=h,
                                           minutes=i))
    df = pd.DataFrame({"ts": rows, "event_type": ["a"] * len(rows)})
    got = daily_periodicity_by_type(
        ray.data.from_pandas(df).repartition(3)).to_pandas()
    r = got.iloc[0]
    assert r["lag_dot"] ** 2 == r["head_dot"] * r["tail_dot"]
    assert r["lag_dot"] > 0
    # dense range: hours 9..60 → n=52, m=28
    assert r["n_terms"] == 28


@pytest.mark.usefixtures("ray_session")
def test_max_drawdown_includes_zero_baseline():
    """The peak includes the initial empty balance: a user whose first
    move is a drop of 4000 has drawdown 4000 even with no prior peak;
    a later recovery then deeper trough tracks the running max."""
    import ray.data

    from pdf2doi_ray.stages.windows import max_drawdown_by_user

    base = pd.Timestamp("2024-01-01")
    df = pd.DataFrame({
        "event_id": [1, 2, 3, 4],
        "user_id": [1, 1, 1, 2],
        "ts": [base + pd.Timedelta(seconds=s) for s in (0, 1, 2, 0)],
        "event_type": ["purchase", "click", "purchase", "click"],
        "value": [10.0, 7.0, 2.0, 4.0]})
    got = max_drawdown_by_user(
        ray.data.from_pandas(df).repartition(2)) \
        .to_pandas().sort_values("user_id").reset_index(drop=True)
    # u1: pre = 10000, 3000, 5000 → peak 10000 → dd max = 7000
    # u2: pre = −4000 → peak max(0) → dd 4000
    assert got.values.tolist() == [[1, 7000, 3], [2, 4000, 1]]


@pytest.mark.usefixtures("ray_session")
def test_sliding_distinct_interval_merge():
    """Two users: u1 active hours {0, 30}, u2 at {10} → windows around
    each activity carry the right distinct counts, with the u1 gap
    (30−0 ≥ 24) split into two intervals."""
    import ray.data

    from pdf2doi_ray.stages.windows import sliding_distinct_users

    def at(h):
        return pd.Timestamp("1970-01-01") + pd.Timedelta(hours=h)

    df = pd.DataFrame({
        "user_id": [1, 1, 2],
        "ts": [at(0), at(30), at(10)]})
    got = sliding_distinct_users(
        ray.data.from_pandas(df).repartition(2)).to_pandas()
    m = dict(zip(got["window_hour"], got["n_distinct"]))
    # window 0 covers [0..23] → u1(h0) AND u2(h10) → 2; window 10
    # covers [10..33] → u1(h30) and u2(h10) → 2; window 30 → u1 only
    assert m[0] == 2 and m[10] == 2 and m[30] == 1
    # u1's two activity hours are ≥24 apart: window 5 ([5..28]) sees
    # only h0?? no: 5..28 misses 0 and 30 → covered only by u2 via h10
    assert m[5] == 1
    # every window in [−23, 30] is present, none outside
    assert set(m) == set(range(-23, 31))


@pytest.mark.usefixtures("ray_session")
def test_minhash_signature_jaccard_property():
    """Identical token sets ⇒ identical signatures in every slot;
    disjoint sets share (almost surely) none; the sig is the true min
    over the union of a source's tokens across docs and blocks."""
    import hashlib

    import ray.data

    from pdf2doi_ray.stages.corpus import source_minhash_signatures

    docs = pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "source": ["a", "a", "b", "c"],
        "text": ["x y", "z", "x y z", "p q r"]})
    got = source_minhash_signatures(
        ray.data.from_pandas(docs).repartition(4), n_slots=8) \
        .to_pandas()
    sig = {(r.source, r.slot): r.sig63 for r in got.itertuples()}
    # a = {x,y,z} (unioned across 2 docs/blocks) == b exactly
    for s in range(8):
        assert sig[("a", s)] == sig[("b", s)]
        want = min(int.from_bytes(hashlib.md5(
            f"{s}:{t}".encode()).digest()[:8], "big") >> 1
            for t in ("x", "y", "z"))
        assert sig[("a", s)] == want
    # c is disjoint → different with overwhelming probability
    assert any(sig[("c", s)] != sig[("a", s)] for s in range(8))


@pytest.mark.usefixtures("ray_session")
def test_internal_link_ratio_handbuilt():
    import ray.data

    from pdf2doi_ray.stages.corpus import internal_link_ratio

    pages = pd.DataFrame({
        "url": ["https://h1.org/a", "https://h1.org/b",
                "https://h2.org/x"],
        "text": ['<a href="https://h1.org/c">i</a> '
                 '<a href="https://h2.org/d">e</a>',
                 '<a href="https://h1.org/e">i</a>',
                 '<a href="https://h1.org/f">e</a>']})
    got = internal_link_ratio(
        ray.data.from_pandas(pages).repartition(2)) \
        .to_pandas().sort_values("src_host").reset_index(drop=True)
    assert got.values.tolist() == [["h1.org", 2, 1], ["h2.org", 0, 1]]


@pytest.mark.usefixtures("ray_session")
def test_consistent_hash_minimal_moves():
    """Ring property: hosts that stay must keep the SAME worker id —
    every move lands on the NEW worker (id n_workers), never a
    reshuffle between old workers."""
    import ray.data

    from pdf2doi_ray.stages.export import consistent_hash_moves

    docs = pd.DataFrame({
        "doc_id": range(200),
        "source": [f"host{i}" for i in range(200)]})
    got = consistent_hash_moves(
        ray.data.from_pandas(docs).repartition(3), n_workers=8) \
        .to_pandas()
    assert len(got) == 200
    moved = got[got.moved]
    # the ONLY legal move target is the newly added worker 8
    assert (moved["worker_n1"] == 8).all()
    stay = got[~got.moved]
    assert (stay["worker_n"] == stay["worker_n1"]).all()
    # and some but not all hosts moved (~1/9 of keyspace)
    assert 0 < len(moved) < 80


@pytest.mark.usefixtures("ray_session")
def test_similarity_pairs_identical_sources_all_slots():
    """Two sources with the same token set agree on EVERY slot; a
    disjoint third never reaches full agreement."""
    import ray.data

    from pdf2doi_ray.stages.corpus import source_similarity_pairs

    docs = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "source": ["a", "b", "c"],
        "text": ["x y z", "z y x", "p q r"]})
    got = source_similarity_pairs(
        ray.data.from_pandas(docs).repartition(3), n_slots=8) \
        .to_pandas()
    m = {(r.source_a, r.source_b): r.n_equal_slots
         for r in got.itertuples()}
    assert m[("a", "b")] == 8
    assert m.get(("a", "c"), 0) < 8 and m.get(("b", "c"), 0) < 8


@pytest.mark.usefixtures("ray_session")
def test_label_scatter_handbuilt_moments():
    import pyarrow as pa
    import ray.data

    from pdf2doi_ray.stages.similarity import label_scatter_components

    t = pa.table({
        "label": pa.array([1, 1, 2], type=pa.int32()),
        "embedding": pa.array([[1.0, 2.0], [3.0, 4.0], [5.0, 6.0]],
                              type=pa.list_(pa.float32()))})
    got = label_scatter_components(
        ray.data.from_arrow(t).repartition(3)) \
        .to_pandas().sort_values(["label", "i"]).reset_index(drop=True)
    # label 1 dim 0: n=2, s=4000, ss=1e6+9e6
    assert got.values.tolist() == [
        [1, 0, 2, 4000, 10_000_000],
        [1, 1, 2, 6000, 20_000_000],
        [2, 0, 1, 5000, 25_000_000],
        [2, 1, 1, 6000, 36_000_000]]


@pytest.mark.usefixtures("ray_session")
def test_contrastive_negatives_never_self_in_range():
    import ray.data

    from pdf2doi_ray.stages.similarity import contrastive_negatives

    df = pd.DataFrame({"vec_id": range(50)})
    got = contrastive_negatives(
        ray.data.from_pandas(df).repartition(4), k=6).to_pandas()
    assert len(got) == 300
    assert (got["neg_id"] != got["vec_id"]).all()
    assert got["neg_id"].between(0, 49).all()
    # deterministic: same call twice is identical
    got2 = contrastive_negatives(
        ray.data.from_pandas(df).repartition(2), k=6).to_pandas()
    key = ["vec_id", "neg_rank"]
    assert got.sort_values(key).reset_index(drop=True).equals(
        got2.sort_values(key).reset_index(drop=True))


@pytest.mark.usefixtures("ray_session")
def test_scc_forward_backward_intersection():
    """Cycle a→b→c→a plus dead-end c→d and feeder e→a: SCC(a) is
    exactly {a, b, c} — d is reachable-only, e is reaching-only."""
    import ray.data

    from pdf2doi_ray.stages.graph import scc_members

    edges = pd.DataFrame({
        "src": ["a", "b", "c", "c", "e"],
        "dst": ["b", "c", "a", "d", "a"]})
    got = scc_members(ray.data.from_pandas(edges).repartition(2),
                      source="a").to_pandas()
    assert got["node"].tolist() == ["a", "b", "c"]


@pytest.mark.usefixtures("ray_session")
def test_theil_sen_robust_to_outlier_day():
    """A perfect +2/day trend with ONE wild outlier day still reports
    slope 2 — the median pair ignores the outlier where a least-
    squares fit would not."""
    import ray.data

    from pdf2doi_ray.stages.windows import DEFAULT_STITCH_SHARDS  # noqa
    from pdf2doi_ray.stages.aggs import theil_sen_trend_by_type

    rows = []
    for day in range(9):
        per = 1000 if day == 4 else 2 * day + 1   # outlier at day 4
        for i in range(per):
            rows.append(pd.Timestamp("2024-01-01")
                        + pd.Timedelta(days=day, minutes=i % 600))
    df = pd.DataFrame({"ts": rows, "event_type": ["a"] * len(rows)})
    got = theil_sen_trend_by_type(
        ray.data.from_pandas(df).repartition(3)).to_pandas()
    r = got.iloc[0]
    assert r["slope_num"] / r["slope_den"] == 2.0
    assert r["n_pairs"] == 36


@pytest.mark.usefixtures("ray_session")
def test_pergroup_engine_split_invariance_via_median():
    """The factored per-group engine gives identical medians at every
    block split, vs a pandas oracle (edge-group stitch exercised)."""
    import numpy as np
    import ray.data

    from pdf2doi_ray.stages.aggs import reorder_interval_median

    rng = np.random.default_rng(4101)
    n = 1200
    df = pd.DataFrame({
        "o_custkey": rng.integers(0, 60, n).astype(np.int64),
        "o_orderkey": np.arange(n, dtype=np.int64),
        "o_orderdate": pd.to_datetime(
            rng.integers(0, 400, n), unit="D", origin="1995-01-01")})

    want = {}
    for ck, g in df.sort_values(
            ["o_custkey", "o_orderdate", "o_orderkey"]) \
            .groupby("o_custkey"):
        days = (g["o_orderdate"].astype("int64")
                // (86_400 * 10**9)).to_numpy()
        if len(days) < 2:
            continue
        gaps = np.sort(np.diff(days))
        want[ck] = (int(gaps[(len(gaps) - 1) // 2]), len(gaps))

    for blocks in (1, 9):
        got = reorder_interval_median(
            ray.data.from_pandas(df).repartition(blocks)).to_pandas()
        assert {r.o_custkey: (r.median_gap_days, r.n_gaps)
                for r in got.itertuples()} == want


@pytest.mark.usefixtures("ray_session")
def test_duplicate_order_flags_same_day_only():
    import ray.data

    from pdf2doi_ray.stages.aggs import duplicate_order_flags

    df = pd.DataFrame({
        "o_custkey": [1, 1, 1, 2, 2],
        "o_orderkey": [10, 11, 12, 13, 14],
        "o_orderdate": pd.to_datetime(
            ["1995-01-01", "1995-01-01", "1995-01-02",
             "1995-03-01", "1995-03-02"])})
    got = duplicate_order_flags(
        ray.data.from_pandas(df).repartition(2)).to_pandas()
    # only cust 1's two same-day orders flag; next-day does not
    assert sorted(got["o_orderkey"]) == [10, 11]


@pytest.mark.usefixtures("ray_session")
def test_active_day_streaks_islands():
    """Days {1,2,3, 7, 9,10} → longest run 3, total 6; repeated events
    on one day count once."""
    import ray.data

    from pdf2doi_ray.stages.aggs import active_day_streaks

    days = [1, 2, 2, 3, 7, 9, 10]
    df = pd.DataFrame({
        "user_id": [5] * len(days),
        "ts": pd.to_datetime(days, unit="D", origin="1970-01-01")})
    got = active_day_streaks(
        ray.data.from_pandas(df).repartition(3)).to_pandas()
    assert got.values.tolist() == [[5, 3, 6]]


@pytest.mark.usefixtures("ray_session")
def test_revenue_hhi_monopoly_vs_even():
    """One-supplier nation scores 1000‰; two equal suppliers 500‰."""
    import ray.data

    from pdf2doi_ray.stages.joins import revenue_hhi_by_nation

    nation = pd.DataFrame({"n_nationkey": [0, 1],
                           "n_name": ["MONO", "DUO"]})
    supplier = pd.DataFrame({"s_suppkey": [1, 2, 3],
                             "s_nationkey": [0, 1, 1]})
    li = pd.DataFrame({
        "l_suppkey": [1, 2, 3],
        "l_extendedprice": [50.0, 10.0, 10.0],
        "l_discount": [0.0, 0.0, 0.0]})
    got = revenue_hhi_by_nation(
        ray.data.from_pandas(nation), ray.data.from_pandas(supplier),
        ray.data.from_pandas(li).repartition(2)) \
        .to_pandas().sort_values("n_name").reset_index(drop=True)
    assert got.values.tolist() == [["DUO", 500, 2], ["MONO", 1000, 1]]
