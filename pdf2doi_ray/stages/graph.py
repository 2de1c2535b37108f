"""Distributed connected components — dedup clustering over near-dup pairs.

A fuzzy-dedup pipeline needs more than pairs: documents form clusters
(A≈B, B≈C ⇒ {A,B,C}) and one canonical survivor per cluster must be chosen.
Ray Data has no graph primitive, so this implements min-label propagation as
iterated keyed aggregations (ray_guide: express iteration as materialized
Dataset rounds):

* every node starts labeled ``min(self, neighbors)``;
* each round, every node's current label is pushed along its edges and every
  node keeps the minimum it has seen — two shuffles per round, both over
  (int64, int64) rows only (edges and labels; documents never move);
* labels decrease monotonically, so the global label SUM is a fixpoint
  detector costing one cheap aggregate per round — no expensive old-vs-new
  join;
* each round ALSO shortcuts ``label(n) ← label(label(n))`` (pointer
  jumping, round 3): every node asks its current label-node for THAT
  node's label, folded into the same per-round groupby as extra
  ``(key=label, asker=node)`` rows.  The known distance to the component
  minimum roughly doubles per round, so rounds needed = O(log diameter)
  instead of O(diameter) — chain-shaped duplicate runs (scrolled/paginated
  boilerplate) converge in a handful of rounds; ``max_iters`` still bounds
  pathology and raises rather than returning silently-unconverged labels.

Output: ``(node, component)`` with ``component = min node id of the
cluster`` — the canonical-survivor rule of :func:`dedup_exact`.

Design note: the per-group ``map_groups``/aggregate reducers here run
Python per node per round.  A sorted-block vectorized variant (the
boundary-exchange pattern used by minhash/sessions/asof) was measured and
REJECTED for this operator: it swaps per-group cost for two extra
sorts + materializations per round, and with rounds = graph diameter the
multiplied fixed stage cost loses badly at every realistic cluster size
(near-dup components are small and dense, so groups are few and rounds
fewer).  The diameter-heavy case is instead handled by the algorithm:
the pointer-jumping shortcut above makes rounds logarithmic in diameter.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _sym_edges(pairs, col_a: str, col_b: str):
    """(a,b) pairs → both-direction (node, peer) edge rows."""
    def sym(t: pa.Table) -> pa.Table:
        a = t[col_a].combine_chunks() if isinstance(t[col_a], pa.ChunkedArray) else t[col_a]
        b = t[col_b].combine_chunks() if isinstance(t[col_b], pa.ChunkedArray) else t[col_b]
        return pa.table({
            "node": pa.concat_arrays([a.cast(pa.int64()), b.cast(pa.int64())]),
            "peer": pa.concat_arrays([b.cast(pa.int64()), a.cast(pa.int64())]),
        })

    return pairs.map_batches(sym, batch_format="pyarrow")


def connected_components(pairs, col_a: str = "doc_a", col_b: str = "doc_b",
                         max_iters: int = 100):
    """Label-propagation connected components over an undirected pair list.

    Returns a Dataset ``(node, component)`` covering every node that appears
    in at least one pair.  Deterministic: component ids are the minimum
    node id of each cluster.
    """
    from ray.data.aggregate import Min

    edges = _sym_edges(pairs, col_a, col_b).materialize()

    # initial label: min(self, direct neighbors)
    def with_self(t: pa.Table) -> pa.Table:
        return pa.table({
            "node": pa.concat_arrays([t["node"].combine_chunks(),
                                      t["node"].combine_chunks()]),
            "cand": pa.concat_arrays([t["peer"].combine_chunks(),
                                      t["node"].combine_chunks()]),
        })

    labels = (edges.map_batches(with_self, batch_format="pyarrow")
              .groupby("node").aggregate(Min("cand", alias_name="label"))
              .materialize())
    prev_sum = labels.sum("label")

    for _ in range(max_iters):
        # push labels along edges AND shortcut pointers: union(edge rows,
        # label rows, jump-query rows) keyed by node; the group for node k
        # knows label(k), its peers, and every node currently labeled k —
        # it emits (peer, label(k)) per edge, the node's own (k, label(k)),
        # and (asker, label(k)) per jump query (= label(label(asker)))
        def edge_rows(t: pa.Table) -> pa.Table:
            n = t.num_rows
            return pa.table({
                "key": t["node"],
                "peer": t["peer"],
                "label": pa.array([None] * n, type=pa.int64()),
                "asker": pa.array([None] * n, type=pa.int64()),
            })

        def label_and_jump_rows(t: pa.Table) -> pa.Table:
            # One pass over the label table emits BOTH row kinds (one fewer
            # stage + union per round; per-round fixed stage cost dominates
            # small/medium graphs):
            # * label rows: (key=node, label) — the group's label source;
            # * jump rows: node n asks its label-node for THAT node's label
            #   (key=label(n), asker=n); self-rooted nodes (label == node)
            #   would ask themselves — skip them.
            import pyarrow.compute as pc
            n = t.num_rows
            j = t.filter(pc.not_equal(t["label"], t["node"]))
            m = j.num_rows
            return pa.table({
                "key": pa.concat_arrays(
                    [t["node"].combine_chunks(), j["label"].combine_chunks()]),
                "peer": pa.array([None] * (n + m), type=pa.int64()),
                "label": pa.concat_arrays(
                    [t["label"].combine_chunks(),
                     pa.array([None] * m, type=pa.int64())]),
                "asker": pa.concat_arrays(
                    [pa.array([None] * n, type=pa.int64()),
                     j["node"].combine_chunks()]),
            })

        def propagate(g: pa.Table) -> pa.Table:
            lbl = g["label"].combine_chunks() if isinstance(g["label"], pa.ChunkedArray) else g["label"]
            valid = np.asarray(lbl.is_valid())
            rows = np.nonzero(valid)[0]
            if len(rows) == 0:        # node with edges but no label: impossible
                return pa.table({"node": pa.array([], type=pa.int64()),
                                 "cand": pa.array([], type=pa.int64())})
            label = lbl[int(rows[0])].as_py()
            peer_col = g["peer"].combine_chunks() if isinstance(g["peer"], pa.ChunkedArray) else g["peer"]
            asker_col = g["asker"].combine_chunks() if isinstance(g["asker"], pa.ChunkedArray) else g["asker"]
            targets = pa.concat_arrays([
                peer_col.drop_null(),
                asker_col.drop_null(),
                pa.array([g["key"][0].as_py()], type=pa.int64()),
            ])
            return pa.table({
                "node": targets,
                "cand": pa.array([label] * len(targets), type=pa.int64()),
            })

        msgs = (edges.map_batches(edge_rows, batch_format="pyarrow")
                .union(labels.map_batches(label_and_jump_rows,
                                          batch_format="pyarrow"))
                .groupby("key").map_groups(propagate, batch_format="pyarrow"))
        labels = (msgs.groupby("node")
                  .aggregate(Min("cand", alias_name="label")).materialize())
        cur_sum = labels.sum("label")
        if cur_sum == prev_sum:       # labels only decrease → fixpoint
            return labels.map_batches(
                lambda t: pa.table({"node": t["node"],
                                    "component": t["label"]}),
                batch_format="pyarrow")
        prev_sum = cur_sum
    raise RuntimeError(
        f"connected_components did not converge in {max_iters} rounds "
        "(graph diameter exceeds the bound)")


def pagerank_fixed(edges, nodes, n_iters: int = 3, damping_pct: int = 85,
                   scale: int = 1_000_000, mode: str = "broadcast"):
    """Fixed-iteration PageRank with EXACT integer arithmetic.

    The canonical iterative-graph benchmark, with every numeric step in
    scaled integers so the result is bit-identical to the SQL oracle's
    unrolled iterations (and identical across both execution modes):

    * ``r0 = scale`` for every node (unnormalized total mass n·scale);
    * per round: ``contrib(e) = (r[src] · damping_pct) // (100 ·
      outdeg[src])`` — non-negative integers, so numpy floor division and
      DuckDB ``//`` truncation agree; ``r' = (scale · (100-damping_pct))
      // 100 + Σ contribs into the node``.  Dangling mass (if any) drops,
      identically on both sides.  Integer sums are order-independent, so
      block scheduling cannot perturb the result.

    Two execution modes, same contract split as embedding_near_dups
    (exact broadcast baseline + shuffle scale path):

    * ``mode="broadcast"`` (default): node ids are dense-indexed once
      (sorted-unique + ``searchsorted``); the rank vector is one int64
      per node, broadcast per round via ``ray.put`` — the same
      dimension-side contract as :func:`..stages.similarity.
      knn_bruteforce`'s query matrix.  Each round is then ONE map stage
      over the index-encoded edge blocks emitting a per-block partial
      contribution vector (``np.add.at`` — exact int64), plus a tiny
      driver reduce over ≤#blocks vectors.  Zero shuffles, zero joins.
      Scale bound: 8 B × |nodes| must fit the driver/object store
      (~1.25e8 nodes per GiB); edge blocks stream and never move.
    * ``mode="shuffle"``: no broadcast assumption — per round, ranks
      join to edges via :func:`..stages.joins.broadcast_hash_join` on
      ``src`` (swap to ``shuffle_hash_join`` past broadcast size), one
      ``groupby(dst)`` Sum over contrib rows, one broadcast left-outer
      back onto the node list.  This is the web-scale path where the
      rank vector itself is too large to broadcast; it pays two
      exchanges per round for it.

    Returns a Dataset of ``(node, rank_micro)`` after ``n_iters``.
    """
    if mode == "broadcast":
        return _pagerank_broadcast(edges, nodes, n_iters, damping_pct,
                                   scale)
    if mode != "shuffle":
        raise ValueError(f"unknown mode {mode!r}")
    from ray.data.aggregate import Sum
    from .joins import broadcast_hash_join

    def deg_partial(t: pa.Table) -> pa.Table:
        g = t.select(["src"]).group_by("src").aggregate([([], "count_all")])
        return pa.table({"src": g["src"],
                         "d_p": g["count_all"].cast(pa.int64())})

    outdeg = (edges.map_batches(deg_partial, batch_format="pyarrow")
              .groupby("src").aggregate(Sum("d_p", alias_name="outdeg")))
    edges_d = broadcast_hash_join(
        edges, outdeg, on="src",
        project=["src", "dst", "outdeg"]).materialize()

    base = (scale * (100 - damping_pct)) // 100

    def init_ranks(t: pa.Table) -> pa.Table:
        return pa.table({
            "node": t["node"],
            "r": pa.array(np.full(t.num_rows, scale, dtype=np.int64)),
        })

    nodes = nodes.materialize()
    ranks = nodes.map_batches(init_ranks,
                              batch_format="pyarrow").materialize()

    def emit(t: pa.Table) -> pa.Table:
        r = np.asarray(t["r"].combine_chunks()
                       if isinstance(t["r"], pa.ChunkedArray) else t["r"])
        od = np.asarray(t["outdeg"].combine_chunks()
                        if isinstance(t["outdeg"], pa.ChunkedArray)
                        else t["outdeg"])
        c = (r * damping_pct) // (100 * od)
        return pa.table({"node": t["dst"], "c": pa.array(c)})

    def fold(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        s = pc.fill_null(t["s"], 0)
        return pa.table({
            "node": t["node"],
            "r": pc.add(pa.scalar(base, type=pa.int64()),
                        s.cast(pa.int64()) if hasattr(s, "cast") else s),
        })

    for _ in range(n_iters):
        sums = (broadcast_hash_join(edges_d, ranks, on="src",
                                    right_on="node",
                                    project=["dst", "outdeg", "r"])
                .map_batches(emit, batch_format="pyarrow")
                .groupby("node").aggregate(Sum("c", alias_name="s")))
        ranks = (broadcast_hash_join(nodes, sums, on="node",
                                     join_type="left outer",
                                     project=["node", "s"])
                 .map_batches(fold, batch_format="pyarrow")
                 .materialize())

    def rename(t: pa.Table) -> pa.Table:
        return pa.table({"node": t["node"], "rank_micro": t["r"]})

    return ranks.map_batches(rename, batch_format="pyarrow")


def _pagerank_broadcast(edges, nodes, n_iters: int, damping_pct: int,
                        scale: int):
    """Broadcast-mode PageRank rounds (see :func:`pagerank_fixed`).

    One dense int64 vector per node state (ranks, out-degrees) lives on
    the driver and is broadcast per round; edge blocks are index-encoded
    once and never move.  ``np.add.at`` keeps the scatter-sum exact in
    int64 (``np.bincount`` weights would detour through float64).

    Memory bounds: the rank vector costs n×8 B on the driver and per
    broadcast copy; the per-block dense partials are TREE-REDUCED inside
    the cluster (fan-in 16, two levels), so the driver receives exactly
    ONE n×8 B row per round regardless of block count and no single
    reduce task holds more than ceil(blocks/16)+1 partials.  Past driver
    RAM (n ≳ 10^9) use ``mode="shuffle"`` — sparse (node, contrib) rows
    through the groupby exchange, no dense vector anywhere.
    """
    import ray
    import ray.data

    from ..arrowutil import collect_tables
    node_tbl = collect_tables(nodes)
    if node_tbl.num_rows == 0:
        return ray.data.from_arrow(pa.table({
            "node": pa.array([], type=pa.int64()),
            "rank_micro": pa.array([], type=pa.int64())}))
    raw_ids = np.asarray(node_tbl["node"].combine_chunks().cast(pa.int64()))
    node_ids = np.unique(raw_ids)
    if len(node_ids) != len(raw_ids):
        raise ValueError("duplicate node ids in pagerank node list")
    n = len(node_ids)
    ids_ref = ray.put(node_ids)

    def encode(t: pa.Table) -> pa.Table:
        ids = ray.get(ids_ref)
        out = {}
        for col, name in (("src", "si"), ("dst", "di")):
            v = np.asarray(t[col].combine_chunks().cast(pa.int64()))
            idx = np.searchsorted(ids, v)
            idx_c = np.clip(idx, 0, n - 1)
            if not np.array_equal(ids[idx_c], v):
                raise ValueError(
                    f"pagerank edge column {col!r} references ids absent "
                    "from the node list")
            out[name] = pa.array(idx_c, type=pa.int64())
        return pa.table(out)

    enc = edges.map_batches(encode, batch_format="pyarrow").materialize()

    def _combine_parts(t: pa.Table) -> pa.Table:
        acc = np.zeros(n, dtype=np.int64)
        for buf in t["part"].to_pylist():
            acc += np.frombuffer(buf, dtype=np.int64)
        return pa.table({"part": pa.array([acc.tobytes()],
                                          type=pa.binary())})

    def _vec_sum(parts_ds, fanin: int = 16):
        # tree-reduce the dense partials IN the cluster: the driver pulls
        # exactly one n×8 B row however many blocks emitted partials
        if enc.num_blocks() > fanin:
            parts_ds = parts_ds.repartition(fanin).map_batches(
                _combine_parts, batch_size=None, batch_format="pyarrow")
        rows = parts_ds.repartition(1).map_batches(
            _combine_parts, batch_size=None,
            batch_format="pyarrow").take_all()
        if not rows:                       # edge-less graph: no partials
            return np.zeros(n, dtype=np.int64)
        return np.frombuffer(rows[0]["part"], dtype=np.int64)

    def deg_part(t: pa.Table) -> pa.Table:
        si = np.asarray(t["si"].combine_chunks())
        return pa.table({"part": pa.array(
            [np.bincount(si, minlength=n).astype(np.int64).tobytes()],
            type=pa.binary())})

    outdeg = _vec_sum(enc.map_batches(deg_part, batch_size=None,
                                      batch_format="pyarrow"))
    od_ref = ray.put(outdeg)

    base = (scale * (100 - damping_pct)) // 100
    r = np.full(n, scale, dtype=np.int64)
    for _ in range(n_iters):
        r_ref = ray.put(r)

        def round_part(t: pa.Table, _r=r_ref) -> pa.Table:
            si = np.asarray(t["si"].combine_chunks())
            di = np.asarray(t["di"].combine_chunks())
            rv, od = ray.get(_r), ray.get(od_ref)
            contrib = (rv[si] * damping_pct) // (100 * od[si])
            acc = np.zeros(n, dtype=np.int64)
            np.add.at(acc, di, contrib)
            return pa.table({"part": pa.array([acc.tobytes()],
                                              type=pa.binary())})

        r = base + _vec_sum(
            enc.map_batches(round_part, batch_size=None,
                            batch_format="pyarrow"))

    final_ref = ray.put(r)

    def emit_ranks(t: pa.Table) -> pa.Table:
        ids, rv = ray.get(ids_ref), ray.get(final_ref)
        v = np.asarray(t["node"].combine_chunks().cast(pa.int64()))
        return pa.table({
            "node": pa.array(v),
            "rank_micro": pa.array(rv[np.searchsorted(ids, v)]),
        })

    return nodes.map_batches(emit_ranks, batch_format="pyarrow")


def triangle_count(pairs, col_a: str = "vec_a", col_b: str = "vec_b",
                   num_partitions: int = 8):
    """Exact triangle count of an undirected graph given as oriented
    (a < b) edge pairs — the standard graph-health/clustering metric.

    Compact-forward algorithm as two hash-partitioned joins (no per-node
    state, no iteration): wedges a<b<c form by joining edges on the middle
    vertex (e1.b = e2.a), and a second join against the edge set on
    (a, c) keeps exactly the closed wedges.  Each triangle a<b<c is
    counted once (its unique orientation).  The count reduces with the
    streaming ``Dataset.count`` — no materialized triangle list.

    Scale note: wedge volume is Σ_v outdeg(v)² — a skewed hub vertex
    inflates its join partition; pre-split hub vertices (the
    ``stages/skew.py`` salting) or cap degree upstream when the graph has
    web-hub skew.  The wedge set is materialized between the joins: (a)
    Ray's hash join drops the key schema on an empty input, so a
    wedge-free graph (e.g. a perfect matching) needs the count guard,
    and (b) it serializes the two joins, so their aggregator actor pools
    never coexist (chaining both in one DAG at ``num_partitions=32`` on
    an 8-CPU box stalled in an actor-spawn storm).  The join's own
    aggregators buffer the same wedge volume either way; the object
    store copy is spillable.  Returns a one-row pandas frame
    (n_triangles).
    """
    import pandas as pd

    from .joins import shuffle_hash_join

    def ab(t: pa.Table) -> pa.Table:
        a = np.asarray(t[col_a].combine_chunks().cast(pa.int64()))
        b = np.asarray(t[col_b].combine_chunks().cast(pa.int64()))
        if len(a) and not (a < b).all():
            raise ValueError(
                "triangle_count requires oriented edges with "
                f"{col_a} < {col_b} in every row")
        return pa.table({"a": pa.array(a), "b": pa.array(b)})

    e = pairs.map_batches(ab, batch_format="pyarrow").materialize()
    if e.count() == 0:
        # an edge-free graph has no triangles; the hash join would also
        # lose the (empty) key schema and raise, so short-circuit
        return pd.DataFrame({"n_triangles": pd.array([0], dtype="int64")})
    mid = e.map_batches(
        lambda t: pa.table({"b": t["a"], "c": t["b"]}),
        batch_format="pyarrow")
    wedges = shuffle_hash_join(e, mid, on="b",
                               num_partitions=num_partitions,
                               project=["a", "c"]).materialize()
    if wedges.count() == 0:      # e.g. a perfect matching: edges, no wedges
        return pd.DataFrame({"n_triangles": pd.array([0], dtype="int64")})
    closing = e.map_batches(
        lambda t: pa.table({"a": t["a"], "c": t["b"]}),
        batch_format="pyarrow")
    tri = shuffle_hash_join(wedges, closing, on=("a", "c"),
                            num_partitions=num_partitions)
    return pd.DataFrame({"n_triangles": pd.array([tri.count()],
                                                 dtype="int64")})


def prune_near_dups(items, pairs, id_col: str = "vec_id",
                    col_a: str = "vec_a", col_b: str = "vec_b"):
    """Fuzzy-dedup pruning — the step after pair finding and clustering
    that a curation pipeline actually ships: keep exactly ONE
    representative (the min id, the repo-wide canonical-survivor rule)
    per near-duplicate component and drop the rest.

    Plan: :func:`connected_components` labels the duplicate-cluster
    members (that set is O(duplicates), not O(corpus)); the non-
    representative members (node != component) become the drop list,
    broadcast once; ``items`` streams through a pyarrow C++ anti-join —
    the corpus side never shuffles.  If the duplicate population is too
    large to broadcast (pathologically duplicated crawls), swap the
    anti-join for the hash-partitioned ``shuffle_hash_join`` with
    ``join_type="left_anti"`` — same semantics, one exchange.

    Returns ``items``' rows whose ``id_col`` survives.
    """
    import ray

    from .joins import broadcast_hash_join

    # a corpus with NO near-dups is an ordinary input: the pair set is
    # tiny by contract (it feeds a driver-side components loop), so
    # materialize once — empty pairs mean nothing to drop, and the
    # schema-less empty Datasets would crash components/the join anyway
    pairs = pairs.materialize()
    if pairs.count() == 0:
        return items

    comp = connected_components(pairs, col_a=col_a, col_b=col_b)

    def drops(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        keep = pc.not_equal(t["node"], t["component"])
        return pa.table({id_col: t.filter(keep)["node"]})

    drop_ids = comp.map_batches(drops, batch_format="pyarrow")
    return broadcast_hash_join(items, drop_ids, on=id_col,
                               join_type="left anti")


def prune_near_dups_distributed(items, pairs, id_col: str = "vec_id",
                                col_a: str = "vec_a", col_b: str = "vec_b",
                                num_partitions: int = 8):
    """Scale-path variant of :func:`prune_near_dups` for pathologically
    duplicated crawls where the drop list (O(duplicates)) outgrows a
    driver broadcast: same component labeling, but the corpus anti-joins
    against the drop ids through ONE hash-partitioned exchange instead of
    a broadcast.  Ray's native join has no anti type, so this is a
    left-outer join against marker rows followed by a null filter — the
    standard exact reduction.  Returns the same surviving rows.
    """
    import numpy as np

    from .joins import shuffle_hash_join

    pairs = pairs.materialize()
    if pairs.count() == 0:
        return items

    comp = connected_components(pairs, col_a=col_a, col_b=col_b)

    def drops(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        keep = pc.not_equal(t["node"], t["component"])
        n = int(pc.sum(pc.cast(keep, pa.int8())).as_py() or 0)
        return pa.table({
            id_col: t.filter(keep)["node"],
            "_drop": pa.array(np.ones(n, dtype=np.int64)),
        })

    # pairs can label every node as its own representative (degenerate
    # self-pairs) — an empty drop side would hit the empty-side join
    # crash; the drop list is O(duplicates) and already bounded by the
    # pairs contract, so one materialize+count here is cheap
    drop_ids = comp.map_batches(drops, batch_format="pyarrow").materialize()
    if drop_ids.count() == 0:
        return items
    joined = shuffle_hash_join(items, drop_ids, on=id_col,
                               num_partitions=num_partitions,
                               join_type="left_outer")

    def survivors(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return t.filter(pc.is_null(t["_drop"])).drop_columns(["_drop"])

    return joined.map_batches(survivors, batch_format="pyarrow")


def resolve_redirects(edges, src_col: str = "src", dst_col: str = "dst",
                      max_rounds: int = 20, num_partitions: int = 8):
    """Resolve HTTP-redirect chains to their final target by path doubling.

    ``edges`` is a FUNCTIONAL graph: one ``(src, dst)`` int64 row per
    redirecting url id, at most one outgoing edge per ``src``, and no
    cycles (a crawler's redirect log after its own loop guard; the
    reference tool follows ``dx.doi.org`` redirects one url at a time in
    ``finders.py`` — here the whole crawl's chains resolve at once).
    Returns ``(src, final, n_hops)`` for EVERY src: the first reachable
    node with no outgoing edge and the exact hop count to it.

    Path doubling: each round every still-unresolved pointer jumps to its
    target's CURRENT pointer (``dst ← M[dst]``, ``hops += hops[dst]``), so
    the resolved prefix of every chain doubles per round — a chain of
    length L needs ceil(log2 L) rounds, each ONE hash-partitioned
    left-outer self-join over 3-int64 rows (`shuffle_hash_join`; payload
    urls never enter the loop — encode to ids first).  A per-round
    driver-side Sum of the moved-row indicator detects the fixpoint; on a
    cycle the sum never reaches zero and ``max_rounds`` raises instead of
    returning wrong finals.  At 10^12 pages redirect rows are a small
    fraction of the crawl and shrink as chains resolve; ``num_partitions``
    bounds per-aggregator memory of each round's exchange.
    """
    import pyarrow.compute as pc

    from ..arrowutil import one_chunk
    from .joins import shuffle_hash_join

    def init(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table({
            "src": one_chunk(t[src_col]).cast(pa.int64()),
            "dst": one_chunk(t[dst_col]).cast(pa.int64()),
            "n_hops": pa.array(np.ones(n, dtype=np.int64)),
        })

    state = edges.map_batches(init, batch_format="pyarrow").materialize()

    def as_jump(t: pa.Table) -> pa.Table:
        return pa.table({"j_src": t["src"], "j_dst": t["dst"],
                         "j_hops": t["n_hops"]})

    for _ in range(max_rounds):
        jump = state.map_batches(as_jump, batch_format="pyarrow")
        joined = shuffle_hash_join(
            state.select_columns(["src", "dst", "n_hops"]), jump,
            on="dst", right_on="j_src",
            join_type="left_outer", num_partitions=num_partitions)

        def advance(t: pa.Table) -> pa.Table:
            hit = pc.is_valid(one_chunk(t["j_dst"]))
            return pa.table({
                "src": t["src"],
                "dst": pc.if_else(hit, t["j_dst"], t["dst"]),
                "n_hops": pc.add(
                    t["n_hops"],
                    pc.if_else(hit, t["j_hops"], pa.scalar(0, pa.int64()))),
                "moved": pc.cast(hit, pa.int64()),
            })

        # the moved indicator rides along in the materialized state (every
        # consumer projects named columns, so it never enters a join) — one
        # materialize per round, the Sum reads it for free
        state = joined.map_batches(
            advance, batch_format="pyarrow").materialize()
        moved = state.sum("moved")
        if not moved:
            return state.map_batches(
                lambda t: pa.table({"src": t["src"], "final": t["dst"],
                                    "n_hops": t["n_hops"]}),
                batch_format="pyarrow")
    raise RuntimeError(
        f"resolve_redirects: chains unresolved after {max_rounds} doubling "
        "rounds — a redirect cycle or a chain longer than 2^rounds")


def hits_fixed(edges, n_iters: int = 2, scale: int = 1_000_000):
    """Fixed-iteration HITS (hubs & authorities) with EXACT integer
    arithmetic over a weighted edge list ``(src, dst, n_links)`` — the
    domain-authority counterpart to :func:`pagerank_fixed` (reference
    ranks candidate identifiers by scan priority,
    reference/pdf2doi/finders.py:268-318; link-topology ranking is the
    beyond-reference crawl-curation tier).

    Per iteration (all int64, floor division on non-negative operands, so
    numpy and DuckDB agree bit-for-bit and block order cannot perturb the
    integer sums):

    * ``a_raw(v) = sum over in-edges (u,v) of n_links * h(u)``;
      ``a(v) = a_raw(v) * scale // max(a_raw)`` (max-normalized so scores
      stay in [0, scale] and iterations cannot overflow);
    * ``h_raw(u) = sum over out-edges (u,v) of n_links * a(v)``;
      ``h(u) = h_raw(u) * scale // max(h_raw)``.

    Plan per iteration: two broadcast hash joins of the node-sized score
    table onto the streaming edge blocks + two ``groupby`` Sums over
    combiner-bounded (node, partial) rows; the normalizing max is a
    per-batch partial reduced on the driver.  The score table is
    node-count-sized — for node sets past broadcast size swap the join to
    :func:`.joins.shuffle_hash_join` exactly as :func:`pagerank_fixed`
    mode="shuffle" does (same contract split).

    int64 bound: ``sum(n_links) * scale < 2**63`` — 9.2e12 weighted edges
    at the default scale; raise ``scale`` down for denser graphs.

    Returns a Dataset of ``(node, hub_scaled, auth_scaled)`` over every
    node that appears as a src or dst.  Raises on an empty edge set.
    """
    from ray.data.aggregate import Max, Sum

    from .joins import broadcast_hash_join

    edges = edges.materialize()

    def node_partial(t: pa.Table) -> pa.Table:
        s = t["src"].combine_chunks() if isinstance(t["src"],
                                                    pa.ChunkedArray) \
            else t["src"]
        d = t["dst"].combine_chunks() if isinstance(t["dst"],
                                                    pa.ChunkedArray) \
            else t["dst"]
        u = pc.unique(pa.concat_arrays([s, d]))
        return pa.table({"node": u})

    from ray.data.aggregate import Count
    nodes = (edges.map_batches(node_partial, batch_format="pyarrow")
             .groupby("node").aggregate(Count())
             .map_batches(lambda t: t.select(["node"]),
                          batch_format="pyarrow").materialize())
    if nodes.count() == 0:
        raise ValueError("hits_fixed: empty edge set")

    def init_scores(t: pa.Table) -> pa.Table:
        return pa.table({
            "node": t["node"],
            "s": pa.array(np.full(t.num_rows, scale, dtype=np.int64)),
        })

    def _arr(col):
        return np.asarray(col.combine_chunks()
                          if isinstance(col, pa.ChunkedArray) else col)

    def sweep(scores, key_col: str, emit_col: str):
        """One half-iteration: scores joined on ``key_col`` of the edges,
        weighted sums grouped by ``emit_col``, max-normalized against the
        node list (absent nodes -> 0)."""
        def emit(t: pa.Table) -> pa.Table:
            v = _arr(t["s"]) * _arr(t["n_links"])
            return pa.table({"node": t[emit_col],
                             "v": pa.array(v, type=pa.int64())})

        raw = (broadcast_hash_join(edges, scores, on=key_col,
                                   right_on="node",
                                   project=[emit_col, "n_links", "s"])
               .map_batches(emit, batch_format="pyarrow")
               .groupby("node").aggregate(Sum("v", alias_name="v"))
               .materialize())
        m = raw.aggregate(Max("v"))["max(v)"]
        if not m:
            raise ValueError(
                "hits_fixed: zero mass sweep (disconnected half)")

        def fold(t: pa.Table) -> pa.Table:
            v = np.asarray(pc.fill_null(t["v"], 0).combine_chunks()
                           if isinstance(t["v"], pa.ChunkedArray)
                           else pc.fill_null(t["v"], 0))
            return pa.table({
                "node": t["node"],
                "s": pa.array(v * scale // m, type=pa.int64()),
            })

        return (broadcast_hash_join(nodes, raw, on="node",
                                    join_type="left outer",
                                    project=["node", "v"])
                .map_batches(fold, batch_format="pyarrow").materialize())

    hubs = nodes.map_batches(init_scores,
                             batch_format="pyarrow").materialize()
    auth = None
    for _ in range(n_iters):
        auth = sweep(hubs, "src", "dst")
        hubs = sweep(auth, "dst", "src")

    joined = broadcast_hash_join(
        hubs.map_batches(lambda t: pa.table({"node": t["node"],
                                             "hub_scaled": t["s"]}),
                         batch_format="pyarrow"),
        auth.map_batches(lambda t: pa.table({"node": t["node"],
                                             "auth_scaled": t["s"]}),
                         batch_format="pyarrow"),
        on="node", project=["node", "hub_scaled", "auth_scaled"])
    return joined


def component_size_histogram(labels, comp_col: str = "component"):
    """Cluster-size distribution of a component labeling — the standard
    dedup-audit report ("how big are my duplicate clusters"), and the
    input to the star-cap / verify-budget decisions the near-dup
    operators make.

    Two combiner-first exchanges, both over combiner-bounded rows: per
    batch, counts per component (one Arrow group_by); ONE
    ``groupby(component)`` Sum gives exact sizes; per batch of sizes, a
    (size, n) partial; ONE ``groupby(size)`` Sum gives the histogram.
    The second exchange carries ≤ distinct-sizes-per-batch rows — a
    power-law cluster distribution collapses to a handful of size keys.

    Returns a Dataset of ``(cluster_size, n_clusters)``.
    """
    from ray.data.aggregate import Sum

    def comp_partial(t: pa.Table) -> pa.Table:
        g = pa.table({"component": t[comp_col]}).group_by("component") \
            .aggregate([([], "count_all")])
        return pa.table({"component": g["component"],
                         "n": g["count_all"].cast(pa.int64())})

    sizes = (labels.map_batches(comp_partial, batch_format="pyarrow")
             .groupby("component").aggregate(Sum("n", alias_name="size")))

    def size_partial(t: pa.Table) -> pa.Table:
        g = pa.table({"cluster_size": t["size"]}) \
            .group_by("cluster_size").aggregate([([], "count_all")])
        return pa.table({"cluster_size": g["cluster_size"],
                         "n": g["count_all"].cast(pa.int64())})

    return (sizes.map_batches(size_partial, batch_format="pyarrow")
            .groupby("cluster_size")
            .aggregate(Sum("n", alias_name="n_clusters")))


def bfs_depths(edges, source: str, max_depth: int = 8,
               src_col: str = "src", dst_col: str = "dst"):
    """Single-source BFS hop distances over an edge list — the crawl
    frontier / link-distance primitive (how many clicks from the seed).
    Returns every node reachable within ``max_depth`` hops as
    ``(node, depth)`` with the MINIMUM hop count (source at depth 0).

    Plan (broadcast-frontier mode, the :func:`pagerank_fixed`
    ``mode="broadcast"`` contract): per round the current frontier set
    (node-sized driver state, re-broadcast in the task closure) filters
    the streaming edge blocks with one vectorized ``pc.is_in``; each
    batch emits its DISTINCT matching destinations and the driver
    subtracts the visited set — edges never shuffle, rounds = graph
    depth.  Node sets past broadcast size swap the frontier filter for a
    hash join exactly as pagerank's ``mode="shuffle"`` does.

    Rounds run at most ``max_depth``; the loop exits early when a
    frontier comes back empty.
    """
    import pandas as pd

    edges = edges.materialize()
    visited = {source}
    frontier = [source]
    out_nodes = [source]
    out_depths = [0]

    for depth in range(1, max_depth + 1):
        fr = pa.array(sorted(frontier), type=pa.string())

        def next_partial(t: pa.Table, _fr=fr) -> pa.Table:
            hit = pc.is_in(t[src_col].combine_chunks()
                           if isinstance(t[src_col], pa.ChunkedArray)
                           else t[src_col], value_set=_fr)
            d = t.filter(hit)[dst_col]
            u = pc.unique(d.combine_chunks()
                          if isinstance(d, pa.ChunkedArray) else d)
            return pa.table({"node": u})

        cand = edges.map_batches(next_partial,
                                 batch_format="pyarrow").to_pandas()
        if "node" not in cand.columns or cand.empty:
            break
        fresh = sorted(set(cand["node"]) - visited)
        if not fresh:
            break
        visited.update(fresh)
        out_nodes.extend(fresh)
        out_depths.extend([depth] * len(fresh))
        frontier = fresh

    return pd.DataFrame({"node": out_nodes,
                         "depth": np.array(out_depths, dtype=np.int64)})


def reciprocal_pairs(edges):
    """Mutual-link host pairs — unordered pairs {a, b} with links in
    BOTH directions, plus each direction's link count: the reciprocity
    cut of a crawl graph (mirror detection, link-exchange rings).

    Input is the aggregated (src, dst, n_links) edge list (one row per
    directed pair, e.g. :func:`.corpus.host_link_graph` output).  Each
    edge maps to its canonical ``(min, max)`` pair carrying its count on
    the matching side; ONE ≤|pairs|-row groupby Sum aligns the two
    directions and a vectorized filter keeps pairs where both are
    positive.  Self-loops drop.  Returns (host_a, host_b, n_ab, n_ba).
    """
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    from ..arrowutil import one_chunk

    def canon(t: pa.Table) -> pa.Table:
        src = one_chunk(t["src"])
        dst = one_chunk(t["dst"])
        keep = pc.invert(pc.equal(src, dst))
        t = pa.table({"src": src, "dst": dst, "n": t["n_links"]}) \
            .filter(keep)
        src, dst = one_chunk(t["src"]), one_chunk(t["dst"])
        fwd = np.asarray(pc.less(src, dst))
        n = np.asarray(one_chunk(t["n"])).astype(np.int64)
        a = pc.if_else(pa.array(fwd), src, dst)
        b = pc.if_else(pa.array(fwd), dst, src)
        return pa.table({
            "host_a": a, "host_b": b,
            "n_ab": pa.array(np.where(fwd, n, 0)),
            "n_ba": pa.array(np.where(fwd, 0, n))})

    summed = (edges.map_batches(canon, batch_format="pyarrow")
              .groupby(["host_a", "host_b"])
              .aggregate(Sum("n_ab", alias_name="n_ab"),
                         Sum("n_ba", alias_name="n_ba")))

    def both(t: pa.Table) -> pa.Table:
        keep = pc.and_(pc.greater(t["n_ab"], 0), pc.greater(t["n_ba"], 0))
        return t.filter(keep)

    return summed.map_batches(both, batch_format="pyarrow")


def out_degree_histogram(edges):
    """Out-degree distribution of a distinct directed edge list — how
    many source nodes have each fan-out (the power-law sanity plot of a
    crawl graph, as data).  Input rows must be distinct (src, dst)
    (aggregated edges); degree = rows per src.  Two tiny exchanges:
    groupby(src).count, then per-batch degree histogramming into a
    ≤|distinct degrees|-row groupby Sum.  Returns (out_degree, n_hosts).
    """
    from ray.data.aggregate import Count, Sum

    from ..arrowutil import one_chunk

    deg = edges.groupby("src").aggregate(Count(alias_name="deg"))

    def partial(t: pa.Table) -> pa.Table:
        d = np.asarray(one_chunk(t["deg"])).astype(np.int64)
        uniq, cnt = np.unique(d, return_counts=True)
        return pa.table({"out_degree": pa.array(uniq),
                         "n_hosts": pa.array(cnt.astype(np.int64))})

    return (deg.map_batches(partial, batch_format="pyarrow")
            .groupby("out_degree")
            .aggregate(Sum("n_hosts", alias_name="n_hosts")))


def bibliographic_coupling(edges, max_fanout: int = 4096,
                           num_shards: int = 32):
    """Bibliographic-coupling projection with exact Jaccard integers:
    pairs of SOURCE hosts linking to common destinations —
    (host_a, host_b, n_common, union_size) where ``n_common`` counts
    shared distinct dst hosts and ``union_size = deg(a)+deg(b)−common``
    (so callers threshold J = common/union without any float leaving
    the engine).  The dual of :func:`.corpus.co_citation_counts`
    (shared dst instead of shared src page).

    Plan: distinct (src, dst) edges shard by dst hash into the
    sharded-stitch machinery; inside a shard ONE lexsort groups each
    dst's sources and the i<j pair fan-out is the same repeat/arange
    segment arithmetic as co-citation — vectorized, never per-group
    Python.  Hub destinations cited by more than ``max_fanout`` sources
    RAISE (quadratic blowup is a data problem the caller must cap or
    pre-filter, the standard stop-pattern rule of similarity joins).
    Degrees attach broadcast-side to the ≤|pairs| result.
    """
    from ray.data.aggregate import Count, Sum

    from ..arrowutil import one_chunk
    from .joins import broadcast_hash_join
    from .stitch import sharded_stitch

    dedges = (edges.map_batches(
        lambda t: t.select(["src", "dst"]).group_by(
            ["src", "dst"]).aggregate([]),
        batch_format="pyarrow")
        .groupby(["src", "dst"]).aggregate(Count(alias_name="_c")))

    def shard_of(t: pa.Table) -> np.ndarray:
        import pandas as pd
        return pd.util.hash_array(
            one_chunk(t["dst"]).to_numpy(zero_copy_only=False)) \
            .astype(np.int64) & np.int64(0x7FFFFFFFFFFFFFFF)

    empty = pa.table({"host_a": pa.array([], type=pa.string()),
                      "host_b": pa.array([], type=pa.string()),
                      "n": pa.array([], type=pa.int64())})

    def pairs_in_shard(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return empty
        s = np.asarray(one_chunk(t["src"]).to_pandas(), dtype=object)
        d = np.asarray(one_chunk(t["dst"]).to_pandas(), dtype=object)
        order = np.lexsort((s.astype(str), d.astype(str)))
        s, d = s[order], d[order]
        new_seg = np.ones(len(d), dtype=bool)
        new_seg[1:] = d[1:] != d[:-1]
        seg_start = np.flatnonzero(new_seg)
        m = np.diff(np.append(seg_start, len(d)))
        if m.max(initial=0) > max_fanout:
            raise ValueError(
                f"bibliographic_coupling: a destination has {m.max()} "
                f"sources (> max_fanout={max_fanout}); cap or pre-filter "
                "hub destinations")
        seg_end = np.repeat(seg_start + m, m)
        row_idx = np.arange(len(d), dtype=np.int64)
        cnt = seg_end - row_idx - 1
        a_idx = np.repeat(row_idx, cnt)
        grp_start = np.cumsum(cnt) - cnt
        b_idx = (np.arange(cnt.sum(), dtype=np.int64)
                 - np.repeat(grp_start, cnt)) + a_idx + 1
        if not len(a_idx):
            return empty
        g = pa.table({"host_a": pa.array(s[a_idx].astype(object),
                                         type=pa.string()),
                      "host_b": pa.array(s[b_idx].astype(object),
                                         type=pa.string()),
                      "n": pa.array(np.ones(len(a_idx), np.int64))}) \
            .group_by(["host_a", "host_b"]).aggregate([("n", "sum")])
        return g.select(["host_a", "host_b", "n_sum"]) \
            .rename_columns(["host_a", "host_b", "n"])

    pair_counts = (sharded_stitch(dedges, shard_of, pairs_in_shard,
                                  num_shards=num_shards)
                   .groupby(["host_a", "host_b"])
                   .aggregate(Sum("n", alias_name="n_common")))

    deg = dedges.groupby("src").aggregate(Count(alias_name="deg"))
    with_a = broadcast_hash_join(
        pair_counts, deg, on=["host_a"], right_on=["src"],
        project=["host_a", "host_b", "n_common", "deg"])
    with_a = with_a.map_batches(
        lambda t: t.rename_columns(
            ["host_a", "host_b", "n_common", "deg_a"]),
        batch_format="pyarrow")
    both = broadcast_hash_join(
        with_a, deg, on=["host_b"], right_on=["src"],
        project=["host_a", "host_b", "n_common", "deg_a", "deg"])

    def finish(t: pa.Table) -> pa.Table:
        nc = np.asarray(one_chunk(t["n_common"])).astype(np.int64)
        da = np.asarray(one_chunk(t["deg_a"])).astype(np.int64)
        db = np.asarray(one_chunk(t["deg"])).astype(np.int64)
        return pa.table({"host_a": t["host_a"], "host_b": t["host_b"],
                         "n_common": pa.array(nc),
                         "union_size": pa.array(da + db - nc)})

    return both.map_batches(finish, batch_format="pyarrow")


def clustering_coefficients(edges, max_fanout: int = 4096,
                            num_shards: int = 32,
                            num_partitions: int = 16):
    """Per-node local clustering coefficient, as exact integers —
    (host, n_triangles, n_wedges) with coefficient =
    n_triangles / n_wedges left to the caller (no float leaves the
    engine).  The standard "how clubby is this host's neighborhood"
    graph statistic.

    Degree-ordered triangle counting (the MapReduce-classic plan that
    survives power-law graphs): the directed input symmetrizes to
    distinct undirected (a<b) edges; each edge orients from its
    lower-(degree, name) endpoint so every wedge is emitted by its
    LOWEST-degree vertex — out-fanout is bounded by O(√m) on any graph,
    hubs never fan out quadratically (``max_fanout`` still guards
    pathology loudly).  Wedge (v, w | u) closes iff undirected edge
    (v, w) exists: ONE shuffle hash join against the edge list — no
    broadcast of the (potentially fact-sized) edge set.  Each found
    triangle credits all three corners via an explode + ONE groupby
    Sum; wedge counts are ``deg·(deg−1)/2`` straight off the degree
    table.  Degrees broadcast (per-host dimension contract shared with
    the other host-graph ops).
    """
    from ray.data.aggregate import Count, Sum

    from ..arrowutil import collect_tables, one_chunk
    from .joins import shuffle_hash_join
    from .stitch import sharded_stitch

    # distinct undirected edges, self-loops dropped
    def undirect(t: pa.Table) -> pa.Table:
        src, dst = one_chunk(t["src"]), one_chunk(t["dst"])
        keep = pc.invert(pc.equal(src, dst))
        src, dst = src.filter(keep), dst.filter(keep)
        lo = pc.if_else(pc.less(src, dst), src, dst)
        hi = pc.if_else(pc.less(src, dst), dst, src)
        return pa.table({"a": lo, "b": hi}).group_by(["a", "b"]) \
            .aggregate([])

    und = (edges.map_batches(undirect, batch_format="pyarrow")
           .groupby(["a", "b"]).aggregate(Count(alias_name="_c"))
           .select_columns(["a", "b"]).materialize())

    def explode_ends(t: pa.Table) -> pa.Table:
        node = pa.concat_arrays([one_chunk(t["a"]), one_chunk(t["b"])])
        return pa.table({"node": node})

    deg_ds = (und.map_batches(explode_ends, batch_format="pyarrow")
              .groupby("node").aggregate(Count(alias_name="deg")))
    deg_tbl = collect_tables(deg_ds)
    nodes = np.asarray(one_chunk(deg_tbl["node"]).to_pandas(),
                       dtype=object).astype(str)
    degs = np.asarray(one_chunk(deg_tbl["deg"])).astype(np.int64)
    order = np.argsort(nodes)
    nodes_sorted, degs_sorted = nodes[order], degs[order]

    def _deg_of(names: np.ndarray) -> np.ndarray:
        return degs_sorted[np.searchsorted(nodes_sorted, names)]

    # orient each edge from the lower-(deg, name) endpoint
    def orient(t: pa.Table) -> pa.Table:
        a = np.asarray(one_chunk(t["a"]).to_pandas(), dtype=object)
        b = np.asarray(one_chunk(t["b"]).to_pandas(), dtype=object)
        da, db = _deg_of(a.astype(str)), _deg_of(b.astype(str))
        # a < b by name already, so name breaks degree ties
        a_first = da <= db
        u = np.where(a_first, a, b)
        v = np.where(a_first, b, a)
        return pa.table({"u": pa.array(u.astype(object),
                                       type=pa.string()),
                         "v": pa.array(v.astype(object),
                                       type=pa.string())})

    oriented = und.map_batches(orient, batch_format="pyarrow")

    empty_w = pa.table({"wa": pa.array([], type=pa.string()),
                        "wb": pa.array([], type=pa.string()),
                        "corner": pa.array([], type=pa.string())})

    def wedges_in_shard(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return empty_w
        u = np.asarray(one_chunk(t["u"]).to_pandas(), dtype=object)
        v = np.asarray(one_chunk(t["v"]).to_pandas(), dtype=object)
        order = np.lexsort((v.astype(str), u.astype(str)))
        u, v = u[order], v[order]
        new_seg = np.ones(len(u), dtype=bool)
        new_seg[1:] = u[1:] != u[:-1]
        seg_start = np.flatnonzero(new_seg)
        m = np.diff(np.append(seg_start, len(u)))
        if m.max(initial=0) > max_fanout:
            raise ValueError(
                f"clustering_coefficients: oriented out-degree "
                f"{m.max()} > max_fanout={max_fanout}")
        seg_end = np.repeat(seg_start + m, m)
        row_idx = np.arange(len(u), dtype=np.int64)
        cnt = seg_end - row_idx - 1
        a_idx = np.repeat(row_idx, cnt)
        grp_start = np.cumsum(cnt) - cnt
        b_idx = (np.arange(cnt.sum(), dtype=np.int64)
                 - np.repeat(grp_start, cnt)) + a_idx + 1
        if not len(a_idx):
            return empty_w
        # out-neighbors are name-sorted within the segment → va < vb
        return pa.table({
            "wa": pa.array(v[a_idx].astype(object), type=pa.string()),
            "wb": pa.array(v[b_idx].astype(object), type=pa.string()),
            "corner": pa.array(u[a_idx].astype(object),
                               type=pa.string())})

    def shard_of(t: pa.Table) -> np.ndarray:
        import pandas as pd
        return pd.util.hash_array(
            one_chunk(t["u"]).to_numpy(zero_copy_only=False)) \
            .astype(np.int64) & np.int64(0x7FFFFFFFFFFFFFFF)

    wedges = sharded_stitch(oriented, shard_of, wedges_in_shard,
                            num_shards=num_shards)

    tri = shuffle_hash_join(
        wedges, und, on=["wa", "wb"], right_on=["a", "b"],
        join_type="inner", num_partitions=num_partitions,
        project=["wa", "wb", "corner"])

    def credit(t: pa.Table) -> pa.Table:
        node = pa.concat_arrays([
            pc.cast(one_chunk(t["wa"]), pa.string()),
            pc.cast(one_chunk(t["wb"]), pa.string()),
            pc.cast(one_chunk(t["corner"]), pa.string())])
        g = pa.table({"node": node}).group_by("node") \
            .aggregate([([], "count_all")])
        return g.select(["node", "count_all"]) \
            .rename_columns(["node", "n"])

    tri_counts = (tri.map_batches(credit, batch_format="pyarrow")
                  .groupby("node").aggregate(Sum("n", alias_name="n")))
    tri_tbl = collect_tables(tri_counts)
    tn = np.asarray(one_chunk(tri_tbl["node"]).to_pandas(),
                    dtype=object).astype(str) if tri_tbl.num_rows \
        else np.empty(0, dtype=str)
    tc = np.asarray(one_chunk(tri_tbl["n"])).astype(np.int64) \
        if tri_tbl.num_rows else np.empty(0, np.int64)
    torder = np.argsort(tn)
    tn, tc = tn[torder], tc[torder]

    def finish(t: pa.Table) -> pa.Table:
        node = np.asarray(one_chunk(t["node"]).to_pandas(),
                          dtype=object).astype(str)
        d = np.asarray(one_chunk(t["deg"])).astype(np.int64)
        pos = np.searchsorted(tn, node)
        hit = (pos < len(tn))
        ntri = np.zeros(len(node), dtype=np.int64)
        if len(tn):
            pos = np.minimum(pos, len(tn) - 1)
            hit = tn[pos] == node
            ntri[hit] = tc[pos[hit]]
        return pa.table({"host": pa.array(node.astype(object),
                                          type=pa.string()),
                         "n_triangles": pa.array(ntri),
                         "n_wedges": pa.array(d * (d - 1) // 2)})

    return deg_ds.map_batches(finish, batch_format="pyarrow")


def weighted_sssp(edges, source: str, max_rounds: int = 16,
                  src_col: str = "src", dst_col: str = "dst",
                  w_col: str = "n_links"):
    """Single-source shortest paths with positive integer edge weights —
    distributed Bellman-Ford over streaming edge blocks: per round the
    current distance map (node-sized driver state, re-broadcast in the
    task closure — the :func:`bfs_depths` / pagerank-broadcast contract)
    relaxes every edge vectorized, each batch emits its per-destination
    MINIMUM candidate (an Arrow group_by combiner), and the driver keeps
    improvements.  Edges never shuffle; rounds needed = longest shortest
    path in hops, with an early exit when a round improves nothing and a
    loud raise at ``max_rounds`` (negative weights are rejected, so
    convergence is guaranteed).  Returns (node, dist) for reachable
    nodes, exact int64.
    """
    import pandas as pd

    from ..arrowutil import one_chunk

    edges = edges.materialize()
    dist: dict = {source: 0}

    for _ in range(max_rounds):
        keys = pa.array(sorted(dist), type=pa.string())
        vals = np.array([dist[k] for k in sorted(dist)], dtype=np.int64)

        def relax(t: pa.Table, _k=keys, _v=vals) -> pa.Table:
            s = one_chunk(t[src_col])
            idx = pc.index_in(s, value_set=_k)
            hit = pc.is_valid(idx)
            t2 = pa.table({"dst": one_chunk(t[dst_col]),
                           "w": one_chunk(t[w_col]),
                           "i": idx}).filter(hit)
            if t2.num_rows == 0:
                return pa.table({"node": pa.array([], type=pa.string()),
                                 "cand": pa.array([], type=pa.int64())})
            w = np.asarray(one_chunk(t2["w"])).astype(np.int64)
            if len(w) and w.min() <= 0:
                raise ValueError("weighted_sssp: weights must be "
                                 "positive integers")
            cand = _v[np.asarray(one_chunk(t2["i"]))] + w
            g = pa.table({"node": t2["dst"], "cand": pa.array(cand)}) \
                .group_by("node").aggregate([("cand", "min")])
            return g.select(["node", "cand_min"]) \
                .rename_columns(["node", "cand"])

        cand = edges.map_batches(relax, batch_format="pyarrow") \
            .to_pandas()
        improved = False
        if "node" in cand.columns and len(cand):
            best = cand.groupby("node")["cand"].min()
            for node, c in best.items():
                if c < dist.get(node, np.iinfo(np.int64).max):
                    dist[node] = int(c)
                    improved = True
        if not improved:
            break
    else:
        raise RuntimeError(
            f"weighted_sssp: no convergence in {max_rounds} rounds")

    nodes = sorted(dist)
    return pd.DataFrame({"node": nodes,
                         "dist": np.array([dist[n] for n in nodes],
                                          dtype=np.int64)})


def degree_assortativity_sums(edges):
    """Degree-assortativity cross-sums over the distinct undirected
    edge list — the exact integer ingredients of the Pearson degree
    correlation (``r = (m·Σxy − Σx·Σy) / …``): callers compare the
    cross-multiplied numerator/denominator without any float.  Per
    edge {a, b}: x = deg(a), y = deg(b) counted BOTH ways (the standard
    symmetrized definition), so Σx ≡ Σy and Σx² ≡ Σy².  Returns one row
    (m_twice, sum_x, sum_xx, sum_xy).

    Degrees broadcast (host-dimension contract); the reduction is a
    per-batch int64 combiner into a sentinel-key groupby Sum.
    """
    from ray.data.aggregate import Count, Sum

    from ..arrowutil import collect_tables, one_chunk

    def undirect(t: pa.Table) -> pa.Table:
        src, dst = one_chunk(t["src"]), one_chunk(t["dst"])
        keep = pc.invert(pc.equal(src, dst))
        src, dst = src.filter(keep), dst.filter(keep)
        lo = pc.if_else(pc.less(src, dst), src, dst)
        hi = pc.if_else(pc.less(src, dst), dst, src)
        return pa.table({"a": lo, "b": hi}).group_by(["a", "b"]) \
            .aggregate([])

    und = (edges.map_batches(undirect, batch_format="pyarrow")
           .groupby(["a", "b"]).aggregate(Count(alias_name="_c"))
           .select_columns(["a", "b"]).materialize())

    deg_tbl = collect_tables(
        und.map_batches(
            lambda t: pa.table({"node": pa.concat_arrays(
                [one_chunk(t["a"]), one_chunk(t["b"])])}),
            batch_format="pyarrow")
        .groupby("node").aggregate(Count(alias_name="deg")))
    nodes = np.asarray(one_chunk(deg_tbl["node"]).to_pandas(),
                       dtype=object).astype(str)
    degs = np.asarray(one_chunk(deg_tbl["deg"])).astype(np.int64)
    order = np.argsort(nodes)
    nodes, degs = nodes[order], degs[order]

    def partial(t: pa.Table) -> pa.Table:
        a = np.asarray(one_chunk(t["a"]).to_pandas(),
                       dtype=object).astype(str)
        b = np.asarray(one_chunk(t["b"]).to_pandas(),
                       dtype=object).astype(str)
        da = degs[np.searchsorted(nodes, a)]
        db = degs[np.searchsorted(nodes, b)]
        return pa.table({
            "k": pa.array([0], type=pa.int64()),
            "m_twice": pa.array([2 * len(a)], type=pa.int64()),
            "sum_x": pa.array([int((da + db).sum())], type=pa.int64()),
            "sum_xx": pa.array([int((da * da + db * db).sum())],
                               type=pa.int64()),
            "sum_xy": pa.array([int(2 * (da * db).sum())],
                               type=pa.int64())})

    out = (und.map_batches(partial, batch_format="pyarrow")
           .groupby("k")
           .aggregate(Sum("m_twice", alias_name="m_twice"),
                      Sum("sum_x", alias_name="sum_x"),
                      Sum("sum_xx", alias_name="sum_xx"),
                      Sum("sum_xy", alias_name="sum_xy")))
    return out.map_batches(lambda t: t.drop_columns(["k"]),
                           batch_format="pyarrow")


def dangling_link_rate(edges):
    """Per-source dangling-outlink rate: how many of a host's outbound
    links point at hosts that were never crawled as sources — the
    frontier-coverage / dead-link crawl-health metric, as exact
    integers (n_dangling, n_total per src).

    The crawled-host set is the distinct src column (a host-dimension
    broadcast, same contract as the other host-graph ops); each
    aggregated edge row tests membership with one vectorized ``is_in``
    and a ≤|hosts|-row groupby Sum finishes.
    """
    from ray.data.aggregate import Count, Sum

    from ..arrowutil import collect_tables, one_chunk

    edges = edges.materialize()
    srcs = collect_tables(
        edges.groupby("src").aggregate(Count(alias_name="_c")))
    src_set = pa.array(sorted(set(
        one_chunk(srcs["src"]).to_pylist())), type=pa.string())

    def partial(t: pa.Table) -> pa.Table:
        dangling = pc.invert(pc.is_in(one_chunk(t["dst"]),
                                      value_set=src_set))
        n = np.asarray(one_chunk(t["n_links"])).astype(np.int64)
        d = np.where(np.asarray(dangling), n, 0)
        g = pa.table({"src_host": t["src"], "nd": pa.array(d),
                      "nt": pa.array(n)}) \
            .group_by("src_host").aggregate([("nd", "sum"),
                                             ("nt", "sum")])
        return g.select(["src_host", "nd_sum", "nt_sum"]) \
            .rename_columns(["src_host", "nd", "nt"])

    return (edges.map_batches(partial, batch_format="pyarrow")
            .groupby("src_host")
            .aggregate(Sum("nd", alias_name="n_dangling"),
                       Sum("nt", alias_name="n_total")))


def kcore_nodes(pairs, k: int, max_rounds: int = 12,
                col_a: str = "a", col_b: str = "b"):
    """Truncated k-core peel of an undirected graph — iteratively drop
    every node with fewer than ``k`` surviving distinct neighbors, for
    at most ``max_rounds`` rounds (the documented contract: BOTH this
    engine and the SQL oracle run the same bounded peel, so the result
    is exact even when a pathological graph hasn't converged; every
    tested graph reaches fixpoint well inside the cap and the loop
    exits early the first round nothing drops).

    Plan (the :func:`bfs_depths` broadcast contract — node-sized driver
    state, edge blocks never shuffle): symmetrized distinct edges
    materialize once; per round one vectorized ``pc.is_in`` on both
    endpoints filters the streaming blocks, a per-batch ``group_by``
    count combines, and ONE groupby Sum yields the node-sized degree
    table the driver thresholds.  Node sets past broadcast size would
    swap the filter for the hash-join path exactly as
    :func:`pagerank_fixed` ``mode="shuffle"`` does.

    Returns a one-column ``(node)`` dataset of the surviving nodes.
    """
    import ray.data
    from ray.data.aggregate import Sum

    from ..arrowutil import one_chunk

    def sym(t: pa.Table) -> pa.Table:
        a, b = one_chunk(t[col_a]), one_chunk(t[col_b])
        return pa.table({"src": pa.concat_arrays([a, b]),
                         "dst": pa.concat_arrays([b, a])})

    edges = pairs.map_batches(sym, batch_format="pyarrow") \
        .groupby(["src", "dst"]).count().drop_columns(["count()"]) \
        .materialize()

    live = None  # None = all nodes live (round 0 counts everything)
    for _ in range(max_rounds):
        fr = (pa.array(sorted(live), type=pa.string())
              if live is not None else None)

        def deg_partial(t: pa.Table, _fr=fr) -> pa.Table:
            if _fr is not None:
                src = one_chunk(t["src"])
                keep = pc.and_(pc.is_in(src, value_set=_fr),
                               pc.is_in(one_chunk(t["dst"]),
                                        value_set=_fr))
                t = t.filter(keep)
            g = t.group_by("src").aggregate([("dst", "count")])
            return pa.table({"node": g["src"], "deg": g["dst_count"]})

        degs = (edges.map_batches(deg_partial, batch_format="pyarrow")
                .groupby("node").aggregate(Sum("deg", alias_name="deg"))
                .to_pandas())
        nxt = set(degs.loc[degs["deg"] >= k, "node"])
        if live is not None and nxt == live:
            break
        live = nxt
        if not live:
            break

    return ray.data.from_arrow(pa.table({
        "node": pa.array(sorted(live or ()), type=pa.string())}))


def two_hop_neighborhood(edges, num_partitions: int = 32,
                         src_col: str = "src", dst_col: str = "dst"):
    """Two-hop reach per node — |{w ≠ u : u→v→w}| distinct, the
    friends-of-friends audience size (directed; one-hop neighbors
    count only if also reachable in two).  Returns (node, n_two_hop).

    ONE edge–edge hash join on the middle node (both sides projected
    to the two key columns first), per-batch DISTINCT (u, w) partials,
    a distinct-pair groupby, then a count groupby — hub middles fan
    out quadratically, which is the honest cost of the metric; cap
    upstream with a degree filter when a web-scale hub graph needs it.
    """
    from ray.data.aggregate import Sum

    from ..arrowutil import one_chunk
    from .joins import shuffle_hash_join

    e = edges.map_batches(
        lambda t: pa.table({"src": t[src_col], "dst": t[dst_col]}),
        batch_format="pyarrow") \
        .groupby(["src", "dst"]).count().drop_columns(["count()"]) \
        .materialize()
    e2 = e.map_batches(
        lambda t: pa.table({"mid": t["src"], "w": t["dst"]}),
        batch_format="pyarrow")
    j = shuffle_hash_join(e, e2, on="dst", right_on="mid",
                          num_partitions=num_partitions,
                          project=("src", "w"))

    def pair_partial(t: pa.Table) -> pa.Table:
        u = np.asarray(one_chunk(t["src"]), dtype=object)
        w = np.asarray(one_chunk(t["w"]), dtype=object)
        keep = u != w
        u, w = u[keep], w[keep]
        if len(u) == 0:
            return pa.table({"node": pa.array([], type=pa.string()),
                             "w": pa.array([], type=pa.string())})
        cu, iu = np.unique(u.astype(str), return_inverse=True)
        cw, iw = np.unique(w.astype(str), return_inverse=True)
        key = np.unique(iu.astype(np.int64) << 32
                        | iw.astype(np.int64))
        return pa.table({
            "node": pa.array(cu[key >> 32].astype(object),
                             type=pa.string()),
            "w": pa.array(cw[key & ((1 << 32) - 1)].astype(object),
                          type=pa.string())})

    distinct = (j.map_batches(pair_partial, batch_format="pyarrow")
                .groupby(["node", "w"]).count()
                .drop_columns(["count()"]))

    def cnt(t: pa.Table) -> pa.Table:
        g = t.group_by("node").aggregate([([], "count_all")])
        return pa.table({"node": g["node"],
                         "n_two_hop": pc.cast(g["count_all"],
                                              pa.int64())})

    return (distinct.map_batches(cnt, batch_format="pyarrow")
            .groupby("node").aggregate(Sum("n_two_hop",
                                           alias_name="n_two_hop")))


def scc_members(edges, source: str, max_depth: int = 8,
                src_col: str = "src", dst_col: str = "dst"):
    """The strongly connected component containing ``source`` — the
    forward-backward trick: SCC(source) = nodes reachable FROM source
    ∩ nodes that REACH source, each side one :func:`bfs_depths` pass
    (the second on reversed edges; no Tarjan recursion, no global SCC
    labeling — the practical question at crawl scale is almost always
    "what cycles through THIS hub").  Returns (node) rows, source
    included.

    Cost: two broadcast-frontier BFS sweeps over the same materialized
    edge blocks; the intersection happens on the two node-sized depth
    tables (driver-bounded by the bfs contract).
    """
    import ray.data

    fwd = bfs_depths(edges, source, max_depth=max_depth,
                     src_col=src_col, dst_col=dst_col)

    def rev(t: pa.Table) -> pa.Table:
        return pa.table({src_col: t[dst_col], dst_col: t[src_col]})

    bwd = bfs_depths(edges.map_batches(rev, batch_format="pyarrow"),
                     source, max_depth=max_depth,
                     src_col=src_col, dst_col=dst_col)
    members = sorted(set(fwd["node"]) & set(bwd["node"]))
    return ray.data.from_arrow(pa.table({
        "node": pa.array(members, type=pa.string())}))


def personalized_pagerank(edges, nodes, n_iters: int = 3,
                          damping_pct: int = 85,
                          scale: int = 1_000_000):
    """Personalized PageRank with EXACT integer arithmetic: identical
    round structure to :func:`pagerank_fixed` (shuffle mode) but all
    initial mass AND all teleport mass concentrates on a seed set —
    the topic-sensitive authority primitive (seed = trusted hosts →
    TrustRank; seed = one user's nodes → recommendation affinity).

    ``nodes`` must carry ``(node:int64, seed:int64 0/1)``.  Per round
    ``r' = seed·(scale·(100−damping))//100 + Σ (r[src]·damping) //
    (100·outdeg[src])`` — non-negative integer ops, so numpy floor
    division and DuckDB ``//`` agree bit-for-bit and the unrolled SQL
    oracle reproduces every rank.  Non-seed sinks decay to 0 unless
    reachable from a seed; dangling mass drops identically on both
    sides.

    Scale shape: one broadcast hash join of ranks onto edges per round
    (swap to ``shuffle_hash_join`` past broadcast size), one
    ``groupby(dst)`` Sum, one broadcast left-outer back onto the node
    list — two narrow exchanges per round over (int64,int64) rows; the
    seed column rides the node list so no extra join is ever needed.

    Returns (node, rank_micro).
    """
    from ray.data.aggregate import Sum

    from .joins import broadcast_hash_join

    def deg_partial(t: pa.Table) -> pa.Table:
        g = t.select(["src"]).group_by("src").aggregate([([], "count_all")])
        return pa.table({"src": g["src"],
                         "d_p": g["count_all"].cast(pa.int64())})

    outdeg = (edges.map_batches(deg_partial, batch_format="pyarrow")
              .groupby("src").aggregate(Sum("d_p", alias_name="outdeg")))
    edges_d = broadcast_hash_join(
        edges, outdeg, on="src",
        project=["src", "dst", "outdeg"]).materialize()

    base_seed = (scale * (100 - damping_pct)) // 100

    def init_ranks(t: pa.Table) -> pa.Table:
        seed = t["seed"].combine_chunks().cast(pa.int64()) \
            if isinstance(t["seed"], pa.ChunkedArray) else t["seed"]
        return pa.table({
            "node": t["node"],
            "seed": seed,
            "r": pc.multiply(seed, pa.scalar(scale, type=pa.int64())),
        })

    nodes = nodes.materialize()
    ranks = nodes.map_batches(init_ranks,
                              batch_format="pyarrow").materialize()

    def emit(t: pa.Table) -> pa.Table:
        r = np.asarray(t["r"].combine_chunks()
                       if isinstance(t["r"], pa.ChunkedArray) else t["r"])
        od = np.asarray(t["outdeg"].combine_chunks()
                        if isinstance(t["outdeg"], pa.ChunkedArray)
                        else t["outdeg"])
        c = (r * damping_pct) // (100 * od)
        return pa.table({"node": t["dst"], "c": pa.array(c)})

    def fold(t: pa.Table) -> pa.Table:
        s = pc.fill_null(t["s"], 0)
        seed = t["seed"].combine_chunks().cast(pa.int64()) \
            if isinstance(t["seed"], pa.ChunkedArray) else t["seed"]
        return pa.table({
            "node": t["node"],
            "seed": seed,
            "r": pc.add(pc.multiply(seed,
                                    pa.scalar(base_seed, type=pa.int64())),
                        s.cast(pa.int64())),
        })

    for _ in range(n_iters):
        sums = (broadcast_hash_join(edges_d, ranks, on="src",
                                    right_on="node",
                                    project=["dst", "outdeg", "r"])
                .map_batches(emit, batch_format="pyarrow")
                .groupby("node").aggregate(Sum("c", alias_name="s")))
        ranks = (broadcast_hash_join(ranks.drop_columns(["r"]), sums,
                                     on="node",
                                     join_type="left outer",
                                     project=["node", "seed", "s"])
                 .map_batches(fold, batch_format="pyarrow")
                 .materialize())

    return ranks.map_batches(
        lambda t: pa.table({"node": t["node"], "rank_micro": t["r"]}),
        batch_format="pyarrow")


def edge_triangle_support(pairs, col_a: str = "vec_a",
                          col_b: str = "vec_b",
                          num_partitions: int = 8):
    """Per-edge triangle support ``|N(a) ∩ N(b)|`` for an undirected graph
    given as oriented (a < b) edges — the k-truss building block (an edge
    in a k-truss needs support ≥ k−2) and the edge-strength signal
    community pruning uses.

    Same compact-forward join plan as :func:`triangle_count` (each
    triangle a<b<c materializes exactly once via two hash-partitioned
    joins), but the middle vertex rides through the wedge join so every
    closed wedge explodes into its THREE constituent edges; one
    ``groupby(edge)`` sum then folds a zero row per original edge in, so
    edges in no triangle report support 0.  Scale caveats are
    triangle_count's (hub-degree wedge inflation — cap or salt hubs
    upstream).  Returns (va, vb, support).
    """
    from ray.data.aggregate import Sum

    from .joins import shuffle_hash_join

    def ab(t: pa.Table) -> pa.Table:
        a = np.asarray(t[col_a].combine_chunks().cast(pa.int64()))
        b = np.asarray(t[col_b].combine_chunks().cast(pa.int64()))
        if len(a) and not (a < b).all():
            raise ValueError(
                "edge_triangle_support requires oriented edges with "
                f"{col_a} < {col_b} in every row")
        return pa.table({"a": pa.array(a), "b": pa.array(b)})

    e = pairs.map_batches(ab, batch_format="pyarrow").materialize()

    def zero_rows(t: pa.Table) -> pa.Table:
        return pa.table({"a": t["a"], "b": t["b"],
                         "s_p": pa.array(
                             np.zeros(t.num_rows, dtype=np.int64))})

    zeros = e.map_batches(zero_rows, batch_format="pyarrow")
    if e.count() == 0:
        return zeros.groupby(["a", "b"]).aggregate(
            Sum("s_p", alias_name="support"))

    mid = e.map_batches(
        lambda t: pa.table({"b": t["a"], "m2": t["b"]}),
        batch_format="pyarrow")
    # wedge (a < b < m2) keeps its middle b for the post-join explode
    wedges = shuffle_hash_join(e, mid, on="b",
                               num_partitions=num_partitions,
                               project=["a", "b", "m2"]).materialize()
    if wedges.count() == 0:
        return zeros.groupby(["a", "b"]).aggregate(
            Sum("s_p", alias_name="support"))
    closing = e.map_batches(
        lambda t: pa.table({"a": t["a"], "m2": t["b"]}),
        batch_format="pyarrow")
    tri = shuffle_hash_join(wedges, closing, on=("a", "m2"),
                            num_partitions=num_partitions,
                            project=["a", "b", "m2"])

    def explode_edges(t: pa.Table) -> pa.Table:
        x = np.asarray(t["a"].combine_chunks()
                       if isinstance(t["a"], pa.ChunkedArray) else t["a"])
        y = np.asarray(t["b"].combine_chunks()
                       if isinstance(t["b"], pa.ChunkedArray) else t["b"])
        z = np.asarray(t["m2"].combine_chunks()
                       if isinstance(t["m2"], pa.ChunkedArray)
                       else t["m2"])
        ea = np.concatenate([x, x, y])
        eb = np.concatenate([y, z, z])
        g = pa.table({"a": pa.array(ea), "b": pa.array(eb)}) \
            .group_by(["a", "b"]).aggregate([([], "count_all")])
        return pa.table({"a": g["a"], "b": g["b"],
                         "s_p": g["count_all"].cast(pa.int64())})

    tri_edges = tri.map_batches(explode_edges, batch_format="pyarrow")
    return (zeros.union(tri_edges)
            .groupby(["a", "b"])
            .aggregate(Sum("s_p", alias_name="support"))
            .map_batches(lambda t: pa.table({
                col_a: t["a"], col_b: t["b"], "support": t["support"]}),
                batch_format="pyarrow"))


def dup_canonical_map(pairs, quality, col_a: str = "vec_a",
                      col_b: str = "vec_b", id_col: str = "node",
                      quality_col: str = "q",
                      num_partitions: int = 8):
    """Canonical-representative selection for near-dup clusters: every
    non-canonical member maps to its cluster's BEST row (max quality,
    ties to the smaller id) — the redirect table a training mix applies
    so each dup family contributes exactly its best exemplar (the
    keep-best generalization of min-id components; e.g. keep the
    longest/cleanest page of a mirror set, not the lowest-numbered).

    Composition of three existing primitives: label-propagation
    :func:`connected_components` over the pair list, one large×large
    hash join attaching ``quality`` to members, a ``grouped_top_k``
    (k=1) picking each component's champion, and one final hash join
    emitting (member → canonical) rows for non-champions.  ``quality``
    is a Dataset of (id_col, quality_col).  Returns (node, canonical).
    """
    from .joins import shuffle_hash_join
    from .windowfns import grouped_top_k

    comps = connected_components(pairs, col_a=col_a, col_b=col_b)
    members = shuffle_hash_join(
        comps, quality, on="node", right_on=id_col,
        num_partitions=num_partitions,
        project=["node", "component", quality_col]).materialize()

    champs = grouped_top_k(members, "component", quality_col, "node",
                           k=1).materialize()

    # grouped_top_k emits (group, rank, order, tie) = (component, rank,
    # quality, node); the k=1 row's tie column IS the champion id
    canon_tbl = champs.map_batches(
        lambda t: pa.table({"component": t["component"],
                            "canonical": t["node"]}),
        batch_format="pyarrow")
    joined = shuffle_hash_join(members, canon_tbl, on="component",
                               num_partitions=num_partitions,
                               project=["node", "canonical"])
    return joined.map_batches(
        lambda t: t.filter(pc.not_equal(t["node"], t["canonical"])),
        batch_format="pyarrow")


def components_incremental(old_components, new_pairs,
                           col_a: str = "doc_a", col_b: str = "doc_b"):
    """Incremental connected-components maintenance: merge yesterday's
    (node, component) labels with today's NEW edge delta without ever
    re-reading yesterday's raw pair list — the daily near-dup-cluster
    update a rolling crawl runs (full recompute touches every historical
    pair; this touches |old nodes| + |delta|).

    Each old cluster collapses to a STAR (node ↔ its component label),
    which is connectivity-equivalent to the original cluster but has
    diameter 2 regardless of how stringy the historical graph was — so
    the min-label propagation restarts from depth-1 structures and
    converges in rounds bounded by the DELTA's diameter, not history's.
    Output ids remain the minimum node id per merged cluster (the same
    contract as :func:`connected_components`, which this reuses on the
    augmented edge list).  Returns (node, component).
    """
    def star(t: pa.Table) -> pa.Table:
        return pa.table({col_a: t["node"].combine_chunks().cast(pa.int64())
                         if isinstance(t["node"], pa.ChunkedArray)
                         else t["node"].cast(pa.int64()),
                         col_b: t["component"].combine_chunks()
                         .cast(pa.int64())
                         if isinstance(t["component"], pa.ChunkedArray)
                         else t["component"].cast(pa.int64())})

    star_edges = old_components.map_batches(star, batch_format="pyarrow")
    return connected_components(star_edges.union(new_pairs),
                                col_a=col_a, col_b=col_b)


def cluster_churn_report(old_components, new_components):
    """Cluster-stability audit between two labelings of (a superset of)
    the same nodes — the churn report a rolling dedup pipeline watches:
    how many of yesterday's clusters SPLIT (their nodes now span several
    new clusters), how many of today's clusters are MERGES (absorbing
    several old ones), and how many nodes are new to the graph.

    One hash join on node (full outer, so appearing/disappearing nodes
    count instead of vanishing), a distinct (old_c, new_c) edge groupby,
    and two tiny per-side fan-out counts.  Returns long-format
    (metric, value): n_old_clusters, n_new_clusters, n_shared_nodes,
    n_new_nodes, n_dropped_nodes, n_split_old, n_merged_new.
    """
    import pandas as pd
    import ray
    from ray.data.aggregate import Sum

    from .joins import shuffle_hash_join

    old = old_components.map_batches(
        lambda t: pa.table({"node": t["node"], "oc": t["component"]}),
        batch_format="pyarrow").materialize()
    new = new_components.map_batches(
        lambda t: pa.table({"node": t["node"], "nc": t["component"]}),
        batch_format="pyarrow").materialize()
    if old.count() == 0 or new.count() == 0:
        rows = [("n_old_clusters", _ndistinct(old, "oc")),
                ("n_new_clusters", _ndistinct(new, "nc")),
                ("n_shared_nodes", 0),
                ("n_new_nodes", new.count()),
                ("n_dropped_nodes", old.count()),
                ("n_split_old", 0), ("n_merged_new", 0)]
        return pd.DataFrame(rows, columns=["metric", "value"])

    j = shuffle_hash_join(old, new, on="node",
                          join_type="full_outer").materialize()

    def edge_partial(t: pa.Table) -> pa.Table:
        return t.select(["oc", "nc"]).group_by(["oc", "nc"]).aggregate([])

    edges = (j.map_batches(edge_partial, batch_format="pyarrow")
             .groupby(["oc", "nc"]).count()).materialize()

    def side_counts(t: pa.Table, col):
        import pyarrow.compute as pc
        v = t.filter(pc.is_valid(t[col]))
        g = v.select([col]).group_by(col).aggregate([([], "count_all")])
        deg = np.asarray(g["count_all"], dtype=np.int64)
        return len(g), int((deg > 1).sum())

    et = pa.concat_tables([pa.table({
        "oc": b["oc"], "nc": b["nc"]})
        for b in edges.iter_batches(batch_format="pyarrow")]) \
        if edges.count() else pa.table({"oc": pa.array([], pa.int64()),
                                        "nc": pa.array([], pa.int64())})
    # drop null-side edges for the split/merge fan-outs
    import pyarrow.compute as pc
    both = et.filter(pc.and_(pc.is_valid(et["oc"]), pc.is_valid(et["nc"])))
    n_old, n_split = side_counts(both, "oc")
    n_new, n_merge = side_counts(pa.table({"oc": both["nc"],
                                           "nc": both["oc"]}), "oc")
    # node-level tallies off the join
    def tally(t: pa.Table) -> pa.Table:
        shared = pc.and_(pc.is_valid(t["oc"]), pc.is_valid(t["nc"]))
        newn = pc.and_(pc.is_null(t["oc"]), pc.is_valid(t["nc"]))
        drop = pc.and_(pc.is_valid(t["oc"]), pc.is_null(t["nc"]))
        return pa.table({
            "s_p": pa.array([int(np.asarray(shared).sum())], pa.int64()),
            "n_p": pa.array([int(np.asarray(newn).sum())], pa.int64()),
            "d_p": pa.array([int(np.asarray(drop).sum())], pa.int64())})

    tt = j.map_batches(tally, batch_format="pyarrow") \
        .sum(["s_p", "n_p", "d_p"])
    rows = [("n_old_clusters", _ndistinct(old, "oc")),
            ("n_new_clusters", _ndistinct(new, "nc")),
            ("n_shared_nodes", int(tt["sum(s_p)"])),
            ("n_new_nodes", int(tt["sum(n_p)"])),
            ("n_dropped_nodes", int(tt["sum(d_p)"])),
            ("n_split_old", n_split),
            ("n_merged_new", n_merge)]
    return pd.DataFrame(rows, columns=["metric", "value"])


def _ndistinct(ds, col: str) -> int:
    def partial(t: pa.Table) -> pa.Table:
        return t.select([col]).group_by(col).aggregate([])
    return int(ds.map_batches(partial, batch_format="pyarrow")
               .groupby(col).count().count())


def kcore_decomposition(pairs, k: int = 2, col_a: str = "vec_a",
                        col_b: str = "vec_b", max_rounds: int = 64):
    """k-core decomposition by iterative peeling: repeatedly remove
    nodes with degree < ``k`` (over the surviving subgraph) until a
    fixpoint — the community-mining / spam-farm-detection primitive
    (a link farm survives peeling; pendant chains and tree fuzz do
    not).  Returns the surviving nodes as (node, core_degree) where
    ``core_degree`` counts neighbours INSIDE the core.

    Broadcast-peel mode (the :func:`pagerank_fixed` ``broadcast`` /
    :func:`bfs_depths` frontier contract — node-sized driver state,
    edges NEVER shuffle): the removed-node set broadcasts in the task
    closure each round; every edge batch drops edges touching it and
    emits per-batch degree partials into ONE ``groupby(node)``; the
    sub-``k`` survivors join the removed set.  Rounds = peel depth
    (≤ graph diameter in practice); at node counts past driver memory,
    swap the membership set for the int64 Bloom + distributed anti-join
    used by ``connected_components``'s prune variants (``graph.py``
    documents the same escape for BFS/PageRank).
    """
    import ray
    import ray.data
    from ray.data.aggregate import Sum

    from ..arrowutil import one_chunk

    def to_edges(t: pa.Table) -> pa.Table:
        a = one_chunk(t[col_a]).cast(pa.int64())
        b = one_chunk(t[col_b]).cast(pa.int64())
        # per-batch distinct of both orientations; the groupby below
        # finishes the global dedup so reversed / repeated input pairs
        # cannot double-count degrees
        g = pa.table({"src": pa.concat_arrays([a, b]),
                      "dst": pa.concat_arrays([b, a])}) \
            .group_by(["src", "dst"]).aggregate([([], "count_all")])
        return g.select(["src", "dst"])

    from ray.data.aggregate import Count as _Count

    edges = (pairs.map_batches(to_edges, batch_format="pyarrow")
             .groupby(["src", "dst"]).aggregate(_Count())
             .select_columns(["src", "dst"])
             .materialize())
    nodes = np.unique(np.asarray(
        edges.unique("src"), dtype=np.int64)) \
        if edges.count() else np.array([], dtype=np.int64)

    removed: set[int] = set()
    deg_tab = None
    for _ in range(max_rounds):
        rm = np.array(sorted(removed), dtype=np.int64)
        rm_ref = ray.put(rm)

        def deg_partial(t: pa.Table) -> pa.Table:
            r = ray.get(rm_ref)
            s = np.asarray(one_chunk(t["src"]))
            d = np.asarray(one_chunk(t["dst"]))
            if len(r):
                alive = ~np.isin(s, r) & ~np.isin(d, r)
                s = s[alive]
            u, c = np.unique(s, return_counts=True)
            return pa.table({"node": pa.array(u, type=pa.int64()),
                             "c_p": pa.array(c.astype(np.int64))})

        deg_tab = (edges.map_batches(deg_partial, batch_format="pyarrow")
                   .groupby("node").aggregate(Sum("c_p",
                                                  alias_name="deg"))
                   .to_pandas())
        alive_nodes = nodes[~np.isin(nodes, rm)]
        degs = dict(zip(deg_tab["node"], deg_tab["deg"])) \
            if "node" in deg_tab.columns else {}
        victims = {int(n) for n in alive_nodes
                   if degs.get(int(n), 0) < k}
        if not victims:
            break
        removed |= victims

    import pandas as pd

    # node-sized result already lives on the driver; return a typed
    # pandas frame so an EMPTY core keeps its schema (an empty Ray
    # dataset drops column metadata through to_pandas)
    if deg_tab is None or deg_tab.empty or "node" not in deg_tab.columns:
        return pd.DataFrame({"node": pd.Series([], dtype="int64"),
                             "core_degree": pd.Series([], dtype="int64")})
    out = deg_tab[~deg_tab["node"].isin(removed)].rename(
        columns={"deg": "core_degree"})
    return out.reset_index(drop=True).astype({"node": "int64",
                                              "core_degree": "int64"})
