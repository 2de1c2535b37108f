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
