"""k-truss decomposition (beyond the reference registry): the maximal
subgraph in which every edge participates in >= k-2 triangles of the
subgraph. Standard support-peeling — each round recounts per-edge
triangle support within the surviving edge set and drops under-supported
edges until a fixed point (NetworkX k_truss semantics).

Distributed shape per round, every shuffle hash-bucketed (never a raw
groupby over vertices/edges — Ray per-group dispatch,
hashing.any_key_partition doc):
  1. degrees: per-batch unique-count partials, fold on hash(vertex);
  2. orientation: each edge points low->high under the (deg, id) total
     order (attached by two bucketed joins), so every triangle is
     expanded exactly once at its minimum-rank apex and wedge volume is
     bounded by sum(out_deg^2) with out_deg <= O(sqrt(E));
  3. wedges fold on hash(apex) -> candidate (x, y) pairs meet the
     oriented edge list on hash(x, y) to confirm triangles;
  4. each triangle credits its 3 undirected edges; support folds on
     hash(edge) and joins back to the edge list, which filters
     support >= k-2.
Rounds are bounded by the peel depth (small in practice); an
incremental-support variant (subtract only dropped edges' triangles) is
the optimization path at extreme scale.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd

from raylinkgraph.functions.hashing import check_u32, pair_hash, partition_of

_B = 32


def _enc(u: np.ndarray, v: np.ndarray) -> np.ndarray:
    """Unordered (u, v) with u < v packed into one int64; ids validated
    to fit u32 (silent corruption otherwise — advisor round-3)."""
    lo = np.minimum(u, v)
    hi = np.maximum(u, v)
    check_u32(hi, "ktruss vertex id")
    check_u32(lo, "ktruss vertex id")
    return (lo << np.int64(32)) | hi


def _canonical_edges(edges: rd.Dataset, src_col: str, dst_col: str) -> pd.DataFrame:
    def canon(b: pd.DataFrame) -> pd.DataFrame:
        s = b[src_col].to_numpy(np.int64)
        d = b[dst_col].to_numpy(np.int64)
        m = s != d  # no self-loops in a truss
        e = np.unique(_enc(s[m], d[m]))
        return pd.DataFrame({"e": e, "__p": partition_of(e, _B)})

    ds = edges.map_batches(canon, batch_format="pandas")
    folded = ds.groupby("__p").map_groups(
        lambda g: pd.DataFrame({"e": np.unique(g["e"].to_numpy(np.int64))}),
        batch_format="pandas",
    )
    return folded.to_pandas()


def k_truss(
    edges: rd.Dataset,
    k: int,
    *,
    src_col: str = "src_id",
    dst_col: str = "dst_id",
    max_rounds: int = 100,
) -> pd.DataFrame:
    """-> surviving undirected edges (u, v), u < v, sorted.

    The edge list lives in driver memory here ONLY as the compact packed
    int64 survivor set between rounds (one int per edge); the per-round
    triangle counting runs distributed. At edge counts beyond driver
    memory, keep the survivor set as a Dataset and replace the numpy
    set-ops below with one more bucketed fold per round.
    """
    cur = _canonical_edges(edges, src_col, dst_col)["e"].to_numpy(np.int64)
    need = k - 2

    for _ in range(max_rounds):
        if len(cur) == 0:
            break
        support = _edge_support(cur)
        # support rows only exist for edges in >= 1 triangle (a
        # triangle-free survivor set yields an empty, column-less frame)
        if "e" not in support.columns:
            support = pd.DataFrame({"e": pd.Series([], dtype=np.int64),
                                    "n": pd.Series([], dtype=np.int64)})
        ok = support["e"].to_numpy(np.int64)[
            support["n"].to_numpy(np.int64) >= need
        ]
        new = np.intersect1d(cur, ok) if need > 0 else cur
        if len(new) == len(cur):
            break
        cur = new
    u = cur >> np.int64(32)
    v = cur & np.int64((1 << 32) - 1)
    return pd.DataFrame({"u": u, "v": v})


def _edge_support(cur: np.ndarray) -> pd.DataFrame:
    """Distributed per-edge triangle support within the edge set ``cur``
    (packed int64, broadcast once per round via ray.put)."""
    import ray

    u = cur >> np.int64(32)
    v = cur & np.int64((1 << 32) - 1)
    # degrees within the current subgraph (driver-side bincount over the
    # compact edge array would also work; keep it vectorized + tiny)
    ids, deg = np.unique(np.concatenate([u, v]), return_counts=True)
    # (deg, id) total-order rank
    rank = np.lexsort((ids, deg))
    rank_of = np.empty(len(ids), np.int64)
    rank_of[rank] = np.arange(len(ids))
    ru = rank_of[np.searchsorted(ids, u)]
    rv = rank_of[np.searchsorted(ids, v)]
    # orient low rank -> high rank
    src = np.where(ru < rv, u, v)
    dst = np.where(ru < rv, v, u)

    eref = ray.put((np.sort(_enc(src, dst)), ids, rank_of))

    order = np.lexsort((dst, src))
    osrc, odst = src[order], dst[order]
    oriented = pd.DataFrame(
        {"s": osrc, "d": odst, "__p": partition_of(osrc, _B)}
    )
    ds = rd.from_pandas(oriented)

    def wedges(g: pd.DataFrame) -> pd.DataFrame:
        # per apex run: out-neighbor pair expansion (rank-ordered)
        _, vids, vrank = ray.get(eref)
        s = g["s"].to_numpy(np.int64)
        d = g["d"].to_numpy(np.int64)
        o = np.lexsort((d, s))
        s, d = s[o], d[o]
        starts = np.flatnonzero(np.r_[True, s[1:] != s[:-1]])
        ends = np.r_[starts[1:], len(s)]
        ax, xx, yy = [], [], []
        for lo, hi in zip(starts, ends):
            m = hi - lo
            if m < 2:
                continue
            nb = d[lo:hi]
            r = vrank[np.searchsorted(vids, nb)]
            nb = nb[np.argsort(r)]  # rank order so x < y by rank
            iu = np.triu_indices(m, 1)
            ax.append(np.full(len(iu[0]), s[lo], np.int64))
            xx.append(nb[iu[0]])
            yy.append(nb[iu[1]])
        if not ax:
            return pd.DataFrame({"a": pd.Series([], dtype=np.int64),
                                 "w": pd.Series([], dtype=np.int64),
                                 "__q": pd.Series([], dtype=np.int32)})
        a = np.concatenate(ax)
        w = _enc(np.concatenate(xx), np.concatenate(yy))
        return pd.DataFrame({"a": a, "w": w, "__q": partition_of(w, _B)})

    def confirm_credit(g: pd.DataFrame) -> pd.DataFrame:
        # wedge (x, y) is a triangle iff (x, y) is an edge of the set
        eset, _, _ = ray.get(eref)
        w = g["w"].to_numpy(np.int64)
        pos = np.searchsorted(eset, w)
        pos = np.minimum(pos, len(eset) - 1)
        hit = eset[pos] == w if len(eset) else np.zeros(len(w), np.bool_)
        a = g["a"].to_numpy(np.int64)[hit]
        w = w[hit]
        x = w >> np.int64(32)
        y = w & np.int64((1 << 32) - 1)
        # credit the 3 edges of each triangle, pre-combined
        e3 = np.concatenate([_enc(a, x), _enc(a, y), w])
        ue, c = np.unique(e3, return_counts=True)
        return pd.DataFrame(
            {"e": ue, "n": c.astype(np.int64), "__r": partition_of(ue, _B)}
        )

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        ue, inv = np.unique(g["e"].to_numpy(np.int64), return_inverse=True)
        c = np.bincount(inv, weights=g["n"].to_numpy(np.float64))
        return pd.DataFrame({"e": ue, "n": c.astype(np.int64)})

    return (
        ds.groupby("__p")
        .map_groups(wedges, batch_format="pandas")
        .groupby("__q")
        .map_groups(confirm_credit, batch_format="pandas")
        .groupby("__r")
        .map_groups(fold, batch_format="pandas")
        .to_pandas()
    )


def scan_similarity(
    edges: rd.Dataset,
    *,
    src_col: str = "src_id",
    dst_col: str = "dst_id",
) -> pd.DataFrame:
    """SCAN structural similarity per undirected edge (Xu et al., KDD
    2007): sigma(u, v) = |G(u) n G(v)| / sqrt(|G(u)| * |G(v)|) over
    CLOSED neighborhoods G(x) = N(x) u {x} -> (u, v, sigma_e6), u < v.

    For an existing edge the closed-neighborhood intersection is the
    per-edge triangle support plus the two endpoints, so the whole op
    reuses _edge_support's distributed wedge-expansion (bucketed by
    apex, confirmed against the sorted packed edge set — the exact
    shape GraphScope's triangle apps use, reference
    analytical_engine/apps/flash/clustering/triangle.h semantics).
    sqrt and division are correctly-rounded IEEE ops (unlike log), so
    sigma_e6 = floor(sigma * 1e6 + 0.5) is bit-identical to the SQL
    oracle with no tolerance caveat. Driver holds only the compact
    packed edge array (one int64 per edge — the documented k_truss
    contract; at edge counts beyond driver memory, keep the set as a
    Dataset and make the final attach one more bucketed fold)."""
    cur = np.sort(_canonical_edges(edges, src_col, dst_col)["e"].to_numpy(np.int64))
    if len(cur) == 0:
        return pd.DataFrame(
            {"u": pd.Series([], dtype=np.int64),
             "v": pd.Series([], dtype=np.int64),
             "sigma_e6": pd.Series([], dtype=np.int64)}
        )
    supp = _edge_support(cur)
    u = cur >> np.int64(32)
    v = cur & np.int64((1 << 32) - 1)
    ids, deg = np.unique(np.concatenate([u, v]), return_counts=True)
    du = deg[np.searchsorted(ids, u)]
    dv = deg[np.searchsorted(ids, v)]
    cn = np.zeros(len(cur), np.int64)
    if "e" in supp.columns and len(supp):
        pos = np.searchsorted(cur, supp["e"].to_numpy(np.int64))
        cn[pos] = supp["n"].to_numpy(np.int64)
    sigma = (cn + 2) / np.sqrt(((du + 1) * (dv + 1)).astype(np.float64))
    out = pd.DataFrame(
        {"u": u, "v": v,
         "sigma_e6": np.floor(sigma * 1_000_000 + 0.5).astype(np.int64)}
    )
    return out.sort_values(["u", "v"]).reset_index(drop=True)


def rich_club(
    edges: rd.Dataset,
    *,
    src_col: str = "src_id",
    dst_col: str = "dst_id",
) -> pd.DataFrame:
    """Rich-club coefficient phi(k) = 2 * E_k / (N_k * (N_k - 1)) for
    every degree threshold k (nodes of degree > k, edges among them)
    -> (k, n_nodes, n_edges, phi_e6), rows where N_k >= 2.

    One pass over the deduplicated edge set: degree histogram + per-edge
    min-endpoint-degree histogram, then two suffix-sums — E_k and N_k
    for ALL k fall out of two bounded histograms (max-degree-sized), so
    no per-k scan ever happens. phi_e6 is computed in exact integer
    arithmetic ((4*E*1e6 + D) // (2*D), D = N*(N-1)) — bit-identical to
    the SQL integer-division oracle."""
    cur = _canonical_edges(edges, src_col, dst_col)["e"].to_numpy(np.int64)
    u = cur >> np.int64(32)
    v = cur & np.int64((1 << 32) - 1)
    ids, deg = np.unique(np.concatenate([u, v]), return_counts=True)
    if len(ids) == 0:
        return pd.DataFrame(
            {c: pd.Series([], dtype=np.int64)
             for c in ("k", "n_nodes", "n_edges", "phi_e6")}
        )
    md = int(deg.max())
    node_hist = np.bincount(deg, minlength=md + 1)
    m = np.minimum(deg[np.searchsorted(ids, u)], deg[np.searchsorted(ids, v)])
    edge_hist = np.bincount(m, minlength=md + 1)
    # N_k = #nodes with degree > k = suffix sum over the histogram
    n_nodes = np.cumsum(node_hist[::-1])[::-1]  # n_nodes[d] = #deg >= d
    e_edges = np.cumsum(edge_hist[::-1])[::-1]
    ks = np.arange(0, md, dtype=np.int64)
    nk = n_nodes[ks + 1]  # deg > k  <=>  deg >= k+1
    ek = e_edges[ks + 1]
    keep = nk >= 2
    ks, nk, ek = ks[keep], nk[keep].astype(np.int64), ek[keep].astype(np.int64)
    d = nk * (nk - 1)
    phi = (4 * ek * 1_000_000 + d) // (2 * d)
    return pd.DataFrame(
        {"k": ks, "n_nodes": nk, "n_edges": ek, "phi_e6": phi.astype(np.int64)}
    )
