"""Betweenness centrality: multi-source Brandes as ONE BSP job pair,
wave-packed.

Reference: betweenness_centrality / betweenness_centrality_generic
(.gs_conf.yaml:286-293, flash_bc yaml:573). Exact betweenness needs a
Brandes pass from EVERY vertex (O(V*E)); the production shape is the
standard sampled-source estimate (NetworkX's ``k=`` parameter): run the
phases from a deterministic source set and sum the dependencies.

All S (<=64) sources run SIMULTANEOUSLY in the wave-packed layout (the
MSBFS 64-bit-wave idea of centrality.py generalized to per-source float
payloads): per-source quantities are (n, S) numpy matrices stored as
ONE fixed-size-list state column each (dist, sigma, delta) instead of S
scalar columns, and the frontier is ONE uint64 bitmask column (bit i =
source i fresh). Message payloads are (m, S) matrices in a single
fixed-size-list column. Column count is therefore constant in S; per
round the whole source set costs one axis-0 ``reduceat`` over the same
CSR gather.

Phase 1 (forward): frontier BFS accumulating shortest-path counts — a
vertex settled at round r gets sigma = sum of sigmas of its round-(r-1)
in-neighbors.

Phase 2 (backward): dependency accumulation down the BFS DAG, one
absolute level per superstep (round t's senders are vertices at level
maxlev - t; sources whose own eccentricity is smaller simply have no
vertices that deep). Senders ship (1 + delta)/sigma to ALL neighbors and
only receivers exactly one level up accept, checked against their own
dist — no per-edge predecessor lists are materialized. The backward
job's init reads the forward job's final checkpoint for its own
partition (home pid = hash(oid) % P is recoverable from any owned oid).

bc(v) = sum over sources s != v of delta_s(v) (Brandes' `w != s` guard).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from raylinkgraph.bsp import Superstep, _np_state_col
from raylinkgraph.functions.hashing import partition_of
from raylinkgraph.state import checkpoint as ckpt

UNREACHED = np.iinfo(np.int64).max
MAX_SOURCES = 64  # one uint64 frontier word


def _bit_powers(S: int) -> np.ndarray:
    return np.uint64(1) << np.arange(S, dtype=np.uint64)


class BrandesForward(Superstep):
    name = "brfwd"
    scalar_names = ["active"]

    def __init__(self, sources, max_rounds: int = 10_000):
        self.sources = [int(s) for s in sorted(sources)]
        if len(self.sources) > MAX_SOURCES:
            raise ValueError(f"at most {MAX_SOURCES} simultaneous sources")
        self.S = len(self.sources)
        self.max_rounds = int(max_rounds)
        self.state_dtypes = {
            "dist": pa.list_(pa.int64(), self.S),
            "sigma": pa.list_(pa.float64(), self.S),
            "freshw": pa.uint64(),
        }
        self.scatter_columns = ["dist", "sigma", "freshw"]
        self.msg_dtypes = {"sig": pa.list_(pa.float64(), self.S)}

    def params(self) -> dict:
        return {"sources": self.sources, "max_rounds": self.max_rounds}

    def init(self, oids, out_deg):
        n, S = len(oids), self.S
        dist = np.full((n, S), UNREACHED, np.int64)
        sigma = np.zeros((n, S))
        freshw = np.zeros(n, np.uint64)
        pw = _bit_powers(S)
        for i, s in enumerate(self.sources):
            hit = oids == s
            dist[hit, i] = 0
            sigma[hit, i] = 1.0
            freshw[hit] |= pw[i]
        return (
            {"dist": dist, "sigma": sigma, "freshw": freshw},
            {"active": float(np.count_nonzero(freshw))},
        )

    def scatter(self, state, block, scalars):
        nseg = len(block["udst_pos"])
        if nseg == 0:
            return
        fw = state["freshw"][block["src_pos"]]
        if not fw.any():
            return
        # unpack the frontier word into a (n_src, S) mask, mask sigmas,
        # gather per edge, segment-sum per unique destination
        mask = (fw[:, None] >> np.arange(self.S, dtype=np.uint64)) & np.uint64(1)
        sig = state["sigma"][block["src_pos"]] * mask
        per_edge = sig[block["src_code"]]
        sums = np.add.reduceat(per_edge, block["dst_ptr"][:-1], axis=0)
        any_live = sums.any(axis=1)
        if not any_live.any():
            return
        tgt_ptr, pos = block["tgt_ptr"], block["udst_pos"]
        for q in range(len(tgt_ptr) - 1):
            lo, hi = tgt_ptr[q], tgt_ptr[q + 1]
            if lo >= hi:
                continue
            m = any_live[lo:hi]
            if m.any():
                yield q, pos[lo:hi][m], {"sig": sums[lo:hi][m]}

    def apply(self, oids, out_deg, state, msgs, scalars):
        r = int(scalars["_round"]) + 1
        n, S = len(oids), self.S
        freshw = np.zeros(n, np.uint64)
        active = 0.0
        dist, sigma = state["dist"], state["sigma"]
        pos = msgs["pos"]
        if len(pos):
            order = np.argsort(pos, kind="stable")
            ps = pos[order]
            starts = np.flatnonzero(np.r_[True, np.diff(ps) > 0])
            upos = ps[starts]
            sums = np.add.reduceat(
                msgs["sig"].reshape(-1, S)[order], starts, axis=0
            )
            new = (dist[upos] == UNREACHED) & (sums > 0)
            if new.any():
                dist = dist.copy()
                sigma = sigma.copy()
                dsub, ssub = dist[upos], sigma[upos]
                dsub[new] = r
                ssub[new] = sums[new]
                dist[upos] = dsub
                sigma[upos] = ssub
                # exact uint64 bit-pack (matmul would round through float64
                # and corrupt bits >= 2^53)
                freshw[upos] = (new.astype(np.uint64) * _bit_powers(S)).sum(
                    axis=1, dtype=np.uint64
                )
                active = float(new.sum())
        return (
            {"dist": dist, "sigma": sigma, "freshw": freshw},
            {"active": active},
        )

    def converged(self, scalars, completed_rounds):
        if completed_rounds >= self.max_rounds:
            return True
        return completed_rounds >= 1 and scalars["active"] == 0.0


class BrandesBackward(Superstep):
    name = "brback"
    scalar_names = ["touched"]

    def __init__(self, P: int, fwd_workdir: str, fwd_step: int, maxlev: int,
                 sources):
        self.P = int(P)
        self.fwd_workdir = fwd_workdir
        self.fwd_step = int(fwd_step)
        self.maxlev = int(maxlev)
        self.sources = [int(s) for s in sorted(sources)]
        self.S = len(self.sources)
        self.state_dtypes = {
            "dist": pa.list_(pa.int64(), self.S),
            "sigma": pa.list_(pa.float64(), self.S),
            "delta": pa.list_(pa.float64(), self.S),
        }
        self.scatter_columns = ["dist", "sigma", "delta"]
        self.msg_dtypes = {"val": pa.list_(pa.float64(), self.S)}

    def params(self) -> dict:
        return {
            "P": self.P,
            "fwd": self.fwd_workdir,
            "fwd_step": self.fwd_step,
            "maxlev": self.maxlev,
            "sources": self.sources,
        }

    def init(self, oids, out_deg):
        n, S = len(oids), self.S
        if n == 0:
            return (
                {"dist": np.zeros((0, S), np.int64),
                 "sigma": np.zeros((0, S)),
                 "delta": np.zeros((0, S))},
                {"touched": 0.0},
            )
        pid = int(partition_of(oids[:1], self.P)[0])  # home pid of any oid
        t = ckpt.read_state(self.fwd_workdir, self.fwd_step, pid)
        return (
            {
                "dist": _np_state_col(
                    t.column("dist"), pa.list_(pa.int64(), S)
                ).copy(),
                "sigma": _np_state_col(
                    t.column("sigma"), pa.list_(pa.float64(), S)
                ).copy(),
                "delta": np.zeros((n, S)),
            },
            {"touched": 0.0},
        )

    def scatter(self, state, block, scalars):
        nseg = len(block["udst_pos"])
        if nseg == 0:
            return
        lev = self.maxlev - int(scalars["_round"])  # this round's sender level
        dist = state["dist"][block["src_pos"]]
        send = dist == lev
        if not send.any():
            return
        sigma = state["sigma"][block["src_pos"]]
        delta = state["delta"][block["src_pos"]]
        contrib = np.where(send, (1.0 + delta) / np.where(send, sigma, 1.0), 0.0)
        per_edge = contrib[block["src_code"]]
        sums = np.add.reduceat(per_edge, block["dst_ptr"][:-1], axis=0)
        any_live = sums.any(axis=1)
        if not any_live.any():
            return
        tgt_ptr, pos = block["tgt_ptr"], block["udst_pos"]
        for q in range(len(tgt_ptr) - 1):
            lo, hi = tgt_ptr[q], tgt_ptr[q + 1]
            if lo >= hi:
                continue
            m = any_live[lo:hi]
            if m.any():
                yield q, pos[lo:hi][m], {"val": sums[lo:hi][m]}

    def apply(self, oids, out_deg, state, msgs, scalars):
        lev = self.maxlev - int(scalars["_round"])
        new_state = dict(state)
        touched = 0.0
        pos = msgs["pos"]
        if len(pos):
            S = self.S
            order = np.argsort(pos, kind="stable")
            ps = pos[order]
            starts = np.flatnonzero(np.r_[True, np.diff(ps) > 0])
            upos = ps[starts]
            sums = np.add.reduceat(
                msgs["val"].reshape(-1, S)[order], starts, axis=0
            )
            dist, sigma = state["dist"], state["sigma"]
            ok = dist[upos] == lev - 1  # only the level directly above accepts
            if ok.any():
                delta = state["delta"].copy()
                dsub = delta[upos] + sigma[upos] * np.where(ok, sums, 0.0)
                delta[upos] = dsub
                new_state["delta"] = delta
                touched = float(ok.sum())
        return new_state, {"touched": touched}

    def converged(self, scalars, completed_rounds):
        return completed_rounds >= self.maxlev


def _run_brandes_pair(graph, workdir: str, sources, engine: str):
    """Shared forward+backward job pair; -> (sorted sources, back result).

    Backward dependency messages travel along OUT edges, which is only
    correct when the graph is symmetric — guard like the sibling
    algorithms (louvain/msf/triangles) instead of silently returning
    wrong values on a directed graph."""
    if not graph.meta.get("symmetrize"):
        raise ValueError(
            "betweenness sends backward dependencies along out-edges; "
            "build the graph with symmetrize=True (to_undirected) first"
        )
    if engine == "actors":
        from raylinkgraph.bsp_actors import run_bsp_actors as runner
    else:
        from raylinkgraph.bsp import run_bsp as runner

    sources = [int(s) for s in sorted(sources)]
    fwd = runner(
        graph, BrandesForward(sources), os.path.join(workdir, "fwd"),
        max_rounds=10_000, keep_steps=1,
    )
    maxlev = fwd.rounds - 1  # the last round discovered nothing
    back = runner(
        graph,
        BrandesBackward(graph.P, fwd.workdir, fwd.final_step, maxlev, sources),
        os.path.join(workdir, "back"),
        max_rounds=max(0, maxlev),
    )
    return sources, back


def run_betweenness(graph, workdir: str, sources, *, engine: str = "dataset"):
    """-> pandas (oid, bc): bc = sum over the sampled sources of Brandes
    dependencies (delta at each source itself excluded). One forward +
    one backward BSP job for the whole source set (up to 64 sources)."""
    sources, back = _run_brandes_pair(graph, workdir, sources, engine)
    S = len(sources)
    # assemble bc from the per-partition final state (delta matrices)
    sd = ckpt.step_dir(back.workdir, back.final_step)
    oid_parts, bc_parts = [], []
    for f in sorted(os.listdir(sd)):
        if not (f.startswith("state-") and f.endswith(".parquet")):
            continue
        t = pq.read_table(os.path.join(sd, f), columns=["oid", "delta"])
        oid = t.column("oid").to_numpy(zero_copy_only=False)
        delta = _np_state_col(t.column("delta"), pa.list_(pa.float64(), S))
        bc = delta.sum(axis=1)
        for i, s in enumerate(sources):
            hit = oid == s
            if hit.any():
                bc[hit] -= delta[hit, i]  # Brandes' w != s guard
        oid_parts.append(oid)
        bc_parts.append(bc)
    out = pd.DataFrame(
        {"oid": np.concatenate(oid_parts), "bc": np.concatenate(bc_parts)}
    )
    return out.sort_values("oid").reset_index(drop=True)


def run_betweenness_exact(graph, workdir: str, *, engine: str = "dataset"):
    """EXACT betweenness (reference semantics: every vertex is a source,
    flash/centrality/bc.h runs Brandes from all roots): ceil(V/64)
    wave-packed forward+backward job pairs, per-vertex bc summed across
    waves on the driver (one O(V) float column per wave — bounded).
    On an undirected graph this counts each (s, t) pair from both ends,
    i.e. bc here = 2 x networkx betweenness_centrality(normalized=False).
    The sampled-source run_betweenness remains the at-scale estimate;
    this is the exact path for graphs where V/64 waves are affordable."""
    parts = [
        pq.read_table(graph.vertexstate_path(pid), columns=["oid"])
        .column("oid").to_numpy(zero_copy_only=False)
        for pid in range(graph.P)
    ]
    sources = np.sort(np.concatenate(parts))
    acc: pd.DataFrame | None = None
    for w, lo in enumerate(range(0, len(sources), 64)):
        df = run_betweenness(
            graph, os.path.join(workdir, f"wave={w:04d}"),
            sources[lo: lo + 64], engine=engine,
        )
        if acc is None:
            acc = df
        else:
            assert np.array_equal(acc["oid"].to_numpy(), df["oid"].to_numpy())
            acc["bc"] = acc["bc"].to_numpy() + df["bc"].to_numpy()
    return acc


def run_edge_betweenness(
    graph, workdir: str, sources, *, engine: str = "dataset", buckets: int = 32
):
    """Edge betweenness over the sampled sources (Brandes 2001 \u00a74 edge
    accumulation) -> pandas (u, v, ebc), u < v, every edge present.

    No third BSP phase: a directed row (a -> b) carries dependency
    sigma_s(a) / sigma_s(b) * (1 + delta_s(b)) for every source s with
    dist_s(b) = dist_s(a) + 1, and dist/sigma/delta are all in the
    backward job's final checkpoint. So the edge accumulation is a pure
    post-pass: two partitioned ARROW-native bucket joins attach the
    endpoints' state vectors to the symmetric edge table (state rows
    travel ONCE per join, bucketed on the join key, fixed-size-list
    columns kept zero-copy end-to-end — never through pandas object
    columns), one vectorized (rows, S) masked product folds the
    per-source sum, and a final hash(pair)-bucketed fold adds the two
    orientations of each undirected edge. Intermediate rows carry
    S-wide float vectors — the same payload shape the backward BSP
    phase ships per round; at larger S, wave-split the sources exactly
    like run_betweenness_exact.

    On an undirected graph with ALL vertices as sources this equals
    2 x networkx.edge_betweenness_centrality(normalized=False) (each
    unordered (s, t) pair is counted from both endpoints)."""
    import ray.data as rd

    from raylinkgraph.functions.hashing import pair_hash

    sources, back = _run_brandes_pair(graph, workdir, sources, engine)
    S = len(sources)
    fsl_i, fsl_f = pa.list_(pa.int64(), S), pa.list_(pa.float64(), S)
    sd = ckpt.step_dir(back.workdir, back.final_step)
    files = [
        os.path.join(sd, f)
        for f in sorted(os.listdir(sd))
        if f.startswith("state-") and f.endswith(".parquet")
    ]
    st = rd.read_parquet(files, columns=["oid", "dist", "sigma", "delta"])
    edges = graph.edges_ds().select_columns(["src_id", "dst_id"])

    def _fsl(mat: np.ndarray, t: pa.DataType) -> pa.Array:
        return pa.FixedSizeListArray.from_arrays(
            pa.array(np.ascontiguousarray(mat).reshape(-1), t.value_type), S
        )

    STATE = ("dist", "sigma", "delta")
    STATE_T = (fsl_i, fsl_f, fsl_f)

    def _attach(edge_like: rd.Dataset, key_col: str, carry: "list[tuple[str, pa.DataType]]"):
        """Bucket-join ``st`` onto ``edge_like`` by ``key_col``: both
        sides tagged with hash(key) % buckets, unioned on a null-padded
        common schema, resolved per group with a searchsorted over the
        state side. -> Dataset of carry columns + dist/sigma/delta of
        the key endpoint."""

        def tag_edges(b: pa.Table) -> pa.Table:
            k = b.column(key_col).to_numpy(zero_copy_only=False)
            cols = {
                "key": pa.array(k, pa.int64()),
                "side": pa.array(np.zeros(len(k), np.int8)),
                "__b": pa.array(partition_of(k, buckets), pa.int32()),
            }
            for c, t in carry:
                cols[c] = b.column(c)
            for c, t in zip(STATE, STATE_T):
                cols["st_" + c] = pa.nulls(len(k), t)
            return pa.table(cols)

        def tag_state(b: pa.Table) -> pa.Table:
            k = b.column("oid").to_numpy(zero_copy_only=False)
            cols = {
                "key": pa.array(k, pa.int64()),
                "side": pa.array(np.ones(len(k), np.int8)),
                "__b": pa.array(partition_of(k, buckets), pa.int32()),
            }
            for c, t in carry:
                cols[c] = pa.nulls(len(k), t)
            for c in STATE:
                cols["st_" + c] = b.column(c).cast(
                    STATE_T[STATE.index(c)]
                )
            return pa.table(cols)

        def resolve(g: pa.Table) -> pa.Table:
            side = g.column("side").to_numpy(zero_copy_only=False)
            st_idx = np.flatnonzero(side == 1)
            ed_idx = np.flatnonzero(side == 0)
            keys = g.column("key").to_numpy(zero_copy_only=False)
            skeys = keys[st_idx]
            order = np.argsort(skeys)
            pos = np.searchsorted(skeys[order], keys[ed_idx])
            take = pa.array(st_idx[order[pos]], pa.int64())
            etake = pa.array(ed_idx, pa.int64())
            cols = {key_col: pa.array(keys[ed_idx], pa.int64())}
            for c, t in carry:
                cols[c] = g.column(c).take(etake)
            for c in STATE:
                cols[c] = g.column("st_" + c).take(take)
            return pa.table(cols)

        tagged_e = edge_like.map_batches(tag_edges, batch_format="pyarrow")
        tagged_s = st.map_batches(tag_state, batch_format="pyarrow")
        return (
            tagged_e.union(tagged_s)
            .groupby("__b")
            .map_groups(resolve, batch_format="pyarrow")
        )

    # join 1: dst-side state -> per-edge g_b = (1 + delta_b) / sigma_b
    j1 = _attach(edges, "dst_id", [("src_id", pa.int64())])

    def dst_side(b: pa.Table) -> pa.Table:
        dist_b = _np_state_col(b.column("dist"), fsl_i)
        sig_b = _np_state_col(b.column("sigma"), fsl_f)
        del_b = _np_state_col(b.column("delta"), fsl_f)
        g = (1.0 + del_b) / np.where(sig_b > 0, sig_b, 1.0)
        return pa.table(
            {
                "src_id": b.column("src_id"),
                "dst_id": b.column("dst_id"),
                "distd": _fsl(dist_b, fsl_i),
                "gd": _fsl(g, fsl_f),
            }
        )

    j1b = j1.map_batches(dst_side, batch_format="pyarrow")

    # join 2: src-side state; then the masked per-source fold
    j2 = _attach(
        j1b, "src_id", [("dst_id", pa.int64()), ("distd", fsl_i), ("gd", fsl_f)]
    )

    def accumulate(b: pa.Table) -> pa.Table:
        dist_a = _np_state_col(b.column("dist"), fsl_i)
        sig_a = _np_state_col(b.column("sigma"), fsl_f)
        dist_b = _np_state_col(b.column("distd"), fsl_i)
        g = _np_state_col(b.column("gd"), fsl_f)
        # guard the +1 against the UNREACHED sentinel before comparing
        la = np.where(dist_a == UNREACHED, np.int64(-2), dist_a)
        ok = dist_b == la + 1
        w = (sig_a * g * ok).sum(axis=1)
        s = b.column("src_id").to_numpy(zero_copy_only=False)
        d = b.column("dst_id").to_numpy(zero_copy_only=False)
        u = np.minimum(s, d)
        v = np.maximum(s, d)
        return pa.table(
            {
                "u": pa.array(u, pa.int64()),
                "v": pa.array(v, pa.int64()),
                "w": pa.array(w, pa.float64()),
                "__p": pa.array(
                    partition_of(pair_hash(u, v), buckets), pa.int32()
                ),
            }
        )

    def fold(gdf: pd.DataFrame) -> pd.DataFrame:
        agg = gdf.groupby(["u", "v"], sort=False)["w"].sum().reset_index()
        return agg.rename(columns={"w": "ebc"})

    out = (
        j2.map_batches(accumulate, batch_format="pyarrow")
        .groupby("__p")
        .map_groups(fold, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values(["u", "v"]).reset_index(drop=True)
