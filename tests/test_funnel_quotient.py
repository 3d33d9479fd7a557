"""Round-4 session additions: funnel, user-gap stats, reciprocity,
quotient graph, weighted PageRank (brute-force / dense-numpy oracles;
the sf0.01 SQL parity sweep covers graph_pagerank_weighted,
graph_reciprocity, graph_quotient, events_funnel, events_user_gaps)."""

import os

import numpy as np
import pandas as pd
import ray.data as rd

from raylinkgraph.functions.windows import funnel_steps, user_gap_stats
from raylinkgraph.pipelines.graph_ops import quotient_graph, reciprocity

STEPS = ["view", "click", "purchase"]


def _events(seed=0, n=600, users=25):
    rng = np.random.default_rng(seed)
    return pd.DataFrame(
        {
            "user_id": rng.integers(0, users, n),
            "ts": pd.Timestamp("2024-01-01")
            + pd.to_timedelta(rng.integers(0, 10**7, n), unit="us"),
            "event_type": rng.choice(STEPS + ["other", "error"], n),
        }
    )


def _funnel_brute(ev):
    rows = []
    for uid, u in ev[ev["event_type"].isin(STEPS)].groupby("user_id"):
        ts = ((u["ts"] - pd.Timestamp(0)) // pd.Timedelta(microseconds=1)).to_numpy(
            np.int64
        )
        st = u["event_type"].to_numpy()
        prev, times = -1, []
        for i, s in enumerate(STEPS):
            if i > 0 and times[-1] < 0:
                times.append(-1)
                continue
            cand = ts[(st == s) & (ts > prev)] if prev >= 0 else ts[st == s]
            if len(cand):
                prev = int(cand.min())
                times.append(prev)
            else:
                times.append(-1)
        rows.append((uid, sum(t >= 0 for t in times), *times))
    return (
        pd.DataFrame(rows, columns=["user_id", "depth", "t0_us", "t1_us", "t2_us"])
        .sort_values("user_id")
        .reset_index(drop=True)
    )


def test_funnel_brute_force(ray_session):
    ev = _events(3)
    got = (
        funnel_steps(rd.from_pandas(ev), STEPS)
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
        .astype(np.int64)
    )
    assert got.equals(_funnel_brute(ev).astype(np.int64))


def test_funnel_partition_invariance(ray_session):
    ev = _events(4)
    a = (
        funnel_steps(rd.from_pandas(ev), STEPS, buckets=3)
        .to_pandas().sort_values("user_id").reset_index(drop=True)
    )
    b = (
        funnel_steps(rd.from_pandas(ev).repartition(7), STEPS, buckets=11)
        .to_pandas().sort_values("user_id").reset_index(drop=True)
    )
    assert a.astype(np.int64).equals(b.astype(np.int64))


def test_funnel_unreached_prefix_blocks_suffix(ray_session):
    # user does click+purchase but never view -> depth 0, all steps after
    # the missing prefix step stay -1 even though their events exist
    ev = pd.DataFrame(
        {
            "user_id": [1, 1],
            "ts": pd.to_datetime(["2024-01-01", "2024-01-02"]),
            "event_type": ["click", "purchase"],
        }
    )
    got = funnel_steps(rd.from_pandas(ev), STEPS).to_pandas()
    assert got["depth"].tolist() == [0]
    assert got[["t0_us", "t1_us", "t2_us"]].to_numpy().tolist() == [[-1, -1, -1]]


def test_user_gaps_brute_force(ray_session):
    ev = _events(5)
    got = (
        user_gap_stats(rd.from_pandas(ev))
        .to_pandas().sort_values("user_id").reset_index(drop=True)
    )
    rows = []
    for uid, u in ev.groupby("user_id"):
        ts = np.sort(
            ((u["ts"] - pd.Timestamp(0)) // pd.Timedelta(microseconds=1)).to_numpy(
                np.int64
            )
        )
        d = np.diff(ts)
        rows.append((uid, len(ts), int(ts[-1] - ts[0]), int(d.max()) if len(d) else 0))
    bf = pd.DataFrame(rows, columns=["user_id", "n", "span_us", "max_gap_us"])
    assert got.astype(np.int64).equals(bf.astype(np.int64))


def test_reciprocity_known(ray_session):
    edges = pd.DataFrame(
        {"src_id": [1, 2, 2, 3, 4, 5, 5], "dst_id": [2, 1, 3, 2, 5, 6, 6]}
    )
    # dedup'd edges: (1,2),(2,1),(2,3),(3,2),(4,5),(5,6) -> 4 of 6 mutual
    out = reciprocity(rd.from_pandas(edges))
    assert out.iloc[0].tolist() == [6, 4, 666667]


def test_reciprocity_partition_invariance(ray_session):
    rng = np.random.default_rng(7)
    e = pd.DataFrame(
        {"src_id": rng.integers(0, 50, 400), "dst_id": rng.integers(0, 50, 400)}
    )
    a = reciprocity(rd.from_pandas(e), buckets=4)
    b = reciprocity(rd.from_pandas(e).repartition(9), buckets=17)
    assert a.equals(b)


def test_quotient_graph_known(ray_session):
    edges = rd.from_pandas(
        pd.DataFrame({"src_id": [1, 2, 2, 3, 4, 5], "dst_id": [2, 1, 3, 2, 5, 6]})
    )
    smap = rd.from_pandas(
        pd.DataFrame({"oid": [1, 2, 3, 4, 5], "grp": ["a", "a", "b", "b", "c"]})
    )
    dmap = rd.from_pandas(
        pd.DataFrame({"oid": [1, 2, 3, 5, 6], "grp": ["x", "x", "y", "z", "z"]})
    )
    q = (
        quotient_graph(edges, smap, dmap)
        .to_pandas().sort_values(["src_grp", "dst_grp"]).reset_index(drop=True)
    )
    want = pd.DataFrame(
        {
            "src_grp": ["a", "a", "b", "b", "c"],
            "dst_grp": ["x", "y", "x", "z", "z"],
            "n_edges": np.array([2, 1, 1, 1, 1], np.int64),
        }
    )
    assert q.astype({"n_edges": np.int64}).equals(want)


def test_quotient_graph_partial_mapping_raises(ray_session):
    edges = rd.from_pandas(pd.DataFrame({"src_id": [1, 9], "dst_id": [2, 2]}))
    smap = rd.from_pandas(pd.DataFrame({"oid": [1], "grp": ["a"]}))  # 9 missing
    dmap = rd.from_pandas(pd.DataFrame({"oid": [2], "grp": ["x"]}))
    import pytest
    import ray.exceptions

    with pytest.raises((ValueError, ray.exceptions.RayTaskError)):
        quotient_graph(edges, smap, dmap).to_pandas()


def test_weighted_pagerank_dense_oracle(ray_session, tmp_root):
    from raylinkgraph.algos.pagerank import WeightedPageRank
    from raylinkgraph.bsp import run_bsp
    from raylinkgraph.stages.graph_build import LinkGraph

    rng = np.random.default_rng(11)
    m = 300
    u = rng.integers(0, 50, m)
    v = rng.integers(0, 50, m)
    keep = u != v
    u, v = u[keep], v[keep]
    w = rng.integers(1, 6, keep.sum()).astype(np.float64)
    df = pd.DataFrame(
        {"src_id": np.minimum(u, v), "dst_id": np.maximum(u, v), "weight": w}
    )
    df = df.groupby(["src_id", "dst_id"], as_index=False)["weight"].sum()
    sym = pd.concat(
        [df, df.rename(columns={"src_id": "dst_id", "dst_id": "src_id"})]
    )
    sym["t"] = sym["weight"] / sym.groupby("src_id")["weight"].transform("sum")
    g = LinkGraph.build(
        rd.from_pandas(
            sym[["src_id", "dst_id", "t"]].rename(columns={"t": "weight"})
        ),
        os.path.join(tmp_root, "wpr_g"),
        P=4,
        symmetrize=False,
        weight_col="weight",
    )
    rounds, alpha = 25, 0.85
    res = run_bsp(
        g,
        WeightedPageRank(g.n_vertices, alpha=alpha, tol=0.0, max_rounds=rounds),
        os.path.join(tmp_root, "wpr_wd"),
        max_rounds=rounds,
    )
    got = res.state_pandas()[["oid", "rank"]].sort_values("oid")
    verts = np.unique(sym[["src_id", "dst_id"]].to_numpy())
    idx = {o: i for i, o in enumerate(verts)}
    n = len(verts)
    T = np.zeros((n, n))
    for _, r in sym.iterrows():
        T[idx[r.src_id], idx[r.dst_id]] = r.t
    rank = np.full(n, 1 / n)
    for _ in range(rounds):
        rank = alpha * (rank @ T) + (1 - alpha) / n
    assert np.abs(got["rank"].to_numpy() - rank).max() < 1e-12


def test_host_graph_ground_truth(ray_session, tmp_root):
    """pages -> link graph -> host contraction must equal PageGen's
    ground-truth (src_url, dst_url) set aggregated by site host."""
    from raylinkgraph.pipelines.linkgraph import (
        build_linkgraph_from_pages,
        host_graph,
    )
    from raylinkgraph.schema import PageGen
    from raylinkgraph.sources.pages import generate_pages_parquet

    n = 400
    pages = os.path.join(tmp_root, "hostg-pages")
    generate_pages_parquet(pages, n, seed=42)
    graph, vmap = build_linkgraph_from_pages(
        pages, os.path.join(tmp_root, "hostg-pipe"), P=4,
        extract_concurrency=(1, 2), write_text_table=False,
    )
    got = (
        host_graph(graph, vmap)
        .to_pandas()
        .sort_values(["src_grp", "dst_grp"])
        .reset_index(drop=True)
    )

    def host(url):
        return url.split("/")[2]

    truth = {}
    for s, d in PageGen(n, 42).true_edge_pairs():
        truth[(host(s), host(d))] = truth.get((host(s), host(d)), 0) + 1
    want = (
        pd.DataFrame(
            [(a, b, c) for (a, b), c in truth.items()],
            columns=["src_grp", "dst_grp", "n_edges"],
        )
        .sort_values(["src_grp", "dst_grp"])
        .reset_index(drop=True)
    )
    assert got.astype({"n_edges": np.int64}).equals(
        want.astype({"n_edges": np.int64})
    )


def test_paragraph_dedup_brute_force(ray_session):
    """Engine chunk dedup == brute-force CCNet rule (drop every chunk
    whose exact text appears >1 time corpus-wide)."""
    from raylinkgraph.functions.dedup import paragraph_dedup

    rng = np.random.default_rng(13)
    W = 4
    vocab = [f"w{i}" for i in range(12)]
    docs = []
    for i in range(60):
        n = int(rng.integers(3, 30))
        docs.append(" ".join(rng.choice(vocab, n)))
    # inject exact duplicate docs (all their chunks duplicate)
    docs[10] = docs[3]
    docs[11] = docs[3]
    df = pd.DataFrame({"doc_id": np.arange(len(docs)), "text": docs})
    got = (
        paragraph_dedup(rd.from_pandas(df), window=W, buckets=7)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    # brute force
    from collections import Counter

    def chunks(t):
        ws = t.split(" ")
        return [" ".join(ws[k:k + W]) for k in range(0, max(len(ws), 1), W)]

    cnt = Counter(c for t in docs for c in chunks(t))
    rows = []
    for i, t in enumerate(docs):
        cs = chunks(t)
        kept = [c for c in cs if cnt[c] == 1]
        rows.append((i, len(cs), len(cs) - len(kept), " ".join(kept)))
    bf = pd.DataFrame(
        rows, columns=["doc_id", "n_chunks", "n_dropped", "text_kept"]
    )
    assert got["n_dropped"].sum() > 0  # the injected dups fired
    assert got.equals(
        bf.astype({"doc_id": np.int64, "n_chunks": np.int64,
                   "n_dropped": np.int64})
    )


def test_retention_cohorts_brute_force(ray_session):
    from raylinkgraph.functions.windows import retention_cohorts

    rng = np.random.default_rng(21)
    n = 900
    ev = pd.DataFrame(
        {
            "user_id": rng.integers(0, 40, n),
            # span ~40 days so the cohort triangle has real structure
            "ts": pd.Timestamp("2024-01-01")
            + pd.to_timedelta(rng.integers(0, 40 * 86_400_000_000, n),
                              unit="us"),
        }
    )
    got = (
        retention_cohorts(rd.from_pandas(ev), buckets=5)
        .to_pandas()
        .sort_values(["cohort_day", "offset_days"])
        .reset_index(drop=True)
    )
    US_PER_DAY = 86_400_000_000
    df = ev.copy()
    df["day"] = (
        (df["ts"] - pd.Timestamp(0)) // pd.Timedelta(microseconds=1)
    ).astype(np.int64) // US_PER_DAY
    d = df[["user_id", "day"]].drop_duplicates()
    first = d.groupby("user_id")["day"].min().rename("cohort_day")
    j = d.join(first, on="user_id")
    j["offset_days"] = j["day"] - j["cohort_day"]
    bf = (
        j.groupby(["cohort_day", "offset_days"])
        .size()
        .reset_index(name="n_users")
        .sort_values(["cohort_day", "offset_days"])
        .reset_index(drop=True)
    )
    assert got.astype(np.int64).equals(bf.astype(np.int64))


def test_host_rank_matches_weighted_power_iteration(ray_session, tmp_root):
    """host_rank (contract -> normalize -> WeightedPageRank) must match a
    dense weighted power iteration (networkx pagerank(weight=) semantics)
    on the ground-truth host multigraph."""
    from raylinkgraph.pipelines.linkgraph import (
        build_linkgraph_from_pages,
        host_rank,
    )
    from raylinkgraph.schema import PageGen
    from raylinkgraph.sources.pages import generate_pages_parquet

    n = 300
    pages = os.path.join(tmp_root, "hr-pages")
    generate_pages_parquet(pages, n, seed=7)
    graph, vmap = build_linkgraph_from_pages(
        pages, os.path.join(tmp_root, "hr-pipe"), P=4,
        extract_concurrency=(1, 2), write_text_table=False,
    )
    got = host_rank(graph, vmap, os.path.join(tmp_root, "hr-work"), P=4)

    def host(url):
        return url.split("/")[2]

    w = {}
    for s, d in set(PageGen(n, 7).true_edge_pairs()):  # distinct page edges
        key = (host(s), host(d))
        w[key] = w.get(key, 0) + 1
    hosts = sorted({h for k in w for h in k})
    idx = {h: i for i, h in enumerate(hosts)}
    m = len(hosts)
    W = np.zeros((m, m))
    for (s, d), c in w.items():
        if s != d:  # host_rank excludes self-loops (LinkGraph convention)
            W[idx[s], idx[d]] = c
    outw = W.sum(axis=1)
    T = np.divide(W, outw[:, None], out=np.zeros_like(W), where=outw[:, None] > 0)
    alpha, x = 0.85, np.full(m, 1.0 / m)
    for _ in range(500):
        xlast = x
        dangling = x[outw == 0].sum()
        x = alpha * (x @ T + dangling / m) + (1 - alpha) / m
        if np.abs(x - xlast).sum() < m * 1e-14:
            break
    got_map = dict(zip(got["host"], got["rank"]))
    assert set(got_map) == set(hosts)
    for h in hosts:
        assert abs(got_map[h] - x[idx[h]]) < 1e-8, (h, got_map[h], x[idx[h]])
