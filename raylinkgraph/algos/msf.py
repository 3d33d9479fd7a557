"""Minimum spanning forest: Boruvka rounds over Dataset shuffles.

Reference: flash_msf / flash_msf_block (.gs_conf.yaml:447-453,
apps/flash/measurement/msf.h). Pinned deterministic spec:

  components start as singletons; each round every component selects its
  minimum outgoing edge by the total order (w, min(u,v), max(u,v));
  selected edges join the forest; touched components merge. Ties are
  impossible under the total order, so the forest is unique given the
  weights — and when all weights are distinct it IS the unique MSF.

All stages are hash-bucket shuffles (louvain.py helpers): two attaches
per round to tag edge endpoints with components, a bucketed lexicographic
argmin per component, and contraction by ITERATED min-label hooks over
the selected edges (comp <- min(comp, partner-comp) to fixpoint — the
hook forest's diameter is small because every hook points at a min-key
partner). Nothing O(V) touches the driver; per-round state is persisted
parquet (resumable like the BSP jobs)."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import ray.data as rd

from raylinkgraph.algos.louvain import _attach, _bucket, _persist


def run_msf(graph, workdir: str, *, max_rounds: int = 60) -> pd.DataFrame:
    """-> forest edges (u, v, w), u < v, sorted. Requires a symmetrized
    weighted graph."""
    if not graph.meta.get("symmetrize") or not graph.meta.get("weighted"):
        raise ValueError("msf requires a symmetrized weighted graph")
    B = graph.P
    os.makedirs(workdir, exist_ok=True)

    def norm(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"src": b["src_id"].to_numpy(np.int64),
             "dst": b["dst_id"].to_numpy(np.int64),
             "w": b["weight"].to_numpy(np.float64)}
        )

    edges = _persist(
        graph.edges_ds().map_batches(norm, batch_format="pandas"),
        os.path.join(workdir, "edges"),
    )
    comp = _persist(
        rd.read_parquet(
            os.path.join(graph.graph_dir, "vertexstate"), columns=["oid"]
        ).map_batches(
            lambda b: pd.DataFrame(
                {"v": b["oid"].to_numpy(np.int64),
                 "comp": b["oid"].to_numpy(np.float64)}
            ),
            batch_format="pandas",
        ),
        os.path.join(workdir, "c0000"),
    )
    forest_frames: list[pd.DataFrame] = []
    ecols = {"src": "int64", "dst": "int64", "w": "float64"}

    for r in range(max_rounds):
        e2 = _attach(edges, "src", comp, "v", ["comp"], ["cs"], B, ecols)
        e2 = _attach(e2, "dst", comp, "v", ["comp"], ["cd"], B,
                     {**ecols, "cs": "float64"})

        def cross_cand(b: pd.DataFrame) -> pd.DataFrame:
            b = b[b["cs"] != b["cd"]]
            if not len(b):
                return pd.DataFrame(
                    {"c": pd.Series([], dtype=np.int64),
                     "w": pd.Series([], dtype=np.float64),
                     "a": pd.Series([], dtype=np.int64),
                     "z": pd.Series([], dtype=np.int64),
                     "oc": pd.Series([], dtype=np.int64),
                     "__b": pd.Series([], dtype=np.int32)}
                )
            u = b["src"].to_numpy(np.int64)
            v = b["dst"].to_numpy(np.int64)
            a, z = np.minimum(u, v), np.maximum(u, v)
            out = pd.DataFrame(
                {"c": b["cs"].astype(np.int64), "w": b["w"].to_numpy(),
                 "a": a, "z": z, "oc": b["cd"].astype(np.int64)}
            )
            # local pre-combine: per component keep only the local argmin
            out = out.sort_values(["c", "w", "a", "z"]).drop_duplicates("c")
            return out.assign(__b=_bucket(out["c"].to_numpy(np.int64), B))

        chosen = (
            e2.map_batches(cross_cand, batch_format="pandas")
            .groupby("__b")
            .map_groups(
                lambda g: g.drop(columns="__b")
                .sort_values(["c", "w", "a", "z"]).drop_duplicates("c"),
                batch_format="pandas",
            )
        )
        import pyarrow as pa

        chosen = _persist(
            chosen, os.path.join(workdir, f"sel{r:04d}"),
            empty_schema={"c": pa.int64(), "w": pa.float64(), "a": pa.int64(),
                          "z": pa.int64(), "oc": pa.int64()},
        )
        n_sel = chosen.count()
        if n_sel == 0:
            break
        # forest edges (deduped across the two endpoint components)
        fr = (
            chosen.map_batches(
                lambda b: b[["a", "z", "w"]].drop_duplicates(),
                batch_format="pandas",
            )
            .groupby("a").map_groups(
                lambda g: g.drop_duplicates(["a", "z"]), batch_format="pandas"
            )
        ).to_pandas()  # O(#components) rows this round, halving each round
        forest_frames.append(fr)

        # contraction: iterated min-label hook over chosen (c -> oc) pairs
        hooks = chosen.map_batches(
            lambda b: pd.DataFrame(
                {"x": np.concatenate([b["c"].to_numpy(np.int64),
                                       b["oc"].to_numpy(np.int64)]),
                 "y": np.concatenate([b["oc"].to_numpy(np.int64),
                                       b["c"].to_numpy(np.int64)]).astype(np.float64)}
            ),
            batch_format="pandas",
        )
        hooks = _persist(hooks, os.path.join(workdir, f"hook{r:04d}"))
        # label table over component ids: lab(c) = c
        lab = _persist(
            chosen.map_batches(
                lambda b: pd.DataFrame(
                    {"c": np.unique(np.concatenate(
                        [b["c"].to_numpy(np.int64), b["oc"].to_numpy(np.int64)]
                    ))}
                ).assign(lab=lambda d: d["c"].astype(np.float64)),
                batch_format="pandas",
            ).groupby("c").map_groups(
                lambda g: g.drop_duplicates("c"), batch_format="pandas"
            ),
            os.path.join(workdir, f"lab{r:04d}-0"),
        )
        for it in range(40):
            # lab'(x) = min(lab(x), min over hooks (x,y) of lab(y)) — one
            # attach + one bucketed min-reduce per iteration
            hy = _attach(
                hooks, "y", lab, "c", ["lab"], ["ly"], B,
                {"x": "int64", "y": "float64"},
            )
            cand = hy.map_batches(
                lambda b: pd.DataFrame(
                    {"c": b["x"].to_numpy(np.int64),
                     "val": b["ly"].to_numpy(np.float64),
                     "own": np.zeros(len(b))}
                ),
                batch_format="pandas",
            )
            ownrows = lab.map_batches(
                lambda b: pd.DataFrame(
                    {"c": b["c"].to_numpy(np.int64),
                     "val": b["lab"].to_numpy(np.float64),
                     "own": np.ones(len(b))}
                ),
                batch_format="pandas",
            )

            def lab_reduce(g: pd.DataFrame) -> pd.DataFrame:
                m = g.groupby("c")["val"].min()
                o = g[g["own"] == 1.0].set_index("c")["val"]
                new = m.to_numpy(np.float64)
                old = o.reindex(m.index).to_numpy(np.float64)
                return pd.DataFrame(
                    {"c": m.index.to_numpy(np.int64), "lab": new,
                     "chg": (new != old).astype(np.float64)}
                )

            lab = _persist(
                cand.union(ownrows)
                .map_batches(
                    lambda b: b.assign(
                        __b=_bucket(b["c"].to_numpy(np.int64), B)
                    ),
                    batch_format="pandas",
                )
                .groupby("__b")
                .map_groups(
                    lambda g: lab_reduce(g.drop(columns="__b")),
                    batch_format="pandas",
                ),
                os.path.join(workdir, f"lab{r:04d}-{it+1}"),
            )
            if float(lab.sum("chg")) == 0.0:
                break
            # pointer jumping: lab(x) <- min(lab(x), lab(lab(x))). The
            # plain neighbor-min hook converges in O(selection-chain
            # length) rounds (a path of monotone weights hooks every
            # component to its successor); the jump halves every chain
            # each iteration, so 40 iterations cover 2^40 components.
            jump_cols = {"c": np.int64, "lab": np.float64, "chg": np.float64,
                         "k": np.int64}
            lab = _persist(
                _attach(
                    lab.map_batches(
                        lambda b: pd.DataFrame(
                            {"c": b["c"].to_numpy(np.int64),
                             "lab": b["lab"].to_numpy(np.float64),
                             "chg": b["chg"].to_numpy(np.float64),
                             "k": b["lab"].to_numpy(np.float64).astype(np.int64)}
                        ),
                        batch_format="pandas",
                    ),
                    "k", lab, "c", ["lab"], ["l2"], B, jump_cols,
                    decide=lambda res: pd.DataFrame(
                        {"c": res["c"].to_numpy(np.int64),
                         "lab": np.minimum(
                             res["lab"].to_numpy(np.float64),
                             res["l2"].to_numpy(np.float64)),
                         "chg": res["chg"].to_numpy(np.float64)}
                    ),
                ),
                os.path.join(workdir, f"lab{r:04d}-{it+1}j"),
            )
        else:
            raise RuntimeError("msf contraction did not converge")
        # comp(v) <- lab(comp(v)) for touched components (untouched keep)
        comp_tag = comp.map_batches(
            lambda b: pd.DataFrame(
                {"v": b["v"].to_numpy(np.int64),
                 "comp": b["comp"].to_numpy(np.float64),
                 "k": b["comp"].astype(np.int64)}
            ),
            batch_format="pandas",
        )
        labm = lab.map_batches(
            lambda b: pd.DataFrame(
                {"k": b["c"].to_numpy(np.int64), "side": np.int8(1),
                 "v": np.full(len(b), -1, np.int64),
                 "comp": b["lab"].to_numpy(np.float64)}
            ),
            batch_format="pandas",
        )

        def remap(g: pd.DataFrame) -> pd.DataFrame:
            lut = g[g["side"] == 1].sort_values("k")
            d = g[g["side"] == 0]
            keys = lut["k"].to_numpy(np.int64)
            vals = lut["comp"].to_numpy(np.float64)
            kk = d["k"].to_numpy(np.int64)
            pos = np.searchsorted(keys, kk)
            pos_c = np.minimum(pos, max(len(keys) - 1, 0))
            if len(keys):
                hit = keys[pos_c] == kk
                newc = np.where(hit, vals[pos_c], d["comp"].to_numpy(np.float64))
            else:
                newc = d["comp"].to_numpy(np.float64)
            return pd.DataFrame({"v": d["v"].to_numpy(np.int64), "comp": newc})

        comp = _persist(
            comp_tag.map_batches(
                lambda b: b.assign(side=np.int8(0)), batch_format="pandas"
            )
            .union(labm)
            .map_batches(
                lambda b: b.assign(__b=_bucket(b["k"].to_numpy(np.int64), B)),
                batch_format="pandas",
            )
            .groupby("__b")
            .map_groups(
                lambda g: remap(g.drop(columns="__b")), batch_format="pandas"
            ),
            os.path.join(workdir, f"c{r+1:04d}"),
        )
    else:
        raise RuntimeError("msf did not converge within max_rounds")

    if not forest_frames:
        return pd.DataFrame(
            {"u": pd.Series([], dtype=np.int64),
             "v": pd.Series([], dtype=np.int64),
             "w": pd.Series([], dtype=np.float64)}
        )
    out = pd.concat(forest_frames, ignore_index=True).drop_duplicates(["a", "z"])
    out = out.rename(columns={"a": "u", "z": "v"})
    return out.sort_values(["u", "v"]).reset_index(drop=True)
