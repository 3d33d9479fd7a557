"""The user-UDF surface (docs/UDF.md): the worked third-party example
`examples/max_value_udf.py` must run UNCHANGED on both engines and
agree with a brute-force oracle.

Reference-parity: user algorithms via Pregel programs / @pregel UDFs
(core/app/pregel/i_vertex_program.h:45-92, udf/decorators.py:51).
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))

import max_value_udf  # noqa: E402
from max_value_udf import _MIX, _MOD, MaxValue  # noqa: E402

# Ship the user module by value so Ray workers (which can't import a
# file living outside the package) receive the class with the task —
# the local-session equivalent of runtime_env={"py_modules": [...]}.
# Documented in docs/UDF.md.
from ray import cloudpickle  # noqa: E402

cloudpickle.register_pickle_by_value(max_value_udf)


def _component_max_oracle(edges_df):
    """Union-find: every vertex ends with the max init value of its
    weakly-connected component."""
    verts = np.unique(
        np.concatenate([edges_df["src_id"].to_numpy(), edges_df["dst_id"].to_numpy()])
    )
    idx = {v: i for i, v in enumerate(verts)}
    parent = np.arange(len(verts))

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    for s, d in zip(edges_df["src_id"], edges_df["dst_id"]):
        ra, rb = find(idx[s]), find(idx[d])
        if ra != rb:
            parent[ra] = rb
    init = (verts.astype(np.int64) * _MIX) % _MOD
    comp_max = {}
    roots = np.array([find(i) for i in range(len(verts))])
    for r, v in zip(roots, init):
        comp_max[r] = max(comp_max.get(r, -1), v)
    return {v: comp_max[r] for v, r in zip(verts, roots)}


@pytest.fixture(scope="module")
def p2p_graph(ray_session, tmp_root_module):
    from raylinkgraph.sources.datasets import load_p2p_network

    pg = load_p2p_network()
    g = pg.to_simple(os.path.join(tmp_root_module, "g"), P=4, symmetrize=True)
    return pg, g


@pytest.fixture(scope="module")
def tmp_root_module():
    import shutil
    import tempfile

    d = tempfile.mkdtemp(prefix="rlg-udf-")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_udf_on_dataset_engine(p2p_graph, tmp_root_module):
    from raylinkgraph.bsp import run_bsp

    pg, g = p2p_graph
    res = run_bsp(
        g, MaxValue(), os.path.join(tmp_root_module, "w_ds"), max_rounds=1000
    )
    assert res.converged
    got = res.state_pandas()
    want = _component_max_oracle(pg.edges("connect").to_pandas())
    assert dict(zip(got["oid"], got["val"])) == want


def test_udf_on_actor_engine_bitwise_equal(p2p_graph, tmp_root_module):
    from raylinkgraph.bsp import run_bsp
    from raylinkgraph.bsp_actors import run_bsp_actors

    pg, g = p2p_graph
    r1 = run_bsp(
        g, MaxValue(), os.path.join(tmp_root_module, "w_ds2"), max_rounds=1000
    )
    r2 = run_bsp_actors(
        g, MaxValue(), os.path.join(tmp_root_module, "w_act"), max_rounds=1000,
        num_workers=2,
    )
    d1 = r1.state_pandas().sort_values("oid").reset_index(drop=True)
    d2 = r2.state_pandas().sort_values("oid").reset_index(drop=True)
    assert (d1["oid"] == d2["oid"]).all()
    assert (d1["val"] == d2["val"]).all()
    assert r1.rounds == r2.rounds
