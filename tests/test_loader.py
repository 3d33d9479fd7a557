"""Option-suffix loader parity (loader.py:94-211 URI syntax)."""

import os

import numpy as np
import pandas as pd
import pytest

from raylinkgraph.sources.loader import load_table, parse_location


def test_parse_location():
    path, opts = parse_location("/x/y.csv#header_row=false#delimiter=|")
    assert path == "/x/y.csv"
    assert opts == {"header_row": "false", "delimiter": "|"}


def test_csv_with_header_and_delimiter(ray_session, tmp_root):
    p = os.path.join(tmp_root, "t1.csv")
    with open(p, "w") as f:
        f.write("id|name|v\n1|a|1.5\n2|b|2.5\n")
    df = load_table(p + "#delimiter=|").to_pandas()
    assert list(df.columns) == ["id", "name", "v"]
    assert df["v"].sum() == 4.0


def test_csv_headerless(ray_session, tmp_root):
    p = os.path.join(tmp_root, "t2.csv")
    with open(p, "w") as f:
        f.write("1,a\n2,b\n3,c\n")
    df = load_table(p + "#header_row=false").to_pandas()
    assert list(df.columns) == ["f0", "f1"]
    assert df["f0"].tolist() == [1, 2, 3]


def test_remote_uri_csv_and_parquet(ray_session, tmp_root):
    """file:// URIs exercise the pyarrow FileSystem.from_uri resolution —
    the same code path s3:// / oss:// / hdfs:// locations take on a real
    deployment (reference Loader protocols, framework/loader.py:94-211)."""
    p = os.path.join(tmp_root, "r1.csv")
    with open(p, "w") as f:
        f.write("7;x\n8;y\n")
    df = (
        load_table("file://" + p + "#header_row=false#delimiter=;")
        .to_pandas()
    )
    assert list(df.columns) == ["f0", "f1"]
    assert df["f0"].tolist() == [7, 8]

    pq = os.path.join(tmp_root, "r2.parquet")
    pd.DataFrame({"a": [3, 4]}).to_parquet(pq)
    assert load_table("file://" + pq).to_pandas()["a"].tolist() == [3, 4]


def test_headerless_shard_directory(ray_session, tmp_root):
    d = os.path.join(tmp_root, "shards.csv")
    os.makedirs(d, exist_ok=True)
    for i, rows in enumerate(("1,a\n2,b\n", "3,c\n")):
        with open(os.path.join(d, f"part{i}.csv"), "w") as f:
            f.write(rows)
    df = load_table(d + "#header_row=false").to_pandas().sort_values("f0")
    assert df["f0"].tolist() == [1, 2, 3]


def test_json_and_parquet(ray_session, tmp_root):
    pq_path = os.path.join(tmp_root, "t3.parquet")
    pd.DataFrame({"a": [1, 2], "b": ["x", "y"]}).to_parquet(pq_path)
    df = load_table(pq_path, columns=["a"]).to_pandas()
    assert list(df.columns) == ["a"]
    j = os.path.join(tmp_root, "t4.json")
    with open(j, "w") as f:
        f.write('{"a": 1}\n{"a": 2}\n')
    dj = load_table(j).to_pandas()
    assert dj["a"].tolist() == [1, 2]


def test_load_table_gzip_csv(ray_session, tmp_path):
    """Compressed CSV shards route by inner extension; codec is
    auto-detected (pyarrow/Ray), including the headerless probe."""
    import gzip

    from raylinkgraph.sources.loader import load_table

    p = tmp_path / "rows.csv.gz"
    with gzip.open(p, "wt") as f:
        f.write("k,v\n1,a\n2,b\n3,c\n")
    got = load_table(str(p)).to_pandas().sort_values("k").reset_index(drop=True)
    assert list(got["k"]) == [1, 2, 3] and list(got["v"]) == ["a", "b", "c"]
    # headerless variant exercises _probe_ncol through the gzip stream
    q = tmp_path / "noheader.csv.gz"
    with gzip.open(q, "wt") as f:
        f.write("1,a\n2,b\n")
    got2 = (
        load_table(str(q) + "#header_row=false")
        .to_pandas().sort_values("f0").reset_index(drop=True)
    )
    assert list(got2.columns) == ["f0", "f1"] and list(got2["f1"]) == ["a", "b"]


def test_edges_from_pandas_coo_csr_agree(ray_session, tmp_path):
    """The three in-memory edge-input forms (reference Loader parity:
    DataFrame / numpy COO / CSR) produce identical graphs."""
    import pandas as pd

    from raylinkgraph.sources.loader import (
        edges_from_coo, edges_from_csr, edges_from_pandas,
    )
    from raylinkgraph.stages.graph_build import LinkGraph

    df = pd.DataFrame({"src_id": [0, 0, 1, 2, 3], "dst_id": [1, 2, 2, 3, 0]})
    indptr = np.array([0, 2, 3, 4, 5])
    indices = np.array([1, 2, 2, 3, 0])
    forms = {
        "pandas": edges_from_pandas(df),
        "coo": edges_from_coo(df["src_id"].to_numpy(), df["dst_id"].to_numpy()),
        "csr": edges_from_csr(indptr, indices),
    }
    frames = {
        k: v.to_pandas().sort_values(["src_id", "dst_id"]).reset_index(drop=True)
        for k, v in forms.items()
    }
    pd.testing.assert_frame_equal(frames["pandas"], frames["coo"])
    pd.testing.assert_frame_equal(frames["pandas"], frames["csr"])
    g = LinkGraph.build(forms["csr"], str(tmp_path / "g-csr"), P=2)
    assert g.n_vertices == 4 and g.n_edges == 5


def test_write_table_roundtrip(ray_session, tmp_path):
    import pandas as pd
    import ray.data as rd

    from raylinkgraph.sources.loader import load_table, write_table

    df = pd.DataFrame({"k": np.arange(5, dtype=np.int64), "v": list("abcde")})
    for name in ("out.parquet", "out.csv", "out.json"):
        dest = str(tmp_path / name)
        write_table(rd.from_pandas(df), dest)
        back = (
            load_table(dest).to_pandas().sort_values("k").reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(back[["k", "v"]], df, check_dtype=False)
    with pytest.raises(ValueError):
        write_table(rd.from_pandas(df), str(tmp_path / "out.xyz"))
