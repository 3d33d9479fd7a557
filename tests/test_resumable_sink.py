"""resumable_write: partitioned atomic commit + skip-finished rerun."""

import os

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from raylinkgraph.sources.resumable import read_resumable, resumable_write


def _df(n=500):
    rng = np.random.default_rng(2)
    return pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "v": rng.integers(0, 100, n).astype(np.int64),
        }
    )


def test_write_read_roundtrip_and_manifest(ray_session, tmp_path):
    df = _df()
    out = str(tmp_path / "sink")
    man = resumable_write(rd.from_pandas(df), out, "doc_id", buckets=8)
    assert len(man) == 8 and man["skipped"].sum() == 0
    assert man["n_rows"].sum() == len(df)
    back = (
        read_resumable(out).to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(back, df)


def test_rerun_skips_committed_partitions(ray_session, tmp_path):
    df = _df()
    out = str(tmp_path / "sink2")
    resumable_write(rd.from_pandas(df), out, "doc_id", buckets=8)
    # simulate a killed run: un-commit two partitions
    for p in (1, 5):
        os.remove(os.path.join(out, f"part={p}", "_SUCCESS"))
        os.remove(os.path.join(out, f"part={p}", "data.parquet"))
    man2 = resumable_write(rd.from_pandas(df), out, "doc_id", buckets=8)
    redone = man2[man2["skipped"] == 0]
    assert set(redone["part"]) == {1, 5}
    assert int(man2["skipped"].sum()) == 6
    back = (
        read_resumable(out).to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(back, df)


def test_uncommitted_partition_invisible(ray_session, tmp_path):
    df = _df(100)
    out = str(tmp_path / "sink3")
    resumable_write(rd.from_pandas(df), out, "doc_id", buckets=4)
    os.remove(os.path.join(out, "part=2", "_SUCCESS"))
    back = read_resumable(out).to_pandas()
    full = pd.read_parquet(os.path.join(out, "part=2", "data.parquet"))
    assert len(back) == len(df) - len(full)
    with pytest.raises(FileNotFoundError):
        read_resumable(str(tmp_path / "nope"))
