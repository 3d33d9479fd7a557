"""interval_join: overlap multi-match, half-open boundaries, and
band-edge values (the sf0.01 oracle sweep covers events_value_bands)."""

import numpy as np
import pandas as pd
import ray.data as rd

from raylinkgraph.functions.windows import interval_join


def _join(vals, ivs, **kw):
    ds = rd.from_pandas(pd.DataFrame({"v": np.asarray(vals, np.float64),
                                      "rid": np.arange(len(vals))}))
    out = interval_join(ds, ivs, "v", "lo", "hi", **kw).to_pandas()
    return sorted(zip(out["rid"], out["iid"]))


def test_overlap_and_boundaries(ray_session):
    ivs = pd.DataFrame(
        {"iid": [0, 1, 2], "lo": [0.0, 5.0, 10.0], "hi": [10.0, 15.0, 20.0]}
    )
    # 7.0 matches [0,10) and [5,15); 10.0 is EXCLUDED from [0,10) but in
    # [5,15) and [10,20); 20.0 matches nothing
    got = _join([7.0, 10.0, 20.0, 0.0], ivs, band_width=4.0)
    assert got == [(0, 0), (0, 1), (1, 1), (1, 2), (3, 0)]


def test_brute_force_random(ray_session):
    rng = np.random.default_rng(5)
    lo = rng.uniform(0, 90, 40)
    ivs = pd.DataFrame(
        {"iid": np.arange(40), "lo": lo, "hi": lo + rng.uniform(0.1, 25, 40)}
    )
    vals = rng.uniform(-5, 120, 2000)
    got = _join(vals, ivs)
    want = sorted(
        (r, i)
        for r, v in enumerate(vals)
        for i in range(40)
        if ivs["lo"][i] <= v < ivs["hi"][i]
    )
    assert got == want
