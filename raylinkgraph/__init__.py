"""raylinkgraph — a from-scratch Ray-Data-native link-graph analytics engine.

Re-expresses the capabilities of GraphScope's analytical engine (GRAPE/PIE
model, see SURVEY.md) as idiomatic Ray Data pipelines: `ray.data.Dataset`
-> `map_batches` over zero-copy Arrow batches, actor pools for stateful
stages, `groupby`/`aggregate` for the wide steps, and a generic BSP
superstep driver with per-superstep Parquet checkpoints.

Nothing in this package calls ``ray.init()`` / ``ray.shutdown()`` — the
caller (driver, bench.py, pytest fixture) owns the Ray session.
"""

__version__ = "0.1.0"
