from raylinkgraph.sources.pages import generate_pages_parquet, read_pages  # noqa: F401
