from raylinkgraph.algos.pagerank import PageRank  # noqa: F401
from raylinkgraph.algos.wcc import WCC  # noqa: F401
from raylinkgraph.algos.cdlp import CDLP  # noqa: F401
