"""Ray-Data-native record-linkage engine.

A from-scratch reimplementation of the capabilities of the
HGCN-name-disambiguation reference (see /root/repo/SURVEY.md) as a
block-parallel Ray Data pipeline over Common-Crawl-style Parquet web
pages: extract -> normalize/tokenize -> blocking (name key + MinHash/LSH,
salted for hot keys) -> per-block heterogeneous-graph scoring (embedding +
graph-constrained agglomerative clustering inside a stateful actor pool)
-> distributed transitive closure -> partitioned Parquet clusters.

All stages are `ray.data.Dataset` transforms; nothing here calls
`ray.init()` (the caller owns the Ray session).
"""

from hgcn_name_disambiguation_ray.config import LinkageConfig

__all__ = ["LinkageConfig"]
__version__ = "0.1.0"
