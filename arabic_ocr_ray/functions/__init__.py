"""Training-data pipeline operators beyond the reference's surface:
text analysis, deduplication (exact / MinHash-LSH / SimHash / n-gram
Jaccard / embedding cosine), similarity search, top-k, windowed and
as-of operators, sketches, multimodal header probing.

All expressed Ray-Data-first: vectorized ``map_batches`` stages +
``groupby`` exchanges with explicit keys (fixed hash partitions for
per-key folds — never a python call per key).
"""

from . import (  # noqa: F401
    ann,
    dedup,
    joins,
    multimodal,
    sketch,
    text,
    topk,
    windows,
)
