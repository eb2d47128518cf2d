"""Training-data pipeline operators beyond the reference's surface:
text analysis, deduplication (exact / MinHash-LSH / SimHash / n-gram
Jaccard / embedding cosine), similarity search, multimodal stubs.

All expressed Ray-Data-first: vectorized ``map_batches`` stages +
``groupby`` exchanges with explicit keys.
"""

from . import ann, dedup, multimodal, text, windows  # noqa: F401
