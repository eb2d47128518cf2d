from .extract_stage import (  # noqa: F401
    ExtractText,
    SegmentStats,
    tokenize_stats_batch,
)
