"""Table-level check operators — the capabilities jio cannot have (it never
sees more than one document, SURVEY.md §2.3): single-pass column stats,
uniqueness without a full shuffle, broadcast referential checks, KS/PSI
distribution drift, plus the training-data-pipeline operators (dedup,
similarity, text quality)."""

from .stats import column_stats, stats_exprs
from .uniqueness import duplicate_ids, uniqueness_check
from .referential import referential_check
from .drift import drift_check, snapshot

__all__ = [
    "column_stats", "stats_exprs",
    "duplicate_ids", "uniqueness_check",
    "referential_check",
    "snapshot", "drift_check",
]
