"""Table-level check operators — the capabilities jio cannot have (it never
sees more than one document, SURVEY.md §2.3): single-pass column stats,
uniqueness without a full shuffle, broadcast referential checks, KS/PSI
distribution drift, plus the training-data-pipeline operators (dedup,
similarity, text quality)."""

from .stats import column_profile_exact, column_stats, stats_exprs
from .uniqueness import duplicate_ids, uniqueness_check
from .referential import referential_check
from .drift import drift_check, snapshot
from .dedup import (dedup_exact, embedding_dup_pairs, exact_duplicates,
                    minhash_lsh_pairs, ngram_jaccard_pairs, simhash_pairs)
from .similarity import brute_force_topk, ivf_topk, lsh_dup_pairs, lsh_topk
from .schema import (CLIPS_SCHEMA_CONTRACT, assert_schema_contract,
                     schema_contract_violations)

__all__ = [
    "CLIPS_SCHEMA_CONTRACT", "assert_schema_contract",
    "schema_contract_violations",
    "column_profile_exact", "column_stats", "stats_exprs",
    "duplicate_ids", "uniqueness_check",
    "referential_check",
    "snapshot", "drift_check",
    "exact_duplicates", "dedup_exact", "ngram_jaccard_pairs",
    "minhash_lsh_pairs", "simhash_pairs", "embedding_dup_pairs",
    "brute_force_topk", "lsh_topk", "lsh_dup_pairs", "ivf_topk",
]
