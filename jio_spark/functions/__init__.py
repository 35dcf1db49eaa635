from .text import (doc_fingerprint, lang_scores, language_id, quality_metrics,
                   token_count_regex, token_count_ws, word_ngrams, words)
from .vectors import cosine_similarity, dot, l2_norm, normalize

__all__ = [
    "words", "word_ngrams", "token_count_ws", "token_count_regex",
    "quality_metrics", "language_id", "lang_scores", "doc_fingerprint",
    "dot", "l2_norm", "normalize", "cosine_similarity",
]
