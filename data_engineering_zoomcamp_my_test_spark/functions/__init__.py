from .exprs import dmoney_sum, money, money_avg, ts_lit
from .text import (
    english_stopword_hits,
    normalized_text,
    quality_score_cols,
    token_count,
    tokens,
)
from .vectors import cosine_similarity, dot_product, l2_norm

__all__ = [
    "dmoney_sum",
    "money",
    "money_avg",
    "ts_lit",
    "english_stopword_hits",
    "normalized_text",
    "quality_score_cols",
    "token_count",
    "tokens",
    "cosine_similarity",
    "dot_product",
    "l2_norm",
]
