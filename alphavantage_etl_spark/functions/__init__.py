from .rounding import money_round
from .windows import sma, sma_exact_cents
from .calendar import business_day_calendar, busday_count_expr
from .vectors import cosine_similarity, dot, l2_norm
from .text import (
    token_count,
    token_count_bpe,
    quality_score,
    with_quality_score,
    fingerprint_sha256,
    rolling_fingerprint,
    simhash64,
    lang_id,
    lang_scores,
)

__all__ = [
    "money_round",
    "sma",
    "sma_exact_cents",
    "business_day_calendar",
    "busday_count_expr",
    "cosine_similarity",
    "dot",
    "l2_norm",
    "token_count",
    "token_count_bpe",
    "quality_score",
    "with_quality_score",
    "fingerprint_sha256",
    "rolling_fingerprint",
    "simhash64",
    "lang_id",
    "lang_scores",
]
