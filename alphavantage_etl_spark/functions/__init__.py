from .rounding import money_round
from .windows import sma
from .calendar import business_day_calendar, busday_count_expr
from .vectors import cosine_similarity, dot, l2_norm
from .text import token_count, quality_score, fingerprint_sha256, simhash64

__all__ = [
    "money_round",
    "sma",
    "business_day_calendar",
    "busday_count_expr",
    "cosine_similarity",
    "dot",
    "l2_norm",
    "token_count",
    "quality_score",
    "fingerprint_sha256",
    "simhash64",
]
