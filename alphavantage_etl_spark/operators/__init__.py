from .bars import ohlcv_bars
from .incremental import high_watermark, new_rows, merge_incremental
from .asof import asof_join
from .dedup import dedup_exact, minhash_near_dups
from .similarity import cosine_topk
from .sessionize import sessionize

__all__ = [
    "ohlcv_bars",
    "high_watermark",
    "new_rows",
    "merge_incremental",
    "asof_join",
    "dedup_exact",
    "minhash_near_dups",
    "cosine_topk",
    "sessionize",
]
