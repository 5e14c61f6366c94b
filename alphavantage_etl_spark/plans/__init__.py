from .views import px_bars, fx_bars, prd_converted, src_px_usd, src_usd_fx
from .flagship import flagship
from .etl import run_etl
from .report import report_frames
from .curation import curate, curation_report

__all__ = [
    "px_bars",
    "fx_bars",
    "prd_converted",
    "src_px_usd",
    "src_usd_fx",
    "flagship",
    "run_etl",
    "report_frames",
    "curate",
    "curation_report",
]
