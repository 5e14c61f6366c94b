from .views import px_bars, fx_bars, prd_converted, src_px_usd, src_usd_fx
from .flagship import flagship
from .etl import run_etl, run_etl_with_retry, with_retry
from .report import report_frames
from .render import publish_report, render_report
from .curation import curate, curation_report

__all__ = [
    "px_bars",
    "fx_bars",
    "prd_converted",
    "src_px_usd",
    "src_usd_fx",
    "flagship",
    "run_etl",
    "run_etl_with_retry",
    "with_retry",
    "report_frames",
    "render_report",
    "publish_report",
    "curate",
    "curation_report",
]
