from .views import px_bars, fx_bars, prd_converted, src_px_usd, src_usd_fx
from .flagship import flagship

__all__ = ["px_bars", "fx_bars", "prd_converted", "src_px_usd", "src_usd_fx", "flagship"]
