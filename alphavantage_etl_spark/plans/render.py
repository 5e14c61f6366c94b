"""HTML report renderer + publish sink — the reference's consumption layer
(IO7), closing the last user-visible capability.

The reference assembles a datapane ``dp.App`` (data_viz.py:165-190): a
title block, two chart-select blocks (Candlestick/OHLC/Line views of the
price and FX series), the dual-axis comparison plot, and a select of three
data tables — then saves it to ``report/index.html`` and pushes that
directory to a GitHub Pages repo (to_github_pages.py:89-107).

This module reproduces the same document structure WITHOUT the datapane/
plotly dependency chain: every block renders as semantic HTML (``<details>``
groups stand in for ``dp.Select``, tables carry the exact series each chart
consumed). The engine boundary is explicit:

- everything upstream of ``render_report`` is a lazy Spark plan
  (``plans.report.report_frames``);
- ``render_report`` is the DRIVER EDGE: it limits each frame to
  ``max_rows`` (the frames are date-DESC, so this is "most recent N" — a
  TakeOrderedAndProject, never a full collect) and calls ``toPandas()``;
- ``publish_report`` mirrors ``report.save(path=.../index.html)``
  (to_github_pages.py:106). The git push itself needs a remote + token
  (``AV_ETL_GITHUB_TOKEN``/``AV_ETL_REMOTE_REPO`` in the reference) and is
  environment-gated here exactly like the live REST fetch: the directory
  written by ``publish_report`` is the push-ready Pages workdir.
"""

from __future__ import annotations

import html as _html
import os
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame

if TYPE_CHECKING:  # pandas only at the driver edge
    import pandas as pd

# chart kinds the reference offers per series (create_fig calls,
# data_viz.py:135-140) and the columns each kind actually consumes
CHART_KINDS = ("Candlestick chart", "OHLC chart", "Line chart")


def _fmt(v) -> str:
    if v is None:
        return ""
    if isinstance(v, float):
        return f"{v:.6g}"
    return _html.escape(str(v))


def _table(pdf: "pd.DataFrame", caption: str) -> str:
    head = "".join(f"<th>{_html.escape(str(c))}</th>" for c in pdf.columns)
    rows = "".join(
        "<tr>" + "".join(f"<td>{_fmt(v)}</td>" for v in row) + "</tr>"
        for row in pdf.itertuples(index=False, name=None)
    )
    return (
        f'<table class="data"><caption>{_html.escape(caption)}</caption>'
        f"<thead><tr>{head}</tr></thead><tbody>{rows}</tbody></table>"
    )


def _select(blocks: list[tuple[str, str]]) -> str:
    """``dp.Select`` analog: labelled, individually collapsible blocks."""
    out = []
    for i, (label, body) in enumerate(blocks):
        open_attr = " open" if i == 0 else ""
        out.append(
            f"<details{open_attr}><summary>{_html.escape(label)}</summary>"
            f"{body}</details>"
        )
    return f'<div class="select">{"".join(out)}</div>'


def _chart_columns(pdf: "pd.DataFrame", kind: str, value_col: str) -> "pd.DataFrame":
    """The column set each chart kind consumes: OHLC-style charts read the
    full bar; the line chart reads close + the two SMA trend lines."""
    if kind == "Line chart":
        keep = ["date", value_col] + [c for c in pdf.columns if c.startswith("sma")]
    else:
        keep = [
            c
            for c in pdf.columns
            if c in ("date", "open", "high", "low", "close", value_col)
        ]
    return pdf[[c for c in keep if c in pdf.columns]]


def render_report(
    frames: dict[str, DataFrame],
    symbol: str = "PX",
    currency: str = "FX",
    max_rows: int = 250,
) -> str:
    """Assemble the full report HTML from ``plans.report.report_frames``.

    Document structure mirrors the reference's ``dp.App`` block list
    (data_viz.py:165-190): title, price-chart select, FX-chart select,
    comparison section, data-table select. ``max_rows`` bounds the driver
    edge — each frame is already date-DESC, so ``limit`` takes the most
    recent rows as a TakeOrderedAndProject, regardless of corpus size.
    """

    def edge(name: str) -> "pd.DataFrame":
        return frames[name].limit(max_rows).toPandas()

    px, fx, conv = edge("px"), edge("fx"), edge("converted")
    px_t, fx_t, conv_t = edge("px_table"), edge("fx_table"), edge("converted_table")
    comparison = edge("comparison")

    sym, ccy = symbol.upper(), currency.upper()
    fig1_title = f"{sym} price in USD"
    fig2_title = f"USD/{ccy} exchange rate"
    fig3_title = f"{sym} price in {ccy} and USD"

    parts = [
        "<!DOCTYPE html><html><head><meta charset='utf-8'>",
        f"<title>{_html.escape(sym)} price report</title>",
        "<style>"
        "#container{margin:auto;text-align:center;height:50px}"
        "h1{color:#444444}"
        "table.data{border-collapse:collapse;margin:1em 0}"
        "table.data td,table.data th{border:1px solid #ccc;padding:2px 8px}"
        "</style></head><body>",
        f'<div id="container"><h1>{_html.escape(sym)} price report</h1></div>',
        f"<h2>{_html.escape(fig1_title)}</h2>",
        _select(
            [
                (kind, _table(_chart_columns(px, kind, "close"), f"{fig1_title} — {kind}"))
                for kind in CHART_KINDS
            ]
        ),
        f"<h2>{_html.escape(fig2_title)}</h2>",
        _select(
            [
                (kind, _table(_chart_columns(fx, kind, "close"), f"{fig2_title} — {kind}"))
                for kind in CHART_KINDS
            ]
        ),
        f"<h2>{_html.escape(fig3_title)}</h2>",
        # the dual-axis ComparisonFigure's two series, plus the converted
        # frame's SMA trend columns (data_viz.py:143-161)
        _table(comparison, f"{fig3_title} — close_usd vs close_fx"),
        _table(
            conv[["date"] + [c for c in conv.columns if c.startswith("sma")]],
            f"{fig3_title} — SMA trend",
        ),
        "<h2>Data</h2>",
        _select(
            [
                (f"{sym} price in USD", _table(px_t, f"{sym} price in USD")),
                (f"USD/{ccy} exchange rate", _table(fx_t, f"USD/{ccy} exchange rate")),
                (
                    f"{sym} price comparison in both currencies",
                    _table(conv_t, f"{sym} price comparison in both currencies"),
                ),
            ]
        ),
        "</body></html>",
    ]
    return "".join(parts)


def publish_report(html: str, report_dir: str) -> str:
    """Write ``index.html`` into the Pages working directory — the
    ``report.save(path=os.path.join(report_path, 'index.html'))`` step of
    to_github_pages.py:106. Returns the written path.

    The surrounding git pull/commit/push (to_github_pages.py:89-107) needs
    a live remote and an access token and is deliberately NOT performed
    here: the written directory is the push-ready artifact, and any
    orchestrator (CI job, cron) can run ``git push`` on it.
    """
    os.makedirs(report_dir, exist_ok=True)
    path = os.path.join(report_dir, "index.html")
    with open(path, "w", encoding="utf-8") as f:
        f.write(html)
    return path
