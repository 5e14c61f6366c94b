"""Regenerate the driver-window registry in queries.py from the pinned
compressed-rotation policy (ROTATION.md, "Window-throughput policy from
r8").

The window each round is, in order:
  (a) every oracle-backed query with NO driver CORRECTNESS row yet,
      newest additions first;
  (b) the remaining slots, round-robin over the FULL oracle-backed
      surface ordered by oldest-last-GREEN-row first (no green row ever
      sorts oldest of all; ties: SURVEY.md §2 reference-parity keys
      first, then registration order).

Everything else moves to EXTRA_QUERIES / EXTRA_ORACLES (same strict
local oracle gate via ALL_ORACLES, still benchmarked). Rows-only
diagnostics (no oracle) always live in EXTRA.

Usage: python scripts/rotate_window.py [--apply]
Prints the computed 50-entry window; with --apply, rewrites the four
registry dict blocks in alphavantage_etl_spark/queries.py in place.
"""

from __future__ import annotations

import glob
import json
import re
import sys

QUERIES_PY = "alphavantage_etl_spark/queries.py"
WINDOW = 50

# SURVEY.md §2 reference-parity keys (tiebreak priority in group (b))
PARITY = {
    "q_scan_project", "q_cast_types", "q_json_explode", "q_join_convert",
    "q_anti_new_rows", "q_filter_today", "q_weekday_filter", "q_busday_gap",
    "q_latest_row", "q_topn_recent", "q_sma_window", "q_sma_partitioned",
    "q_ohlc_daily", "q_incremental_merge", "q_asof_partitioned",
    "q_interval_join", "q_asof_rate",
}


def load_history():
    last_green: dict[str, int] = {}
    has_row: set[str] = set()
    for path in sorted(glob.glob("CORRECTNESS_r*.json")):
        rnd = int(re.search(r"r(\d+)", path).group(1))
        for q, v in json.load(open(path)).items():
            has_row.add(q)
            if v.get("hash_match"):
                last_green[q] = max(last_green.get(q, 0), rnd)
    return last_green, has_row


def compute_window():
    sys.path.insert(0, ".")
    from alphavantage_etl_spark.queries import ALL_ORACLES, ALL_QUERIES

    reg_order = {n: i for i, n in enumerate(ALL_QUERIES)}
    oracle_backed = list(ALL_ORACLES)
    last_green, has_row = load_history()

    # (a) never driver-checked, newest registration first
    fresh = sorted(
        (q for q in oracle_backed if q not in has_row),
        key=lambda q: -reg_order[q],
    )
    # (b) oldest-last-green first; no-green-yet (red-only history) oldest
    rest = sorted(
        (q for q in oracle_backed if q not in fresh),
        key=lambda q: (
            last_green.get(q, 0),
            0 if q in PARITY else 1,
            reg_order[q],
        ),
    )
    window = (fresh + rest)[:WINDOW]
    extra = [q for q in ALL_QUERIES if q not in set(window)]
    return window, extra, len(fresh), last_green


def emit(window, extra, n_fresh, last_green):
    src = open(QUERIES_PY).read()
    sql_of = dict(re.findall(r'"(q_\w+)": (SQL_\w+),', src))

    def q_block(names, header):
        lines = [header]
        lines += [f'    "{n}": {n},' for n in names]
        return "\n".join(lines)

    def o_block(names, header):
        lines = [header]
        lines += [f'    "{n}": {sql_of[n]},' for n in names if n in sql_of]
        return "\n".join(lines)

    fresh, rb = window[:n_fresh], window[n_fresh:]
    never_green = [q for q in rb if q not in last_green]
    q_hdr = (
        "QUERIES: dict[str, QueryFn] = {\n"
        "    # r8 window under the pinned compressed rotation\n"
        "    # (ROTATION.md): (a) never-driver-checked first, newest\n"
        f"    # additions first ({len(fresh)} entries), then (b) the full\n"
        "    # oracle-backed surface oldest-last-green-row first (the\n"
        f"    # {len(never_green)} red-only entries sort oldest of all;\n"
        "    # ties: SURVEY §2 parity keys, then registration order)."
    )
    e_hdr = (
        "EXTRA_QUERIES: dict[str, QueryFn] = {\n"
        "    # Outside the r8 driver window (compressed rotation,\n"
        "    # ROTATION.md). Every oracle-backed entry stays under the\n"
        "    # strict local gate via ALL_ORACLES and in bench.py's\n"
        "    # headline set; rows-only diagnostics live here always."
    )
    or_hdr = (
        "ORACLES: dict[str, str] = {\n"
        "    # mirrors QUERIES order exactly (the driver zips them)"
    )
    eo_hdr = (
        "EXTRA_ORACLES: dict[str, str] = {\n"
        "    # oracle-backed entries currently outside the driver window"
    )

    blocks = {
        "QUERIES": q_block(window, q_hdr) + "\n}",
        "EXTRA_QUERIES": q_block(extra, e_hdr) + "\n}",
        "ORACLES": o_block(window, or_hdr) + "\n}",
        "EXTRA_ORACLES": o_block(extra, eo_hdr) + "\n}",
    }
    for name in ["QUERIES", "EXTRA_QUERIES", "ORACLES", "EXTRA_ORACLES"]:
        pat = re.compile(
            rf"^{name}: dict\[str, \w+\] = \{{.*?^\}}",
            re.DOTALL | re.MULTILINE,
        )
        assert pat.search(src), f"block {name} not found"
        src = pat.sub(lambda _m: blocks[name], src, count=1)
    open(QUERIES_PY, "w").write(src)


if __name__ == "__main__":
    window, extra, n_fresh, last_green = compute_window()
    for i, q in enumerate(window):
        tag = "NEW" if i < n_fresh else f"lg=r{last_green.get(q, '-')}"
        print(f"{i + 1:3d} {q:28s} {tag}")
    print(f"... {len(extra)} extra entries")
    if "--apply" in sys.argv:
        emit(window, extra, n_fresh, last_green)
        print("applied to", QUERIES_PY)
