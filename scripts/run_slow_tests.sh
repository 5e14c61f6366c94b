#!/bin/sh
# The heavyweight half of the suite (generated-input property tests,
# streaming restart/recovery parity, recall sweeps) — excluded from the
# default `pytest tests/` selection by pytest.ini so the external verify
# window can finish, but still part of the release bar: run this before
# closing any round.
set -e
cd "$(dirname "$0")/.."
exec python -m pytest tests/ -m slow -q "$@"
