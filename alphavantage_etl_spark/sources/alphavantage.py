"""Alpha Vantage REST/JSON source (reference IO1/IO2, av_etl.py:22-27,113-118).

Spark has no native REST source; the correct shape at any scale is
driver-side fetch (or, at 100 TB, payloads landed to object storage and
``spark.read.json``) followed by a distributed parse. The parse is the part
worth engineering: the wire format is a JSON map-of-maps
``{"Time Series (Daily)": {"YYYY-MM-DD": {"1. open": "...", ...}}}`` with
every leaf a STRING (SURVEY.md section 1.1); ``payload_to_df`` re-expresses
the reference's transpose+reverse+cast (av_etl.py:76-81,121-133) as
from_json -> explode -> cast, keeping the whole parse in Catalyst.

The HTTP fetch itself is import-gated: this container has no network and no
``requests``; the function documents the exact call shape for deployments.
"""

from __future__ import annotations

import json
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

API_URL = "https://www.alphavantage.co/query"

# Wire field names -> (clean column name, Spark type). FX payloads carry no
# volume (av_etl.py:121); equity payloads carry all five.
EQUITY_FIELDS = {
    "1. open": ("open", "double"),
    "2. high": ("high", "double"),
    "3. low": ("low", "double"),
    "4. close": ("close", "double"),
    "5. volume": ("volume", "long"),
}
FX_FIELDS = {k: v for k, v in EQUITY_FIELDS.items() if k != "5. volume"}

SERIES_KEYS = {
    "TIME_SERIES_DAILY": "Time Series (Daily)",
    "FX_DAILY": "Time Series FX (Daily)",
}


def fetch_payload(params: dict[str, str]) -> dict[str, Any]:
    """GET the API (reference ``pull_data_from_api``). Requires network +
    ``requests`` — absent here, so this raises with the documented call."""
    try:
        import requests  # noqa: F401
    except ImportError as e:  # pragma: no cover
        raise NotImplementedError(
            f"no network/requests in this container; deployment shape: "
            f"requests.get({API_URL!r}, params={{**params, 'apikey': ...}}).json()"
        ) from e
    return requests.get(API_URL, params=params, timeout=30).json()  # pragma: no cover


def payload_to_df(
    spark: SparkSession,
    payload: dict[str, Any],
    function: str = "TIME_SERIES_DAILY",
) -> DataFrame:
    """Distributed parse of one API payload into a typed daily-bars frame.

    The payload enters Spark as a single JSON string row; from_json with a
    map<string,map<string,string>> schema + explode replaces the reference's
    driver-side ``DataFrame(...).transpose()`` — at scale the same plan runs
    over millions of landed payload files via ``spark.read.text``.

    Output: date (date), then typed clean columns (open..close[, volume]),
    ascending by date — the reference's post-``iloc[::-1]`` orientation as
    an explicit sort key (SURVEY.md S4).
    """
    series_key = SERIES_KEYS[function]
    fields = EQUITY_FIELDS if function == "TIME_SERIES_DAILY" else FX_FIELDS
    series = payload.get(series_key, {})
    row = spark.createDataFrame([(json.dumps(series),)], "js string")
    exploded = row.select(
        F.explode(F.from_json("js", "map<string,map<string,string>>")).alias(
            "date_s", "m"
        )
    )
    return exploded.select(
        F.to_date("date_s").alias("date"),
        *[
            F.col("m")[wire].cast(dtype).alias(clean)
            for wire, (clean, dtype) in fields.items()
        ],
    ).orderBy("date")
