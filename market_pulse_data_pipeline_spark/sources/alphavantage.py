"""Alpha Vantage ingest (reference operator S1) + deterministic fixtures.

The reference fetches ``TIME_SERIES_DAILY`` per symbol with a 15 s sleep
(free-tier rate limit, get_stock.py:110-115) — an external constraint that
forces the fetch to stay driver-side and serial. Everything from the
landing zone onward is executor-parallel.

Network access is not available (and not needed) in this environment, so
``fetch_stock_data`` is the real shape behind an import-try, and tests use
``make_fixture_doc`` — deterministic synthetic documents matching the API
shape at get_stock.py:64,89-97 (leaf numerics are strings).
"""

from __future__ import annotations

import json
import time

from market_pulse_data_pipeline_spark.functions.scalars import SYMBOL_NORMALIZATION

# the reference's fixed symbol list (get_stock.py:24-27)
TOP_10_STOCKS = [
    "AAPL", "MSFT", "GOOGL", "AMZN", "META",
    "TSLA", "NVDA", "BRK.B", "V", "JPM",
]

_API_URL = "https://www.alphavantage.co/query"


def fetch_stock_data(symbol: str, api_key: str, timeout: int = 30) -> dict:
    """S1 — GET TIME_SERIES_DAILY (outputsize=full); payload kept only if
    the series key is present (get_stock.py:53-71). Driver-side by design."""
    try:
        import requests  # noqa: PLC0415
    except ImportError as e:  # pragma: no cover
        raise NotImplementedError("requests not available in this environment") from e
    resp = requests.get(
        _API_URL,
        params={
            "function": "TIME_SERIES_DAILY",
            "symbol": symbol,
            "outputsize": "full",
            "apikey": api_key,
        },
        timeout=timeout,
    )
    resp.raise_for_status()
    data = resp.json()
    if "Time Series (Daily)" not in data:
        return {}
    return data


def fetch_all(symbols: list[str], api_key: str, sleep_s: float = 15.0) -> dict[str, dict]:
    """Serial loop + sleep, mirroring get_stock.py:110-115. The rate limit
    is the throughput ceiling; do not parallelize the fetch."""
    out = {}
    for raw_symbol in symbols:
        symbol = SYMBOL_NORMALIZATION.get(raw_symbol, raw_symbol)
        doc = fetch_stock_data(symbol, api_key)
        if doc:
            out[raw_symbol] = doc  # keyed by UN-normalized symbol (§2.7-a)
        time.sleep(sleep_s)
    return out


# --- deterministic fixtures (FIXTURES.md §A1) --------------------------------


def _trading_weekdays(end: str, n: int) -> list[str]:
    """n weekdays ending at `end` (YYYY-MM-DD), newest first."""
    from datetime import date, timedelta  # noqa: PLC0415

    y, m, d = map(int, end.split("-"))
    cur = date(y, m, d)
    days = []
    while len(days) < n:
        if cur.weekday() < 5:
            days.append(cur.isoformat())
        cur -= timedelta(days=1)
    return days


def make_fixture_doc(
    symbol: str,
    n_days: int = 60,
    end: str = "2025-10-16",
    base_price: float | None = None,
    zero_open_on: str | None = None,
    skip_dates: tuple[str, ...] = (),
) -> dict:
    """One synthetic TIME_SERIES_DAILY document; fully deterministic in
    (symbol, n_days, end). Prices are strings with 2-4 decimals, volumes
    integers, per the API shape."""
    seed = sum(ord(c) * (i + 1) for i, c in enumerate(symbol))
    base = base_price if base_price is not None else 50.0 + (seed % 400)
    series: dict[str, dict[str, str]] = {}
    for i, day in enumerate(_trading_weekdays(end, n_days)):
        if day in skip_dates:
            continue
        # deterministic walk, no RNG
        px = base + ((seed * (i + 3)) % 97) * 0.13 + i * 0.01
        o = round(px, 2)
        h = round(px * 1.02 + 0.11, 4)
        lo = round(px * 0.985, 3)
        c = round(px * (1.0 + (((seed + i) % 7) - 3) * 0.004), 2)
        vol = 1_000_000 + ((seed * 7919 * (i + 1)) % 900_000_000)
        if zero_open_on == day:
            o = 0.0
        series[day] = {
            "1. open": f"{o}",
            "2. high": f"{h}",
            "3. low": f"{lo}",
            "4. close": f"{c}",
            "5. volume": str(vol),
        }
    return {
        "Meta Data": {
            "1. Information": "Daily Prices (open, high, low, close) and Volumes",
            "2. Symbol": symbol,
            "3. Last Refreshed": end,
            "4. Output Size": "Full size",
            "5. Time Zone": "US/Eastern",
        },
        "Time Series (Daily)": series,
    }


def merge_series_doc(existing: dict, new: dict) -> dict:
    """J3 at the document level — the reference's dict merge
    (get_stock.py:88-97): new API data overwrites same-date entries, older
    dates are retained; Meta Data always taken from the newest fetch."""
    if not existing:
        return new
    merged = dict(existing.get("Time Series (Daily)", {}))
    merged.update(new.get("Time Series (Daily)", {}))
    return {"Meta Data": new.get("Meta Data", {}), "Time Series (Daily)": merged}


def write_fixture_landing(landing_dir: str, docs: dict[str, dict]) -> None:
    from market_pulse_data_pipeline_spark.sources.landing import write_landing_doc  # noqa: PLC0415

    for key, doc in docs.items():
        write_landing_doc(landing_dir, key, doc)


def default_fixture_docs(n_days: int = 60) -> dict[str, dict]:
    """The FIXTURES.md §A1 spec: 10 symbols, BRK.B loaded as BRK-B inside
    the doc (exercises the dim_stock miss branch), one zero-open row
    (NULLIF path), one symbol with a gap date."""
    docs = {}
    days = _trading_weekdays("2025-10-16", n_days)
    for sym in TOP_10_STOCKS:
        loaded = SYMBOL_NORMALIZATION.get(sym, sym)
        docs[sym] = make_fixture_doc(
            loaded,
            n_days=n_days,
            zero_open_on=days[5] if sym == "AAPL" and n_days > 5 else None,
            skip_dates=(days[10],) if sym == "MSFT" and n_days > 10 else (),
        )
    return docs


def doc_json(doc: dict) -> str:
    return json.dumps(doc, indent=2)
