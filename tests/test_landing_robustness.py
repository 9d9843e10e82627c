"""Edge cases at the ingest boundary — the reference's runtime checks
(payload presence, get_stock.py:64-68; missing object → {}, :73-82)."""

import json
import os

from market_pulse_data_pipeline_spark.sources.landing import (
    landing_to_raw,
    read_landing_json,
    write_landing_doc,
)
from market_pulse_data_pipeline_spark.sources.alphavantage import make_fixture_doc


def test_doc_without_series_is_dropped(spark, tmp_path):
    """API error payloads ({'Note': ...} rate-limit responses etc.) carry
    no series — the presence filter must drop them, like the reference."""
    landing = str(tmp_path / "landing")
    write_landing_doc(landing, "GOOD", make_fixture_doc("GOOD", n_days=5))
    write_landing_doc(
        landing, "BAD", {"Note": "API call frequency exceeded", "Meta Data": None}
    )
    raw = landing_to_raw(read_landing_json(spark, landing))
    assert [r.symbol for r in raw.select("symbol").collect()] == ["GOOD"]


def test_malformed_json_file_is_tolerated(spark, tmp_path):
    landing = str(tmp_path / "landing")
    write_landing_doc(landing, "OK", make_fixture_doc("OK", n_days=5))
    os.makedirs(landing, exist_ok=True)
    with open(os.path.join(landing, "broken.json"), "w") as f:
        f.write("{not valid json at all")
    raw = landing_to_raw(read_landing_json(spark, landing))
    # permissive read: the corrupt document parses to nulls and the
    # presence filter drops it; the good doc survives
    assert [r.symbol for r in raw.select("symbol").collect()] == ["OK"]


def test_symbol_normalization_at_load(spark, tmp_path):
    """Object key keeps BRK.B; loaded symbol is the normalized BRK-B
    (SURVEY §2.7-a)."""
    landing = str(tmp_path / "landing")
    doc = make_fixture_doc("BRK.B", n_days=5)
    write_landing_doc(landing, "BRK.B", doc)
    raw = landing_to_raw(read_landing_json(spark, landing))
    assert [r.symbol for r in raw.collect()] == ["BRK-B"]
    assert os.path.exists(os.path.join(landing, "BRK.B.json"))


def test_empty_doc_json_roundtrip(spark, tmp_path):
    landing = str(tmp_path / "landing")
    with open(os.path.join(os.makedirs(landing) or landing, "empty.json"), "w") as f:
        json.dump({}, f)
    raw = landing_to_raw(read_landing_json(spark, landing))
    assert raw.count() == 0


def test_same_symbol_twice_in_one_batch_is_deduped(spark, tmp_path):
    """Two landed objects normalizing to the same symbol → one bronze row,
    the fresher document winning (mirrors the reference's serial MERGE
    order where the later object overwrites)."""
    landing = str(tmp_path / "landing")
    older = make_fixture_doc("AAPL", n_days=5, end="2025-10-10")
    newer = make_fixture_doc("AAPL", n_days=5, end="2025-10-16", base_price=888.0)
    write_landing_doc(landing, "AAPL", older)
    write_landing_doc(landing, "AAPL_refetch", newer)
    raw = landing_to_raw(read_landing_json(spark, landing))
    rows = raw.collect()
    assert len(rows) == 1
    assert rows[0].data["Meta Data"]["3. Last Refreshed"] == "2025-10-16"
