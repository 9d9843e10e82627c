"""Position-based attribution credit rule on a handcrafted event log
(the registered query carries the DuckDB oracle at scale): exact
milli-credit split for 1-, 2-, and k>=3-touch paths, remainder pinned
to the earliest middle touch."""

import datetime
import os

from market_pulse_data_pipeline_spark.queries.events import (
    attribution_position_credit,
)


def _mk_events(spark, tmp_path):
    t0 = datetime.datetime(2024, 1, 1, 0, 0, 0)

    def ev(eid, minute, user, etype):
        return (
            eid,
            t0 + datetime.timedelta(minutes=minute),
            user,
            etype,
            1.0,
            "{}",
        )

    rows = [
        # user 1: 5 touches in the 60-min lookback before the purchase
        # at t=100 → k=5: first 400, last 400, middles 200 DIV 3 = 66
        # each, remainder 2 to the EARLIEST middle (the t=55 click)
        ev(1, 45, 1, "view"),
        ev(2, 55, 1, "click"),
        ev(3, 65, 1, "signup"),
        ev(4, 75, 1, "click"),
        ev(5, 85, 1, "view"),
        ev(6, 100, 1, "purchase"),
        # user 2: 2 touches → 500/500
        ev(7, 10, 2, "click"),
        ev(8, 20, 2, "view"),
        ev(9, 30, 2, "purchase"),
        # user 3: 1 touch → 1000; plus a touch OUTSIDE the lookback
        # (95 min before) that must not join
        ev(10, 0, 3, "signup"),
        ev(11, 90, 3, "click"),
        ev(12, 95, 3, "purchase"),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, value double, props string",
    )
    sf_dir = os.path.join(str(tmp_path), "attr_sf")
    df.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(sf_dir, "events.parquet")
    )
    return sf_dir


def test_credit_split_exact(spark, tmp_path):
    sf = _mk_events(spark, tmp_path)
    out = {
        r.channel: (r.n_touches, r.credit_milli)
        for r in attribution_position_credit(spark, sf).collect()
    }
    # user 1: view 400 (first) + 400 (last); click 66+2 (earliest
    # middle) + 66; signup 66. user 2: click 500, view 500.
    # user 3: click 1000 (single touch); the t=0 signup is outside the
    # 60-min lookback and earns nothing.
    assert out == {
        "view": (3, 1300),
        "click": (4, 1634),
        "signup": (1, 66),
    }
    assert sum(c for _, c in out.values()) == 3000  # 1000 per conversion
