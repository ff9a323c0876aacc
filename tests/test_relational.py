"""Planted-fixture tests for relational/events operators whose
interesting behavior the synthetic sf tables don't exercise (every sf
user emits all event types, so the funnel never narrows there)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture(autouse=True)
def _ray(ray_session):
    yield


def _write_events(tmp_path, rows):
    t = pa.table({
        "event_id": pa.array(range(len(rows)), pa.int64()),
        "ts": pa.array([pd.Timestamp(r[1]) for r in rows],
                       pa.timestamp("us")),
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "event_type": pa.array([r[2] for r in rows], pa.string()),
        "value": pa.array([1.0] * len(rows), pa.float64()),
        "props": pa.array(["{}"] * len(rows), pa.string()),
    })
    d = tmp_path / "sf"
    d.mkdir(exist_ok=True)
    pq.write_table(t, str(d / "events.parquet"))
    return str(d)


def test_events_funnel_order_sensitivity(tmp_path):
    """The funnel must drop users whose steps happen out of order or
    stop early — the property a per-type count cannot express:
    user 1 completes view->click->purchase in order;
    user 2 clicks BEFORE its first view (click must not count);
    user 3 views and clicks but never purchases;
    user 4 purchases first, then views (reaches only step 0);
    user 5 has no view at all (reaches nothing)."""
    from sotohp_ray.pipelines.relational import events_funnel

    rows = [
        (1, "2026-01-01 10:00", "view"),
        (1, "2026-01-01 10:05", "click"),
        (1, "2026-01-01 10:10", "purchase"),
        (2, "2026-01-01 09:00", "click"),
        (2, "2026-01-01 09:30", "view"),
        (2, "2026-01-01 09:10", "purchase"),
        (3, "2026-01-01 08:00", "view"),
        (3, "2026-01-01 08:01", "click"),
        (4, "2026-01-01 07:00", "purchase"),
        (4, "2026-01-01 07:30", "view"),
        (5, "2026-01-01 06:00", "click"),
        (5, "2026-01-01 06:01", "purchase"),
    ]
    d = _write_events(tmp_path, rows)
    got = events_funnel(d).to_pandas().sort_values("step_idx")
    # view reached by users 1,2,3,4 = 4; click AFTER view by 1,3 = 2;
    # purchase AFTER that click by 1 only = 1
    assert list(got["n_users"]) == [4, 2, 1]
    # oracle agrees on the planted fixture
    import duckdb

    from sotohp_ray.pipelines.relational import events_funnel_sql

    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM '{d}/events.parquet'")
    sql = con.sql(events_funnel_sql()).df().sort_values("step_idx")
    assert list(sql["n_users"]) == [4, 2, 1]


def test_events_funnel_strictly_later(tmp_path):
    """A same-timestamp next step must NOT count (strictly-later
    contract, shared with the oracle's e.ts > p.t)."""
    from sotohp_ray.pipelines.relational import events_funnel

    rows = [
        (1, "2026-01-01 10:00", "view"),
        (1, "2026-01-01 10:00", "click"),  # same instant: not after
        (2, "2026-01-01 10:00", "view"),
        (2, "2026-01-01 10:01", "click"),
    ]
    d = _write_events(tmp_path, rows)
    got = events_funnel(d).to_pandas().sort_values("step_idx")
    assert list(got["n_users"]) == [2, 1, 0]
