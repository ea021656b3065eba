"""Regression tests for the relational join operators (pipelines/relational.py)."""

import datetime
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from language_identification_ray.pipelines.relational import (
    events_asof_purchase,
    events_purchases_within_hour,
)


@pytest.fixture()
def events_dir(tmp_path):
    """Tiny events table: user 1 has clicks AND purchases; user 2 has clicks
    but ZERO purchases (the ASOF LEFT JOIN null branch); user 3 purchases only."""
    base = datetime.datetime(2024, 1, 1, 12, 0, 0)

    def ts(minutes):
        return base + datetime.timedelta(minutes=minutes)

    rows = [
        # user 1: purchase before + after clicks
        (1, 1, ts(0), "purchase", 10.0),
        (2, 1, ts(5), "click", 0.0),
        (3, 1, ts(10), "purchase", 20.0),
        (4, 1, ts(15), "click", 0.0),
        # user 2: clicks only — no purchases at all
        (5, 2, ts(1), "click", 0.0),
        (6, 2, ts(2), "click", 0.0),
        # user 3: purchases only — no clicks
        (7, 3, ts(3), "purchase", 5.0),
    ]
    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "user_id": pa.array([r[1] for r in rows], pa.int64()),
            "ts": pa.array([r[2] for r in rows], pa.timestamp("ns")),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([r[4] for r in rows], pa.float64()),
        }
    )
    pq.write_table(tbl, tmp_path / "events.parquet")
    return str(tmp_path)


def test_asof_user_without_purchases_gets_null(ray_session, events_dir):
    df = events_asof_purchase(events_dir).to_pandas().sort_values("event_id")
    # user 1: click@5 sees purchase@0 (10.0); click@15 sees purchase@10 (20.0)
    by_id = df.set_index("event_id")
    assert by_id.loc[2, "last_purchase_value"] == 10.0
    assert by_id.loc[4, "last_purchase_value"] == 20.0
    # user 2's clicks must appear with NULL, not crash with IndexError
    assert set(df["event_id"]) == {2, 4, 5, 6}
    assert np.isnan(by_id.loc[5, "last_purchase_value"])
    assert np.isnan(by_id.loc[6, "last_purchase_value"])


def test_purchases_within_hour_user_without_purchases(ray_session, events_dir):
    df = events_purchases_within_hour(events_dir).to_pandas().set_index("event_id")
    assert df.loc[5, "n_purchases_1h"] == 0
    assert df.loc[6, "n_purchases_1h"] == 0
    assert df.loc[2, "n_purchases_1h"] == 1
    assert df.loc[4, "n_purchases_1h"] == 2
