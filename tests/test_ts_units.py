"""The driver regenerates testdata between rounds and has shipped the
events ``ts`` column both as parquet TIMESTAMP(NANOS) and TIMESTAMP(MICROS).
The streaming sources must detect the unit from the footer, not assume one:
a hard-coded nanos divide turned every event time into 1970 when the data
switched to micros (round-4 regression).  Locks both branches of
``streaming.windows._ts_field_spec`` end-to-end through a bounded stream.
"""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from rawdata_client_provider_gcs_spark.streaming import windows as W

# one event at 2024-01-01T00:00:00Z + 90s, one at +2100s (same content in
# every unit; 30-min session gap => both land in one session window)
_BASE_S = 1_704_067_200
_OFFSETS_S = (90, 2100)


def _write_events(path: str, ts_type, scale: int) -> None:
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([1, 2], pa.int64()),
                "ts": pa.array(
                    [(_BASE_S + o) * scale for o in _OFFSETS_S], pa.int64()
                ).cast(ts_type),
                "user_id": pa.array([7, 7], pa.int64()),
                "event_type": pa.array(["click", "click"]),
                "value": pa.array([1.0, 2.0], pa.float64()),
                "props": pa.array([None, None], pa.string()),
            }
        ),
        path,
    )


@pytest.mark.parametrize(
    "ts_type,scale",
    [
        (pa.timestamp("ns"), 10**9),
        (pa.timestamp("us"), 10**6),
        (pa.timestamp("ms"), 10**3),
        (pa.int64(), 10**9),  # legacy: raw int64 nanos
    ],
    ids=["ns", "us", "ms", "int64-ns"],
)
def test_stream_events_any_ts_unit(spark, tmp_path, ts_type, scale):
    d = str(tmp_path)
    _write_events(os.path.join(d, "events.parquet"), ts_type, scale)
    out = W.run_available_now_append(
        W.stream_events(spark, d).select("event_id", "ts"),
        f"t_units_{scale}_{str(ts_type).replace('[', '_').replace(']', '')}",
    ).collect()
    got = {r["event_id"]: r["ts"] for r in out}
    assert sorted(got) == [1, 2]
    for eid, off in zip((1, 2), _OFFSETS_S):
        ts = got[eid]
        assert ts.year == 2024 and ts.month == 1 and ts.day == 1
        assert ts.hour * 3600 + ts.minute * 60 + ts.second == off
