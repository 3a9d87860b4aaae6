"""load_table must read identical instants regardless of which parquet
timestamp encoding the driver's generator emitted that round. Three
flavors have shipped so far (r1-r5): TIMESTAMP(NANOS), timestamp[us]
with isAdjustedToUTC=false (Spark infers TIMESTAMP_NTZ), and plain
UTC-adjusted micros. This test writes the SAME instants in all three
encodings and asserts load_table normalizes every one to identical
plain-TIMESTAMP rows — so the next encoding flip is a no-op instead of
a round-4-style eight-query breakage."""

import sys
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from ct_mapreduce_spark.sources.tables import load_table

# instants chosen so nanos -> micros truncation is visible: the nanos
# file carries .123456789, the micro files the truncated .123456
_MICROS = [
    1_704_067_200_123_456,  # 2024-01-01T00:00:00.123456Z
    1_704_070_800_000_001,
    1_704_074_400_999_999,
]
_NANO_TAILS = [789, 0, 999]  # extra sub-micro digits for the nanos file


def _base_columns():
    return {
        "event_id": pa.array([1, 2, 3], pa.int64()),
        "user_id": pa.array([10, 20, 30], pa.int64()),
        "event_type": pa.array(["a", "b", "c"], pa.string()),
    }


def _write(path: str, ts_array: pa.Array) -> None:
    cols = _base_columns()
    cols["ts"] = ts_array
    pq.write_table(pa.table(cols), path, version="2.6")


def test_load_table_normalizes_all_timestamp_encodings(spark, tmp_path):
    flavors = {}

    # 1. TIMESTAMP(NANOS): extra sub-micro digits must TRUNCATE (not
    #    round) to match DuckDB's nanos->micros behavior
    d = tmp_path / "nanos"
    d.mkdir()
    _write(
        str(d / "events.parquet"),
        pa.array(
            [m * 1000 + t for m, t in zip(_MICROS, _NANO_TAILS)],
            pa.timestamp("ns"),
        ),
    )
    flavors["nanos"] = str(d)

    # 2. micros, isAdjustedToUTC=false (tz-naive -> Spark TIMESTAMP_NTZ)
    d = tmp_path / "ntz"
    d.mkdir()
    _write(str(d / "events.parquet"), pa.array(_MICROS, pa.timestamp("us")))
    flavors["ntz_micros"] = str(d)

    # 3. plain UTC-adjusted micros (the unproblematic encoding)
    d = tmp_path / "utc"
    d.mkdir()
    _write(
        str(d / "events.parquet"), pa.array(_MICROS, pa.timestamp("us", tz="UTC"))
    )
    flavors["utc_micros"] = str(d)

    results = {}
    for name, sf_dir in flavors.items():
        df = load_table(spark, "events", sf_dir)
        # normalized to PLAIN timestamp: every event-time consumer
        # (withWatermark, window(), interval arithmetic) accepts it
        assert dict(df.dtypes)["ts"] == "timestamp", (name, df.dtypes)
        results[name] = sorted(
            (r.event_id, r.user_id, r.event_type, r.ts) for r in df.collect()
        )

    assert results["nanos"] == results["ntz_micros"] == results["utc_micros"], (
        results
    )
    # and the instants are the intended ones (truncated, not rounded)
    micros = [int(r[3].timestamp() * 1_000_000 + 0.5) for r in results["utc_micros"]]
    assert micros == _MICROS
