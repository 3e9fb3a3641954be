"""Event-time encoding proofing for every streaming entry point.

The driver's testdata has shipped the events ``ts`` column under three
different parquet encodings across rounds: TIMESTAMP(NANOS) (surfaced as
bigint under spark.sql.legacy.parquet.nanosAsLong), TIMESTAMP_NTZ
(isAdjustedToUTC=false), and TIMESTAMP/LTZ (isAdjustedToUTC=true).  The
r5 switch to NTZ broke ``withWatermark`` in v34 with
EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE and left v31/v32 as latent failures
(VERDICT r5 #1/#6).  This matrix pins every events-reading streaming
entry point against all three encodings AND asserts the results are
bit-identical across encodings, so a future driver-side type change
cannot silently re-break a rotated-out query.

v33 (stream_ingest_documents) is exercised elsewhere
(test_streaming_ingest.py) and reads the documents table, which has no
event-time column — the encoding matrix does not apply to it.
"""

from __future__ import annotations

import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lawlm_spark.streaming.events import (
    run_stream_stream_join,
    run_stream_stream_outer_join,
    run_streaming_cms,
    run_streaming_dedup,
    run_streaming_enriched_counts,
    run_streaming_hll_registers,
    run_streaming_session_counts,
    run_streaming_window_counts,
    run_streaming_windowed_hll,
)
from lawlm_spark.streaming.stateful import (
    run_stateful_running_totals,
    run_stateful_timeout_sessions,
)

SF_DIR = "/root/testdata/sf0.001"

# parquet type per encoding; arrow casts naive->tz-aware by assuming the
# naive values are UTC wall-clock, which matches the UTC session pin
_ENCODINGS = {
    "nanos": pa.timestamp("ns"),
    "ntz": pa.timestamp("us"),
    "ltz": pa.timestamp("us", tz="UTC"),
}

_ENTRY_POINTS = {
    "v14s_window_counts": run_streaming_window_counts,
    "v30_enriched_counts": run_streaming_enriched_counts,
    "v31_stream_stream_join": run_stream_stream_join,
    "v32_streaming_dedup": run_streaming_dedup,
    "v34_session_counts": run_streaming_session_counts,
    "v36_stateful_totals": run_stateful_running_totals,
    "v38_stream_outer_join": run_stream_stream_outer_join,
    "v41_stateful_timeout": run_stateful_timeout_sessions,
    # streaming sketches: v54 reads no event time (hash-only) but goes
    # through _events_stream's schema pin; v57 windows on ts; v64
    # hash-only like v54 — all three must survive any ts encoding
    "v54_streaming_hll": run_streaming_hll_registers,
    "v57_windowed_hll": run_streaming_windowed_hll,
    "v64_streaming_cms": run_streaming_cms,
}


@pytest.fixture(scope="module")
def encoded_dirs(tmp_path_factory):
    """Three copies of the sf0.001 events table, one per ts encoding,
    each alongside the customer dim (v30 joins it)."""
    src = pq.read_table(os.path.join(SF_DIR, "events.parquet"))
    idx = src.schema.get_field_index("ts")
    dirs = {}
    for enc, ty in _ENCODINGS.items():
        d = tmp_path_factory.mktemp(f"events_{enc}")
        cast = src.set_column(idx, pa.field("ts", ty), src.column("ts").cast(ty))
        pq.write_table(
            cast.replace_schema_metadata(None), str(d / "events.parquet")
        )
        shutil.copy(
            os.path.join(SF_DIR, "customer.parquet"), str(d / "customer.parquet")
        )
        dirs[enc] = str(d)
    return dirs


@pytest.mark.parametrize("name", sorted(_ENTRY_POINTS))
def test_entry_point_invariant_under_ts_encoding(spark, encoded_dirs, name):
    fn = _ENTRY_POINTS[name]
    results = {
        enc: sorted(map(tuple, fn(spark, d).collect()))
        for enc, d in encoded_dirs.items()
    }
    assert len(results["ntz"]) > 0
    assert results["nanos"] == results["ntz"] == results["ltz"]
