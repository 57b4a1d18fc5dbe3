#!/usr/bin/env python3
"""One-off test-fixture generator (dev tool, not a runtime dependency):
writes a genuine parquet TIMESTAMP(NANOS) events file so TablesDriftSpec
exercises the real legacy-flag decode path (nanosAsLong) end-to-end,
not just the LongType branch it produces. Checked-in output:
src/test/resources/events_nanos/events.parquet/part-0.parquet
"""
import pyarrow as pa, pyarrow.parquet as pq
# 2021-03-04T05:06:07.123456789Z as epoch nanos
ns = 1614834367123456789
t = pa.table({
    "event_id": pa.array([1], pa.int64()),
    "user_id": pa.array([7], pa.int64()),
    "event_type": pa.array(["signup"], pa.string()),
    "value": pa.array([1.0], pa.float64()),
    "props": pa.array(["{}"], pa.string()),
    "ts": pa.array([ns], pa.timestamp("ns")),
})
pq.write_table(t, "src/test/resources/events_nanos/events.parquet/part-0.parquet",
               version="2.6", coerce_timestamps=None)
print(pq.read_metadata("src/test/resources/events_nanos/events.parquet/part-0.parquet").schema)
