#!/usr/bin/env python3
"""Dev tool: annotate a GenFixtures events table's int64 `ts` column as
parquet TIMESTAMP(NANOS), matching the driver testdata's physical schema.

Spark cannot write the NANOS annotation (its timestamps are micros), so
GenFixtures emits raw int64 nanoseconds; this post-step rewrites the
column metadata so DuckDB sees the same TIMESTAMP_NS the driver tables
have and the oracle SQL runs unchanged. The Spark read side is identical
either way: `Tables.events` reads NANOS-annotated parquet via
`nanosAsLong=true`, which yields the very int64 the raw column already
is.

Usage: fix_events_ns.py <fixtures_dir>   (e.g. /root/repo/fixtures/sf1)
"""
import glob
import os
import shutil
import sys

import pyarrow as pa
import pyarrow.parquet as pq

d = sys.argv[1]
path = os.path.join(d, "events.parquet")
if os.path.isfile(path):
    t = pq.read_table(path)
else:
    t = pa.concat_tables(
        pq.read_table(f) for f in sorted(glob.glob(os.path.join(path, "*.parquet"))))
if not pa.types.is_int64(t.schema.field("ts").type):
    print(f"ts already {t.schema.field('ts').type}; nothing to do")
    sys.exit(0)
i = t.schema.get_field_index("ts")
t = t.set_column(i, "ts", t.column("ts").cast(pa.timestamp("ns")))
tmp = path + ".tmp"
pq.write_table(t, tmp)
if os.path.isdir(path):
    shutil.rmtree(path)
else:
    os.remove(path)
os.rename(tmp, path)
print(f"rewrote {path}: ts -> timestamp[ns], {t.num_rows} rows")
