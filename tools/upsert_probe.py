"""RETIRED (r17). This was the r15 scale probe behind SCALING_r15.json
`upsert_scale_probe_sf10` (sparse-batch upsert cost vs the full-table
rewrite a bucket-oblivious MERGE would pay). It measured the r15/r16
marker-file + copytree machinery, which the r17 snapshot-pointer commit
removed (operators/layout.py) — the marker files and the clone copytree
it instruments no longer exist, so running it would crash.

The question it answered ("does upsert cost track TOUCHED buckets, not
table size?") is answered for the pointer-era arms by
`tools/upsert_inplace_probe.py` (SCALING_r17.json
`upsert_pointer_probe_sf10`): staged-written vs hard-linked bytes per
batch at 32/512 buckets, plus the re-bucket half-split arm. The r15
artifact remains valid history for the machinery that existed then.
"""
from __future__ import annotations

import sys

sys.exit(
    "tools/upsert_probe.py is retired (r17): the marker-file/copytree "
    "machinery it instrumented was replaced by the snapshot-pointer "
    "commit. Use tools/upsert_inplace_probe.py instead."
)
