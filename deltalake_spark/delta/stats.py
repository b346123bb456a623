"""Per-file statistics from Parquet footers.

The reference computes numRecords/minValues/maxValues/nullCount in a single
pass while columnarizing rows (/root/reference/src/delta/table.ts:1062-1147,
FileStats src/delta/types.ts:346-351). Spark already wrote row-group stats
into the Parquet footer, so we aggregate them driver-side with pyarrow —
no second data pass.
"""

from __future__ import annotations

import datetime as _dt
import json
from typing import Any

import pyarrow.parquet as pq


def _json_safe(v: Any) -> Any:
    if isinstance(v, (_dt.datetime, _dt.date)):
        return v.isoformat()
    if isinstance(v, bytes):
        try:
            return v.decode("utf-8")
        except UnicodeDecodeError:
            return v.hex()
    if isinstance(v, float) and (v != v):  # NaN
        return None
    return v


def collect_file_stats(file_path: str) -> dict[str, Any]:
    """Aggregate footer row-group stats → Delta-style stats dict."""
    meta = pq.ParquetFile(file_path).metadata
    num_records = meta.num_rows
    mins: dict[str, Any] = {}
    maxs: dict[str, Any] = {}
    nulls: dict[str, int] = {}

    for rg in range(meta.num_row_groups):
        group = meta.row_group(rg)
        for ci in range(group.num_columns):
            col = group.column(ci)
            # only top-level leaves; nested paths carry dots
            name = col.path_in_schema
            if "." in name:
                continue
            st = col.statistics
            if st is None:
                continue
            if st.null_count is not None:
                nulls[name] = nulls.get(name, 0) + st.null_count
            if st.has_min_max:
                mn, mx = _json_safe(st.min), _json_safe(st.max)
                if name not in mins or (mn is not None and mn < mins[name]):
                    mins[name] = mn
                if name not in maxs or (mx is not None and mx > maxs[name]):
                    maxs[name] = mx

    return {
        "numRecords": num_records,
        "minValues": mins,
        "maxValues": maxs,
        "nullCount": nulls,
    }


def stats_json(file_path: str) -> str:
    return json.dumps(collect_file_stats(file_path), separators=(",", ":"))
