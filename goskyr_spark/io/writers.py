"""Sinks. The reference's writers (stdout/file/api,
/root/reference/internal/output/) emit per-item JSON with Go's encoder
settings: SetEscapeHTML(false), two-space indent, map keys sorted,
time.Time as RFC3339Nano. ``items_to_json_array`` / ``item_to_json``
replicate those bytes; the Spark-scale path writes the same rows as
parquet via DataFrameWriter (pipeline.py) and keeps these byte-parity
writers for fixture comparison and small exports.
"""

from __future__ import annotations

import json
from datetime import datetime

from ..kernels.gocompat import go_rfc3339


def _jsonable(v):
    if isinstance(v, datetime):
        return go_rfc3339(v)
    return v


def item_to_json(item) -> str:
    """One item, Go-encoder-shaped (stdout writer, stdout.go:24-50)."""
    clean = {k: _jsonable(v) for k, v in item.items()}
    return json.dumps(clean, indent=2, ensure_ascii=False, sort_keys=True)


def items_to_json_array(items) -> str:
    """All items as one indented JSON array (file writer, file.go:42-82)."""
    clean = [{k: _jsonable(v) for k, v in item.items()} for item in items]
    return json.dumps(clean, indent=2, ensure_ascii=False, sort_keys=True)


def write_items_file(items, filedir) -> str:
    """FileWriter.Write: <filedir>/items.json."""
    import os

    os.makedirs(filedir, exist_ok=True)
    path = os.path.join(filedir, "items.json")
    with open(path, "w", encoding="utf-8") as f:
        f.write(items_to_json_array(items))
    return path


def write_status_file(statuses, filedir) -> str:
    """FileWriter.WriteStatus: <filedir>/status.json."""
    import os

    os.makedirs(filedir, exist_ok=True)
    path = os.path.join(filedir, "status.json")
    with open(path, "w", encoding="utf-8") as f:
        json.dump(statuses, f, indent=2, ensure_ascii=False, default=_jsonable)
    return path
