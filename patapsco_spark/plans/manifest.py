"""Stage manifests + per-partition lineage — the Spark analogue of
patapsco's ``.complete`` markers and part_N bookkeeping
(/root/reference/patapsco/pipeline.py:60-64, job.py:576-610,903-908).

Every stage directory gets a ``manifest.json`` next to Spark's ``_SUCCESS``:

    {
      "stage": "postings",
      "config": {...},              # provenance (artifact config parity)
      "metrics": {...},             # counts, like patapsco's timing/report
      "lineage": [                  # one row per output partition/file
         {"file": "...", "rows": N, "min_key": ..., "max_key": ...}, ...
      ]
    }

``is_complete`` gates a stage: a completed stage is skipped on resume and its
Parquet output is read instead — exact resume after partial failure, because
Spark task outputs are atomic (files only appear on commit) and the manifest
is written last.
"""

from __future__ import annotations

import json
import time
import pathlib
from typing import Any

from . import fsio

# underscore prefix: Spark/Hadoop file indexes skip `_*` files (like
# _SUCCESS), so the manifest can live inside the Parquet directory
MANIFEST = "_manifest.json"


def write_manifest(path: str | pathlib.Path, stage: str,
                   config: dict | None = None,
                   metrics: dict | None = None,
                   lineage: list[dict] | None = None) -> None:
    doc = {
        "stage": stage,
        "config": config or {},
        "metrics": metrics or {},
        "lineage": lineage or [],
        "written_at": time.time(),  # provenance; is_complete ignores it
    }
    # fsio routes scheme-qualified paths (hdfs://, s3a://, file:) through
    # the Hadoop FileSystem API — round-4 defect #1: this layer was
    # POSIX-only, voiding resume on object-store index paths
    fsio.mkdirs(str(path))
    fsio.write_text_atomic(f"{path}/{MANIFEST}",
                           json.dumps(doc, indent=1, default=str))


def read_manifest(path: str | pathlib.Path) -> dict[str, Any] | None:
    text = fsio.read_text(f"{path}/{MANIFEST}")
    return None if text is None else json.loads(text)


def is_complete(path: str | pathlib.Path, stage: str,
                config: dict | None = None) -> bool:
    """A stage is resumable-complete iff its manifest exists and, when a
    config is given, the recorded config matches (the reference refuses to
    reuse artifacts built under a different config — helpers.py:192-229)."""
    m = read_manifest(path)
    if m is None or m.get("stage") != stage:
        return False
    if config is not None and m.get("config") != _jsonable(config):
        return False
    return True


def _jsonable(d: dict) -> dict:
    return json.loads(json.dumps(d, default=str))


def file_lineage(df_rows: list[dict]) -> list[dict]:
    """Normalize collected per-file stats into lineage records."""
    out = []
    for r in df_rows:
        rec = dict(r)
        if "file" in rec and rec["file"]:
            rec["file"] = rec["file"].rsplit("/", 1)[-1]
        out.append(rec)
    return out
