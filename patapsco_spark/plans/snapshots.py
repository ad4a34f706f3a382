"""Snapshot / restore — ES snapshot repositories for a Spark-native index.

A repository directory holds ONE shared file pool plus one manifest per
snapshot:

    repo/
      files/<relative path>        the pooled data files
      snapshots/<name>.json        {"files": [[relpath, size], ...]}

Incrementality rides on the engine's commit discipline: committed DATA
files are IMMUTABLE — every overwrite, append, compaction, or resharding
materializes NEW part files (Spark part files carry fresh UUIDs; new
generations/segments add new dirs), so a pooled file at the same
relative path never changes content. A snapshot therefore copies only
the files the pool has not seen; unchanged shards of a 100 TB index cost
ZERO bytes per snapshot, exactly like ES's segment-level incremental
snapshots. A same-path size mismatch means the immutability contract
was broken — the snapshot refuses loudly rather than silently pooling
one content for two snapshots' claims.

METADATA files (basename starting with ``_``: the ``_manifest.json``
commit markers, ``_SUCCESS``) are the deliberate exception — the commit
protocol REPLACES them in place atomically, so they are tiny and
mutable by design. Each snapshot stores its own copies under
``meta/<name>/`` instead of the shared pool (they ARE the point-in-time
state: the manifest says which shards are live).

Restore copies a manifest's files into a FRESH index directory (never
over a live one — the ES restore-to-new-index discipline); with the
aliases layer (plans/aliases.py) the cutover to a restored index is one
CAS swap. All IO routes through fsio, so ``s3a://``/``hdfs://`` repos
work the same as local ones.
"""

from __future__ import annotations

import json
import time

from . import fsio


def _snap_path(repo_dir: str, name: str) -> str:
    return f"{repo_dir.rstrip('/')}/snapshots/{name}.json"


def _pool_path(repo_dir: str, rel: str) -> str:
    return f"{repo_dir.rstrip('/')}/files/{rel}"


def list_snapshots(repo_dir: str) -> list[str]:
    snaps = f"{repo_dir.rstrip('/')}/snapshots"
    if not fsio.exists(snaps):
        return []
    return sorted(rel[:-5] for rel, _sz in fsio.list_files(snaps)
                  if rel.endswith(".json"))


def snapshot(index_path: str, repo_dir: str, name: str) -> dict:
    """Incremental snapshot of a committed index. Returns
    {"files": N, "copied": M, "bytes_copied": B} — M < N whenever the
    pool already held unchanged files from earlier snapshots."""
    if fsio.exists(_snap_path(repo_dir, name)):
        raise ValueError(
            f"snapshot {name!r} already exists in {repo_dir!r} — "
            "snapshots are immutable, pick a new name")
    files = fsio.list_files(index_path)
    if not files:
        raise ValueError(f"nothing to snapshot under {index_path!r}")
    data = [(rel, sz) for rel, sz in files
            if not rel.rsplit("/", 1)[-1].startswith("_")]
    meta = [(rel, sz) for rel, sz in files
            if rel.rsplit("/", 1)[-1].startswith("_")]
    pooled = {rel: sz for rel, sz in
              fsio.list_files(f"{repo_dir.rstrip('/')}/files")} \
        if fsio.exists(f"{repo_dir.rstrip('/')}/files") else {}
    copied = bytes_copied = 0
    for rel, sz in data:
        have = pooled.get(rel)
        if have is None:
            fsio.copy_file(f"{index_path.rstrip('/')}/{rel}",
                           _pool_path(repo_dir, rel))
            copied += 1
            bytes_copied += sz
        elif have != sz:
            raise RuntimeError(
                f"pool file {rel!r} has size {have} but the index's has "
                f"{sz}: a committed file was rewritten in place, breaking "
                "the immutability contract incremental snapshots rely on")
    meta_root = f"{repo_dir.rstrip('/')}/meta/{name}"
    for rel, sz in meta:
        fsio.copy_file(f"{index_path.rstrip('/')}/{rel}",
                       f"{meta_root}/{rel}")
        copied += 1
        bytes_copied += sz
    fsio.write_text_atomic(
        _snap_path(repo_dir, name),
        json.dumps({"created": time.time(), "index_path": index_path,
                    "files": data, "meta": meta}, indent=1))
    return {"files": len(files), "copied": copied,
            "bytes_copied": bytes_copied}


def restore(repo_dir: str, name: str, dst_index_path: str) -> dict:
    """Materialize a snapshot into a FRESH directory. Refuses a non-empty
    destination: restoring over a live index is how you corrupt both."""
    text = fsio.read_text(_snap_path(repo_dir, name))
    if text is None:
        raise KeyError(
            f"unknown snapshot {name!r}; repo has {list_snapshots(repo_dir)}")
    if fsio.exists(dst_index_path) and fsio.list_files(dst_index_path):
        raise ValueError(
            f"restore destination {dst_index_path!r} is not empty — "
            "restore to a fresh directory and cut over via an alias swap")
    doc = json.loads(text)
    for rel, _sz in doc["files"]:
        fsio.copy_file(_pool_path(repo_dir, rel),
                       f"{dst_index_path.rstrip('/')}/{rel}")
    meta_root = f"{repo_dir.rstrip('/')}/meta/{name}"
    for rel, _sz in doc.get("meta", []):
        fsio.copy_file(f"{meta_root}/{rel}",
                       f"{dst_index_path.rstrip('/')}/{rel}")
    return {"files": len(doc["files"]) + len(doc.get("meta", []))}


def delete_snapshot(repo_dir: str, name: str, gc: bool = True) -> dict:
    """Drop a snapshot manifest; with ``gc``, also remove pool files no
    remaining snapshot references (the ES repository-cleanup semantics)."""
    path = _snap_path(repo_dir, name)
    if not fsio.exists(path):
        raise KeyError(f"unknown snapshot {name!r}")
    fsio.delete(path, recursive=False)
    meta_root = f"{repo_dir.rstrip('/')}/meta/{name}"
    if fsio.exists(meta_root):
        fsio.delete(meta_root, recursive=True)
    removed = 0
    if gc:
        live: set[str] = set()
        for other in list_snapshots(repo_dir):
            doc = json.loads(fsio.read_text(_snap_path(repo_dir, other)))
            live.update(rel for rel, _sz in doc["files"])
        pool_root = f"{repo_dir.rstrip('/')}/files"
        if fsio.exists(pool_root):
            for rel, _sz in fsio.list_files(pool_root):
                if rel not in live:
                    fsio.delete(_pool_path(repo_dir, rel), recursive=False)
                    removed += 1
    return {"gc_removed": removed}
