"""Index aliases — the Elasticsearch zero-downtime reindex idiom.

Queries address a NAME ("prod-webpages"); the name resolves to a
concrete index path through a tiny JSON registry. Reindexing builds the
new index under a new path, then ONE atomic swap repoints the alias —
readers either see the old index or the new one, never a half state,
because the registry write goes through ``fsio.write_text_atomic``
(temp-file + rename, the same commit primitive the manifests use, so it
works on any Hadoop-FS scheme). The reference has no alias layer at all
(each patapsco run owns its output dir); at web scale the swap IS how
an analyzer change ships without a read outage.

Concurrency contract: ``swap_alias`` is compare-and-set — the caller
says what it believes the alias currently points at, and a concurrent
swap that got there first makes the call fail loudly instead of silently
clobbering (the lost-update race two blind writers would have). The
last-write-wins ``set_alias`` is for first assignment and tests.
"""

from __future__ import annotations

import contextlib
import json
import pathlib

from . import fsio

ALIASES = "_aliases.json"


@contextlib.contextmanager
def _registry_lock(registry_dir: str):
    """Serialize whole-registry read-modify-writes. The CAS in swap_alias
    protects same-alias races; this lock closes the OTHER race — two
    concurrent writers of DIFFERENT aliases interleaving load/replace and
    dropping one update. flock on a sidecar for local registries; on
    object-store schemes no lock primitive exists, so concurrent
    DIFFERENT-alias writers must be externally serialized (one deployer),
    which the docstring contract states — same trade the manifest
    replacement layer documents in fsio."""
    if fsio.has_scheme(registry_dir):
        yield
        return
    import fcntl
    p = pathlib.Path(registry_dir)
    p.mkdir(parents=True, exist_ok=True)
    with open(p / (ALIASES + ".lock"), "w") as lock:
        fcntl.flock(lock, fcntl.LOCK_EX)
        try:
            yield
        finally:
            fcntl.flock(lock, fcntl.LOCK_UN)


def _registry_path(registry_dir: str) -> str:
    return f"{registry_dir.rstrip('/')}/{ALIASES}"


def _load(registry_dir: str) -> dict[str, str]:
    text = fsio.read_text(_registry_path(registry_dir))
    return json.loads(text) if text else {}


def list_aliases(registry_dir: str) -> dict[str, str]:
    """name → index path, a copy of the committed registry state."""
    return _load(registry_dir)


def resolve_alias(registry_dir: str, name: str) -> str:
    """The index path an alias points at; loud on unknown names (a
    silent None would surface later as an unrelated read error)."""
    aliases = _load(registry_dir)
    if name not in aliases:
        raise KeyError(
            f"unknown alias {name!r}; registry at "
            f"{_registry_path(registry_dir)} has {sorted(aliases) or '[]'}")
    return aliases[name]


def set_alias(registry_dir: str, name: str, index_path: str) -> None:
    """First assignment / unconditional repoint (last-write-wins).
    For a reindex cutover use ``swap_alias`` — it refuses to clobber a
    concurrent writer's swap."""
    with _registry_lock(registry_dir):
        aliases = _load(registry_dir)
        aliases[name] = index_path
        fsio.write_text_atomic(
            _registry_path(registry_dir),
            json.dumps(aliases, indent=1, sort_keys=True))


def swap_alias(registry_dir: str, name: str, new_path: str,
               expect: str) -> None:
    """Atomic reindex cutover with a compare-and-set guard: repoint
    ``name`` to ``new_path`` only if it currently points at ``expect``.
    A stale expectation (someone else swapped first, or the alias was
    never set) raises instead of silently undoing their cutover."""
    with _registry_lock(registry_dir):
        aliases = _load(registry_dir)
        current = aliases.get(name)
        if current != expect:
            raise RuntimeError(
                f"alias {name!r} points at {current!r}, not the expected "
                f"{expect!r} — refusing the swap (concurrent cutover?)")
        aliases[name] = new_path
        fsio.write_text_atomic(
            _registry_path(registry_dir),
            json.dumps(aliases, indent=1, sort_keys=True))


def drop_alias(registry_dir: str, name: str) -> None:
    with _registry_lock(registry_dir):
        aliases = _load(registry_dir)
        if name not in aliases:
            raise KeyError(f"unknown alias {name!r}")
        del aliases[name]
        fsio.write_text_atomic(
            _registry_path(registry_dir),
            json.dumps(aliases, indent=1, sort_keys=True))
