"""Run-config front-end: YAML/JSON/dict with the reference's config-language
semantics (/root/reference/patapsco/config.py):

- **string interpolation** ``{a.b.c}`` — values referencing other keys by
  dotted path, resolved depth-first top-to-bottom (config.py:366-406);
  unresolvable references are collected as errors, not silently kept
- **section inheritance** ``inherit: other.section`` — deep-copy parent,
  merge child over it (dicts merge recursively, lists replace), multi-level
  allowed if parents are defined first (config.py:444-490)
- **overrides** ``set key.path=value`` applied after load (config.py:409-441)
- **imports** ``imports: [other.yml, ...]`` — multi-file composition: each
  listed file is loaded relative to the importing file's directory, resolved
  recursively (imports may have imports), and merged into the conf with the
  IMPORTED values winning on conflicts — the reference's merge direction
  (config.py:224-235,493-500). Imports run before inheritance/overrides/
  interpolation, like the reference's read path (config.py:115-120).

The validated result feeds :class:`RunConfig`, the Spark engine's mirror of
the reference's pydantic ``RunnerConfig`` (/root/reference/patapsco/schema.py:253-264).
"""

from __future__ import annotations

import copy
import json
import re
from dataclasses import dataclass, field
from typing import Any

from ..config import ConfigError, IndexConfig, RetrieveConfig, TextConfig

_INTERP = re.compile(r"{([A-Za-z0-9_.]+)}")


def _get_path(conf: dict, dotted: str) -> Any:
    cur: Any = conf
    for part in dotted.split("."):
        if not isinstance(cur, dict) or part not in cur:
            raise KeyError(dotted)
        cur = cur[part]
    return cur


def _merge_dicts(base: dict, over: dict) -> dict:
    """Child keys override parent; nested dicts merge; lists replace."""
    for k, v in over.items():
        if isinstance(v, dict) and isinstance(base.get(k), dict):
            _merge_dicts(base[k], v)
        else:
            base[k] = v
    return base


def interpolate(conf: dict) -> tuple[dict, list[str]]:
    """Resolve ``{dotted.path}`` references depth-first, top-to-bottom.
    Returns (config, unresolved-reference errors)."""
    errors: list[str] = []

    def resolve_value(value, top):
        if isinstance(value, str) and _INTERP.search(value):
            def sub(m):
                try:
                    return str(_get_path(top, m.group(1)))
                except KeyError:
                    errors.append(m.group(0))
                    return m.group(0)
            return _INTERP.sub(sub, value)
        if isinstance(value, list):
            return [resolve_value(v, top) for v in value]
        if isinstance(value, dict):
            for k in list(value):
                value[k] = resolve_value(value[k], top)
            return value
        return value

    resolve_value(conf, conf)
    return conf, errors


def apply_inheritance(conf: dict) -> dict:
    """Process ``inherit: parent.path`` sections (parents first, like the
    reference: config.py:444-490)."""
    def process(node: dict, top: dict) -> None:
        for key, value in list(node.items()):
            if isinstance(value, dict):
                process(value, top)
                if "inherit" in value:
                    try:
                        parent = _get_path(top, value["inherit"])
                    except KeyError:
                        raise ConfigError(
                            f"Cannot inherit from {value['inherit']} as it does not exist")
                    merged = copy.deepcopy(parent)
                    _merge_dicts(merged, value)
                    del merged["inherit"]
                    node[key] = merged
            elif isinstance(value, list):
                for entry in value:
                    if isinstance(entry, dict):
                        process(entry, top)
    process(conf, conf)
    return conf


def apply_overrides(conf: dict, overrides: dict[str, Any] | None) -> dict:
    """``{"a.b.c": v}`` — set dotted paths, creating intermediate dicts."""
    for dotted, v in (overrides or {}).items():
        cur = conf
        parts = dotted.split(".")
        for p in parts[:-1]:
            cur = cur.setdefault(p, {})
        cur[parts[-1]] = v
    return conf


def _convert_boolean_strings(d: Any) -> Any:
    """Reference parity (config.py:_convert_boolean_strings): the string
    values 'true'/'on'/'yes' and 'false'/'off'/'no' become booleans,
    recursively — applied to JSON input only, exactly like the reference
    (its JSON reader calls the conversion, config.py:192; its YAML reader
    never does, so quoted YAML scalars like ``lang: "no"`` keep PyYAML's
    standard quoting escape hatch)."""
    if isinstance(d, dict):
        for k, v in d.items():
            d[k] = _convert_boolean_strings(v)
        return d
    if isinstance(d, list):
        # the reference recurses into dict entries of lists but leaves bare
        # strings in lists untouched (config.py list branch) — match that
        return [_convert_boolean_strings(v) if isinstance(v, (dict, list))
                else v for v in d]
    if isinstance(d, str):
        if d in ("true", "on", "yes"):
            return True
        if d in ("false", "off", "no"):
            return False
    return d


def _parse_text(text: str) -> Any:
    try:
        parsed = json.loads(text)
    except json.JSONDecodeError:
        try:
            import yaml
            return yaml.safe_load(text)
        except ImportError as e:  # pragma: no cover
            raise ConfigError(f"not JSON and pyyaml unavailable: {e}")
    return _convert_boolean_strings(parsed)


def apply_imports(conf: dict, base_dir: str | None,
                  _visited: frozenset[str] = frozenset()) -> dict:
    """Process ``imports: [file, ...]``: load each file relative to the
    importing file's directory, recurse into its own imports, then merge it
    into ``conf`` with the imported values winning (the reference merges the
    partial over the main conf — config.py:231,493-500). Import cycles
    (a.yml → b.yml → a.yml) raise a ConfigError naming the cycle instead of
    dying in an opaque RecursionError (the reference shares the flaw; a
    clear error is cheap)."""
    if "imports" not in conf:
        return conf
    imports = conf.pop("imports")
    if base_dir is None:
        raise ConfigError("imports require a file-based config (relative "
                          "paths resolve against the importing file)")
    import os
    for rel in imports:
        path = os.path.abspath(os.path.join(base_dir, str(rel)))
        if path in _visited:
            raise ConfigError(f"import cycle detected at {path} "
                              f"(already imported in this chain)")
        try:
            with open(path) as f:
                partial = _parse_text(f.read())
        except OSError as e:
            raise ConfigError(f"cannot import config {path}: {e}")
        if not isinstance(partial, dict):
            raise ConfigError(f"imported config {path} must be a mapping")
        apply_imports(partial, os.path.dirname(path), _visited | {path})
        _merge_dicts(conf, partial)
    return conf


def load_config(source: str | dict, overrides: dict[str, Any] | None = None) -> dict:
    """Load + import + inherit + override + interpolate. ``source`` is a
    dict, a JSON string, a YAML string, or a path ending in .yml/.yaml/.json."""
    base_dir = None
    if isinstance(source, dict):
        conf = copy.deepcopy(source)
    else:
        text = source
        if source.endswith((".yml", ".yaml", ".json")):
            import os
            base_dir = os.path.dirname(os.path.abspath(source))
            with open(source) as f:
                text = f.read()
        conf = _parse_text(text)
    if not isinstance(conf, dict):
        raise ConfigError("config must be a mapping")
    conf = apply_imports(conf, base_dir)
    conf = apply_inheritance(conf)
    conf = apply_overrides(conf, overrides)
    conf, errors = interpolate(conf)
    if errors:
        raise ConfigError(f"unresolved config references: {sorted(set(errors))}")
    return conf


# ---------------------------------------------------------------------------
# Typed run config
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class DocumentsConfig:
    input_path: str = ""
    input_format: str = "parquet"      # parquet | webpages | hc4 | tsv
    lang: str = "eng"
    id_col: str = "id"
    text_col: str = "text"
    lang_col: str | None = "lang"


@dataclass(frozen=True)
class TopicsConfig:
    input_path: str = ""
    input_format: str = "hc4"          # hc4 | tsv
    lang: str = "eng"
    source: str = "original"
    fields: tuple[str, ...] = ("title",)
    qrels_lang: str | None = None
    # retrieval batching: 0 = auto (driver-resident plan list for small
    # topic sets, chunked queries-as-DataFrame path past `auto_chunk_above`
    # topics); >0 forces the chunked path with that chunk size
    chunk_size: int = 0
    auto_chunk_above: int = 50_000


@dataclass(frozen=True)
class ScoreConfig:
    qrels_path: str = ""
    metrics: tuple[str, ...] = ("map", "ndcg", "ndcg_prime", "recall_100", "P_10")


@dataclass(frozen=True)
class RunConfig:
    name: str
    path: str                           # run output directory
    documents: DocumentsConfig = field(default_factory=DocumentsConfig)
    index: IndexConfig = field(default_factory=IndexConfig)
    topics: TopicsConfig = field(default_factory=TopicsConfig)
    retrieve: RetrieveConfig = field(default_factory=RetrieveConfig)
    score: ScoreConfig | None = None

    @classmethod
    def from_dict(cls, conf: dict) -> "RunConfig":
        run = conf.get("run", {})
        if "name" not in run or "path" not in run:
            raise ConfigError("run.name and run.path are required")
        text = TextConfig(**conf.get("text", {}))
        idx = conf.get("index", {})
        retrieve = conf.get("retrieve", {})
        topics = dict(conf.get("topics", {}))
        if "fields" in topics:
            topics["fields"] = tuple(topics["fields"])
        score = conf.get("score")
        if score and "metrics" in score:
            score = dict(score, metrics=tuple(score["metrics"]))
        return cls(
            name=run["name"], path=run["path"],
            documents=DocumentsConfig(**conf.get("documents", {})),
            index=IndexConfig(text=text, **idx),
            topics=TopicsConfig(**topics),
            retrieve=RetrieveConfig(**retrieve),
            score=ScoreConfig(**score) if score else None,
        )
