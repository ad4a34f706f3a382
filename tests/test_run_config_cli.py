"""Config-file CLI entry (tools/run_config.py) — the reference's primary
``patapsco config.yml`` surface (bin/main.py:10-27): config file + --set
overrides → two-stage run. Also pins the reference's boolean-string
conversion ('on'/'yes'/'off'/'no' in file values become booleans)."""

import json
import os
import sys

import pytest

from patapsco_spark.plans.runconfig import load_config

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))
from tools.run_config import main as cli_main, parse_overrides  # noqa: E402


class TestBooleanStrings:
    def test_json_boolean_strings_convert(self):
        conf = load_config('{"retrieve": {"rm3": "on"}, "x": {"y": "no"}}')
        assert conf["retrieve"]["rm3"] is True
        assert conf["x"]["y"] is False

    def test_yaml_quoted_strings_stay_strings(self):
        # reference parity: only the JSON reader converts boolean strings
        # (config.py:192); YAML keeps PyYAML semantics, so quoting is the
        # escape hatch — lang: "no" (Norwegian) must stay a string while a
        # bare `no` is already a bool via YAML 1.1 itself
        conf = load_config('documents:\n  lang: "no"\n  flag: no\n')
        assert conf["documents"]["lang"] == "no"
        assert conf["documents"]["flag"] is False

    def test_strings_in_lists_untouched(self):
        # reference parity: list entries are not converted (config.py list
        # branch only recurses into dicts)
        conf = load_config('{"score": {"metrics": ["map", "no"]}}')
        assert conf["score"]["metrics"] == ["map", "no"]


class TestOverrides:
    def test_parse_overrides_coerce(self):
        got = parse_overrides(["retrieve.k=5", "retrieve.b=0.25",
                               "retrieve.rm3=true", "run.name=x"])
        assert got == {"retrieve.k": 5, "retrieve.b": 0.25,
                       "retrieve.rm3": True, "run.name": "x"}

    def test_bad_override_exits(self):
        with pytest.raises(SystemExit):
            parse_overrides(["nonsense"])


def test_cli_end_to_end(spark, tmp_path, monkeypatch):
    from patapsco_spark.sources.webpages import synthesize_pages

    corpus = str(tmp_path / "pages")
    synthesize_pages(spark, 30, partitions=2).write.parquet(corpus)
    topics = tmp_path / "topics.tsv"
    topics.write_text("q1\tdata stream window\n")
    conf = tmp_path / "run.yml"
    conf.write_text(f"""
run:
  name: cli-run
  path: {tmp_path / 'out'}
documents:
  input_path: {corpus}
  input_format: webpages
text:
  stem: null
  stopwords: null
index:
  num_shards: 2
topics:
  input_path: {topics}
  input_format: tsv
retrieve:
  k: 10
""")
    monkeypatch.setattr(sys, "argv",
                        ["run_config.py", str(conf), "--set", "retrieve.k=3"])
    import io
    from contextlib import redirect_stdout
    buf = io.StringIO()
    with redirect_stdout(buf):
        cli_main()
    out = json.loads(buf.getvalue().strip().splitlines()[-1])
    assert os.path.exists(os.path.join(out["results_path"], "_SUCCESS"))
    lines = []
    for f in os.listdir(out["results_path"]):
        if f.startswith("part"):
            lines += open(os.path.join(out["results_path"], f)).read().splitlines()
    assert 0 < len(lines) <= 3  # --set retrieve.k=3 took effect
    assert all(ln.split()[5] == "cli-run" for ln in lines)
