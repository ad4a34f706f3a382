"""Config language (interpolation / inheritance / overrides — reference
semantics from patapsco/config.py) and the end-to-end job runner."""

import json
import os

import pytest

from patapsco_spark.config import ConfigError
from patapsco_spark.plans.runconfig import (
    RunConfig,
    apply_inheritance,
    apply_overrides,
    interpolate,
    load_config,
)


class TestConfigLanguage:
    def test_interpolation_nested_paths(self):
        conf, errs = interpolate({
            "lang": "zho",
            "run": {"name": "test-{lang}", "path": "runs/{run.name}"},
        })
        assert errs == []
        assert conf["run"]["name"] == "test-zho"
        assert conf["run"]["path"] == "runs/test-zho"

    def test_interpolation_in_lists(self):
        conf, errs = interpolate({"a": "x", "items": ["{a}1", "{a}2"]})
        assert conf["items"] == ["x1", "x2"]

    def test_unresolved_reference_collected(self):
        _, errs = interpolate({"a": "{missing.key}"})
        assert errs == ["{missing.key}"]

    def test_inheritance_merge_and_override(self):
        conf = apply_inheritance({
            "base": {"k1": 1, "nested": {"x": 1, "y": 2}, "lst": [1, 2]},
            "child": {"inherit": "base", "k2": 2,
                      "nested": {"y": 99}, "lst": [3]},
        })
        c = conf["child"]
        assert c == {"k1": 1, "k2": 2, "nested": {"x": 1, "y": 99}, "lst": [3]}
        assert "inherit" not in c

    def test_inheritance_missing_parent_raises(self):
        with pytest.raises(ConfigError, match="does not exist"):
            apply_inheritance({"child": {"inherit": "nope"}})

    def test_overrides_create_paths(self):
        conf = apply_overrides({"a": {"b": 1}}, {"a.b": 2, "c.d": 3})
        assert conf == {"a": {"b": 2}, "c": {"d": 3}}

    def test_load_config_full_chain(self, tmp_path):
        p = tmp_path / "run.json"
        p.write_text(json.dumps({
            "lang": "eng",
            "base_retrieve": {"k": 100, "k1": 0.9},
            "run": {"name": "r-{lang}", "path": str(tmp_path / "out")},
            "retrieve": {"inherit": "base_retrieve", "k": 50},
        }))
        conf = load_config(str(p), overrides={"retrieve.b": 0.3})
        assert conf["run"]["name"] == "r-eng"
        assert conf["retrieve"] == {"k": 50, "k1": 0.9, "b": 0.3}

    def test_load_config_unresolved_raises(self):
        with pytest.raises(ConfigError, match="unresolved"):
            load_config({"a": "{nope}"})

    def test_imports_merge_reference_case(self, tmp_path):
        """Port of the reference's test_imports (tests/test_config.py:388-394
        over tests/config_files/{main,docs,index}.yml): imported sections
        land in the conf, resolved relative to the importing file."""
        (tmp_path / "main.yml").write_text(
            "run:\n  name: English test run\n\nimports:\n  - docs.yml\n  - index.yml\n")
        (tmp_path / "docs.yml").write_text(
            "documents:\n  input:\n    format: json\n    lang: eng\n"
            "    encoding: utf8\n    path: sample/en_mini_dataset.jsonl\n"
            "  process:\n    tokenize: whitespace\n    stem: off\n")
        (tmp_path / "index.yml").write_text("index:\n  name: lucene\n")
        conf = load_config(str(tmp_path / "main.yml"))
        assert conf["run"]["name"] == "English test run"
        assert conf["documents"]["input"]["format"] == "json"
        assert conf["index"]["name"] == "lucene"
        assert "imports" not in conf

    def test_imports_nested_and_conflict_direction(self, tmp_path):
        """Imports may themselves import (resolved relative to THEIR file);
        on conflicts the imported value wins (reference merge_dicts merges
        the partial over the main conf, config.py:231,493-500)."""
        sub = tmp_path / "sub"
        sub.mkdir()
        (tmp_path / "main.yml").write_text(
            "run:\n  name: main\nretrieve:\n  k: 5\nimports:\n  - sub/mid.yml\n")
        (sub / "mid.yml").write_text(
            "retrieve:\n  k: 50\nimports:\n  - deep.yml\n")
        (sub / "deep.yml").write_text("score:\n  metrics: [map]\n")
        conf = load_config(str(tmp_path / "main.yml"))
        assert conf["run"]["name"] == "main"
        assert conf["retrieve"]["k"] == 50          # imported value wins
        assert conf["score"]["metrics"] == ["map"]  # nested import, sub/-relative

    def test_imports_missing_file_raises(self, tmp_path):
        (tmp_path / "main.yml").write_text("imports:\n  - nope.yml\n")
        with pytest.raises(ConfigError, match="cannot import"):
            load_config(str(tmp_path / "main.yml"))

    def test_imports_without_base_dir_raises(self):
        with pytest.raises(ConfigError, match="file-based"):
            load_config({"imports": ["x.yml"]})

    def test_import_cycle_raises_clear_error(self, tmp_path):
        (tmp_path / "a.yml").write_text("run:\n  name: a\nimports:\n  - b.yml\n")
        (tmp_path / "b.yml").write_text("retrieve:\n  k: 5\nimports:\n  - a.yml\n")
        with pytest.raises(ConfigError, match="cycle"):
            load_config(str(tmp_path / "a.yml"))

    def test_diamond_imports_are_not_a_cycle(self, tmp_path):
        # a imports b and c; both import base — legal (visited set is
        # per-chain, not global)
        (tmp_path / "a.yml").write_text(
            "run:\n  name: a\nimports:\n  - b.yml\n  - c.yml\n")
        (tmp_path / "b.yml").write_text("imports:\n  - base.yml\nx:\n  b: 1\n")
        (tmp_path / "c.yml").write_text("imports:\n  - base.yml\nx:\n  c: 2\n")
        (tmp_path / "base.yml").write_text("retrieve:\n  k: 7\n")
        conf = load_config(str(tmp_path / "a.yml"))
        assert conf["retrieve"]["k"] == 7
        assert conf["x"] == {"b": 1, "c": 2}

    def test_runconfig_requires_name_and_path(self):
        with pytest.raises(ConfigError, match="run.name"):
            RunConfig.from_dict({"run": {"name": "x"}})


class TestJobRunner:
    @pytest.fixture()
    def corpus(self, spark, tmp_path):
        from patapsco_spark.sources.webpages import synthesize_pages
        path = str(tmp_path / "pages")
        synthesize_pages(spark, 40, partitions=2).write.parquet(path)
        return path

    def test_end_to_end_run_with_scoring(self, spark, tmp_path, corpus):
        from patapsco_spark.plans.job import run

        # qrels over synthetic urls: judge a few docs per query
        urls = [r.url for r in spark.read.parquet(corpus).select("url")
                .orderBy("url").limit(6).collect()]
        qrels_path = tmp_path / "qrels.txt"
        qrels_path.write_text("".join(
            f"q{1 + i % 2} 0 {u} {1 + i % 2}\n" for i, u in enumerate(urls)))
        topics_path = tmp_path / "topics.jsonl"
        topics_path.write_text("".join(json.dumps({
            "topic_id": f"q{i}", "languages_with_qrels": ["eng"],
            "topics": [{"lang": "eng", "source": "original",
                        "topic_title": t, "topic_description": t}]}) + "\n"
            for i, t in [(1, "data stream window"), (2, "index web crawl")]))

        cfg = RunConfig.from_dict(load_config({
            "run": {"name": "e2e", "path": str(tmp_path / "run1")},
            "documents": {"input_path": corpus, "input_format": "webpages",
                          "text_col": "text"},
            "text": {"stem": None, "stopwords": None},
            "index": {"num_shards": 2},
            "topics": {"input_path": str(topics_path), "input_format": "hc4",
                       "lang": "eng", "source": "original"},
            "retrieve": {"k": 10},
            "score": {"qrels_path": str(qrels_path)},
        }))
        out = run(spark, cfg)
        assert os.path.exists(os.path.join(out["results_path"], "_SUCCESS"))
        assert os.path.exists(out["scores_path"])
        scores = open(out["scores_path"]).read()
        assert "map" in scores and "\tall\t" in scores
        assert os.path.exists(os.path.join(cfg.path, "timing.json"))

        # resume: rerunning skips the index build (manifest-gated)
        import time
        t0 = time.perf_counter()
        run(spark, cfg, resume=True)
        assert time.perf_counter() - t0 < 30  # no full rebuild

    def test_chunked_topics_path_matches_list_path(self, spark, tmp_path, corpus):
        """topics.chunk_size > 0 routes retrieval through the chunked
        queries-as-DataFrame path; the TREC run must be line-identical to
        the driver-list path (modulo line order)."""
        from patapsco_spark.plans.job import run

        topics_path = tmp_path / "topics.tsv"
        topics_path.write_text("q1\tdata stream window\nq2\tindex web crawl\n"
                               "q3\tcrawl data\n")
        base = {
            "documents": {"input_path": corpus, "input_format": "webpages"},
            "text": {"stem": None, "stopwords": None},
            "index": {"num_shards": 2},
            "retrieve": {"k": 5},
        }

        def read_run(out):
            lines = []
            for f in os.listdir(out["results_path"]):
                if f.startswith("part"):
                    lines += open(os.path.join(out["results_path"], f)
                                  ).read().splitlines()
            return sorted(ln.rsplit(" ", 1)[0] for ln in lines)  # drop system

        out_list = run(spark, RunConfig.from_dict(dict(
            base, run={"name": "lst", "path": str(tmp_path / "runL")},
            topics={"input_path": str(topics_path), "input_format": "tsv"})))
        out_chunk = run(spark, RunConfig.from_dict(dict(
            base, run={"name": "chk", "path": str(tmp_path / "runC")},
            topics={"input_path": str(topics_path), "input_format": "tsv",
                    "chunk_size": 2})))
        assert os.path.isdir(os.path.join(str(tmp_path / "runC"),
                                          "results_chunks"))
        a, b = read_run(out_list), read_run(out_chunk)
        assert a == b and len(a) > 0

    def test_rm3_mode(self, spark, tmp_path, corpus):
        from patapsco_spark.plans.job import run

        topics_path = tmp_path / "topics.tsv"
        topics_path.write_text("q1\tdata stream window\n")
        cfg = RunConfig.from_dict({
            "run": {"name": "rm3run", "path": str(tmp_path / "run2")},
            "documents": {"input_path": corpus, "input_format": "webpages"},
            "text": {"stem": None, "stopwords": None},
            "index": {"num_shards": 2},
            "topics": {"input_path": str(topics_path), "input_format": "tsv"},
            "retrieve": {"k": 5, "rm3": True, "fb_docs": 3, "fb_terms": 5},
        })
        out = run(spark, cfg)
        lines = []
        rdir = out["results_path"]
        for f in os.listdir(rdir):
            if f.startswith("part"):
                lines += open(os.path.join(rdir, f)).read().splitlines()
        assert 0 < len(lines) <= 5
        assert all(ln.split()[0] == "q1" and ln.split()[5] == "rm3run"
                   for ln in lines)
