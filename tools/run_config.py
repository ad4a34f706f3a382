#!/usr/bin/env python
"""Config-file run entry point — the rebuild of the reference's primary
``patapsco config.yml`` CLI (/root/reference/patapsco/bin/main.py:10-27):
load a YAML/JSON run config (with imports/inheritance/interpolation),
apply ``--set key=value`` overrides, and execute the two-stage pipeline
(documents → index; topics → retrieve → score) with manifest-gated resume.

    spark-submit --py-files patapsco_spark.zip tools/run_config.py \\
        run.yml --set retrieve.k=100 --set run.path=/out/run1
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_overrides(pairs):
    out = {}
    for p in pairs or []:
        if "=" not in p:
            raise SystemExit(f"--set expects key=value, got {p!r}")
        k, v = p.split("=", 1)
        # literal-ish coercion, like the reference's override handling
        for cast in (int, float):
            try:
                v = cast(v)
                break
            except ValueError:
                continue
        if v in ("true", "True"):
            v = True
        elif v in ("false", "False"):
            v = False
        out[k] = v
    return out


def main() -> None:
    p = argparse.ArgumentParser(description="Run a patapsco_spark pipeline from a config file.")
    p.add_argument("config", help="YAML/JSON run configuration file")
    p.add_argument("-s", "--set", action="append", metavar="KEY=VALUE",
                   help="Override a config parameter (repeatable)")
    p.add_argument("--no-resume", action="store_true",
                   help="Ignore existing stage manifests and rebuild")
    args = p.parse_args()

    from patapsco_spark.config import ConfigError
    from patapsco_spark.plans.job import run
    from patapsco_spark.plans.runconfig import RunConfig, load_config
    from patapsco_spark.session import get_spark

    try:
        conf = load_config(args.config, overrides=parse_overrides(args.set))
        cfg = RunConfig.from_dict(conf)
    except ConfigError as e:
        raise SystemExit(f"Error: {e}")
    spark = get_spark(app=f"patapsco-spark-{cfg.name}")
    result = run(spark, cfg, resume=not args.no_resume)
    import json
    print(json.dumps(result, default=str))


if __name__ == "__main__":
    main()
