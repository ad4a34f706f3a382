#!/usr/bin/env python
"""Noop-sink per-query isolation bench (guide §1.4) — NOT the driver's
harness; bench.py stays the frozen measurement surface. This file exists so
optimization rounds can (a) time individual declared queries against the
noop sink without the cold-build preamble, and (b) dump
``.explain('formatted')`` plans for the plan-diff evidence in plans/r*/.

Usage:
  python bench_extra.py time  [sf_dir] q1 q2 ...   # per-query noop seconds
  python bench_extra.py plan  [outdir] [sf_dir] q1 q2 ...  # write plans
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf1.0), SPARK_GRAFT_CPUS.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    import __spark_entry__ as entry
    from patapsco_spark.session import get_spark

    mode = sys.argv[1] if len(sys.argv) > 1 else "time"
    args = sys.argv[2:]
    outdir = None
    if mode == "plan":
        outdir, args = args[0], args[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
    if args and os.path.isdir(args[0]):
        sf_dir, args = args[0], args[1:]
    spark = get_spark()
    qs = entry.queries()
    names = args or list(qs)
    for name in names:
        fn = qs[name]
        if mode == "plan":
            import io
            from contextlib import redirect_stdout

            df = fn(spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            plan = buf.getvalue()
            os.makedirs(outdir, exist_ok=True)
            with open(os.path.join(outdir, f"{name}.txt"), "w") as f:
                f.write(plan)
            print(f"{name}: plan -> {outdir}/{name}.txt")
        else:
            spark.sparkContext.setJobDescription(f"bench_extra: {name}")
            t0 = time.time()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            print(f"{name}: {time.time() - t0:.2f}s", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
