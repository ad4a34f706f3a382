#!/usr/bin/env python
"""Interleaved A/B throughput comparison: OLD (a git worktree) vs NEW
(this repo) index builds over the SAME cached corpus, alternating run
order so host drift cancels (the round-2/3 lesson: absolute numbers on
this shared VM are meaningless; only same-window code-vs-code medians
count). Each run is a fresh subprocess calling bench.scaling_child, with
an Arrow health probe before/after each PAIR so every comparison carries
its environment evidence.

Usage: python tools/ab_interleave.py OLD_REPO [--cores N] [--pages P]
       [--reps R] [--out FILE]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_child(repo: str, cores: int, corpus: str) -> float | None:
    code = ("import sys; sys.path.insert(0, %r); import bench; "
            "print('RATE', bench.scaling_child(%d, %r))" % (repo, cores, corpus))
    # cwd + PYTHONPATH must BOTH point at the measured repo: Spark's Python
    # workers re-import modules with the inherited cwd/PYTHONPATH, not the
    # driver's runtime sys.path — without this the old-code child's workers
    # import the NEW package from cwd and the schemas mismatch
    env = dict(os.environ, PYTHONPATH=repo)
    try:
        proc = subprocess.run([sys.executable, "-c", code], cwd=repo, env=env,
                              capture_output=True, text=True, timeout=3000)
    except subprocess.TimeoutExpired:
        return None
    for line in proc.stdout.splitlines():
        if line.startswith("RATE "):
            return float(line.split()[1])
    sys.stderr.write(proc.stderr[-400:] + "\n")
    return None


def probe() -> dict:
    sys.path.insert(0, HERE)
    import bench
    return bench.health_probe()


def main() -> None:
    argv = sys.argv[1:]
    old_repo = argv[0]

    def opt(name, default, cast):
        return cast(argv[argv.index(name) + 1]) if name in argv else default

    cores = opt("--cores", 16, int)
    pages = opt("--pages", 100000, int)
    reps = opt("--reps", 6, int)
    out_path = opt("--out", os.path.join(HERE, "AB_r5.json"), str)

    sys.path.insert(0, HERE)
    import bench
    corpus = bench._corpus_path(pages)
    bench._ensure_corpus(corpus, pages)

    rows = []
    for i in range(reps):
        order = [("old", old_repo), ("new", HERE)]
        if i % 2 == 1:
            order.reverse()
        pre = probe()
        pair = {"i": i, "order": [o[0] for o in order],
                "pre_ratio": pre.get(next(k for k in pre if k.startswith("ratio")), None)
                if any(k.startswith("ratio") for k in pre) else None,
                "pre_healthy": pre.get("healthy")}
        for name, repo in order:
            r = run_child(repo, cores, corpus)
            pair[name] = round(r, 1) if r else None
            print(json.dumps({name: pair[name], "i": i}), flush=True)
        post = probe()
        pair["post_healthy"] = post.get("healthy")
        if pair.get("old") and pair.get("new"):
            pair["speedup"] = round(pair["new"] / pair["old"], 3)
        rows.append(pair)
        with open(out_path, "w") as f:
            json.dump({"cores": cores, "pages": pages, "pairs": rows}, f, indent=1)

    speeds = sorted(p["speedup"] for p in rows if "speedup" in p)
    med = (speeds[len(speeds) // 2] if len(speeds) % 2 else
           (speeds[len(speeds) // 2 - 1] + speeds[len(speeds) // 2]) / 2) \
        if speeds else None
    olds = sorted(p["old"] for p in rows if p.get("old"))
    news = sorted(p["new"] for p in rows if p.get("new"))
    summary = {
        "median_pairwise_speedup": med,
        "median_old": olds[len(olds) // 2] if olds else None,
        "median_new": news[len(news) // 2] if news else None,
        "pairs": len(rows),
    }
    with open(out_path, "w") as f:
        json.dump({"cores": cores, "pages": pages, "pairs": rows,
                   "summary": summary}, f, indent=1)
    print(json.dumps({"summary": summary}), flush=True)


if __name__ == "__main__":
    main()
