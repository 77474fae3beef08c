"""Time a handful of declared queries in isolation (A/B harness).

Same methodology as bench.py (fresh session from the same factory,
fixture tables warmed, offline index builds pre-run, best-of-N with a
count() materialization and gc between runs) but restricted to the
named queries, so a single optimization's effect is measurable in ~a
minute instead of a full 514-query session.  The FIRST timed run of
each query doubles as its codegen warm-up; best-of-N absorbs it.

Usage:
    python tools/time_queries.py [--runs 3] [--sf-dir /root/testdata/sf0.1] \
        [--tag label] name1 name2 ...

Prints one JSON line: {"tag": ..., "queries": {name: best_sec}}.
"""

from __future__ import annotations

import argparse
import gc
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--tag", default="")
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    from simple_vector_spark.registry import _QUERIES
    from simple_vector_spark.session import get_spark
    from simple_vector_spark.sources.loaders import load_table

    spark = get_spark("time-queries")
    qs = dict(_QUERIES)
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents", "embeddings"):
        if os.path.exists(os.path.join(args.sf_dir, f"{t}.parquet")):
            load_table(spark, args.sf_dir, t).count()
    # offline index builds (same set bench.py pre-builds).  Built
    # UNCONDITIONALLY (ADVICE r08): name-prefix gating missed
    # index-dependent queries with other names (e.g.
    # stream_live_index_knn), which then paid the shared build inside
    # their A/B timing — unlike bench.py, which always pre-builds.
    for wq in ("ann_ivf", "ann_pq_adc", "knn_graph_navigable"):
        if wq in qs:
            qs[wq](spark, args.sf_dir).count()

    timings = {}
    for name in args.names:
        if name not in qs:
            print(f"!! unknown query {name}", file=sys.stderr)
            continue
        best = None
        for _ in range(args.runs):
            t0 = time.perf_counter()
            df = qs[name](spark, args.sf_dir)
            df.count()
            elapsed = time.perf_counter() - t0
            best = elapsed if best is None else min(best, elapsed)
            del df
            gc.collect()
        timings[name] = round(best, 4)
        print(f"# {name}: {timings[name]:.3f}s", file=sys.stderr)
    print(json.dumps({"tag": args.tag, "sf_dir": args.sf_dir,
                      "runs": args.runs, "queries": timings}))


if __name__ == "__main__":
    main()
