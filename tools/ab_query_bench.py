"""Controlled per-query A/B bench harness (VERDICT r06 item 1).

Runs a list of registry queries against ONE fresh tuned session built
from the repo at --root (so two arms = two checkouts), best-of-N per
query, and prints one JSON line.  Mirrors bench.py's execution shape
(tuned session factory, count() to materialize) so numbers are
comparable with BENCH_r*.json rows.  Launch it once per session-arm;
the caller aggregates medians across sessions.

Usage:
    python tools/ab_query_bench.py --root /root/repo \
        --sf /root/testdata/sf0.1 --repeats 3 q1 q2 q3
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", required=True)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    sys.path.insert(0, args.root)
    import gc

    from simple_vector_spark.registry import _QUERIES  # noqa: E402
    from simple_vector_spark.session import get_spark  # noqa: E402

    spark = get_spark("bench")
    # same warm-up conventions as bench.py: small-sf JVM/codegen/worker
    # warm-up, then the OFFLINE index builds at the bench sf so timed
    # queries measure serving cost (the graph edge-table cache in
    # particular is what knn_graph_search reads)
    warm_dir = "/root/testdata/sf0.001"
    for wq in ("knn_exact_topk", "knn_shard_topk", "vocab_top100",
               "knn_graph_navigable"):
        if wq in _QUERIES:
            _QUERIES[wq](spark, warm_dir).count()
    for wq in ("ann_ivf", "ann_pq_adc", "knn_graph_navigable"):
        if wq in _QUERIES:
            _QUERIES[wq](spark, args.sf).count()

    out: dict[str, object] = {"root": args.root, "sf": args.sf}
    times: dict[str, list[float]] = {}
    for name in args.names:
        runs = []
        for _ in range(args.repeats):
            t0 = time.monotonic()
            df = _QUERIES[name](spark, args.sf)
            df.count()
            runs.append(round(time.monotonic() - t0, 3))
            del df
            gc.collect()
        times[name] = runs
    out["runs"] = times
    out["best"] = {n: min(r) for n, r in times.items()}
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
