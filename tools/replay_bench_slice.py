"""Replay a slice of a bench session's query order with JVM telemetry.

Round-7 attribution tool (VERDICT r06 item 1): both round-6 bench
sessions — driver and builder, independent JVMs, same HEAD hence same
queries() order — degraded 2-4x over the SAME order positions
(~228-248) and recovered abruptly, while round 5's session (different
rotation order) was flat.  That pattern is order-deterministic session
state, not plan cost.  This tool replays order[START:END] in one fresh
session exactly the way bench.py runs it (same session factory,
warm-up, best-of-2, gc between queries) while sampling, per query:

  - cumulative JVM GC time (all collectors) and GC count
  - JVM heap used / committed
  - BlockManager storage memory used (localCheckpoint block pressure)

so a reproduced band can be attributed to GC pressure, storage
accumulation, or neither.  --skip drops names from the replayed prefix
(bisection: does removing a suspect family dissolve the band?).

Usage:
    python tools/replay_bench_slice.py --root /root/repo/.wt_r6 \
        --order /tmp/order_.wt_r6.json --start 0 --end 250 \
        [--measure-start 200] [--skip name1,name2] [--out out.json]
"""

from __future__ import annotations

import argparse
import gc
import json
import sys
import time


def jvm_stats(spark):
    jvm = spark.sparkContext._jvm
    mf = jvm.java.lang.management.ManagementFactory
    gc_ms = 0
    gc_n = 0
    it = mf.getGarbageCollectorMXBeans().iterator()
    while it.hasNext():
        b = it.next()
        gc_ms += b.getCollectionTime()
        gc_n += b.getCollectionCount()
    heap = mf.getMemoryMXBean().getHeapMemoryUsage()
    status = spark.sparkContext._jsc.sc().getExecutorMemoryStatus()
    # local mode: one entry; (max, remaining) in bytes
    vals = status.values().iterator()
    storage_used = 0
    while vals.hasNext():
        t = vals.next()
        storage_used += t._1() - t._2()
    # Non-heap pools: the round-7 replay ruled out GC-time and heap
    # size, leaving "session-state churn".  The two JVM-level suspects
    # that are heap-invariant are the JIT CODE CACHE (default reserve
    # 240 MB; when the CodeHeaps fill, the sweeper flushes warm
    # compiled methods and hot paths re-run in the interpreter until
    # re-JITed) and METASPACE (every WholeStageCodegen query loads new
    # generated classes; class unloading only happens on full GC).
    # Sample both so a reproduced band can be attributed directly.
    code_used = code_max = meta_used = 0
    pit = mf.getMemoryPoolMXBeans().iterator()
    while pit.hasNext():
        p = pit.next()
        nm = p.getName()
        u = p.getUsage()
        if "CodeHeap" in nm or nm == "Code Cache":
            code_used += u.getUsed()
            code_max += u.getMax()
        elif nm == "Metaspace":
            meta_used = u.getUsed()
    cl = mf.getClassLoadingMXBean()
    return {
        "gc_ms": gc_ms,
        "gc_n": gc_n,
        "heap_used_mb": heap.getUsed() // 1048576,
        "heap_committed_mb": heap.getCommitted() // 1048576,
        "storage_used_mb": storage_used // 1048576,
        "codecache_used_mb": code_used // 1048576,
        "codecache_max_mb": code_max // 1048576,
        "metaspace_used_mb": meta_used // 1048576,
        "classes_loaded": cl.getLoadedClassCount(),
        "classes_unloaded": cl.getUnloadedClassCount(),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", required=True)
    ap.add_argument("--order", required=True)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--start", type=int, default=0)
    ap.add_argument("--end", type=int, required=True)
    ap.add_argument("--measure-start", type=int, default=None,
                    help="positions before this run once, untimed "
                    "(prefix-conditioning only)")
    ap.add_argument("--skip", default="",
                    help="comma-separated names to drop from the slice")
    ap.add_argument("--hygiene-every", type=int, default=0,
                    help="every N positions: clearCache + drop temp "
                    "views + JVM System.gc (VERDICT r07 item 4 arm)")
    ap.add_argument("--recycle-at", type=int, default=None,
                    help="stop the session and start a fresh warmed "
                    "JVM at this position (VERDICT r07 item 4 arm)")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    sys.path.insert(0, args.root)
    from simple_vector_spark.registry import _QUERIES  # noqa: E402
    from simple_vector_spark.session import get_spark  # noqa: E402

    order = json.load(open(args.order))
    skip = {s for s in args.skip.split(",") if s}
    names = [n for n in order[args.start:args.end] if n not in skip]

    def warmed_session():
        spark = get_spark("bench")
        # bench.py warm-up conventions
        spark.read.parquet(args.sf.rstrip("/") + "/region.parquet").count()
        warm_dir = "/root/testdata/sf0.001"
        for wq in ("knn_exact_topk", "knn_batch_join", "tpch_q1_pricing",
                   "knn_shard_topk", "vocab_top100", "dedup_simhash_pairs",
                   "embedding_knn_loo_accuracy", "knn_graph_navigable",
                   "dedup_weighted_minhash", "part_covisit_recs"):
            if wq in _QUERIES:
                _QUERIES[wq](spark, warm_dir).count()
        for wq in ("ann_ivf", "ann_pq_adc", "knn_graph_navigable"):
            if wq in _QUERIES:
                _QUERIES[wq](spark, args.sf).count()
        return spark

    def hygiene(spark):
        spark.catalog.clearCache()
        for tbl in spark.catalog.listTables():
            if tbl.isTemporary:
                spark.catalog.dropTempView(tbl.name)
        spark.sparkContext._jvm.System.gc()

    spark = warmed_session()
    mstart = args.measure_start
    rows = []
    for pos, name in enumerate(names, start=args.start):
        if args.recycle_at is not None and pos == args.recycle_at:
            t0 = time.perf_counter()
            spark.stop()
            spark = warmed_session()
            print(json.dumps({"pos": pos, "event": "recycle",
                              "sec": round(time.perf_counter() - t0, 1)}),
                  flush=True)
        if args.hygiene_every and pos > args.start and \
                (pos - args.start) % args.hygiene_every == 0:
            t0 = time.perf_counter()
            hygiene(spark)
            print(json.dumps({"pos": pos, "event": "hygiene",
                              "sec": round(time.perf_counter() - t0, 1)}),
                  flush=True)
        timed = mstart is None or pos >= mstart
        runs = []
        for _ in range(2 if timed else 1):
            t0 = time.perf_counter()
            df = _QUERIES[name](spark, args.sf)
            df.count()
            runs.append(round(time.perf_counter() - t0, 3))
            del df
            gc.collect()
        row = {"pos": pos, "name": name, "best": min(runs), "timed": timed}
        row.update(jvm_stats(spark))
        rows.append(row)
        print(json.dumps(row), flush=True)

    if args.out:
        with open(args.out, "w") as fh:
            json.dump({"root": args.root, "sf": args.sf,
                       "start": args.start, "end": args.end,
                       "skip": sorted(skip),
                       "hygiene_every": args.hygiene_every,
                       "recycle_at": args.recycle_at,
                       "rows": rows}, fh, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
