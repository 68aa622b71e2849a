#!/usr/bin/env python
"""Benchmark driver: headline KG pipeline + operator suite.

Prints ONE JSON line:
  {"metric": "kg_pipeline_sf_seconds", "value": <sec>, "unit": "sec",
   "queries": {...per-query seconds...}, "sf": <sf>, "num_cpus": N,
   "triples_out": ..., "triples_per_sec": ...}

Env: GRAFT_SF_DIR (default /root/testdata/sf0.1),
     RAY_GRAFT_CPUS (default 32).

--scaling: run the headline pipeline in TWO fresh processes at
num_cpus=8 and num_cpus=32 on the same input and report both
throughputs + scaling efficiency (the sandbox stand-in for N vs 4N
nodes, BASELINE.md).
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))


def _sf() -> str:
    m = re.search(r"sf([0-9.]+)", SF_DIR)
    return m.group(1) if m else "0.1"


def run_bench() -> dict:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=NUM_CPUS,
                 include_dashboard=False, ignore_reinit_error=True,
                 logging_level="ERROR")
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    from sophia_rs_ray.pipelines.kg import kg_pipeline
    from sophia_rs_ray.pipelines.queries import registry
    from sophia_rs_ray.sources.pages import SF_PAGE_COUNTS, pages_dataset

    sf = _sf()
    n_pages = SF_PAGE_COUNTS.get(sf, 5000)

    # warm the page cache (untimed read of the parquet inputs)
    import pyarrow.parquet as pq
    for t in ("lineitem", "documents", "embeddings", "events"):
        try:
            pq.read_table(f"{SF_DIR}/{t}.parquet")
        except Exception:
            pass

    # headline: flagship KG pipeline over synthetic pages
    t0 = time.perf_counter()
    out = kg_pipeline(pages_dataset(n_pages))
    n_triples = out.count()
    headline = time.perf_counter() - t0

    queries = {}
    reg = registry()
    for name in ("tpch_q1", "top_orders_by_revenue", "events_hourly",
                 "doc_triples", "triples_dedup", "dedup_exact_docs",
                 "token_counts", "knn_cosine", "minhash_bands",
                 "customers_per_region", "orders_per_segment"):
        fn, _sql = reg[name]
        t0 = time.perf_counter()
        res = fn(SF_DIR)
        _ = res.count() if hasattr(res, "count") else len(res)
        queries[name] = round(time.perf_counter() - t0, 3)

    result = {
        "metric": "kg_pipeline_seconds",
        "value": round(headline, 3),
        "unit": "sec",
        "queries": queries,
        "sf": float(sf),
        "num_cpus": NUM_CPUS,
        "n_pages": n_pages,
        "triples_out": n_triples,
        "triples_per_sec": round(n_triples / headline, 1),
    }
    ray.shutdown()
    return result


def run_scaling() -> dict:
    def run(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
        out = subprocess.run([sys.executable, os.path.abspath(__file__)],
                             env=env, capture_output=True, text=True,
                             check=True).stdout
        return json.loads(out.strip().splitlines()[-1])

    lo, hi = run(8), run(32)
    tput_lo = lo["triples_per_sec"]
    tput_hi = hi["triples_per_sec"]
    eff = (tput_hi / tput_lo) / (32 / 8)
    return {
        "metric": "scaling_efficiency",
        "value": round(eff, 3),
        "unit": "ratio",
        "sec_8": lo["value"], "sec_32": hi["value"],
        "triples_per_sec_8": tput_lo, "triples_per_sec_32": tput_hi,
        "sf": lo["sf"],
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_bench()))
