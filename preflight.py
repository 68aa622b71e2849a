#!/usr/bin/env python
"""Full-registry preflight: run EVERY `queries()` entry at sf0.01 and
compare against its `oracle_sql()` DuckDB oracle — the driver's
correctness gate, but over the whole registry instead of a 50-entry
sample.  Writes PREFLIGHT.json (per-key status + summary) so each
round ships a machine-checked 69/69-style report even for entries the
driver's sampler never picks (VERDICT r02 item 5).

Usage:  python preflight.py  [--sf-dir /root/testdata/sf0.01]
Owns its own Ray session (like bench.py).
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

TABLES = ("region nation customer supplier part orders lineitem "
          "events documents embeddings").split()


def _to_pandas(result):
    import pandas as pd
    import pyarrow as pa

    if isinstance(result, pd.DataFrame):
        return result
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result.to_pandas()  # ray Dataset


def _norm(df):
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def _compare(got, want) -> str | None:
    if list(got.columns) != list(want.columns):
        return f"columns {list(got.columns)} != {list(want.columns)}"
    if len(got) != len(want):
        return f"rows {len(got)} != {len(want)}"
    for c in got.columns:
        a, b = got[c].tolist(), want[c].tolist()
        if a and isinstance(a[0], float):
            if not all(math.isclose(x, y, rel_tol=0, abs_tol=0) or x == y
                       for x, y in zip(a, b)):
                return f"values differ in {c}"
        elif a != b:
            return f"values differ in {c}"
    return None


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get(
        "GRAFT_PREFLIGHT_SF_DIR", "/root/testdata/sf0.01"))
    ap.add_argument("--out", default="PREFLIGHT.json")
    args = ap.parse_args()

    import duckdb
    import ray

    if not ray.is_initialized():
        ray.init(address="local",
                 num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
                 include_dashboard=False, logging_level="ERROR")

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from sophia_rs_ray.pipelines.queries import registry

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{args.sf_dir}/{t}.parquet')")

    reg = registry()
    report: dict = {}
    n_ok = n_rows_only = n_fail = 0
    for name, (fn, sql) in sorted(reg.items()):
        t0 = time.perf_counter()
        try:
            got = _to_pandas(fn(args.sf_dir))
            if sql is None:
                ok = len(got) > 0 and len(got.columns) > 0
                report[name] = {
                    "status": "rows_only" if ok else "FAIL",
                    "rows": int(len(got)),
                    "sec": round(time.perf_counter() - t0, 2)}
                n_rows_only += ok
                n_fail += not ok
                continue
            want = con.execute(sql).fetchdf()
            err = _compare(_norm(got), _norm(want))
            report[name] = {
                "status": "ok" if err is None else "FAIL",
                "rows": int(len(got)), "oracle_rows": int(len(want)),
                "err": err, "sec": round(time.perf_counter() - t0, 2)}
            n_ok += err is None
            n_fail += err is not None
        except Exception as ex:  # noqa: BLE001 — report, don't abort
            report[name] = {"status": "FAIL",
                            "err": f"{type(ex).__name__}: {ex}"[:300],
                            "sec": round(time.perf_counter() - t0, 2)}
            n_fail += 1

    summary = {"sf_dir": args.sf_dir, "total": len(reg),
               "oracled_ok": n_ok, "rows_only_ok": n_rows_only,
               "failed": n_fail}
    out = {"summary": summary, "results": report}
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
        f.write("\n")
    print(json.dumps(summary))
    ray.shutdown()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
