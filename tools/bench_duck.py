#!/usr/bin/env python3
"""Dev-loop DuckDB timing twin for graft.Bench.

Times each oracle SQL (from a Verify-produced oracle_sql.json) over the
same parquet tables the Spark bench reads, best-of-N, full result
materialization (fetchall) so both engines are measured on the same work.

Usage: bench_duck.py <sfDir> <oracle_sql.json> [reps]
Dev tooling only — the shipped library is pure Scala/Spark.
"""
import json
import sys
import time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# Storage-verb rows take min over max(reps, 5) on the Spark side (their
# sub-second multi-commit bodies carry the widest host-noise spread) —
# mirror the SAME per-row protocol here so min-of-N is symmetric.
# The authoritative set is the one the Spark bench EMITS into its
# artifact ("storage_ops"); the literal below is only the fallback when
# no artifact is readable, so a storage row added on one side can no
# longer silently desync the rep protocol.
FALLBACK_STORAGE_OPS = {"k11", "k12", "k13", "k14", "k17", "k18", "k19",
                        "k20", "k22", "k23", "k24", "k25", "k26", "k29",
                        "k30"}


def storage_ops():
    # repo-local artifacts FIRST (r21, ADVICE): the world-writable /tmp
    # copy can be a stale artifact from a different checkout/branch (or
    # another user on a shared host) silently redefining the rep
    # protocol; the cwd/repo artifact is the one the paired Bench run
    # just wrote
    for p in ("BENCH_LATEST.json", "/root/repo/BENCH_LATEST.json",
              "/tmp/bench_latest.json"):
        try:
            ops = json.load(open(p)).get("storage_ops")
            if ops:
                print(f"storage_ops from {p}: {sorted(ops)}", file=sys.stderr)
                return set(ops)
        except Exception:
            pass
    print("storage_ops: no bench artifact readable, using built-in fallback",
          file=sys.stderr)
    return FALLBACK_STORAGE_OPS


def main(sf_dir, oracle_path, reps=3):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(oracle_path))
    oracle = {n.removesuffix(".parquet"): s for n, s in oracle.items()}
    s_ops = storage_ops()
    times = {}
    for name, sql in sorted(oracle.items()):
        n_reps = max(reps, 5) if name[:3] in s_ops else reps
        best = None
        for _ in range(n_reps):
            t0 = time.perf_counter()
            try:
                con.sql(sql).fetchall()
            except Exception as e:
                print(f"ERR {name}: {e}", file=sys.stderr)
                best = None
                break
            dt = time.perf_counter() - t0
            best = dt if best is None or dt < best else best
        if best is not None:
            times[name] = best
    total = sum(times.values())
    print(json.dumps({"metric": "duck_total", "value": total, "unit": "sec",
                      "queries": times,
                      "reps": {"default": reps, "storage": max(reps, 5)},
                      "sf": sf_dir}))


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], int(sys.argv[3]) if len(sys.argv) > 3 else 3)
