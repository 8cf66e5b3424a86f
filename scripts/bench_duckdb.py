#!/usr/bin/env python3
"""Time each oracle SQL in DuckDB on the same parquet tables — the
measurable single-node baseline the Spark bench is compared against
(BASELINE.md has no reference numbers, so DuckDB-on-the-same-data is
the anchor for the per-query ratio column in bench_full.json).

Usage: python3 scripts/bench_duckdb.py <sfDir> <oracle_sql.json> [timeout_s]

Prints ONE JSON line: {"<query>": seconds | null, ...} — null when the
query exceeded the per-query timeout (interrupted) or errored. Dev/bench
tool (driver-side python libs); the Scala library does not depend on it.
"""
import json, sys, threading, time
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def main(sf_dir: str, oracle_path: str, timeout_s: float = 120.0) -> int:
    oracle = json.loads(Path(oracle_path).read_text())
    results = {}
    for name in sorted(oracle):
        # fresh connection per query: an interrupted query leaves the
        # connection unusable for reliable timing, and view setup is ~ms
        con = duckdb.connect()
        for t in TABLES:
            p = Path(sf_dir) / f"{t}.parquet"
            if p.exists():
                con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
        timer = threading.Timer(timeout_s, con.interrupt)
        t0 = time.monotonic()
        try:
            timer.start()
            con.sql(oracle[name]).fetchall()
            results[name] = round(time.monotonic() - t0, 3)
        except Exception as e:
            print(f"[bench_duckdb] {name}: {type(e).__name__}: {e}",
                  file=sys.stderr)
            results[name] = None
        finally:
            timer.cancel()
            con.close()
    print(json.dumps(results, separators=(",", ":")))
    return 0


if __name__ == "__main__":
    t = float(sys.argv[3]) if len(sys.argv) > 3 else 120.0
    sys.exit(main(sys.argv[1], sys.argv[2], t))
