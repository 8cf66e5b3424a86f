#!/usr/bin/env python3
"""Local dev mimic of the driver's correctness gate.

Usage: python3 scripts/check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet dump produced by graft.Verify,
runs the matching oracle SQL from oracle_sql.json in DuckDB against the
same parquet tables, sorts columns by name, and value-compares.
Dev-only tool (driver-side python libs); the Scala library does not
depend on it.
"""
import json, math, sys
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    return repr(v)


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.loads((Path(out_dir) / "oracle_sql.json").read_text())
    failures = 0
    for name in sorted(p.name for p in Path(out_dir).iterdir() if p.is_dir()):
        spark_rel = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
        if name not in oracle:
            n = len(spark_rel.fetchall())
            if n == 0:
                failures += 1  # empty unchecked dump must fail, like the driver gate
            print(f"  ~ {name}: rows-only check, {n} rows {'OK' if n > 0 else 'EMPTY!'}")
            continue
        duck_rel = con.sql(oracle[name])
        s_cols = sorted(spark_rel.columns)
        d_cols = sorted(duck_rel.columns)
        if s_cols != d_cols:
            print(f"  X {name}: COLUMN MISMATCH spark={s_cols} duck={d_cols}")
            failures += 1
            continue
        # The driver hashes TYPED values — an oracle that silently widens
        # (e.g. a window SUM over BIGINT -> HUGEINT) value-matches here but
        # hash-fails there (r8 curate_quantile_bins). Compare DuckDB result
        # types column-by-column so the dev loop sees what the driver sees.
        s_types = dict(zip(spark_rel.columns, (str(t) for t in spark_rel.types)))
        d_types = dict(zip(duck_rel.columns, (str(t) for t in duck_rel.types)))
        bad_types = [(c, s_types[c], d_types[c]) for c in s_cols
                     if s_types[c] != d_types[c]]
        if bad_types:
            print(f"  X {name}: TYPE MISMATCH {bad_types}")
            failures += 1
            continue
        s_rows = [tuple(norm(v) for v in r) for r in
                  con.sql(f"SELECT {', '.join(s_cols)} FROM spark_rel").fetchall()]
        d_rows = [tuple(norm(v) for v in r) for r in
                  con.sql(f"SELECT {', '.join(d_cols)} FROM duck_rel").fetchall()]
        if s_rows == d_rows:
            print(f"  + {name}: MATCH ({len(s_rows)} rows)")
        else:
            failures += 1
            print(f"  X {name}: VALUE MISMATCH spark={len(s_rows)} duck={len(d_rows)} rows")
            for i, (a, b) in enumerate(zip(s_rows, d_rows)):
                if a != b:
                    print(f"      first diff row {i}:\n      spark={a}\n      duck ={b}")
                    break
            if len(s_rows) != len(d_rows):
                only_s = set(s_rows) - set(d_rows)
                only_d = set(d_rows) - set(s_rows)
                if only_s: print(f"      only-spark sample: {list(only_s)[:2]}")
                if only_d: print(f"      only-duck  sample: {list(only_d)[:2]}")
    print("FAILURES:", failures)
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
