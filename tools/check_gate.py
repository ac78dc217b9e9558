"""Local stand-in for the driver's correctness check: run every gate
query on Spark AND its DuckDB oracle at a given SF, compare row count,
column names, and (order-insensitively) values.

Usage: python tools/check_gate.py [sf_dir] [name_filter]
"""

from __future__ import annotations

import math
import sys

import duckdb

sys.path.insert(0, ".")

from cantera_table_spark import gate  # noqa: E402
from cantera_table_spark.session import get_spark  # noqa: E402

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 6)
    return v


def rows_key(df_rows, cols):
    out = []
    for r in df_rows:
        d = dict(zip(cols, r))
        out.append(tuple(norm(d[c]) for c in sorted(cols)))
    return sorted(out)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    name_filter = sys.argv[2] if len(sys.argv) > 2 else ""

    spark = get_spark("gate-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = gate.queries()
    oracles = gate.oracle_sql()
    n_pass = n_fail = 0
    for name in sorted(qs):
        if name_filter and name_filter not in name:
            continue
        try:
            sdf = qs[name](spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            n_fail += 1
            continue
        finally:
            # drop caches registered by the gate body (cluster labels,
            # quantized tables) so storage doesn't accumulate across
            # the 101-gate sweep; the shared postings cache is NOT in
            # this registry and survives
            gate.release_gate_caches()
        if name not in oracles:
            print(f"  ok {name}: rows-only ({len(srows)} rows)")
            n_pass += 1
            continue
        try:
            cur = con.execute(oracles[name])
            ocols = [d[0] for d in cur.description]
            orows = [tuple(r) for r in cur.fetchall()]
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        if sorted(scols) != sorted(ocols):
            print(f"FAIL {name}: columns {sorted(scols)} != {sorted(ocols)}")
            n_fail += 1
            continue
        if len(srows) != len(orows):
            print(f"FAIL {name}: rowcount {len(srows)} != {len(orows)}")
            n_fail += 1
            continue
        sk, ok = rows_key(srows, scols), rows_key(orows, ocols)
        if sk != ok:
            diffs = [(a, b) for a, b in zip(sk, ok) if a != b][:3]
            print(f"FAIL {name}: values differ, e.g. {diffs}")
            n_fail += 1
            continue
        print(f"PASS {name} ({len(srows)} rows)")
        n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
