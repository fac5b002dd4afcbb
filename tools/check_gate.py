"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB over the same sf directory, then compares row count, column names,
and an order-insensitive value hash.  Usage::

    python tools/check_gate.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as entry_mod
from city2graph_spark.gate import TABLES
from city2graph_spark.session import get_spark


def value_hash(rows, cols) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("\x1f".join(repr(r[i]) for i in order) for r in rows)
    return hashlib.md5("\n".join(lines).encode()).hexdigest()


def norm(v):
    # unify numpy scalars / ints across engines
    if hasattr(v, "item"):
        v = v.item()
    if isinstance(v, float) and v.is_integer():
        return int(v)
    return v


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    spark = get_spark("check_gate")
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(norm(v) for v in r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error {e}")
            failures += 1
            continue
        t1 = time.time()
        if name not in oracles:
            print(f"PASS? {name}: rows={len(srows)} (no oracle, rows-only) "
                  f"[spark {t1-t0:.1f}s]")
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [c[0] for c in res.description]
            orows = [tuple(norm(v) for v in r) for r in res.fetchall()]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: oracle error {e}")
            failures += 1
            continue
        t2 = time.time()
        ok_cnt = len(srows) == len(orows)
        ok_cols = sorted(scols) == sorted(ocols)
        ok_hash = value_hash(srows, scols) == value_hash(orows, ocols)
        status = "PASS" if (ok_cnt and ok_cols and ok_hash) else "FAIL"
        if status == "FAIL":
            failures += 1
        print(f"{status} {name}: spark={len(srows)} oracle={len(orows)} "
              f"cols={'ok' if ok_cols else f'{scols} vs {ocols}'} "
              f"hash={'ok' if ok_hash else 'MISMATCH'} "
              f"[spark {t1-t0:.1f}s oracle {t2-t1:.1f}s]")
        if not ok_hash and ok_cnt and ok_cols:
            s_set = {tuple(r) for r in srows}
            o_set = {tuple(r) for r in orows}
            print(f"   only-spark: {list(s_set - o_set)[:3]}")
            print(f"   only-oracle: {list(o_set - s_set)[:3]}")
    spark.stop()
    print("FAILURES:", failures)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
