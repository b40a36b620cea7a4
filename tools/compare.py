"""Local replica of the driver's correctness gate: run each queries()
entry on Spark and its oracle_sql() on DuckDB, compare row count, column
names, and an order-insensitive value hash.

Usage: python tools/compare.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import math
import sys
import time

sys.path.insert(0, "/root/repo")


def canon(val):
    import decimal

    if val is None:
        return "\x00"
    if isinstance(val, bool):
        return "1" if val else "0"
    if isinstance(val, decimal.Decimal):
        val = float(val)
    if isinstance(val, float):
        if math.isnan(val):
            return "nan"
        if val == int(val) and abs(val) < 1e15:
            return str(int(val))
        return repr(round(val, 9))
    if isinstance(val, bytes):
        return val.hex()
    return str(val)


def table_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("\x01".join(canon(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    import duckdb

    import __spark_entry__ as entrymod
    from zinger_spark.session import get_spark

    spark = get_spark("compare")
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_pass = n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"SKIP {name}: no oracle (rows-only) rows={len(srows)}")
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1
            continue
        problems = []
        if len(srows) != len(orows):
            problems.append(f"rows {len(srows)} != {len(orows)}")
        if sorted(scols) != sorted(ocols):
            problems.append(f"cols {sorted(scols)} != {sorted(ocols)}")
        else:
            hs, ho = table_hash(scols, srows), table_hash(ocols, orows)
            if hs != ho:
                problems.append(f"hash {hs} != {ho}")
        dt = time.time() - t0
        if problems:
            n_fail += 1
            print(f"FAIL {name} ({dt:.1f}s): {'; '.join(problems)}")
            # show a small diff sample
            sset = {tuple(canon(v) for v in r) for r in srows}
            oset = {tuple(canon(v) for v in r) for r in orows}
            so = list(sset - oset)[:3]
            os_ = list(oset - sset)[:3]
            if so:
                print(f"   spark-only: {so}")
            if os_:
                print(f"   oracle-only: {os_}")
        else:
            n_pass += 1
            print(f"PASS {name} ({dt:.1f}s, {len(srows)} rows)")
    print(f"\n{n_pass} pass, {n_fail} fail")
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
