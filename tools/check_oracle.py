"""Local stand-in for the driver's correctness gate.

Runs every `queries()` entry on Spark and its `oracle_sql()` twin on DuckDB
over the same sf dir; compares row count, column-name set, and an
order-insensitive value hash (columns sorted by name, rows sorted, values
canonicalized). Usage:

    python tools/check_oracle.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import hashlib
import sys
import time

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon_value(v) -> str:
    import datetime
    import math

    if v is None:
        return "\x00NULL"
    if isinstance(v, float):
        # NaN and infinities get their own sentinels: collapsing NaN into
        # NULL would hide a real engine divergence (Spark 0.0/0.0 = NaN vs
        # SQL NULL), and int(inf) raises OverflowError
        if math.isnan(v):
            return "\x00NaN"
        if math.isinf(v):
            return "\x00+Inf" if v > 0 else "\x00-Inf"
        if v == int(v) and abs(v) < 2**53:
            return str(int(v))
        return f"{v:.6g}"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon_value(x) for x in v) + "]"
    return str(v)


def frame_hash(rows: list[tuple], cols: list[str]) -> tuple[int, str]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "\x01".join(canon_value(r[i]) for i in order) for r in rows
    )
    h = hashlib.md5("\n".join(lines).encode("utf-8", "surrogateescape")).hexdigest()
    return len(rows), h


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import duckdb

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entrymod
    from logzoom_spark.session import get_spark

    spark = get_spark("check_oracle", cpus=16)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entrymod.queries()
    osql = entrymod.oracle_sql()
    unknown = only - set(qs)
    if unknown:
        # a typo'd name must not yield a "0 pass, 0 fail" success
        print(f"ERROR: unknown query name(s): {sorted(unknown)}")
        spark.stop()
        return 2
    n_pass = n_fail = n_rowsonly = 0
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as ex:
            print(f"FAIL {name}: spark error: {ex}")
            n_fail += 1
            failures.append(name)
            continue
        if name not in osql:
            print(f"rows-only {name}: {len(s_rows)} rows ({time.time()-t0:.1f}s)")
            n_rowsonly += 1
            continue
        try:
            cur = con.execute(osql[name])
            d_cols = [d[0] for d in cur.description]
            d_rows = cur.fetchall()
        except Exception as ex:
            print(f"FAIL {name}: duckdb error: {ex}")
            n_fail += 1
            failures.append(name)
            continue
        sc, sh = frame_hash(s_rows, s_cols)
        dc, dh = frame_hash(d_rows, d_cols)
        cols_ok = sorted(s_cols) == sorted(d_cols)
        if sc == dc and sh == dh and cols_ok:
            print(f"PASS {name}: {sc} rows ({time.time()-t0:.1f}s)")
            n_pass += 1
        else:
            print(
                f"FAIL {name}: rows {sc} vs {dc}, hash "
                f"{'==' if sh == dh else '!='}, cols {'==' if cols_ok else f'{sorted(s_cols)} vs {sorted(d_cols)}'}"
            )
            if sc and dc and sc == dc:
                order_s = sorted(range(len(s_cols)), key=lambda i: s_cols[i])
                order_d = sorted(range(len(d_cols)), key=lambda i: d_cols[i])
                ss = sorted("\x01".join(canon_value(r[i]) for i in order_s) for r in s_rows)
                dd = sorted("\x01".join(canon_value(r[i]) for i in order_d) for r in d_rows)
                for a, b in zip(ss, dd):
                    if a != b:
                        print(f"  spark: {a[:300]!r}")
                        print(f"  duck : {b[:300]!r}")
                        break
            n_fail += 1
            failures.append(name)
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only")
    if failures:
        print("failures:", failures)
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
