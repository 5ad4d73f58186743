#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB oracle compare.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir> [query ...]

Runs each oracle_sql.json entry in DuckDB against the parquet tables in
sfDir, loads the Spark result parquet the Verify main dumped, sorts
columns by name and rows by all values (the driver's canonicalization),
and reports row/schema/value match per query.
"""
import json, sys, math

import duckdb


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                if math.isnan(v):
                    v = "NaN"
                else:
                    v = round(v, 9)
            elif isinstance(v, (list, tuple)):
                v = tuple(round(x, 6) if isinstance(x, float) else x for x in v)
            elif isinstance(v, (bytes, bytearray)):
                v = bytes(v).hex()
            vals.append(v)
        out.append(tuple(vals))
    out.sort(key=lambda t: tuple(repr(x) for x in t))
    return [cols[i] for i in order], out


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    tables = ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]
    fails, passes, skips = [], 0, 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        con = duckdb.connect()
        for t in tables:
            try:
                con.execute(
                    f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
            except Exception:
                pass
        try:
            cur = con.execute(sql)
            ocols = [d[0] for d in cur.description]
            orows = cur.fetchall()
        except Exception as e:
            fails.append((name, f"oracle error: {e}"))
            con.close()
            continue
        try:
            cur2 = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            scols = [d[0] for d in cur2.description]
            srows = cur2.fetchall()
        except Exception as e:
            fails.append((name, f"spark result unreadable: {e}"))
            con.close()
            continue
        con.close()
        oc, orc = canon(orows, ocols)
        sc, src = canon(srows, scols)
        if oc != sc:
            fails.append((name, f"schema mismatch spark={sc} oracle={oc}"))
        elif len(orc) != len(src):
            fails.append((name, f"rows spark={len(src)} oracle={len(orc)}"))
        elif orc != src:
            diff = next(i for i in range(len(orc)) if orc[i] != src[i])
            fails.append((name,
                          f"values differ at row {diff}:\n  spark : {src[diff]}\n  oracle: {orc[diff]}"))
        else:
            passes += 1
    print(f"{passes}/{passes + len(fails)} passing")
    for name, why in fails:
        print(f"FAIL {name}: {why}")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
