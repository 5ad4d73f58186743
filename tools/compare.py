#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB oracle compare.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir> [query ...]

Runs each oracle_sql.json entry in DuckDB against the parquet tables in
sfDir, loads the Spark result parquet the Verify main dumped, sorts
columns by name and rows by all values (the driver's canonicalization),
and reports row/schema/value match per query.

Mirrors the driver's strictness: values compare EXACTLY (the driver
repr-hashes, it does not round) — a rounded-only agreement is reported
as a distinct failure diagnostic. Result dirs dumped WITHOUT an oracle
entry are not silently skipped: they get the driver's weaker rows-only
check (readable, sortable, and — since the driver's pandas sort crashes
on ndarrays — no array-typed output columns).
"""
import json, math, os, sys

import duckdb


def canon(rows, cols, ndigits=None):
    """Canonical (sorted-cols, sorted-rows) form. ndigits=None compares
    exact values (the driver's behavior); an int rounds floats to that
    many digits — used only as a diagnostic fallback."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                if math.isnan(v):
                    v = "NaN"
                elif ndigits is not None:
                    v = round(v, ndigits)
            elif isinstance(v, (list, tuple)):
                v = tuple(round(x, ndigits) if ndigits is not None and isinstance(x, float)
                          else x for x in v)
            elif isinstance(v, (bytes, bytearray)):
                v = bytes(v).hex()
            vals.append(v)
        out.append(tuple(vals))
    out.sort(key=lambda t: tuple(repr(x) for x in t))
    return [cols[i] for i in order], out


def main():
    argv = sys.argv[1:]
    json_out = None
    if "--json" in argv:
        i = argv.index("--json")
        if i + 1 >= len(argv):
            sys.exit("usage: compare.py SF_DIR OUT_DIR [names...] [--json FILE]")
        json_out = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    sf_dir, out_dir = argv[0], argv[1]
    only = set(argv[2:])
    verdicts = {}
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    tables = ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]
    fails, passes, rows_only = [], 0, 0
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
            verdicts[name] = {"rows": False, "schema": False, "hash": False,
                              "mode": "oracle", "error": f"oracle error: {e}"}
            con.close()
            continue
        try:
            cur2 = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            scols = [d[0] for d in cur2.description]
            srows = cur2.fetchall()
        except Exception as e:
            fails.append((name, f"spark result unreadable: {e}"))
            verdicts[name] = {"rows": False, "schema": False, "hash": False,
                              "mode": "oracle", "error": f"unreadable: {e}"}
            con.close()
            continue
        con.close()
        oc, orc = canon(orows, ocols)
        sc, src = canon(srows, scols)
        verdicts[name] = {"rows": len(orc) == len(src), "schema": oc == sc,
                          "hash": oc == sc and orc == src, "mode": "oracle"}
        if oc != sc:
            fails.append((name, f"schema mismatch spark={sc} oracle={oc}"))
        elif len(orc) != len(src):
            fails.append((name, f"rows spark={len(src)} oracle={len(orc)}"))
        elif orc != src:
            diff = next(i for i in range(len(orc)) if orc[i] != src[i])
            # diagnostic only: does a rounded compare agree? (the
            # driver would still fail — it compares exact reprs)
            _, orr = canon(orows, ocols, ndigits=9)
            _, srr = canon(srows, scols, ndigits=9)
            hint = (" [values agree to 9dp — sub-ulp drift, driver STILL FAILS]"
                    if orr == srr else "")
            fails.append((name,
                          f"values differ at row {diff}:{hint}\n  spark : {src[diff]}\n  oracle: {orc[diff]}"))
        else:
            passes += 1
    # Result dirs dumped without an oracle entry: the driver records a
    # weaker rows-only check — replicate it instead of skipping, and
    # fail array-typed outputs outright (the driver's pandas sort
    # crashes on ndarrays).
    dumped = {d for d in os.listdir(out_dir)
              if os.path.isdir(os.path.join(out_dir, d))}
    for name in sorted(dumped - set(oracle)):
        if only and name not in only:
            continue
        con = duckdb.connect()
        try:
            cur = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            rows = cur.fetchall()
            bad = [d[0] for i, d in enumerate(cur.description)
                   if any(isinstance(r[i], (list, tuple)) for r in rows)]
            if bad:
                fails.append((name, f"ROWS-ONLY dir has array column(s) {bad} — "
                                    "driver comparator crashes on ndarrays"))
                verdicts[name] = {"rows": False, "mode": "rows-only"}
            elif not rows:
                fails.append((name, "ROWS-ONLY dir dumped 0 rows"))
                verdicts[name] = {"rows": False, "mode": "rows-only"}
            else:
                sorted(rows, key=lambda t: tuple(repr(x) for x in t))
                rows_only += 1
                verdicts[name] = {"rows": True, "mode": "rows-only",
                                  "nrows": len(rows)}
                print(f"ROWS-ONLY {name}: {len(rows)} rows, no oracle entry "
                      "(driver records a weaker rows-only check)")
        except Exception as e:
            fails.append((name, f"ROWS-ONLY dir unreadable: {e}"))
            verdicts[name] = {"rows": False, "mode": "rows-only",
                              "error": str(e)}
        finally:
            con.close()
    print(f"{passes}/{passes + len(fails) + rows_only} passing"
          + (f" ({rows_only} rows-only)" if rows_only else ""))
    for name, why in fails:
        print(f"FAIL {name}: {why}")
    if json_out:
        summary = {"sf_dir": sf_dir, "passes": passes, "fails": len(fails),
                   "rows_only": rows_only, "queries": verdicts}
        with open(json_out, "w") as f:
            json.dump(summary, f, indent=1, sort_keys=True)
        print(f"wrote {json_out}")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
