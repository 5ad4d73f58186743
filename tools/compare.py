#!/usr/bin/env python3
"""Local dev harness: emulate the driver's DuckDB-oracle correctness
gate. Compares each Verify parquet dump against its oracle SQL result
(rows, schema column names, and value hash after sorting columns by
name and rows by value). Dev tooling only — not part of the library.

Usage: python3 tools/compare.py /root/testdata/sf0.01 /tmp/verify_out
"""
import sys, json, glob, hashlib
import duckdb
import pandas as pd


def canon(df: pd.DataFrame) -> pd.DataFrame:
    # The driver's comparator sorts columns by name then rows by value
    # with plain pandas sort_values — array-typed columns make it raise
    # (unhashable numpy.ndarray). Mirror that strictness here so an
    # array column in any query output fails locally, not in the driver.
    df = df.reindex(sorted(df.columns), axis=1)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def table_hash(df: pd.DataFrame) -> str:
    h = hashlib.sha256()
    for row in df.itertuples(index=False):
        h.update(repr(tuple(row)).encode())
    return h.hexdigest()


def main(sf_dir: str, out_dir: str) -> None:
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    results = {}
    for name in sorted(d.split('/')[-1] for d in glob.glob(f"{out_dir}/*") if not d.endswith('.json')):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        got = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True) \
            if files else pd.DataFrame()
        if name not in oracle:
            try:
                canon(got)  # driver sorts rows-only outputs too
                results[name] = f"ROWS-ONLY rows={len(got)}"
            except Exception as e:
                results[name] = f"ROWS-ONLY-UNSORTABLE {type(e).__name__}: {e}"
            continue
        try:
            exp = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            results[name] = f"ORACLE-ERROR {e}"
            continue
        gc, ec = canon(got), canon(exp)
        if sorted(gc.columns) != sorted(ec.columns):
            results[name] = f"SCHEMA-MISMATCH spark={sorted(gc.columns)} duck={sorted(ec.columns)}"
        elif len(gc) != len(ec):
            results[name] = f"ROWCOUNT-MISMATCH spark={len(gc)} duck={len(ec)}"
        elif table_hash(gc) != table_hash(ec):
            diff = None
            for i in range(len(gc)):
                for c in gc.columns:
                    a, b = gc[c].iloc[i], ec[c].iloc[i]
                    if repr(a) != repr(b):
                        diff = f"first diff row {i} col {c}: spark={a!r} duck={b!r}"
                        break
                if diff:
                    break
            results[name] = f"HASH-MISMATCH rows={len(gc)} {diff}"
        else:
            results[name] = f"OK rows={len(gc)}"
    width = max(len(k) for k in results)
    n_ok = sum(1 for v in results.values() if v.startswith(('OK', 'ROWS-ONLY')))
    for k, v in results.items():
        print(f"{k:<{width}}  {v}")
    print(f"\n{n_ok}/{len(results)} passing")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
