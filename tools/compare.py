#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB oracle compare.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir> [query ...]
           [--json FILE] [--marker FILE] [--jobs N] [--wait]

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

The serial r8 form took ~11 min for 126 queries at sf0.01 — longer than
the driver's correctness-step budget, which is why CORRECTNESS_r05..r08
came back `{}` despite 126/126 passing. This version:
  * fans the per-query compares across a multiprocessing pool (--jobs,
    default 12; each worker owns its own single-threaded DuckDB
    connection — per-query work at sf0.01 is overhead-bound, so
    cross-query parallelism beats DuckDB's intra-query threads);
  * with --wait, starts comparing AS dumps land: a query is eligible
    once Verify touches <outDir>/_done/<name>; <outDir>/_done/_ALL
    releases everything remaining (covers dump failures — those compare
    as "spark result unreadable" rather than hanging the gate);
  * prints GRAFT_CORRECTNESS_PROGRESS: {"done":N,"fails":M} every 20
    completions so even a timed-out tail window carries a verdict;
  * with --marker, writes the compact final verdict
    {"passes":..,"fails":..,"rows_only":..,"failed":[...]} to FILE so
    the caller reads it verbatim instead of regexing compare.json.
"""
import json, math, os, sys, time
from multiprocessing import Pool

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


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


def _connect(sf_dir):
    import duckdb
    con = duckdb.connect()
    # one worker = one query stream; intra-query threading only competes
    # with the Spark dumps still running alongside in --wait mode
    con.execute("SET threads=1")
    for t in TABLES:
        try:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
        except Exception:
            pass
    return con


def compare_oracle(args):
    """Worker: one oracle-gated query → (name, verdict, fail_msg|None).
    Never raises — an unexpected crash becomes a named FAIL verdict, so
    the final counts always cover every query."""
    name = args[0]
    try:
        return _compare_oracle(args)
    except Exception as e:
        return name, {"rows": False, "schema": False, "hash": False,
                      "mode": "oracle", "error": f"comparator crash: {e}"}, \
               f"comparator crash: {e}"


def _compare_oracle(args):
    name, sql, sf_dir, out_dir = args
    con = _connect(sf_dir)
    try:
        try:
            cur = con.execute(sql)
            ocols = [d[0] for d in cur.description]
            orows = cur.fetchall()
        except Exception as e:
            return name, {"rows": False, "schema": False, "hash": False,
                          "mode": "oracle", "error": f"oracle error: {e}"}, \
                   f"oracle error: {e}"
        try:
            cur2 = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            scols = [d[0] for d in cur2.description]
            srows = cur2.fetchall()
        except Exception as e:
            return name, {"rows": False, "schema": False, "hash": False,
                          "mode": "oracle", "error": f"unreadable: {e}"}, \
                   f"spark result unreadable: {e}"
        oc, orc = canon(orows, ocols)
        sc, src = canon(srows, scols)
        verdict = {"rows": len(orc) == len(src), "schema": oc == sc,
                   "hash": oc == sc and orc == src, "mode": "oracle",
                   "spark_rows": len(src), "oracle_rows": len(orc)}
        if oc != sc:
            return name, verdict, f"schema mismatch spark={sc} oracle={oc}"
        if len(orc) != len(src):
            return name, verdict, f"rows spark={len(src)} oracle={len(orc)}"
        if orc != src:
            diff = next(i for i in range(len(orc)) if orc[i] != src[i])
            # diagnostic only: does a rounded compare agree? (the
            # driver would still fail — it compares exact reprs)
            _, orr = canon(orows, ocols, ndigits=9)
            _, srr = canon(srows, scols, ndigits=9)
            hint = (" [values agree to 9dp — sub-ulp drift, driver STILL FAILS]"
                    if orr == srr else "")
            return name, verdict, (f"values differ at row {diff}:{hint}\n"
                                   f"  spark : {src[diff]}\n  oracle: {orc[diff]}")
        return name, verdict, None
    finally:
        con.close()


def compare_rows_only(args):
    """Worker: dumped dir without an oracle entry → the driver's weaker
    rows-only check (readable, non-empty, no array-typed columns).
    Never raises — like compare_oracle, _connect runs INSIDE the guard
    (a duckdb import/connect failure otherwise escapes the worker, its
    callback never fires, and the query silently vanishes from the
    counts)."""
    name = args[0]
    try:
        return _compare_rows_only(args)
    except Exception as e:
        return name, {"rows": False, "mode": "rows-only",
                      "error": f"comparator crash: {e}"}, \
               f"ROWS-ONLY comparator crash: {e}"


def _compare_rows_only(args):
    name, sf_dir, out_dir = args
    con = _connect(sf_dir)
    try:
        cur = con.execute(
            f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
        rows = cur.fetchall()
        bad = [d[0] for i, d in enumerate(cur.description)
               if any(isinstance(r[i], (list, tuple)) for r in rows)]
        if bad:
            return name, {"rows": False, "mode": "rows-only"}, \
                   (f"ROWS-ONLY dir has array column(s) {bad} — "
                    "driver comparator crashes on ndarrays")
        if not rows:
            return name, {"rows": False, "mode": "rows-only"}, \
                   "ROWS-ONLY dir dumped 0 rows"
        sorted(rows, key=lambda t: tuple(repr(x) for x in t))
        return name, {"rows": True, "mode": "rows-only",
                      "nrows": len(rows)}, None
    except Exception as e:
        return name, {"rows": False, "mode": "rows-only",
                      "error": str(e)}, f"ROWS-ONLY dir unreadable: {e}"
    finally:
        con.close()


def main():
    argv = sys.argv[1:]

    def take_opt(flag, needs_value=True):
        if flag not in argv:
            return None
        i = argv.index(flag)
        if not needs_value:
            del argv[i]
            return True
        if i + 1 >= len(argv):
            sys.exit(f"usage: compare.py SF_DIR OUT_DIR [names...] "
                     f"[--json FILE] [--marker FILE] [--jobs N] [--wait]")
        v = argv[i + 1]
        del argv[i:i + 2]
        return v

    json_out = take_opt("--json")
    marker_out = take_opt("--marker")
    driver_json_out = take_opt("--driver-json")
    jobs = int(take_opt("--jobs") or "12")
    wait = bool(take_opt("--wait", needs_value=False))
    sf_dir, out_dir = argv[0], argv[1]
    only = set(argv[2:])

    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    names = sorted(n for n in oracle if not only or n in only)
    done_dir = os.path.join(out_dir, "_done")

    verdicts, fails = {}, []
    progress = {"done": 0, "fails": 0}

    def record(name, verdict, fail_msg):
        if fail_msg is not None:
            # carried into the per-query verdict so the driver-schema
            # artifact (--driver-json) has an `err` without re-deriving
            verdict = dict(verdict, fail=fail_msg)
        verdicts[name] = verdict
        if fail_msg is not None:
            fails.append((name, fail_msg))
            progress["fails"] += 1
        progress["done"] += 1
        if progress["done"] % 20 == 0:
            print(f"GRAFT_CORRECTNESS_PROGRESS: "
                  f"{json.dumps(progress, separators=(',', ':'))}", flush=True)

    pool = Pool(jobs)

    # Belt to the workers' never-raise braces: if anything STILL escapes
    # a worker (or the result fails to unpickle), the error_callback
    # records a named FAIL — without it the callback never runs, a.wait()
    # swallows the error, and the query is counted in neither passes nor
    # fails (the marker silently undercounts).
    def submit(fn, wargs):
        n = wargs[0]
        return pool.apply_async(
            fn, (wargs,), callback=lambda r: record(*r),
            error_callback=lambda e, n=n: record(
                n, {"rows": False, "schema": False, "hash": False,
                    "mode": "worker-error", "error": str(e)},
                f"pool worker error: {e}"))

    try:
        pending_async = []
        if wait:
            # submit each query the moment its dump-done sentinel lands;
            # _ALL releases stragglers (failed dumps compare as
            # unreadable — loud, never a hang). Verify always touches
            # _ALL after its dump pool settles; the deadline only guards
            # against a crashed Verify parking this process forever.
            # ~18 oracles (IVF/PQ/PCA/clustering) are DYNAMIC — their SQL
            # inlines centroids fitted while the query runs, so Verify
            # rewrites the complete oracle_sql.json right before _ALL;
            # re-read it then to pick up entries the startup copy lacked.
            # The poll deadline must EXCEED the caller's dump budget
            # (Verify awaits dumps for 60 min): a shorter deadline would
            # force-release queries against half-written dumps on a slow
            # run and record false failures.
            submitted, released_all = set(), False
            forced_release = False
            deadline = time.time() + 4200
            while True:
                if not released_all and (
                        os.path.exists(os.path.join(done_dir, "_ALL"))
                        or time.time() > deadline):
                    forced_release = not os.path.exists(
                        os.path.join(done_dir, "_ALL"))
                    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
                    names = sorted(n for n in oracle if not only or n in only)
                    released_all = True
                for n in names:
                    if n in submitted:
                        continue
                    # a sentinel only proves the DUMP landed; the oracle
                    # entry for a dynamic query may still be pending, so
                    # eager submission is gated on the entry existing in
                    # the startup snapshot — dynamic ones go at _ALL
                    if released_all or os.path.exists(os.path.join(done_dir, n)):
                        submitted.add(n)
                        pending_async.append(submit(
                            compare_oracle, (n, oracle[n], sf_dir, out_dir)))
                if released_all and len(submitted) >= len(names):
                    break
                time.sleep(0.2)
        else:
            for n in names:
                pending_async.append(submit(
                    compare_oracle, (n, oracle[n], sf_dir, out_dir)))
        for a in pending_async:
            a.wait()

        # Before scanning for rows-only dirs, make sure ALL dumps have
        # landed (a dumped-without-oracle query may finish after the
        # last oracle-gated one): _ALL is touched once Verify's dump
        # pool settles. Skip entirely when the submit loop already
        # force-released on deadline — the caller is gone and a second
        # full wait would just park an orphan for another 70 minutes.
        if wait and not forced_release:
            deadline = time.time() + 4200
            while (not os.path.exists(os.path.join(done_dir, "_ALL"))
                   and time.time() < deadline):
                time.sleep(0.2)

        # Result dirs dumped without an oracle entry: the driver records
        # a weaker rows-only check — replicate it instead of skipping.
        dumped = {d for d in os.listdir(out_dir)
                  if os.path.isdir(os.path.join(out_dir, d))
                  and not d.startswith("_")}
        ro_names = sorted(n for n in dumped - set(oracle)
                          if not only or n in only)
        ro_async = [submit(compare_rows_only, (n, sf_dir, out_dir))
                    for n in ro_names]
        for a in ro_async:
            a.wait()
    finally:
        pool.close()
        pool.join()

    rows_only = sum(1 for v in verdicts.values()
                    if v.get("mode") == "rows-only" and v.get("rows"))
    passes = sum(1 for v in verdicts.values() if v.get("hash"))
    for name in sorted(verdicts):
        v = verdicts[name]
        if v.get("mode") == "rows-only" and v.get("rows"):
            print(f"ROWS-ONLY {name}: {v['nrows']} rows, no oracle entry "
                  "(driver records a weaker rows-only check)")
    print(f"{passes}/{passes + len(fails) + rows_only} passing"
          + (f" ({rows_only} rows-only)" if rows_only else ""))
    for name, why in sorted(fails):
        print(f"FAIL {name}: {why}")
    if json_out:
        summary = {"sf_dir": sf_dir, "passes": passes, "fails": len(fails),
                   "rows_only": rows_only, "queries": verdicts}
        with open(json_out, "w") as f:
            json.dump(summary, f, indent=1, sort_keys=True)
        print(f"wrote {json_out}")
    if driver_json_out:
        # The driver's OWN per-query artifact schema, verbatim — the six
        # keys of CORRECTNESS_r01..r04 — so a round whose driver-side
        # compare dies can be adjudicated by diffing this file with zero
        # translation (CORRECTNESS_r05..r10 all came back `{}`).
        driver = {}
        for name, v in verdicts.items():
            if v.get("mode") == "rows-only":
                driver[name] = {
                    "rows_match": bool(v.get("rows")),
                    "schema_match": False, "hash_match": False,
                    "spark_rows": v.get("nrows"), "oracle_rows": None,
                    "err": v.get("fail") or "rows-only: no oracle entry"}
            else:
                driver[name] = {
                    "rows_match": bool(v.get("rows")),
                    "schema_match": bool(v.get("schema")),
                    "hash_match": bool(v.get("hash")),
                    "spark_rows": v.get("spark_rows"),
                    "oracle_rows": v.get("oracle_rows"),
                    "err": v.get("error") or v.get("fail")}
        tmp = driver_json_out + ".tmp"
        with open(tmp, "w") as f:
            json.dump(driver, f, indent=1, sort_keys=True)
        os.replace(tmp, driver_json_out)
        print(f"wrote {driver_json_out}")
        # One-line stdout copy of the full per-query driver-schema
        # record (~15 KB at 126 queries): graft.Verify's pump echoes
        # GRAFT_-prefixed lines, so a harness that captures stdout but
        # reads no files still gets every per-query verdict.
        print("GRAFT_CORRECTNESS_PERQUERY: " +
              json.dumps(driver, sort_keys=True, separators=(",", ":")),
              flush=True)
    if marker_out:
        marker = {"passes": passes, "fails": len(fails),
                  "rows_only": rows_only,
                  "failed": sorted(n for n, _ in fails)[:20]}
        # write-then-rename so the caller never reads a torn marker
        tmp = marker_out + ".tmp"
        with open(tmp, "w") as f:
            json.dump(marker, f, separators=(",", ":"), sort_keys=True)
        os.replace(tmp, marker_out)
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
