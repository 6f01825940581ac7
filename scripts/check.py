#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate.

Usage: python3 scripts/check.py <sfDir> <verifyOutDir>

Reads each <outDir>/<name>/ parquet result written by graft.Verify, runs the
oracle SQL from <outDir>/oracle_sql.json in DuckDB against the same fixture
tables, and compares: row count, column set (sorted by name), and values
row-by-row (columns sorted by name, rows in result order).
"""
import sys, json, glob, os
import duckdb
import pyarrow.types as pt

def main(sf_dir, out_dir, json_out=None):
    results = {}
    con = duckdb.connect()
    # Scale-probe memory discipline (CHECK_MEM_LIMIT, e.g. "48GB"):
    # without a bound, a multiset EXCEPT over a 60M-row result builds
    # its hash tables fully in RAM and the OS OOM-killer takes the
    # whole run; with one, DuckDB spills to temp_directory instead.
    mem = os.environ.get("CHECK_MEM_LIMIT")
    if mem:
        con.execute(f"SET memory_limit='{mem}'")
        # per-process spill dir: two concurrent checks sharing one
        # directory delete each other's temp blocks on cleanup
        con.execute(
            f"SET temp_directory='/tmp/duck_spill_{os.getpid()}'")
    # Resume a killed run (CHECK_RESUME=<prior json>): queries already
    # recorded ok:true there are carried over, not re-compared.
    prior = {}
    rp = os.environ.get("CHECK_RESUME")
    if rp and os.path.exists(rp):
        prior = {k: v for k, v in json.load(open(rp))["queries"].items()
                 if isinstance(v, dict) and v.get("ok") is True}
    for t in ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split():
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):  # Spark-written table (directory of parts)
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}/*.parquet')")
        elif os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    # determinism sort keys per query (written by graft.Verify): the
    # order-tie multiset fallback below may only fire when a query's sort
    # keys are verifiably non-unique in the result — absent this file the
    # fallback never fires (a positional mismatch stays a FAIL)
    sk_path = f"{out_dir}/sort_keys.json"
    sort_keys = json.load(open(sk_path)) if os.path.exists(sk_path) else None
    if sort_keys is None:
        # make a later FAIL on this output dir attributable: without the
        # sidecar (any verify dir produced before it existed) the
        # order-tie multiset fallback can never fire, so a positional
        # mismatch that would have been reported ORDER-TIE reports FAIL
        print(f"NOTE: {sk_path} missing (pre-sidecar verify output); "
              "order-tie fallback disabled — positional mismatches on "
              "tied sort keys will report FAIL")
    n_pass = n_fail = n_skip = 0
    # Scale-probe fast path (CHECK_MULTISET_OVER=N, default off → the
    # driver-identical row-by-row compare): a result larger than N rows
    # compares as an exact MULTISET inside DuckDB (count + sorted column
    # set + EXCEPT ALL in both directions), never materialized in
    # python. At probe corpora (sf1/sf10, built by row replication) the
    # positional compare degenerates anyway — duplicate sort keys
    # interleave per engine and the sf1 sweep already fell back to
    # multiset for those — while a 60M-row to_pylist costs tens of GB
    # and hours. The multiset check is exact on values (EXCEPT ALL is
    # bag difference); order contracts stay pinned by the positional
    # compare at the gate SFs.
    big_over = int(os.environ.get("CHECK_MULTISET_OVER", "0") or 0)
    # Local-iteration filter (CHECK_ONLY=<regex>): check only matching
    # queries. Needed because Verify now always dumps the FULL oracle
    # map (a filtered dump into an existing dir truncated the suite);
    # without this, a single-query re-verify into a fresh dir would
    # report every other query as "no spark output".
    only = os.environ.get("CHECK_ONLY")
    if only:
        import re as _re
        oracles = {k: v for k, v in oracles.items() if _re.search(only, k)}
    for name in sorted(oracles):
        if name in prior:
            print(f"PASS {name} (carried from resumed run)")
            results[name] = prior[name]
            n_pass += 1
            continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            results[name] = {"ok": False, "err": "no spark output"}
            n_fail += 1
            continue
        if big_over:
            n_got = con.execute(
                f"SELECT count(*) FROM read_parquet({files!r})").fetchone()[0]
            if n_got > big_over:
                try:
                    gcols = sorted(con.execute(
                        f"SELECT * FROM read_parquet({files!r}) LIMIT 0"
                    ).fetch_arrow_table().column_names)
                    con.execute("DROP VIEW IF EXISTS __exp_v")
                    con.execute(f"CREATE TEMP VIEW __exp_v AS {oracles[name]}")
                    ecols = sorted(con.execute(
                        "SELECT * FROM __exp_v LIMIT 0"
                    ).fetch_arrow_table().column_names)
                    if gcols != ecols:
                        print(f"FAIL {name}: columns {gcols} vs {ecols}")
                        results[name] = {"ok": False,
                                         "err": f"columns {gcols} vs {ecols}"}
                        n_fail += 1
                        continue
                    cols = ", ".join(f'"{c}"' for c in gcols)
                    tmo = float(os.environ.get(
                        "CHECK_ORACLE_TIMEOUT", "0") or 0)
                    timer = None
                    if tmo > 0:
                        import threading
                        timer = threading.Timer(3 * tmo, con.interrupt)
                        timer.start()
                    try:
                        n_exp = con.execute(
                            "SELECT count(*) FROM __exp_v").fetchone()[0]
                        if n_got != n_exp:
                            print(f"FAIL {name}: rows {n_got} vs {n_exp}")
                            results[name] = {"ok": False,
                                             "err": f"rows {n_got} vs {n_exp}"}
                            n_fail += 1
                            continue
                        d1 = con.execute(
                            f"SELECT count(*) FROM (SELECT {cols} FROM "
                            f"read_parquet({files!r}) EXCEPT ALL "
                            f"SELECT {cols} FROM __exp_v)").fetchone()[0]
                        d2 = con.execute(
                            f"SELECT count(*) FROM (SELECT {cols} FROM __exp_v "
                            f"EXCEPT ALL SELECT {cols} FROM "
                            f"read_parquet({files!r}))").fetchone()[0]
                    finally:
                        if timer is not None:
                            timer.cancel()
                    if d1 or d2:
                        print(f"FAIL {name}: multiset differs "
                              f"(spark-only {d1}, duck-only {d2} of {n_got})")
                        results[name] = {"ok": False,
                                         "err": f"multiset diff {d1}/{d2}"}
                        n_fail += 1
                        continue
                    # same driver hash-red rule the row path enforces: a
                    # decimal128 column on EITHER side fails the driver's
                    # hash gate even when values match, so the fast path
                    # must flag it too (it previously didn't)
                    decs = [
                        f"{side}:{f.name}:{f.type}"
                        for side, q in (
                            ("spark",
                             f"SELECT * FROM read_parquet({files!r}) LIMIT 0"),
                            ("duck", "SELECT * FROM __exp_v LIMIT 0"))
                        for f in con.execute(q).fetch_arrow_table().schema
                        if pt.is_decimal(f.type)]
                    if decs:
                        print(f"FAIL {name}: decimal128 in output "
                              f"(driver hash-red): {decs}")
                        results[name] = {"ok": False,
                                         "err": f"decimal128: {decs}"}
                        n_fail += 1
                    else:
                        print(f"PASS {name} ({n_got} rows; multiset compare "
                              f"— result > {big_over} rows)")
                        results[name] = {"ok": True, "rows": n_got,
                                         "note": "multiset compare (big result)"}
                        n_pass += 1
                except KeyboardInterrupt:
                    print(f"SKIP {name}: oracle exceeded the multiset "
                          "timeout (quadratic twin)")
                    results[name] = {"ok": None, "err": "oracle_timeout"}
                    n_skip += 1
                except Exception as e:
                    if "INTERRUPT" in str(e).upper():
                        print(f"SKIP {name}: oracle exceeded the multiset "
                              "timeout (quadratic twin)")
                        results[name] = {"ok": None, "err": "oracle_timeout"}
                        n_skip += 1
                    else:
                        print(f"FAIL {name}: oracle error {e}")
                        results[name] = {"ok": False,
                                         "err": f"oracle error {e}"}
                        n_fail += 1
                continue
        got = con.execute(
            f"SELECT * FROM read_parquet({files!r})").fetch_arrow_table()
        try:
            # optional per-oracle wall clamp (CHECK_ORACLE_TIMEOUT seconds):
            # a handful of twins are deliberately quadratic (full cross-join
            # truth sets) and do not terminate usefully at probe scale —
            # record those as skipped, never as silent hangs
            tmo = float(os.environ.get("CHECK_ORACLE_TIMEOUT", "0") or 0)
            if tmo > 0:
                import threading
                timer = threading.Timer(tmo, con.interrupt)
                timer.start()
                try:
                    exp = con.execute(oracles[name]).fetch_arrow_table()
                finally:
                    timer.cancel()
            else:
                exp = con.execute(oracles[name]).fetch_arrow_table()
        except KeyboardInterrupt:
            print(f"SKIP {name}: oracle exceeded {tmo:.0f}s (quadratic twin)")
            results[name] = {"ok": None, "err": f"oracle_timeout_{tmo:.0f}s"}
            n_skip += 1
            continue
        except Exception as e:
            if "INTERRUPT" in str(e).upper():
                print(f"SKIP {name}: oracle exceeded {tmo:.0f}s (quadratic twin)")
                results[name] = {"ok": None, "err": f"oracle_timeout_{tmo:.0f}s"}
                n_skip += 1
                continue
            print(f"FAIL {name}: oracle error {e}")
            results[name] = {"ok": False, "err": f"oracle error {e}"}
            n_fail += 1
            continue
        gcols, ecols = sorted(got.column_names), sorted(exp.column_names)
        if gcols != ecols:
            print(f"FAIL {name}: columns {gcols} vs {ecols}")
            results[name] = {"ok": False, "err": f"columns {gcols} vs {ecols}"}
            n_fail += 1
            continue
        if got.num_rows != exp.num_rows:
            print(f"FAIL {name}: rows {got.num_rows} vs {exp.num_rows}")
            results[name] = {"ok": False,
                             "err": f"rows {got.num_rows} vs {exp.num_rows}"}
            n_fail += 1
            continue
        g = [tuple(r[c] for c in gcols) for r in got.to_pylist()]
        e = [tuple(r[c] for c in ecols) for r in exp.to_pylist()]
        bad = [(i, a, b) for i, (a, b) in enumerate(zip(g, e)) if a != b]
        if bad:
            # Positional mismatch: distinguish VALUE bugs from sort-TIE
            # artifacts. The determinism sort keys are total orders on
            # the driver's single-file fixtures, but a scale corpus
            # built by row replication (the sf1 probe) has duplicate
            # keys, so tied rows interleave differently per engine.
            # An exact MULTISET match (sorted full-row compare) means
            # every value is identical and only tie order differs —
            # report it as such, never as a silent pass. GUARD: the
            # fallback only applies when the query's sort keys are
            # verifiably NON-unique in the result (duplicate key tuples
            # actually present) — on unique keys a positional mismatch
            # is a genuine ordering/value divergence (e.g. NULLS FIRST
            # vs LAST or a broken ORDER BY) and must stay a FAIL. A
            # query with NO sort keys has no order contract at all:
            # every row shares the empty key tuple, so ties are allowed.
            ties_possible = False
            if sort_keys is not None and name in sort_keys:
                keys = [k for k in sort_keys[name] if k in got.column_names]
                if keys != sort_keys[name]:
                    ties_possible = False  # key not in output: no claim
                else:
                    kt = [tuple(r[k] for k in keys) for r in got.to_pylist()]
                    ties_possible = len(set(map(repr, kt))) < len(kt)
            try:
                ms_ok = ties_possible and \
                    sorted(map(repr, g)) == sorted(map(repr, e))
            except Exception:
                ms_ok = False
            if ms_ok:
                print(f"PASS {name} ({got.num_rows} rows; order-tie only: "
                      "multiset-identical, non-unique sort keys in fixture)")
                results[name] = {"ok": True, "rows": got.num_rows,
                                 "note": "order-tie; multiset-identical"}
                n_pass += 1
                continue
            i, a, b = bad[0]
            print(f"FAIL {name}: {len(bad)}/{len(g)} rows differ; "
                  f"first at {i}:\n  spark={a}\n  duck ={b}")
            results[name] = {"ok": False,
                             "err": f"{len(bad)}/{len(g)} rows differ"}
            n_fail += 1
            continue
        # The driver's hash gate is stricter than python-value equality:
        # round-2 showed it fails whenever a decimal128 column appears on
        # EITHER side (per-engine decimal canonicalization). Flag that
        # here so value-identical-but-type-red rows fail locally too.
        decs = [f"{side}:{f.name}:{f.type}"
                for side, tbl in (("spark", got), ("duck", exp))
                for f in tbl.schema
                if pt.is_decimal(f.type)]
        if decs:
            print(f"FAIL {name}: decimal128 in output (driver hash-red): {decs}")
            results[name] = {"ok": False, "err": f"decimal128: {decs}"}
            n_fail += 1
        else:
            print(f"PASS {name} ({got.num_rows} rows)")
            results[name] = {"ok": True, "rows": got.num_rows}
            n_pass += 1
    # Skips are visible in the tally and the artifact, never silently
    # folded into "0 fail": a run that skipped oracles is NOT a clean
    # sweep. CHECK_STRICT_SKIPS=1 additionally makes skips fail the
    # exit code (distinct code 2), for sweeps that must adjudicate
    # every row rather than tolerate timeout-prone quadratic twins.
    print(f"\n{n_pass} pass, {n_fail} fail, {n_skip} skip")
    if json_out:
        json.dump({"sf_dir": sf_dir, "n_pass": n_pass, "n_fail": n_fail,
                   "n_skip": n_skip,
                   "sort_keys_sidecar_present": sort_keys is not None,
                   "queries": results},
                  open(json_out, "w"), indent=1, sort_keys=True)
    if n_fail:
        return 1
    if n_skip and os.environ.get("CHECK_STRICT_SKIPS"):
        return 2
    return 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  sys.argv[3] if len(sys.argv) > 3 else None))
