#!/usr/bin/env python3
"""Scale-probe runner that evaluates an oracle's CTE chain STAGED —
each CTE materialized as a temp table in definition order — instead of
as one statement.

Why: DuckDB inlines a non-recursive CTE per reference, so a deep CTE
DAG multiplies its upstream pipeline per level; at sf10 the
ms_ingest_final_state twin OOMed at 93 GiB evaluating `win1` even
though every single CTE in it is at most a few thousand rows (bisected
— the memory is dozens of concurrently-inlined scan/join instances,
not data). Staging evaluates each CTE exactly once: the i-th statement
re-issues the original WITH prefix but with every EARLIER definition
replaced by `name AS (SELECT * FROM t_name)`, keeping the i-th body
VERBATIM (recursive self-references included), then materializes it.
The final statement is the oracle's own tail SELECT over the staged
chain. The algebra compared is the committed oracle's; only its
evaluation order changes.

Compare = scripts/check.py's row-path: row count, sorted column set,
positional row compare (the oracle's ORDER BY is kept verbatim in the
tail), and the driver's decimal128 hash-red rule.

Usage: probe_staged_cte.py <sfDir> <verifyOutDir> <jsonOut> <nameRegex>
Env: PROBE_MEM_LIMIT (default 60GB)
"""
import sys, json, glob, os, re, time
import duckdb
import pyarrow.types as pt

TABLES = ("region nation customer supplier part orders lineitem "
          "events documents embeddings").split()


def split_ctes(sql):
    """Parse `WITH [RECURSIVE] n1 AS [MATERIALIZED] (...), ... <tail>`
    into ([(name, body, materialized)], tail, recursive). Paren-matched,
    no SQL-string handling needed (the twins carry no parens inside
    string literals that would unbalance the scan — asserted by the
    round-trip check below)."""
    m = re.match(r"\s*WITH\s+(RECURSIVE\s+)?", sql, re.I)
    assert m, "oracle does not start with WITH"
    recursive = bool(m.group(1))
    i = m.end()
    ctes = []
    while True:
        hm = re.compile(r"\s*(\w+)\s+AS\s+(MATERIALIZED\s+)?\(").match(sql, i)
        if not hm:
            break
        name, mat = hm.group(1), bool(hm.group(2))
        j = hm.end()  # position after the opening paren
        depth = 1
        while depth:
            c = sql[j]
            if c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
            j += 1
        ctes.append((name, sql[hm.end():j - 1], mat))
        k = re.compile(r"\s*,").match(sql, j)
        if not k:
            tail = sql[j:]
            break
        i = k.end()
    return ctes, tail, recursive


def main(sf_dir, out_dir, json_out, name_re):
    con = duckdb.connect()
    con.execute(
        f"SET memory_limit='{os.environ.get('PROBE_MEM_LIMIT', '60GB')}'")
    con.execute(f"SET temp_directory='/tmp/duck_spill_{os.getpid()}'")
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                        f"read_parquet('{p}/*.parquet')")
        elif os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    results = {}
    n_fail = 0
    for name in sorted(k for k in oracles if re.search(name_re, k)):
        sql = oracles[name]
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            results[name] = {"ok": False, "err": "no spark output"}
            n_fail += 1
            continue
        t0 = time.time()
        try:
            ctes, tail, recursive = split_ctes(sql)
            # round-trip check: reassembling the parse must reproduce
            # the oracle text, or the paren scan mis-split something
            kw = "WITH RECURSIVE " if recursive else "WITH "
            rebuilt = kw + ",\n".join(
                f"{n} AS {'MATERIALIZED ' if m else ''}({b})"
                for n, b, m in ctes) + tail
            if re.sub(r"\s+", " ", rebuilt).strip() != \
               re.sub(r"\s+", " ", sql).strip():
                raise RuntimeError("CTE parse round-trip mismatch")
            staged = []  # names materialized so far
            for i, (cte_name, body, _mat) in enumerate(ctes):
                shims = ",\n".join(
                    f"{n} AS (SELECT * FROM t_{n})" for n in staged)
                prefix = kw + (shims + ",\n" if shims else "")
                con.execute(f"DROP TABLE IF EXISTS t_{cte_name}")
                con.execute(
                    f"CREATE TEMP TABLE t_{cte_name} AS {prefix}"
                    f"{cte_name} AS ({body}) SELECT * FROM {cte_name}")
                staged.append(cte_name)
            shims = ",\n".join(
                f"{n} AS (SELECT * FROM t_{n})" for n in staged)
            exp = con.execute(kw + shims + tail).fetch_arrow_table()
            got = con.execute(
                f"SELECT * FROM read_parquet({files!r})").fetch_arrow_table()
            for n in staged:
                con.execute(f"DROP TABLE IF EXISTS t_{n}")
            gcols = sorted(got.column_names)
            ecols = sorted(exp.column_names)
            if gcols != ecols:
                print(f"FAIL {name}: columns {gcols} vs {ecols}")
                results[name] = {"ok": False,
                                 "err": f"columns {gcols} vs {ecols}"}
                n_fail += 1
                continue
            if got.num_rows != exp.num_rows:
                print(f"FAIL {name}: rows {got.num_rows} vs {exp.num_rows}")
                results[name] = {"ok": False,
                                 "err": f"rows {got.num_rows} vs "
                                        f"{exp.num_rows}"}
                n_fail += 1
                continue
            g = [tuple(r[c] for c in gcols) for r in got.to_pylist()]
            e = [tuple(r[c] for c in ecols) for r in exp.to_pylist()]
            bad = [(i, a, b) for i, (a, b) in enumerate(zip(g, e)) if a != b]
            if bad:
                i, a, b = bad[0]
                print(f"FAIL {name}: {len(bad)}/{len(g)} rows differ; "
                      f"first at {i}:\n  spark={a}\n  duck ={b}")
                results[name] = {"ok": False,
                                 "err": f"{len(bad)}/{len(g)} rows differ"}
                n_fail += 1
                continue
            decs = [f"{side}:{f.name}:{f.type}"
                    for side, tbl in (("spark", got), ("duck", exp))
                    for f in tbl.schema if pt.is_decimal(f.type)]
            if decs:
                print(f"FAIL {name}: decimal128 in output: {decs}")
                results[name] = {"ok": False, "err": f"decimal128: {decs}"}
                n_fail += 1
                continue
            print(f"PASS {name} ({got.num_rows} rows; staged-CTE "
                  f"evaluation; {time.time() - t0:.0f}s)", flush=True)
            results[name] = {
                "ok": True, "rows": got.num_rows,
                "note": "staged-CTE evaluation (each CTE materialized "
                        "once, in order; oracle text otherwise verbatim)"}
        except Exception as ex:
            print(f"FAIL {name}: oracle error {ex}")
            results[name] = {"ok": False, "err": f"oracle error {ex}"}
            n_fail += 1
    json.dump(results, open(json_out, "w"), indent=1, sort_keys=True)
    print(f"{len(results) - n_fail} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], sys.argv[3], sys.argv[4]))
