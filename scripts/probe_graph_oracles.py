#!/usr/bin/env python3
"""Scale-probe runner for the four GRAPH oracle rows (sf10 close-out).

At sf10 the one-shot oracle SQL is disk-infeasible in DuckDB: every
graph twin opens with the same edge CTE `e` (a lineitem self-join +
DISTINCT over ~10^8.5 pairs), the engine inlines it per reference, and
the repeated build spills >60 GB — the r15 sweep died on ENOSPC in the
spill directory, not on a wrong answer. The r15 verdict's sanctioned
remedy: STAGE the shared CTE. This runner materializes the edge set
ONCE as a temp table (the exact CTE text, executed verbatim) and
mechanically substitutes `e AS (SELECT src, dst FROM <table>)` into the
otherwise-unchanged oracle SQL — the substitution is asserted to match
exactly once per query, so the algebra compared is the committed
oracle's, only its evaluation order is staged. Everything downstream of
`e` builds only node-sized (~|parts|) hash tables, so the stage is the
whole fix.

Compare = scripts/check.py's multiset fast path, verbatim semantics:
row count, sorted column set, EXCEPT ALL in both directions, and the
driver's decimal128 hash-red rule.

Usage: probe_graph_oracles.py <sfDir> <verifyOutDir> <jsonOut>
Env: PROBE_MEM_LIMIT (default 60GB), PROBE_THREADS (optional)
"""
import sys, json, glob, os, re, time
import duckdb
import pyarrow.types as pt

# the two edge-CTE bodies as Verify dumps them (SparkEntry's oracle
# text) — substitution FAILS LOUDLY if the committed SQL ever drifts
# from these, so the probe can never silently run a different oracle
E_NE = (
    "e AS (\n"
    "  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst\n"
    "  FROM lineitem a JOIN lineitem b\n"
    "    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey)")
E_LT = E_NE.replace("a.l_partkey <> b.l_partkey", "a.l_partkey < b.l_partkey")

QUERIES = {
    "graph_bfs_3hop": "ne",
    "graph_edge_jaccard": "ne",
    "graph_pagerank": "ne",
    "graph_triangles": "lt",
}

# graph_edge_jaccard needs ONE more staging level: its `scored` CTE
# (an edge×adj×adj double join whose QUALIFY window then sorts the
# symmetric closure) spilled >60 GB evaluated in one shot even with
# the edge table staged. The adj and scored CTE bodies below are the
# oracle text verbatim (asserted, like the edge CTE); scored is built
# in disjoint x.src % K passes — disjoint partitions of the output,
# so the union of passes IS the one-shot result.
ADJ_CTE = "adj AS (SELECT src, list(DISTINCT dst) AS nbrs FROM e GROUP BY 1)"
SCORED_CTE = (
    "scored AS (\n"
    "  SELECT x.src, x.dst,\n"
    "    len(list_intersect(u.nbrs, v.nbrs))::BIGINT AS common,\n"
    "    len(list_intersect(u.nbrs, v.nbrs))::DOUBLE\n"
    "      / (len(u.nbrs) + len(v.nbrs)\n"
    "         - len(list_intersect(u.nbrs, v.nbrs))) AS sim\n"
    "  FROM e x JOIN adj u ON u.src = x.src\n"
    "           JOIN adj v ON v.src = x.dst\n"
    "  WHERE x.src < x.dst)")


# graph_pagerank's three iteration CTEs each re-evaluate their
# predecessors (rN is referenced twice by rN+1), so the one-shot query
# runs SEVEN 240M-row contrib aggregations whose spill accumulates for
# the statement's whole lifetime — ENOSPC even with the edge table
# staged. Staged form: deg/nodes once, then r1 and r2 as temp tables
# built SEQUENTIALLY (each a single contrib aggregation + left join,
# its spill freed at statement end); the final statement evaluates
# only r3. The CTE bodies are the oracle text verbatim (asserted).
def rank_cte(n):
    prev = f"r{n - 1}"
    return (
        f"r{n} AS (\n"
        "  SELECT n.node,\n"
        "    150000 + (85 * COALESCE(s.contrib, 0)) // 100 AS rank_micro\n"
        "  FROM nodes n LEFT JOIN (SELECT e.dst AS node,"
        " sum(r.rank_micro // d.outdeg)::BIGINT AS contrib\n"
        f"    FROM e JOIN {prev} r ON r.node = e.src\n"
        "           JOIN deg d ON d.src = e.src\n"
        "    GROUP BY 1) s\n"
        "    ON s.node = n.node)")


DEG_CTE = "deg AS (SELECT src, count(*)::BIGINT AS outdeg FROM e GROUP BY 1)"
NODES_CTE = "nodes AS (SELECT DISTINCT src AS node FROM e)"
R0_CTE = "r0 AS (SELECT node, 1000000::BIGINT AS rank_micro FROM nodes)"


def stage_pagerank(con, t0):
    con.execute("CREATE TEMP TABLE t_deg AS SELECT src, "
                "count(*)::BIGINT AS outdeg FROM e_ne GROUP BY 1")
    con.execute("CREATE TEMP TABLE t_nodes AS "
                "SELECT DISTINCT src AS node FROM e_ne")
    con.execute("CREATE TEMP TABLE t_r0 AS SELECT node, "
                "1000000::BIGINT AS rank_micro FROM t_nodes")
    for n in (1, 2):
        con.execute(
            f"CREATE TEMP TABLE t_r{n} AS\n"
            "  SELECT n.node,\n"
            "    150000 + (85 * COALESCE(s.contrib, 0)) // 100"
            " AS rank_micro\n"
            "  FROM t_nodes n LEFT JOIN (SELECT e.dst AS node,"
            " sum(r.rank_micro // d.outdeg)::BIGINT AS contrib\n"
            f"    FROM e_ne e JOIN t_r{n - 1} r ON r.node = e.src\n"
            "           JOIN t_deg d ON d.src = e.src\n"
            "    GROUP BY 1) s\n"
            "    ON s.node = n.node")
        print(f"  pagerank r{n} staged ({time.time() - t0:.0f}s)",
              flush=True)


def stage_jaccard(con, parts, t0):
    con.execute("CREATE TEMP TABLE t_adj AS "
                "SELECT src, list(DISTINCT dst) AS nbrs "
                "FROM e_ne GROUP BY 1")
    print(f"  jaccard adj staged ({time.time() - t0:.0f}s)", flush=True)
    con.execute("CREATE TEMP TABLE t_scored "
                "(src BIGINT, dst BIGINT, common BIGINT, sim DOUBLE)")
    for k in range(parts):
        con.execute(
            "INSERT INTO t_scored\n"
            "  SELECT x.src, x.dst,\n"
            "    len(list_intersect(u.nbrs, v.nbrs))::BIGINT AS common,\n"
            "    len(list_intersect(u.nbrs, v.nbrs))::DOUBLE\n"
            "      / (len(u.nbrs) + len(v.nbrs)\n"
            "         - len(list_intersect(u.nbrs, v.nbrs))) AS sim\n"
            "  FROM e_ne x JOIN t_adj u ON u.src = x.src\n"
            "           JOIN t_adj v ON v.src = x.dst\n"
            f"  WHERE x.src < x.dst AND x.src % {parts} = {k}")
        print(f"  jaccard scored pass {k + 1}/{parts} "
              f"({time.time() - t0:.0f}s)", flush=True)


def main(sf_dir, out_dir, json_out):
    con = duckdb.connect()
    con.execute(f"SET memory_limit='{os.environ.get('PROBE_MEM_LIMIT', '60GB')}'")
    con.execute(f"SET temp_directory='/tmp/duck_spill_{os.getpid()}'")
    if os.environ.get("PROBE_THREADS"):
        con.execute(f"SET threads={os.environ['PROBE_THREADS']}")
    for t in ("lineitem",):
        p = f"{sf_dir}/{t}.parquet"
        src = f"'{p}/*.parquet'" if os.path.isdir(p) else f"'{p}'"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet({src})")

    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    results = {}
    only = os.environ.get("PROBE_ONLY")
    queries = {k: v for k, v in QUERIES.items()
               if not only or re.search(only, k)}

    # stage the shared edge set once: the <> variant's pair generation
    # verbatim, the < variant derived from it (the pair set is
    # symmetric, so filtering src < dst equals running the CTE with the
    # < join predicate). The DISTINCT runs in DISJOINT src-partition
    # passes (src % K): distinct-within-partition over disjoint
    # partitions IS the global distinct, and each pass's hash state —
    # the thing that spilled past the disk in one shot — is 1/K the
    # size and freed before the next pass.
    t0 = time.time()
    parts = int(os.environ.get("PROBE_STAGE_PARTS", "8"))
    con.execute("CREATE TEMP TABLE e_ne (src BIGINT, dst BIGINT)")
    for k in range(parts):
        con.execute(
            "INSERT INTO e_ne\n"
            "SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst\n"
            "FROM lineitem a JOIN lineitem b\n"
            "  ON a.l_orderkey = b.l_orderkey"
            " AND a.l_partkey <> b.l_partkey\n"
            f"WHERE a.l_partkey % {parts} = {k}")
        print(f"  edge pass {k + 1}/{parts} done "
              f"({time.time() - t0:.0f}s)", flush=True)
    con.execute("CREATE TEMP TABLE e_lt AS "
                "SELECT src, dst FROM e_ne WHERE src < dst")
    n_ne = con.execute("SELECT count(*) FROM e_ne").fetchone()[0]
    print(f"staged edge CTE: {n_ne} directed edges in "
          f"{time.time() - t0:.0f}s ({parts} disjoint passes)", flush=True)

    n_fail = 0
    for name, variant in sorted(queries.items()):
        sql = oracles[name]
        cte = E_NE if variant == "ne" else E_LT
        if sql.count(cte) != 1:
            print(f"FAIL {name}: edge CTE text not found verbatim "
                  "(oracle drifted from the staged form)")
            results[name] = {"ok": False, "err": "edge CTE drift"}
            n_fail += 1
            continue
        staged = sql.replace(
            cte, f"e AS (SELECT src, dst FROM e_{variant})")
        if name == "graph_pagerank":
            needed = [DEG_CTE, NODES_CTE, R0_CTE,
                      rank_cte(1), rank_cte(2), rank_cte(3)]
            if any(sql.count(c) != 1 for c in needed):
                print(f"FAIL {name}: iteration CTE text not found "
                      "verbatim (oracle drifted from the staged form)")
                results[name] = {"ok": False, "err": "pagerank CTE drift"}
                n_fail += 1
                continue
            stage_pagerank(con, time.time())
            staged = (staged
                .replace(DEG_CTE,
                         "deg AS (SELECT src, outdeg FROM t_deg)")
                .replace(NODES_CTE,
                         "nodes AS (SELECT node FROM t_nodes)")
                .replace(R0_CTE,
                         "r0 AS (SELECT node, rank_micro FROM t_r0)")
                .replace(rank_cte(1),
                         "r1 AS (SELECT node, rank_micro FROM t_r1)")
                .replace(rank_cte(2),
                         "r2 AS (SELECT node, rank_micro FROM t_r2)"))
        if name == "graph_edge_jaccard":
            if sql.count(ADJ_CTE) != 1 or sql.count(SCORED_CTE) != 1:
                print(f"FAIL {name}: adj/scored CTE text not found "
                      "verbatim (oracle drifted from the staged form)")
                results[name] = {"ok": False, "err": "adj/scored CTE drift"}
                n_fail += 1
                continue
            stage_jaccard(con, parts, time.time())
            staged = staged.replace(
                ADJ_CTE, "adj AS (SELECT src, nbrs FROM t_adj)").replace(
                SCORED_CTE,
                "scored AS (SELECT src, dst, common, sim FROM t_scored)")
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            results[name] = {"ok": False, "err": "no spark output"}
            n_fail += 1
            continue
        t1 = time.time()
        try:
            gcols = sorted(con.execute(
                f"SELECT * FROM read_parquet({files!r}) LIMIT 0"
            ).fetch_arrow_table().column_names)
            con.execute("DROP VIEW IF EXISTS __exp_v")
            con.execute(f"CREATE TEMP VIEW __exp_v AS {staged}")
            ecols = sorted(con.execute(
                "SELECT * FROM __exp_v LIMIT 0"
            ).fetch_arrow_table().column_names)
            if gcols != ecols:
                print(f"FAIL {name}: columns {gcols} vs {ecols}")
                results[name] = {"ok": False,
                                 "err": f"columns {gcols} vs {ecols}"}
                n_fail += 1
                continue
            n_got = con.execute(
                f"SELECT count(*) FROM read_parquet({files!r})").fetchone()[0]
            n_exp = con.execute(
                "SELECT count(*) FROM __exp_v").fetchone()[0]
            if n_got != n_exp:
                print(f"FAIL {name}: rows {n_got} vs {n_exp}")
                results[name] = {"ok": False,
                                 "err": f"rows {n_got} vs {n_exp}"}
                n_fail += 1
                continue
            cols = ", ".join(f'"{c}"' for c in gcols)
            d1 = con.execute(
                f"SELECT count(*) FROM (SELECT {cols} FROM "
                f"read_parquet({files!r}) EXCEPT ALL "
                f"SELECT {cols} FROM __exp_v)").fetchone()[0]
            d2 = con.execute(
                f"SELECT count(*) FROM (SELECT {cols} FROM __exp_v "
                f"EXCEPT ALL SELECT {cols} FROM "
                f"read_parquet({files!r}))").fetchone()[0]
            if d1 or d2:
                print(f"FAIL {name}: multiset differs "
                      f"(spark-only {d1}, duck-only {d2} of {n_got})")
                results[name] = {"ok": False,
                                 "err": f"multiset diff {d1}/{d2}"}
                n_fail += 1
                continue
            decs = [
                f"{side}:{f.name}:{f.type}"
                for side, q in (
                    ("spark",
                     f"SELECT * FROM read_parquet({files!r}) LIMIT 0"),
                    ("duck", "SELECT * FROM __exp_v LIMIT 0"))
                for f in con.execute(q).fetch_arrow_table().schema
                if pt.is_decimal(f.type)]
            if decs:
                print(f"FAIL {name}: decimal128 in output: {decs}")
                results[name] = {"ok": False, "err": f"decimal128: {decs}"}
                n_fail += 1
                continue
            print(f"PASS {name} ({n_got} rows; multiset compare, staged "
                  f"edge CTE; {time.time() - t1:.0f}s)", flush=True)
            results[name] = {
                "ok": True, "rows": n_got,
                "note": "multiset compare (staged edge CTE - the shared "
                        "e CTE materialized once; oracle text otherwise "
                        "verbatim)"}
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}")
            results[name] = {"ok": False, "err": f"oracle error {e}"}
            n_fail += 1
    json.dump(results, open(json_out, "w"), indent=1, sort_keys=True)
    print(f"{len(results) - n_fail} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], sys.argv[3]))
