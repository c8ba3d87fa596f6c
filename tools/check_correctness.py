#!/usr/bin/env python3
"""Dev-only pre-verification harness (mimics the driver's t2 gate).

Runs each oracle SQL from <outDir>/oracle_sql.json in DuckDB against the
parquet tables in <sfDir>, loads the Spark result from <outDir>/<name>/,
and compares: row count, column names (sorted), and values.

Usage: python3 tools/check_correctness.py <sfDir> <outDir>
"""
import sys, json, glob, math
import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def load_spark_result(path):
    files = sorted(glob.glob(f"{path}/*.parquet"))
    if not files:
        return None
    import pyarrow as pa
    tabs = [pq.read_table(f) for f in files]
    return pa.concat_tables(tabs)

def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return v
    return v

import os
# GRAFT_EXACT=1: bit-level float equality, mimicking the driver's hash
# compare exactly (the default tolerance is a debugging aid only — a query
# that needs it would FAIL the driver gate)
EXACT = os.environ.get("GRAFT_EXACT", "") == "1"

import pyarrow as _pa

def types_compatible(dt, st):
    """True iff the driver's typed hash would treat columns of these arrow
    types identically. Calibrated against CORRECTNESS_r03: int64-vs-int32
    columns (q15 rk, q47 clean_len, ...) hash GREEN at the driver, so
    integer WIDTH is normalized; decimal128(5,2)-vs-double (q21 quality)
    hashes GREEN, so decimals coerce to float; decimal128-vs-int64
    (q34 session_idx) hashes RED, so int-vs-float KIND is not normalized.
    String/binary offset width (large_string vs string) is a writer
    detail, also normalized."""
    if dt.equals(st):
        return True
    def canon(t):
        if _pa.types.is_integer(t):
            return "int"
        if _pa.types.is_floating(t) or _pa.types.is_decimal(t):
            return "float"
        s = str(t)
        return {"large_string": "string", "large_binary": "binary"}.get(s, s)
    return canon(dt) == canon(st)

def values_equal(a, b):
    a, b = norm(a), norm(b)
    if isinstance(a, float) and isinstance(b, float):
        if a == b:
            # IEEE == treats -0.0 == 0.0; a bit-hashing driver does not
            if EXACT:
                return math.copysign(1.0, a) == math.copysign(1.0, b)
            return True
        if EXACT:
            return False
        # tolerate last-ulp drift only; flag anything bigger
        return abs(a - b) <= 1e-9 * max(1.0, abs(a), abs(b))
    return a == b

def check_q41(con, ours):
    """Sketch bound check: q41 has no hash oracle (HLL++/KLL internals are
    engine-specific), but the sketch CONTRACT is checkable against DuckDB
    exact values — approx_count_distinct(rsd=0.02) within 3*rsd = 6%
    relative error, and percentile_approx(0.5, acc=10000) by RANK: the
    exact CDF at the returned value must bracket 0.5 within 0.01 (100x
    the 1e-4 rank guarantee, so never flaky). Group keys and the exact
    count column still compare bit-equal."""
    errs = []
    rows = {r["l_returnflag"]: r for r in ours.to_pylist()}
    exact = con.execute(
        "SELECT l_returnflag, COUNT(DISTINCT l_orderkey) AS orders, COUNT(*) AS n "
        "FROM lineitem GROUP BY 1").arrow().to_pylist()
    if len(exact) != len(rows):
        errs.append(f"groups duck={len(exact)} spark={len(rows)}")
    for er in exact:
        g = er["l_returnflag"]
        sr = rows.get(g)
        if sr is None:
            errs.append(f"missing group {g!r}")
            continue
        if sr["n"] != er["n"]:
            errs.append(f"{g}: n spark={sr['n']} exact={er['n']}")
        rel = abs(sr["approx_orders"] - er["orders"]) / er["orders"]
        if rel > 0.06:
            errs.append(f"{g}: approx_orders rel err {rel:.4f} > 0.06 (3*rsd)")
        v = sr["approx_p50"]
        lt, le = con.execute(
            "SELECT COUNT(*) FILTER (WHERE l_extendedprice < ?) * 1.0 / COUNT(*), "
            "COUNT(*) FILTER (WHERE l_extendedprice <= ?) * 1.0 / COUNT(*) "
            "FROM lineitem WHERE l_returnflag = ?", [v, v, g]).fetchone()
        if not (lt <= 0.5 + 0.01 and le >= 0.5 - 0.01):
            errs.append(f"{g}: p50={v} CDF window [{lt:.4f},{le:.4f}] excludes 0.5±0.01")
    return errs

# Queries whose outputs are sketches: verified against DuckDB EXACT
# values within the sketch's declared error bound instead of by hash.
SKETCH_CHECKS = {"q41_approx_stats": check_q41}

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    # Verify.scala writes a manifest of queries that died at plan/run time;
    # surface those as explicit FAILs with the real engine message (round 7
    # shipped with 11 broken queries invisible because absence looked like
    # "not declared").
    try:
        query_errors = json.load(open(f"{out_dir}/errors.json"))
    except FileNotFoundError:
        query_errors = {}
    # Persisted alongside the dump so the round artifact trail carries a
    # machine-readable verdict per query (incl. bounds_pass for sketches),
    # not just printed lines.
    results = {}
    n_pass = n_fail = 0
    for name, check in sorted(SKETCH_CHECKS.items()):
        if name in query_errors:
            print(f"FAIL {name}: query error: {query_errors[name][:300]}")
            results[name] = {"pass": False, "bounds_pass": False,
                             "err": query_errors[name][:500]}
            n_fail += 1
            continue
        ours = load_spark_result(f"{out_dir}/{name}")
        if ours is None:
            continue  # query not in this (possibly filtered) dump
        errs = check(con, ours)
        if errs:
            print(f"FAIL {name}: {'; '.join(errs)}")
            results[name] = {"pass": False, "bounds_pass": False,
                             "err": "; ".join(errs)[:500]}
            n_fail += 1
        else:
            print(f"PASS(bounds) {name}: {ours.num_rows} rows within declared sketch bounds")
            results[name] = {"pass": True, "bounds_pass": True,
                             "spark_rows": ours.num_rows, "err": None}
            n_pass += 1
    for name, sql in sorted(oracle.items()):
        if name in query_errors:
            print(f"FAIL {name}: query error: {query_errors[name][:300]}")
            results[name] = {"pass": False, "err": query_errors[name][:500]}
            n_fail += 1
            continue
        try:
            duck = con.execute(sql).arrow()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            results[name] = {"pass": False, "err": f"duckdb error: {e}"[:500]}
            n_fail += 1
            continue
        ours = load_spark_result(f"{out_dir}/{name}")
        if ours is None:
            print(f"FAIL {name}: no spark output")
            results[name] = {"pass": False, "err": "no spark output"}
            n_fail += 1
            continue
        dcols, scols = sorted(duck.column_names), sorted(ours.column_names)
        if dcols != scols:
            print(f"FAIL {name}: columns differ duck={dcols} spark={scols}")
            results[name] = {"pass": False,
                             "err": f"columns differ duck={dcols} spark={scols}"[:500]}
            n_fail += 1
            continue
        # The driver hashes TYPED values: a decimal128 session_idx vs an
        # int64 one fails its hash even when every value matches (this is
        # exactly how q34 stayed red for two rounds while this checker said
        # PASS). Compare arrow types after the name sort; hard-fail in
        # EXACT mode, warn otherwise.
        type_bad = [
            (c, str(duck.schema.field(c).type), str(ours.schema.field(c).type))
            for c in dcols
            if not types_compatible(duck.schema.field(c).type, ours.schema.field(c).type)
        ]
        if type_bad:
            c, dt, st = type_bad[0]
            msg = f"{name}: col {c} type duck={dt} spark={st}"
            if EXACT:
                print(f"FAIL {msg} (typed driver hash would differ)")
                results[name] = {"pass": False, "err": f"type mismatch: {msg}"[:500]}
                n_fail += 1
                continue
            print(f"WARN {msg}")
        if duck.num_rows != ours.num_rows:
            print(f"FAIL {name}: rows duck={duck.num_rows} spark={ours.num_rows}")
            results[name] = {"pass": False,
                             "err": f"rows duck={duck.num_rows} spark={ours.num_rows}"}
            n_fail += 1
            continue
        drows = duck.select(dcols).to_pylist()
        srows = ours.select(dcols).to_pylist()
        bad = None
        for i, (dr, sr) in enumerate(zip(drows, srows)):
            for c in dcols:
                if not values_equal(dr[c], sr[c]):
                    bad = (i, c, dr[c], sr[c])
                    break
            if bad:
                break
        if bad:
            i, c, dv, sv = bad
            print(f"FAIL {name}: row {i} col {c}: duck={dv!r} spark={sv!r}")
            results[name] = {"pass": False,
                             "err": f"row {i} col {c}: duck={dv!r} spark={sv!r}"[:500]}
            n_fail += 1
        else:
            exact = all(norm(dr[c]) == norm(sr[c]) for dr, sr in zip(drows, srows) for c in dcols)
            tag = "PASS" if exact else "PASS~(1e-9)"
            print(f"{tag} {name}: {duck.num_rows} rows")
            results[name] = {"pass": True, "exact": exact,
                             "spark_rows": ours.num_rows, "err": None}
            n_pass += 1
    # Rows-only queries (no oracle, no sketch bounds — the ANN/hash-kernel
    # family): still require rows > 0 and surface runtime errors, so a
    # broken rows-only query cannot vanish from the artifact (the round-7
    # lesson applied to the last uncovered family). Iterate the manifest of
    # queries THIS Verify run executed (not os.listdir) so stale output
    # dirs from earlier runs / removed queries can't inflate the pass
    # total; fall back to listdir only for pre-manifest output dirs.
    manifest_path = f"{out_dir}/manifest.json"
    if os.path.exists(manifest_path):
        with open(manifest_path) as f:
            declared = sorted(json.load(f))
    else:
        declared = sorted(os.listdir(out_dir))
    for name in declared:
        if name in results or not os.path.isdir(f"{out_dir}/{name}"):
            continue
        if name in query_errors:
            print(f"FAIL {name}: query error: {query_errors[name][:300]}")
            results[name] = {"pass": False, "rows_only": True,
                             "err": query_errors[name][:500]}
            n_fail += 1
            continue
        ours = load_spark_result(f"{out_dir}/{name}")
        n = ours.num_rows if ours is not None else 0
        if n > 0:
            print(f"PASS(rows-only) {name}: {n} rows (no oracle by design)")
            results[name] = {"pass": True, "rows_only": True,
                             "spark_rows": n, "err": "no_oracle"}
            n_pass += 1
        else:
            print(f"FAIL {name}: rows-only query produced no rows")
            results[name] = {"pass": False, "rows_only": True,
                             "spark_rows": 0, "err": "no rows"}
            n_fail += 1
    for name, err in sorted(query_errors.items()):
        if name in results:
            continue
        print(f"FAIL {name}: query error (no output dir): {err[:300]}")
        results[name] = {"pass": False, "err": err[:500]}
        n_fail += 1
    with open(f"{out_dir}/correctness_local.json", "w") as f:
        json.dump(results, f, indent=1, sort_keys=True)
    # Breakdown COMPUTED from the per-query results, never hand-maintained:
    # round 9 shipped docs claiming 113 hash-exact while the driver measured
    # 112 (q107 was missing from every rows-only list). Quoting this line is
    # the only sanctioned way to cite the split in GATE.md/SURVEY.md/README.
    # "hash-exact" counts only records the value comparison found EXACT
    # (r["exact"]); in a non-EXACT run a query can pass at 1e-9 tolerance
    # with exact=False and must NOT inflate the hash-exact bucket — those
    # surface as a separate "tolerance-pass" count so the citation line
    # never overstates exactness (round-10 advice).
    n_hash = sum(1 for r in results.values()
                 if r.get("pass") and r.get("exact")
                 and not r.get("rows_only") and not r.get("bounds_pass"))
    n_tol = sum(1 for r in results.values()
                if r.get("pass") and not r.get("exact")
                and not r.get("rows_only") and not r.get("bounds_pass"))
    n_bounds = sum(1 for r in results.values() if r.get("pass") and r.get("bounds_pass"))
    rows_only = sorted(n for n, r in results.items() if r.get("pass") and r.get("rows_only"))
    print(f"\n{n_pass} passed, {n_fail} failed")
    tol_part = f", {n_tol} tolerance-pass (non-EXACT run)" if n_tol else ""
    print(f"breakdown: {n_hash} hash-exact, {n_bounds} bounds-checked, "
          f"{len(rows_only)} rows-only ({', '.join(q.split('_')[0] for q in rows_only)})"
          f"{tol_part}")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
