#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: check_oracle.py <sfDir> <verifyOutDir>

Registers every parquet in sfDir as a DuckDB view, runs each SQL from
<verifyOutDir>/oracle_sql.json, reads the Spark result parquet written
by graft.Verify, sorts columns by name + rows by all columns, and
compares cell-by-cell (exact for non-floats; floats must match to
1e-9 relative — also reports max abs diff so near-misses are visible).
"""
import duckdb, glob, json, math, os, sys

def canon(rows, cols):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(r[i] for i in idx) for r in rows]
    return sorted(out, key=lambda t: tuple((v is None, str(v)) for v in t)), [cols[i] for i in idx]

def col_types(con, sql):
    """name -> canonical type class for a query's result columns.

    The driver's hash treats all machine-width ints alike (INTEGER vs
    BIGINT both passed r1) but NOT HUGEINT (python int overflow path) —
    so canonicalize {U,}{TINY,SMALL,}INT/INTEGER/BIGINT to 'INT' and
    keep everything else (HUGEINT, DECIMAL(...), DOUBLE, ...) verbatim.
    """
    rows = con.execute(f"DESCRIBE ({sql})").fetchall()
    ints = {"TINYINT", "SMALLINT", "INTEGER", "BIGINT",
            "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"}
    return {r[0]: ("INT" if r[1] in ints else r[1]) for r in rows}

def cell_eq(a, b):
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return False
        if math.isnan(fa) and math.isnan(fb):
            return True
        return fa == fb or abs(fa - fb) <= 1e-9 * max(1.0, abs(fa), abs(fb))
    return str(a) == str(b)

def main(sfdir, outdir):
    con = duckdb.connect()
    for p in sorted(glob.glob(f"{sfdir}/*.parquet")):
        name = os.path.basename(p)[:-len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        spark_dir = f"{outdir}/{name}"
        if not os.path.isdir(spark_dir):
            print(f"FAIL {name}: no spark output dir"); n_fail += 1; continue
        try:
            duck = con.execute(oracle[name])
            dcols = [d[0] for d in duck.description]
            drows = duck.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}"); n_fail += 1; continue
        try:
            sp = con.execute(f"SELECT * FROM read_parquet('{spark_dir}/*.parquet')")
            scols = [d[0] for d in sp.description]
            srows = sp.fetchall()
        except Exception as e:
            print(f"FAIL {name}: spark parquet read error: {e}"); n_fail += 1; continue
        drows, dcols = canon(drows, dcols)
        srows, scols = canon(srows, scols)
        if dcols != scols:
            print(f"FAIL {name}: columns differ spark={scols} duck={dcols}"); n_fail += 1; continue
        # Driver's hash is type-sensitive: compare DuckDB-reported types and
        # reject HUGEINT leakage from oracle aggregates (SUM/list_sum return
        # HUGEINT — must be CAST(... AS BIGINT) in the oracle SQL).
        dtypes = col_types(con, oracle[name])
        stypes = col_types(con, f"SELECT * FROM read_parquet('{spark_dir}/*.parquet')")
        tbad = [(c, stypes.get(c), dtypes.get(c)) for c in dcols
                if dtypes.get(c) != stypes.get(c) or "HUGEINT" in str(dtypes.get(c))]
        if tbad:
            c, st, dt = tbad[0]
            print(f"FAIL {name}: col {c} type spark={st} duck={dt} "
                  f"(HUGEINT in oracle => CAST to BIGINT)"); n_fail += 1; continue
        if len(drows) != len(srows):
            print(f"FAIL {name}: rowcount spark={len(srows)} duck={len(drows)}"); n_fail += 1; continue
        bad = None
        for i, (dr, sr) in enumerate(zip(drows, srows)):
            for j, (dv, sv) in enumerate(zip(dr, sr)):
                if not cell_eq(dv, sv):
                    bad = (i, dcols[j], sv, dv); break
            if bad: break
        if bad:
            i, c, sv, dv = bad
            print(f"FAIL {name}: row {i} col {c}: spark={sv!r} duck={dv!r}"); n_fail += 1
        else:
            print(f"PASS {name} ({len(srows)} rows)"); n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
