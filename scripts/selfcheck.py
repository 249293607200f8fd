#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate.

Runs graft.Verify's parquet output (outDir/<name>/ + oracle_sql.json) against
DuckDB over the same testdata dir, compares sorted rowsets cell-by-cell.

Usage: python3 scripts/selfcheck.py <sfDir> <verifyOutDir>
"""
import json, math, sys
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if hasattr(v, "timestamp"):  # datetime
        return str(v)
    if isinstance(v, (list, tuple)):
        return tuple(norm(x) for x in v)
    return v


def key(row):
    return tuple((str(type(c)), str(c)) for c in row)


def cmp_cell(a, b):
    a, b = norm(a), norm(b)
    if isinstance(a, float) and isinstance(b, float):
        if a == b:
            return True
        # report near-misses distinctly
        return False
    return a == b


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        import os
        if not os.path.isdir(f"{out_dir}/{name}"):
            continue  # not dumped in this (possibly filtered) Verify run
        try:
            rel_g = con.sql(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            got_cols = list(rel_g.columns)
            got_types = dict(zip(got_cols, (str(t) for t in rel_g.types)))
            got_rows = rel_g.fetchall()
            rel_e = con.sql(sql)
            exp_cols = list(rel_e.columns)
            exp_types = dict(zip(exp_cols, (str(t) for t in rel_e.types)))
            exp_rows = rel_e.fetchall()
        except Exception as e:
            print(f"FAIL {name}: exec error: {str(e).splitlines()[0][:160]}")
            n_fail += 1
            continue
        if sorted(got_cols) != sorted(exp_cols):
            print(f"FAIL {name}: columns spark={sorted(got_cols)} oracle={sorted(exp_cols)}")
            n_fail += 1
            continue
        # Declared-type parity: fetched Python values hide engine-width
        # differences (DuckDB HUGEINT and Spark BIGINT both arrive as int),
        # but the driver hashes with engine type tags — compare declared types.
        type_diffs = [
            (c, got_types[c], exp_types[c]) for c in sorted(got_cols)
            if got_types[c] != exp_types[c]]
        if type_diffs:
            detail = "; ".join(
                f"{c}: spark={a} oracle={b}" for c, a, b in type_diffs[:6])
            print(f"FAIL {name}: declared types differ: {detail}")
            n_fail += 1
            continue
        # align column order by name
        gi = [got_cols.index(c) for c in sorted(got_cols)]
        ei = [exp_cols.index(c) for c in sorted(exp_cols)]
        g = sorted([tuple(norm(r[i]) for i in gi) for r in got_rows], key=key)
        e = sorted([tuple(norm(r[i]) for i in ei) for r in exp_rows], key=key)
        if len(g) != len(e):
            print(f"FAIL {name}: rows spark={len(g)} oracle={len(e)}")
            n_fail += 1
            continue
        # python-type kind audit: int vs float vs str mismatches would break a
        # stringified value hash even when numerically equal
        if g and e:
            kinds_g = [type(v).__name__ for v in g[0]]
            kinds_e = [type(v).__name__ for v in e[0]]
            if kinds_g != kinds_e:
                print(f"WARN {name}: value kinds differ spark={kinds_g} oracle={kinds_e}")
        bad = None
        for i, (rg, re_) in enumerate(zip(g, e)):
            if rg != re_:
                # tolerate nothing, but diagnose floats
                diffs = [(c, a, b) for c, (a, b) in
                         enumerate(zip(rg, re_)) if a != b]
                bad = (i, diffs)
                break
        if bad:
            i, diffs = bad
            cols = sorted(got_cols)
            detail = "; ".join(
                f"{cols[c]}: spark={a!r} oracle={b!r}" for c, a, b in diffs[:4])
            print(f"FAIL {name}: row {i} differs: {detail}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(g)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
