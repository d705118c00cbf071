#!/usr/bin/env python3
"""Local pre-flight for the driver's correctness gate.

Runs graft.Verify output (parquet per query) against the oracle SQL in
DuckDB over the same testdata dir, compares row-by-row after sorting
columns by name (mirroring the driver's compare).

Usage: python3 tools/check.py <sfDir> <verifyOutDir>
"""
import json, sys, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def type_kind(t):
    """Collapse a DuckDB logical type to a comparison class.

    The driver's hash compare is value-typed, so an INT column on one
    side and a DOUBLE on the other hash-mismatches even when every
    value is numerically identical (the q_compat_r14misc epoch() bug).
    Compare type KINDS on both sides so that class of bug dies locally.
    HUGEINT deliberately maps to the same kind as BIGINT: the driver
    normalizes integer widths, and the house rule already requires
    casting sum(BIGINT) oracles explicitly.
    """
    s = str(t).upper()
    if s.endswith("[]"):
        return type_kind(s[:-2]) + "[]"
    if s.startswith("DECIMAL"):
        return "decimal"
    if s in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT", "HUGEINT",
             "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT", "UHUGEINT"):
        return "int"
    if s in ("FLOAT", "REAL", "DOUBLE"):
        return "float"
    if s in ("VARCHAR", "STRING", "TEXT"):
        return "str"
    if s == "BOOLEAN":
        return "bool"
    if s == "DATE":
        return "date"
    if s.startswith("TIMESTAMP"):
        return "timestamp"
    return s


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 6)
    # list-valued columns (posting lists, quantized vectors) arrive as
    # numpy arrays from parquet and as python lists from DuckDB —
    # normalize both to plain tuples so row comparison stays total
    if hasattr(v, "tolist"):
        return tuple(norm(x) for x in v.tolist())
    if isinstance(v, (list, tuple)):
        return tuple(norm(x) for x in v)
    return v


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        try:
            grel = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            g_types = {c: type_kind(t)
                       for c, t in zip(grel.columns, grel.types)}
            got = grel.fetchdf()
        except Exception as e:
            print(f"FAIL {name}: no spark output ({e})")
            n_bad += 1
            continue
        try:
            erel = con.sql(sql)
            e_types = {c: type_kind(t)
                       for c, t in zip(erel.columns, erel.types)}
            exp = erel.fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            n_bad += 1
            continue
        g_cols, e_cols = sorted(got.columns), sorted(exp.columns)
        if g_cols != e_cols:
            print(f"FAIL {name}: columns differ spark={g_cols} oracle={e_cols}")
            n_bad += 1
            continue
        t_mism = [(c, g_types[c], e_types[c]) for c in g_cols
                  if g_types[c] != e_types[c]]
        if t_mism:
            print(f"FAIL {name}: column TYPE kinds differ "
                  f"(spark vs oracle): {t_mism}")
            n_bad += 1
            continue
        got = got[g_cols]
        exp = exp[e_cols]
        if len(got) != len(exp):
            print(f"FAIL {name}: rows spark={len(got)} oracle={len(exp)}")
            n_bad += 1
            continue
        grows = [tuple(norm(v) for v in r) for r in got.itertuples(index=False)]
        erows = [tuple(norm(v) for v in r) for r in exp.itertuples(index=False)]
        mism = [(i, a, b) for i, (a, b) in enumerate(zip(grows, erows)) if a != b]
        if mism:
            i, a, b = mism[0]
            print(f"FAIL {name}: {len(mism)}/{len(grows)} rows differ; "
                  f"first at {i}:\n  spark : {a}\n  oracle: {b}")
            n_bad += 1
        else:
            print(f"ok   {name} ({len(grows)} rows)")
            n_ok += 1
    print(f"\n{n_ok} ok, {n_bad} fail")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
