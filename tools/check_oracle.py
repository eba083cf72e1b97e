#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness gate.

Usage: python3 tools/check_oracle.py <sfdir> <verify_outdir>

Registers each testdata parquet as a DuckDB view named after the table,
runs every oracle_sql.json entry, and compares against the Spark result
parquet written by graft.Verify: column-name set, row count, and
value-level equality after sorting columns by name and rows by all
columns (floats compared to 1e-9 rel tol to be *stricter* than a hash
of rounded values).
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        return round(v, 9)
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    return v


def sort_key_val(v):
    # Coarse float keys (6 significant digits) keep tolerance-equal rows
    # adjacent after sorting. Any quantization has boundary cases in both
    # directions (distinct values collapsing onto one key, near-equal
    # values straddling a boundary) — those surface as POSITIONAL
    # mismatches, which the tolerant multiset repair pass in main()
    # resolves, so the key only affects mismatch-set size, never the
    # verdict.
    if isinstance(v, float):
        return f"{v:.6g}"
    if isinstance(v, tuple):
        return tuple((x is None, sort_key_val(x)) for x in v)
    return str(v)


def rows_key(rows):
    return sorted([tuple(norm(v) for v in r) for r in rows],
                  key=lambda r: tuple((x is None, sort_key_val(x)) for x in r))


def approx_eq(a, b):
    if a is None or b is None:
        return a is b
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return str(a) == str(b)
        if math.isnan(fa) and math.isnan(fb):
            return True
        return abs(fa - fb) <= 1e-9 * max(1.0, abs(fa), abs(fb))
    if isinstance(a, tuple) and isinstance(b, tuple):
        return len(a) == len(b) and all(approx_eq(x, y) for x, y in zip(a, b))
    return a == b


def main(sfdir, outdir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = n_typediff = 0
    for name, sql in sorted(oracle.items()):
        try:
            want_rel = con.sql(sql)
            want_cols = list(want_rel.columns)
            want_types = {c: str(t) for c, t in zip(want_cols, want_rel.types)}
            want_rows = want_rel.fetchall()
            got_rel = con.sql(
                f"SELECT * FROM '{outdir}/{name}/*.parquet'")
            got_cols = list(got_rel.columns)
            got_types = {c: str(t) for c, t in zip(got_cols, got_rel.types)}
            got_rows = got_rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: exception {e}")
            n_fail += 1
            continue
        # Driver-hash early warning: unit-typed timestamps (TIMESTAMP_MS/NS)
        # or HUGEINT on the oracle side hash differently even when values
        # match (round-1 q18/q38). Reported, not failed — some width diffs
        # (e.g. Spark INT vs DuckDB BIGINT literals) are benign to the driver.
        diffs = [f"{c}: oracle={want_types[c]} spark={got_types.get(c)}"
                 for c in want_cols
                 if c in got_types and want_types[c] != got_types[c]]
        if diffs:
            n_typediff += 1
            print(f"TYPEDIFF {name}: {'; '.join(diffs)}")
        if sorted(want_cols) != sorted(got_cols):
            print(f"FAIL {name}: cols want={sorted(want_cols)} got={sorted(got_cols)}")
            n_fail += 1
            continue
        if len(want_rows) != len(got_rows):
            print(f"FAIL {name}: rows want={len(want_rows)} got={len(got_rows)}")
            n_fail += 1
            continue
        # align column order by sorted name
        wi = [want_cols.index(c) for c in sorted(want_cols)]
        gi = [got_cols.index(c) for c in sorted(got_cols)]
        w = rows_key([[r[i] for i in wi] for r in want_rows])
        g = rows_key([[r[i] for i in gi] for r in got_rows])
        # positional compare, then repair: rows that mis-sorted (equal
        # coarse keys in input order, or tolerance-equal values straddling
        # a key boundary) are re-paired as a tolerant multiset — O(m^2)
        # only over the mismatch set, which is empty on the happy path
        mism = [i for i, (a, b) in enumerate(zip(w, g))
                if not approx_eq(tuple(a), tuple(b))]
        unmatched = None
        if mism:
            ga = [g[i] for i in mism]
            used = [False] * len(ga)
            for i in mism:
                hit = next((k for k, b in enumerate(ga)
                            if not used[k] and approx_eq(tuple(w[i]), tuple(b))), None)
                if hit is None:
                    unmatched = i
                    break
                used[hit] = True
        if unmatched is not None:
            print(f"FAIL {name}: unmatched sorted-row {unmatched}:")
            print(f"  want {w[unmatched]}")
            print(f"  got  {g[unmatched]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(want_rows)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail, {n_typediff} typediff ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
