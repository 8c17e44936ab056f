#!/usr/bin/env python3
"""Local replica of the driver's DuckDB oracle compare.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

For each query in <verifyOutDir>/oracle_sql.json: run the SQL in DuckDB
(views over <sfDir>/*.parquet), load the Spark result parquet, sort
columns by name and rows by all columns, and diff values.
"""
import json, sys, glob, os
import duckdb
import pandas as pd

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize everything to strings for a hash-like compare
    out = pd.DataFrame()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_float_dtype(s):
            # Byte-faithful like the driver's hasher: str() of the float64,
            # NOT a %.6f normalization. A decimal-vs-float or last-ulp
            # divergence must FAIL here exactly as it fails the driver
            # (round-1 lesson: %.6f hid 6 decimal-canonicalization fails).
            # Non-finite/signed-zero caveat: str() renders 'inf'/'-inf'/
            # '-0.0'; the driver's renderer is unobservable from here, but
            # canon() is applied to BOTH sides, so a divergence could only
            # matter if the two ENGINES disagree on producing such a value
            # — no current query emits inf/nan, and -0.0 would have to
            # differ between engines to flip a verdict.
            out[c] = s.map(lambda v: "null" if pd.isna(v) else str(float(v)))
        elif pd.api.types.is_datetime64_any_dtype(s):
            out[c] = s.map(lambda v: "null" if pd.isna(v) else v.isoformat())
        else:
            out[c] = s.map(lambda v: "null" if v is None or (isinstance(v, float) and pd.isna(v)) else str(v))
    out = out.sort_values(by=list(out.columns)).reset_index(drop=True)
    return out

def main():
    # --subset: compare only the queries present in oracle_sql.json and
    # skip the README count audit — the in-process spec tripwire
    # (AnnRecallSpec) feeds a 2-query subset through the same compare.
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for p in glob.glob(f"{sf_dir}/*.parquet"):
        name = os.path.basename(p)[:-8]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = 0
    for name, sql in sorted(oracles.items()):
        spark_files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not spark_files:
            print(f"FAIL {name}: no spark output")
            continue
        try:
            oracle = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            continue
        spark = con.execute(
            f"SELECT * FROM read_parquet({spark_files!r})").df()
        o, s = canon(oracle), canon(spark)
        if list(o.columns) != list(s.columns):
            print(f"FAIL {name}: columns oracle={list(o.columns)} spark={list(s.columns)}")
            continue
        if len(o) != len(s):
            print(f"FAIL {name}: rows oracle={len(o)} spark={len(s)}")
            continue
        neq = (o != s)
        if neq.any().any():
            bad_cols = [c for c in o.columns if neq[c].any()]
            print(f"FAIL {name}: value diff in {bad_cols}")
            for c in bad_cols[:3]:
                i = neq[c].idxmax()
                print(f"   row {i} col {c}: oracle={o[c][i]!r} spark={s[c][i]!r}")
            continue
        print(f"OK   {name} ({len(o)} rows)")
        n_ok += 1
    print(f"{n_ok}/{len(oracles)} ok")
    if "--subset" not in sys.argv:
        check_readme_counts(out_dir, len(oracles))
    # a failed oracle comparison must fail the run at least as loudly
    # as a README count drift does
    if n_ok < len(oracles):
        sys.exit(1)

def check_readme_counts(out_dir, n_oracles):
    """README's query/test totals drifted twice across rounds; derive
    them from the artifacts instead of trusting the hand-sync. Fails
    the run (exit 1) on any mismatch."""
    import re
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    readme = open(os.path.join(root, "README.md")).read()
    n_queries = len([d for d in os.listdir(out_dir) if d != "oracle_sql.json"])
    n_tests = 0
    for p in glob.glob(os.path.join(root, "src/test/scala/graft/*.scala")):
        n_tests += len(re.findall(r"^\s+test\(", open(p).read(), re.M))
    problems = []
    for label, actual, pats in [
        ("oracle-backed queries", n_oracles, [r"(\d+) oracle-backed queries"]),
        ("total queries", n_queries, [r"(\d+)-query suite"]),
        ("tests", n_tests, [r"\((\d+) tests\)", r"(\d+) ScalaTest specs"]),
    ]:
        for pat in pats:
            ms = re.findall(pat, readme)
            if not ms:
                # a reworded README must FAIL, not silently disable the
                # guard: zero matches means the count is no longer pinned
                problems.append(
                    f"README no longer matches {pat!r} ({label}); "
                    "update the wording AND this checker together")
            for m in ms:
                if int(m) != actual:
                    problems.append(
                        f"README claims {m} {label}; actual is {actual}")
    if problems:
        for p in problems:
            print(f"FAIL readme-counts: {p}")
        sys.exit(1)
    print(f"OK   readme-counts ({n_oracles} oracle / {n_queries} queries / "
          f"{n_tests} tests)")

if __name__ == "__main__":
    main()
