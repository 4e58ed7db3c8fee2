#!/usr/bin/env python3
"""Self-check: mimic the driver's t2 gate. Run graft.Verify at a given SF,
then execute each oracle SQL in DuckDB over the same parquet tables and
compare (columns sorted by name, rows sorted, exact values)."""
import json, re, subprocess, sys, glob, os
import duckdb
import numpy as np
import pandas as pd

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def survey_gate():
    """SURVEY's measured blocks must BE the artifacts. Four consecutive
    rounds shipped measured numbers that diverged from the artifacts (r9:
    a literal '(placeholder)' inside the GENERATED markers) — this check
    makes that unshippable: every GENERATED block must be non-empty,
    placeholder-free, and SOME block must carry bench_out.json's current
    total, i.e. tools/survey_numbers.py was re-run against the shipped
    artifacts. Returns a list of problems (empty = green)."""
    problems = []
    try:
        survey = open(os.path.join(REPO, "SURVEY.md")).read()
    except FileNotFoundError:
        return ["SURVEY.md missing"]
    blocks = re.findall(
        r"<!-- (GENERATED-NUMBERS[-\w]*)-START -->(.*?)<!-- \1-END -->",
        survey, re.S)
    if not blocks:
        problems.append("no GENERATED-NUMBERS blocks found in SURVEY.md")
    for name, body in blocks:
        if "placeholder" in body.lower():
            problems.append(f"{name} block contains 'placeholder' — run "
                            "tools/survey_numbers.py and paste its output")
        if not body.strip():
            problems.append(f"{name} block is empty")
    try:
        with open(os.path.join(REPO, "bench_out.json")) as f:
            total = json.loads(f.readline())["value"]
        want = f"total **{total:.1f} s"
        if blocks and not any(want in body for _, body in blocks):
            problems.append(
                f"no GENERATED block carries the shipped bench total "
                f"('{want} …' from bench_out.json) — the measured block is "
                "stale; regenerate with tools/survey_numbers.py")
    except FileNotFoundError:
        problems.append("bench_out.json missing")
    return problems

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def main():
    if os.environ.get("SKIP_VERIFY") != "1":
        r = subprocess.run(
            ["sbt", "-batch", f'runMain graft.Verify {SF_DIR} {OUT}'],
            capture_output=True, text=True, cwd="/root/repo")
        sys.stdout.write(r.stdout[-3000:])
        sys.stderr.write(r.stderr[-3000:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    oracle = json.load(open(f"{OUT}/oracle_sql.json"))
    results = {}
    for name in sorted(os.listdir(OUT)):
        p = os.path.join(OUT, name)
        if not os.path.isdir(p):
            continue
        files = glob.glob(f"{p}/*.parquet")
        if not files:
            results[name] = "NO_OUTPUT"
            continue
        spark_df = con.execute(f"SELECT * FROM '{p}/*.parquet'").df()
        if name not in oracle:
            results[name] = f"rows_only:{len(spark_df)}"
            continue
        try:
            oracle_df = con.execute(oracle[name]).df()
        except Exception as e:
            results[name] = f"ORACLE_SQL_ERROR: {e}"
            continue
        s, o = canon(spark_df), canon(oracle_df)
        if list(s.columns) != list(o.columns):
            results[name] = f"SCHEMA_MISMATCH spark={list(s.columns)} oracle={list(o.columns)}"
            continue
        if len(s) != len(o):
            results[name] = f"ROWCOUNT_MISMATCH spark={len(s)} oracle={len(o)}"
            continue
        if s.dtypes.tolist() != o.dtypes.tolist():
            results[name] = (f"DTYPE_DIFF spark={s.dtypes.to_dict()} oracle={o.dtypes.to_dict()}")
            # fall through to value compare anyway
        try:
            pd.testing.assert_frame_equal(s, o, check_dtype=False, check_exact=True)
        except AssertionError as e:
            results[name] = "VALUE_MISMATCH: " + str(e).replace("\n", " | ")[:500]
            continue
        # the driver hashes raw bytes, so -0.0 vs 0.0 (equal under pandas)
        # is a real failure there — compare float columns bitwise
        bit_bad = []
        for c in s.columns:
            sc, oc = s[c], o[c]
            if sc.dtype.kind == "f" and oc.dtype.kind == "f":
                sv = sc.to_numpy(dtype="float64")
                ov = oc.to_numpy(dtype="float64")
                neq = sv.view("uint64") != ov.view("uint64")
                # NaN == NaN bitwise only if same payload; treat any NaN pair as equal
                neq &= ~(np.isnan(sv) & np.isnan(ov))
                if neq.any():
                    i = int(np.argmax(neq))
                    bit_bad.append(f"{c}[row {i}]: spark={sv[i]!r} oracle={ov[i]!r}")
        if bit_bad:
            results[name] = "BITWISE_MISMATCH: " + "; ".join(bit_bad[:4])
            continue
        # flag signed zeros on EITHER side even when both sides agree —
        # a -0.0 that both engines happen to emit today is one engine
        # version away from a hash mismatch
        nz = []
        for c in s.columns:
            for side, df_ in (("spark", s), ("oracle", o)):
                col_ = df_[c]
                if col_.dtype.kind == "f":
                    v = col_.to_numpy(dtype="float64")
                    cnt = int(((v == 0.0) & (np.signbit(v))).sum())
                    if cnt:
                        nz.append(f"{side}.{c}:{cnt}")
        if nz:
            results[name] = "SIGNED_ZERO: " + ", ".join(nz)
            continue
        results[name] = f"OK:{len(s)}"
    n_ok = sum(1 for v in results.values() if v.startswith(("OK", "rows_only")))
    for k, v in sorted(results.items()):
        print(f"{k:25s} {v}")
    print(f"\n{n_ok}/{len(results)} pass")
    problems = survey_gate()
    if problems:
        print("\nSURVEY_GATE FAIL (measured blocks != shipped artifacts):")
        for p in problems:
            print(f"  - {p}")
        sys.exit(2)
    print("SURVEY_GATE OK")

if __name__ == "__main__":
    main()
