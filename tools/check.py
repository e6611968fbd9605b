#!/usr/bin/env python3
"""Local emulation of the driver's correctness gate.

Usage: python3 tools/check.py [sfDir] [outDir] [only_prefix...]

Assumes `sbt "runMain graft.Verify <sfDir> <outDir>"` already ran: reads each
<outDir>/<name> parquet dump plus <outDir>/oracle_sql.json, runs the oracle
SQL in DuckDB against the same testdata parquet (views named per table), and
compares: schema (sorted column names), row count, and cell values
(exact for ints/strings, tiny-epsilon report for floats so we can see
whether a mismatch is drift or a real bug).
"""
import sys, json, math, glob
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        return v
    return v


def compare(name, spark_rows, spark_cols, duck_rows, duck_cols):
    issues = []
    if sorted(spark_cols) != sorted(duck_cols):
        issues.append(f"schema: spark={sorted(spark_cols)} duck={sorted(duck_cols)}")
        return issues
    if len(spark_rows) != len(duck_rows):
        issues.append(f"rowcount: spark={len(spark_rows)} duck={len(duck_rows)}")
        return issues
    order = sorted(range(len(spark_cols)), key=lambda i: spark_cols[i])
    dorder = sorted(range(len(duck_cols)), key=lambda i: duck_cols[i])
    nbad = 0
    for r, (sr, dr) in enumerate(zip(spark_rows, duck_rows)):
        for si, di in zip(order, dorder):
            a, b = sr[si], dr[di]
            if a is None and b is None:
                continue
            ok = a == b
            if not ok and isinstance(a, float) and isinstance(b, float):
                ok = (math.isnan(a) and math.isnan(b))
                if not ok and abs(a - b) <= 1e-9 * max(1.0, abs(a), abs(b)):
                    issues.append(f"float-drift row {r} col {spark_cols[si]}: {a!r} vs {b!r}")
                    continue
            if not ok:
                nbad += 1
                if nbad <= 5:
                    issues.append(f"value row {r} col {spark_cols[si]}: spark={a!r} duck={b!r}")
    if nbad > 5:
        issues.append(f"... {nbad} bad cells total")
    return issues


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    only = sys.argv[3:]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    oracles = json.load(open(f"{out}/oracle_sql.json"))
    npass = nfail = 0
    for name, sql in sorted(oracles.items()):
        if only and not any(name.startswith(p) for p in only):
            continue
        files = glob.glob(f"{out}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output");  nfail += 1;  continue
        try:
            srel = con.execute(f"SELECT * FROM read_parquet({files!r})")
            spark_cols = [d[0] for d in srel.description]
            spark_rows = srel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: cannot read spark output: {e}");  nfail += 1;  continue
        try:
            drel = con.execute(sql)
            duck_arrow = drel.fetch_arrow_table()
            duck_cols = duck_arrow.column_names
            duck_rows = con.execute(sql).fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}");  nfail += 1;  continue
        issues = compare(name, spark_rows, spark_cols, duck_rows, duck_cols)
        # The driver hashes typed values: a DuckDB HUGEINT/decimal column
        # (e.g. sum() over integers) hash-mismatches Spark's int64 even when
        # the values compare equal in Python. Flag any decimal oracle column.
        for f in duck_arrow.schema:
            if "decimal" in str(f.type):
                issues.append(
                    f"type: oracle col {f.name} is {f.type} (HUGEINT/DECIMAL) — "
                    f"CAST it (e.g. AS BIGINT) to match Spark's type")
        hard = [i for i in issues if not i.startswith("float-drift")]
        drift = [i for i in issues if i.startswith("float-drift")]
        if hard:
            nfail += 1
            print(f"FAIL {name} ({len(spark_rows)} rows)")
            for i in hard[:8]:
                print(f"   {i}")
        else:
            npass += 1
            tag = f" [{len(drift)} float-drift cells]" if drift else ""
            print(f"PASS {name} ({len(spark_rows)} rows){tag}")
    print(f"\n{npass} pass / {nfail} fail")
    sys.exit(1 if nfail else 0)


if __name__ == "__main__":
    main()
