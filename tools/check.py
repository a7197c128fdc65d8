#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate (dev tooling only, not
part of the shipped library): run graft.Verify at a given SF, then run
each oracle SQL in DuckDB over the same parquet tables and compare
row count, column names, and cell values."""
import json, math, subprocess, sys, os, glob

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = "/tmp/graft_verify_out"
ONLY = sys.argv[2].split(",") if len(sys.argv) > 2 else None

ADD_OPENS = []
for p in ["java.lang", "java.lang.invoke", "java.lang.reflect", "java.io",
          "java.net", "java.nio", "java.util", "java.util.concurrent",
          "java.util.concurrent.atomic", "sun.nio.ch", "sun.nio.cs",
          "sun.security.action", "sun.util.calendar"]:
    ADD_OPENS += ["--add-opens", f"java.base/{p}=ALL-UNNAMED"]

def run_verify():
    cmd = ["java"] + ADD_OPENS + [
        "-Xmx8g", "-Dspark.ui.enabled=false",
        "-Dspark.sql.session.timeZone=UTC",
        "-cp", "/root/repo/target/scala-2.13/classes:" +
               ":".join(glob.glob("/opt/spark/jars/*.jar")),
        "graft.Verify", SF_DIR, OUT]
    env = dict(os.environ, SPARK_GRAFT_CPUS="8")
    r = subprocess.run(cmd, capture_output=True, text=True, env=env)
    for ln in r.stderr.splitlines():
        if "[verify]" in ln or "Exception" in ln:
            print("VERIFY-ERR:", ln[:300])
    if r.returncode != 0:
        print("verify rc:", r.returncode)
        print(r.stderr[-3000:])
        sys.exit(1)

def norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return float(v)
    if isinstance(v, bytes):
        return v.hex()
    return v

def main():
    import duckdb
    run_verify()
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.sql(f"CREATE VIEW {t} AS FROM read_parquet('{SF_DIR}/{t}.parquet')")
    oracles = json.load(open(f"{OUT}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        if ONLY and name not in ONLY:
            continue
        try:
            res_dir = f"{OUT}/{name}"
            spark = con.sql(
                f"SELECT * FROM read_parquet('{res_dir}/*.parquet')")
            scols, stypes = spark.columns, [str(t) for t in spark.types]
            srows = spark.fetchall()
            oracle = con.sql(sql)
            ocols, otypes = oracle.columns, [str(t) for t in oracle.types]
            orows = oracle.fetchall()
        except Exception as e:
            print(f"FAIL {name}: exception {str(e)[:200]}")
            n_fail += 1
            continue
        ok = True
        # The driver hashes what each engine SERIALIZES, so identical values
        # with different physical types (e.g. DuckDB promoting sum(BIGINT)
        # to HUGEINT/int128) still hash-mismatch.  Mirror that: oracle result
        # types must match the Spark parquet result types per column, and
        # never be HUGEINT/DECIMAL (which Arrow serializes as decimal128).
        stype_by = dict(zip(scols, stypes))
        otype_by = dict(zip(ocols, otypes))
        bad_types = [(c, t) for c, t in otype_by.items()
                     if "HUGEINT" in t or "DECIMAL" in t]
        mismatches = [(c, stype_by[c], otype_by[c])
                      for c in sorted(set(scols) & set(ocols))
                      if stype_by[c] != otype_by[c]]
        if sorted(scols) != sorted(ocols):
            print(f"FAIL {name}: cols spark={scols} oracle={ocols}")
            ok = False
        elif bad_types:
            print(f"FAIL {name}: oracle wide types {bad_types} "
                  f"(add CAST(... AS BIGINT/DOUBLE) in the oracle SQL)")
            ok = False
        elif mismatches:
            print(f"FAIL {name}: type mismatch (col, spark, oracle): "
                  f"{mismatches}")
            ok = False
        elif len(srows) != len(orows):
            print(f"FAIL {name}: rows spark={len(srows)} oracle={len(orows)}")
            ok = False
        else:
            sidx = [scols.index(c) for c in sorted(scols)]
            oidx = [ocols.index(c) for c in sorted(ocols)]
            for i, (sr, orow) in enumerate(zip(srows, orows)):
                sv = [norm(sr[j]) for j in sidx]
                ov = [norm(orow[j]) for j in oidx]
                if sv != ov:
                    print(f"FAIL {name}: row {i} spark={sv} oracle={ov}")
                    ok = False
                    break
        if ok:
            print(f"PASS {name} ({len(srows)} rows)")
            n_pass += 1
        else:
            n_fail += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

main()
