#!/usr/bin/env python3
"""Self-test for the dtype-strict gate in check.py (r18, verdict #6):
a struct column whose nested field WIDTH diverges between the Spark
parquet and the DuckDB oracle must be flagged DTYPE; a width-exact
struct must pass. Drives check.py as a subprocess against synthetic
fixtures, exactly like the driver drives the real gate.

Run: python3 tools/check_selftest.py (exits non-zero on failure)."""
import json, os, subprocess, sys, tempfile
import pyarrow as pa
import pyarrow.parquet as pq

here = os.path.dirname(os.path.abspath(__file__))
check = os.path.join(here, "check.py")

def run_case(name, spark_field_type, oracle_sql, a_name="a"):
    tmp = tempfile.mkdtemp(prefix="gate_selftest_")
    sf = os.path.join(tmp, "sf"); out = os.path.join(tmp, "out")
    os.makedirs(sf); os.makedirs(os.path.join(out, "x01_struct"))
    # a one-row base table so check.py's view bootstrap has something
    pq.write_table(pa.table({"k": pa.array([1], pa.int64())}),
                   os.path.join(sf, "base.parquet"))
    # the "Spark result": one struct column s{a, b}
    t = pa.table({"s": pa.array([{a_name: 1, "b": "x"}], pa.struct(
        [(a_name, spark_field_type), ("b", pa.string())]))})
    pq.write_table(t, os.path.join(out, "x01_struct", "part-0.parquet"))
    with open(os.path.join(out, "oracle_sql.json"), "w") as f:
        json.dump({"x01_struct": oracle_sql}, f)
    r = subprocess.run([sys.executable, check, sf, out],
                       capture_output=True, text=True)
    print(f"[selftest] {name}:")
    print("  " + "\n  ".join(r.stdout.strip().splitlines()))
    return r.stdout

# 1. width-exact struct: int64 field vs BIGINT — must pass
ok = run_case("matching struct (int64 vs BIGINT)", pa.int64(),
              "SELECT {'a': CAST(1 AS BIGINT), 'b': 'x'} AS s")
assert "OK     x01_struct" in ok, "width-exact struct must pass"

# 2. the deliberate divergence: Spark int32 field vs oracle BIGINT —
#    must be flagged DTYPE before any value compare
bad = run_case("diverging struct (int32 vs BIGINT)", pa.int32(),
               "SELECT {'a': CAST(1 AS BIGINT), 'b': 'x'} AS s")
assert "DTYPE  x01_struct" in bad, "struct width divergence must be DTYPE"
assert "int32" in bad and "int64" in bad, "diff must name the widths"

# 3. a QUOTED field name holding a space and a comma (r19, advice r18):
#    DuckDB renders the type as STRUCT("a b,c" BIGINT, b VARCHAR) — the
#    parser must not split inside the quotes or mis-pair name/type
quoted = run_case("quoted struct field name with space+comma", pa.int64(),
                  "SELECT {'a b,c': CAST(1 AS BIGINT), 'b': 'x'} AS s",
                  a_name="a b,c")
assert "OK     x01_struct" in quoted, \
    "quoted field name with space/comma must parse and pass"

print("[selftest] struct dtype gate: all cases behaved — PASS")
