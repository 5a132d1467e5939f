#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: compare Verify output
parquet against DuckDB oracle results (sorted rows, columns sorted by name)."""
import duckdb, glob, json, math, os, sys
import pyarrow.parquet as pq

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
only = sys.argv[3:] if len(sys.argv) > 3 else None

con = duckdb.connect()
for f in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(f)[:-len(".parquet")]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{f}')")

oracles = json.load(open(f"{out_dir}/oracle_sql.json"))

def norm(v):
    # NB: floats/decimals are TAGGED so an int-vs-double column mismatch fails
    # here like it does in the driver's format-sensitive hash (Python would
    # otherwise treat 3600 == 3600.0 and hide it — bit us on q15).
    if v is None: return None
    if isinstance(v, float):
        if math.isnan(v): return "nan"
        return ("f", round(v, 9))
    if hasattr(v, "isoformat"): return v.isoformat()[:26]
    if isinstance(v, list): return tuple(norm(x) for x in v)
    try:
        import decimal
        if isinstance(v, decimal.Decimal): return ("f", round(float(v), 9))
    except Exception: pass
    return v

# -- dtype parity (round-17): the driver's hash is dtype-sensitive in ways
# norm() cannot see — DuckDB types SUM(BIGINT) and `//` as HUGEINT (int128),
# which pandas renders as float, breaking the driver's hash against Spark's
# int64 even when every value is equal (r15 q36, r16's seven rows). Compare
# the DuckDB result's logical column types against the Spark parquet arrow
# schema and fail on any kind/width divergence BEFORE comparing values.
import pyarrow as pa

def _split_top(s):
    # split on commas at nesting depth 0, OUTSIDE double quotes (r19,
    # advice r18: DuckDB quotes struct field names that need it — a space
    # or comma inside "a b,c" must not split the field; embedded quotes
    # are doubled)
    parts, depth, cur, inq, i = [], 0, "", False, 0
    while i < len(s):
        ch = s[i]
        if ch == '"':
            if inq and i + 1 < len(s) and s[i + 1] == '"':
                cur += '""'; i += 2; continue
            inq = not inq
        elif not inq:
            if ch in "(<[": depth += 1
            elif ch in ")>]": depth -= 1
            if ch == "," and depth == 0:
                parts.append(cur); cur = ""; i += 1; continue
        cur += ch; i += 1
    if cur.strip(): parts.append(cur)
    return [p.strip() for p in parts]

def _field_split(f):
    # one struct field -> (name, type). A quoted name may hold spaces or
    # commas (embedded quotes doubled): split at the space AFTER the
    # closing quote, never at the first space (r19, advice r18).
    f = f.strip()
    if f.startswith('"'):
        i = 1
        while i < len(f):
            if f[i] == '"':
                if i + 1 < len(f) and f[i + 1] == '"': i += 2; continue
                break
            i += 1
        return f[1:i].replace('""', '"'), f[i + 1:].strip()
    n, ft = f.split(" ", 1)
    return n, ft

def duck_kind(t):
    raw = str(t).strip()
    s = raw.upper()
    # recurse on the RAW spelling, not the uppercased copy: nested struct
    # field names must reach _field_split with their original case/quoting
    if s.endswith("[]"): return "list<" + duck_kind(raw[:-2]) + ">"
    # STRUCT(a INTEGER, b VARCHAR) -> struct<a:int32,b:string> — nested
    # field KINDS must compare like top-level columns (r18, verdict #6:
    # the str(t) fallthrough compared raw engine spellings, which can
    # neither match nor catch a width divergence meaningfully)
    if s.startswith("STRUCT(") and raw.endswith(")"):
        fields = []
        for f in _split_top(raw[len("STRUCT("):-1]):
            n, ft = _field_split(f)
            fields.append(n.lower() + ":" + duck_kind(ft))
        return "struct<" + ",".join(fields) + ">"
    if s.startswith("DECIMAL"):
        digits = [x for x in s.replace("(", ",").replace(")", ",").split(",") if x.strip().isdigit()]
        return f"decimal(s={digits[1]})" if len(digits) == 2 else "decimal"
    if s.startswith("TIMESTAMP"): return "timestamp"
    m = {"BIGINT": "int64", "INTEGER": "int32", "SMALLINT": "int16",
         "TINYINT": "int8", "HUGEINT": "int128", "UHUGEINT": "uint128",
         "UBIGINT": "uint64", "UINTEGER": "uint32", "USMALLINT": "uint16",
         "UTINYINT": "uint8", "DOUBLE": "float64", "FLOAT": "float32",
         "REAL": "float32", "VARCHAR": "string", "BOOLEAN": "bool",
         "DATE": "date", "BLOB": "binary"}
    return m.get(s, s.lower())

def arrow_kind(t):
    if pa.types.is_large_list(t) or pa.types.is_list(t):
        return "list<" + arrow_kind(t.value_type) + ">"
    if pa.types.is_struct(t):
        return "struct<" + ",".join(
            t.field(i).name.lower() + ":" + arrow_kind(t.field(i).type)
            for i in range(t.num_fields)) + ">"
    if pa.types.is_decimal(t): return f"decimal(s={t.scale})"
    if pa.types.is_timestamp(t): return "timestamp"
    if pa.types.is_date(t): return "date"
    if pa.types.is_large_string(t) or pa.types.is_string(t): return "string"
    if pa.types.is_boolean(t): return "bool"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t): return "binary"
    if pa.types.is_float64(t): return "float64"
    if pa.types.is_float32(t): return "float32"
    return str(t)

def dtype_diffs(spark_schema, duck_names, duck_types):
    sk = {f.name: arrow_kind(f.type) for f in spark_schema}
    dk = {n: duck_kind(t) for n, t in zip(duck_names, duck_types)}
    return [(c, sk[c], dk[c]) for c in sorted(set(sk) & set(dk))
            if sk[c] != dk[c]]

def rows_of(cols, table):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    names = [cols[i] for i in idx]
    data = table
    out = []
    for row in data:
        out.append(tuple(norm(row[i]) for i in idx))
    out.sort(key=lambda r: tuple((x is None, str(x)) for x in r))
    return names, out

errors = {}
if os.path.exists(f"{out_dir}/_errors.json"):
    errors = json.load(open(f"{out_dir}/_errors.json"))

passed = failed = skipped = 0
seen = set()
for name in sorted(os.listdir(out_dir)):
    d = os.path.join(out_dir, name)
    if not os.path.isdir(d): continue
    if only and name not in only: continue
    seen.add(name)
    files = glob.glob(f"{d}/*.parquet")
    if not files:
        why = errors.get(name, "")
        if not why and os.path.exists(f"{d}/_error.txt"):
            why = open(f"{d}/_error.txt").read().strip()
        print(f"ERR    {name}: {why.splitlines()[0][:160]}" if why
              else f"NOOUT  {name}")
        failed += 1; continue
    t = pq.read_table(files[0])
    spark_cols = t.column_names
    spark_rows = [tuple(r.values()) for r in t.to_pylist()]
    spark_rows = [[r[i] for i in range(len(spark_cols))] for r in spark_rows]
    if name not in oracles:
        print(f"ROWS   {name}: {len(spark_rows)} rows (no oracle)")
        skipped += 1
        continue
    try:
        rel = con.sql(oracles[name])
        duck_cols = list(rel.columns)
        duck_types = list(rel.types)
        duck_rows = rel.fetchall()
    except Exception as e:
        print(f"ORAFAIL {name}: {str(e).splitlines()[0][:160]}")
        failed += 1; continue
    dt = dtype_diffs(t.schema, duck_cols, duck_types)
    if dt:
        print(f"DTYPE  {name}: " + "; ".join(
            f"{c} spark={s} duck={d}" for c, s, d in dt))
        failed += 1; continue
    sn, sr = rows_of(spark_cols, spark_rows)
    dn, dr = rows_of(duck_cols, duck_rows)
    if sn != dn:
        print(f"SCHEMA {name}: spark={sn} duck={dn}"); failed += 1; continue
    if len(sr) != len(dr):
        print(f"NROWS  {name}: spark={len(sr)} duck={len(dr)}"); failed += 1; continue
    if sr != dr:
        bad = [(a, b) for a, b in zip(sr, dr) if a != b][:3]
        print(f"VALUES {name}: first diffs {bad}")
        failed += 1; continue
    print(f"OK     {name} ({len(sr)} rows)")
    passed += 1

# EXPECTED−ACTUAL drift: every oracle key must have an output dir. A query
# that threw before writing anything (and somehow left no _error.txt) must
# shrink the list VISIBLY, not silently (round-8 q26 escape).
expected = set(oracles) if not only else set(oracles) & set(only)
for name in sorted(expected - seen):
    print(f"DRIFT  {name}: in oracle_sql.json but no output dir"
          + (f" — {errors[name].splitlines()[0][:140]}" if name in errors else ""))
    failed += 1

print(f"\n{passed} ok, {failed} failed, {skipped} rows-only")
sys.exit(1 if failed else 0)
