"""Independent driver simulation: imports __spark_entry__ as the driver does,
runs entry() smoke + per-query Spark-vs-DuckDB order-insensitive value-hash
compare at sf0.01. Deliberately does NOT reuse the repo's oracle harness.

Usage: python tools/driver_sim.py [name ...] — with names, checks only
those registry entries (targeted re-verify after an edit); without, all."""
import os, sys, hashlib, decimal, datetime, math
sys.path.insert(0, "/root/repo")
import duckdb
import __spark_entry__ as E
from pyspark.sql import SparkSession

# r17: overridable so changed queries can be spot-checked against the
# oracle at sf0.1 too (the driver itself only verifies the small SFs).
SF = os.environ.get("DRIVER_SIM_SF_DIR", "/root/testdata/sf0.01")
spark = (SparkSession.builder.master("local[8]")
         .config("spark.sql.session.timeZone", "UTC")
         .config("spark.sql.legacy.parquet.nanosAsLong", "true")
         .config("spark.sql.shuffle.partitions", "8")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

con = duckdb.connect()
for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
    if t == "events":
        con.execute(f"CREATE VIEW events AS SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM read_parquet('{SF}/{t}.parquet')")
    else:
        con.execute(f"CREATE VIEW {t} AS FROM read_parquet('{SF}/{t}.parquet')")

def cv(v):
    if v is None: return "NULL"
    if isinstance(v, bool): return str(int(v))
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else repr(v)
    if isinstance(v, decimal.Decimal):
        # strict: keep full scale — the real driver renders Spark/DuckDB
        # Decimals differently, so Decimal outputs must fail here too
        return format(v, "f")
    if isinstance(v, (datetime.datetime, datetime.date)): return v.isoformat()
    if isinstance(v, (list, tuple)): return "[" + ",".join(cv(x) for x in v) + "]"
    if hasattr(v, "tolist"): return cv(v.tolist())
    return str(v)

def rowhash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    canon = sorted("|".join(cv(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for line in canon: h.update(line.encode()); h.update(b"\n")
    return h.hexdigest()

# --- entry smoke ---
df = E.entry(spark)
rows = df.collect()
print(f"ENTRY: rows={len(rows)} schema={[f.name for f in df.schema.fields]}")
assert len(rows) >= 0

qs, osql = E.queries(), E.oracle_sql()
print(f"queries={len(qs)} oracles={len(osql)}")
only = set(sys.argv[1:])
unknown = only - set(qs)
if unknown:
    sys.exit(f"unknown query names: {sorted(unknown)}")
fails = []
for name, fn in sorted(qs.items()):
    if only and name not in only:
        continue
    sdf = fn(spark, SF)
    scols = sdf.columns
    # the real driver's pandas canonicalizer crashes on list/map cells
    bad = [f.name for f in sdf.schema.fields
           if f.dataType.typeName() in ("array", "map")]
    if bad:
        print(f"  FAIL  {name}: array/map-typed output cols {bad} (driver canonicalizer crashes)")
        fails.append(name)
        continue
    srows = [tuple(r) for r in sdf.collect()]
    if name not in osql:
        print(f"  rows-only {name}: {len(srows)} rows")
        continue
    # type-drift guard: the real driver canonicalizes DuckDB results via
    # pandas, which renders HUGEINT/DECIMAL columns differently than
    # fetchall()'s plain Python ints — fail loudly on any such output column
    # instead of silently reporting MATCH where the driver would FAIL.
    desc = con.execute(f"DESCRIBE {osql[name]}").fetchall()
    drift = [(c, ty) for c, ty, *_ in desc
             if "HUGEINT" in ty.upper() or "DECIMAL" in ty.upper()]
    if drift:
        print(f"  FAIL  {name}: oracle output type drift {drift} "
              f"(cast to BIGINT/DOUBLE in the oracle SQL)")
        fails.append(name)
        continue
    cur = con.execute(osql[name])
    dcols = [d[0] for d in cur.description]
    drows = cur.fetchall()
    hs, hd = rowhash(scols, srows), rowhash(dcols, drows)
    ok = (sorted(scols) == sorted(dcols)) and (len(srows) == len(drows)) and hs == hd
    print(f"  {'MATCH ' if ok else 'FAIL  '}{name}: spark={len(srows)} duck={len(drows)} hash={'=' if hs==hd else '!='}")
    if not ok: fails.append(name)
print("RESULT:", "ALL MATCH" if not fails else f"FAILURES: {fails}")
sys.exit(1 if fails else 0)
