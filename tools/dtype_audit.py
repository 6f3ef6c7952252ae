#!/usr/bin/env python3
"""Oracle output-dtype audit — driver-hash hazard detector (dev tool).

The driver's correctness gate converts BOTH sides to pandas before
hashing, and that conversion is dtype-sensitive in ways tools/check.py
(python-native fetchall) is not:

  - DuckDB HUGEINT — produced by SUM(BIGINT), and preserved by %, //,
    etc. — becomes pandas float64, so a value renders '32.0' while
    Spark's LongType renders '32': hash false-red on every row even
    though the values are identical (bit us on cur_pack_sequences, r4).
  - LIST/STRUCT/MAP columns become numpy arrays; the driver's pandas
    row-sort crashes with "unhashable type: numpy.ndarray" (bit us on
    x2_array_agg, r4).
  - An int column on one side vs a float column on the other renders
    '32' vs '32.0' — same hash failure without any DuckDB widening.

Rule (Inventory.scala determinism rule 5): every gated output column
must be a scalar with the SAME type family on both sides — BIGINT/
INTEGER, DOUBLE, VARCHAR, DATE, TIMESTAMP, or BOOLEAN. CAST anything
DuckDB widens (SUM, %, //, list len) to an explicit type; string-join
any array.

Usage: python3 tools/dtype_audit.py <sfDir> <verifyOutDir>
Exit 0 = no hazards. Prints one line per flagged column otherwise.
"""
import sys, os, json, glob
import duckdb
import pyarrow.parquet as pq
import pyarrow as pa

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def duck_family(t):
    """Collapse a DuckDB declared type to a render-equivalence family."""
    t = t.upper()
    if t in ("HUGEINT", "UHUGEINT"):
        return "HAZARD:hugeint(->float64 in pandas)"
    if "[]" in t or t.startswith(("STRUCT", "LIST", "MAP")):
        return "HAZARD:nested(pandas sort crashes)"
    if t.startswith("DECIMAL"):
        # pandas renders Decimal objects ('32.00') unlike float ('32.0')
        # or int ('32') — only safe if Spark emits the identical decimal.
        return "decimal"
    if t in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT",
             "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"):
        return "int"
    if t in ("FLOAT", "REAL", "DOUBLE"):
        return "float"
    if t in ("VARCHAR", "TEXT", "STRING", "BLOB"):
        return "str"
    if t.startswith("TIMESTAMP"):
        return "timestamp"
    if t == "DATE":
        return "date"
    if t == "BOOLEAN":
        return "bool"
    return t


def arrow_family(t):
    if pa.types.is_nested(t):
        return "HAZARD:nested(pandas sort crashes)"
    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_floating(t):
        return "float"
    if pa.types.is_decimal(t):
        return "decimal"
    if pa.types.is_string(t) or pa.types.is_large_string(t) or pa.types.is_binary(t):
        return "str"
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_boolean(t):
        return "bool"
    return str(t)


def main(sf_dir, out_dir):
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    hazards = []
    for name, sql in sorted(oracle.items()):
        try:
            desc = con.execute(f"DESCRIBE {sql}").fetchall()
        except Exception as e:
            hazards.append(f"{name}: DESCRIBE failed: {e}")
            continue
        ofam = {r[0]: duck_family(r[1]) for r in desc}
        d = os.path.join(out_dir, name)
        sfam = {}
        if glob.glob(os.path.join(d, "*.parquet")):
            sch = pq.read_schema(glob.glob(os.path.join(d, "*.parquet"))[0])
            sfam = {f.name: arrow_family(f.type) for f in sch}
        for c, fam in ofam.items():
            if fam.startswith("HAZARD"):
                hazards.append(f"{name}.{c}: oracle {fam}")
        for c, fam in sfam.items():
            if fam.startswith("HAZARD"):
                hazards.append(f"{name}.{c}: spark {fam}")
        for c in set(ofam) & set(sfam):
            a, b = ofam[c], sfam[c]
            if a.startswith("HAZARD") or b.startswith("HAZARD"):
                continue
            if a != b:
                hazards.append(
                    f"{name}.{c}: family mismatch oracle={a} spark={b}"
                    " (renders differently under the driver's hash)")
    for h in hazards:
        print("FLAG", h)
    print(f"{len(oracle)} oracles audited, {len(hazards)} hazards")
    return 1 if hazards else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
