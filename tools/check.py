#!/usr/bin/env python3
"""Local pre-verification mirroring the driver's correctness gate:
run each oracle SQL in DuckDB against the sf tables and compare with the
parquet dumped by graft.Verify (columns sorted by name, row order kept,
values compared exactly; doubles bit-compared with an optional report of
near-misses). Usage: check.py <sfDir> <verifyOutDir>"""
import sys, os, json, math
import decimal
import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def typeclass(v):
    """Driver-gate-faithful type class: the driver's hash canonicalization
    distinguishes Decimal from int from float (r14's q_mix_temperature red
    row was exactly a Decimal-vs-int mismatch with identical values that
    the old float(a)==float(b) compare equated). Int widths collapse (both
    pyarrow and duckdb surface them as Python int); bool is its own class
    (it is an int subclass in Python, so check it first)."""
    if isinstance(v, bool):
        return "bool"
    if isinstance(v, decimal.Decimal):
        return "decimal"
    if isinstance(v, int):
        return "int"
    if isinstance(v, float):
        return "float"
    return type(v).__name__

def arrow_typeclass(t):
    """Column-level type class from the Arrow schema. This is the gate the
    r18 red row needed: DuckDB's fetchall() erases HUGEINT into Python int,
    so a `sum(BIGINT) // x` oracle column (HUGEINT) compared equal to a
    Spark BIGINT locally while the driver's type-sensitive hash said red.
    Reading the DuckDB result THROUGH Arrow preserves HUGEINT as
    decimal128(38,0), which this classifier keeps distinct from int.
    Integer widths collapse (the driver canonicalizes values, not widths);
    float widths likewise; decimal is its own class."""
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_floating(t):
        return "float"
    if pa.types.is_decimal(t):
        return "decimal"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "str"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "binary"
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return "list<" + arrow_typeclass(t.value_type) + ">"
    if pa.types.is_struct(t):
        return "struct"
    if pa.types.is_null(t):
        return "null"
    return str(t)

def typeclass_compat(a, b):
    # An all-NULL column surfaces as Arrow null type on either side;
    # nothing to distinguish, so it matches any class.
    return a == b or a == "null" or b == "null"

def cmp_cell(a, b):
    if a is None and b is None:
        return True
    if a is None or b is None:
        return False
    if typeclass(a) != typeclass(b):
        return False
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    return a == b

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    # Scale-fixture runs: an unbounded DuckDB eats the whole box on the
    # quadratic closure oracles (measured 124 GB on the 10x jaccard
    # closure before the kill). A limit makes DuckDB spill instead.
    if os.environ.get("GRAFT_DUCK_MEM"):
        con.execute(f"SET memory_limit='{os.environ['GRAFT_DUCK_MEM']}'")
        con.execute("SET temp_directory='/tmp/graft_duck_spill'")
    if os.environ.get("GRAFT_DUCK_THREADS"):
        con.execute(f"SET threads={os.environ['GRAFT_DUCK_THREADS']}")
    for t in TABLES:
        # driver testdata = single parquet file; ScaleStress output (the
        # 10x stress dirs) = a directory of part files — glob those
        p = f"{sf_dir}/{t}.parquet"
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        sel = "*"
        if t == "events":
            # driver fixtures carry ts as TIMESTAMP(NANOS); Spark-written
            # scale fixtures carry the same value as raw int64 ns (the
            # nanosAsLong representation graft.ops.table() reads). Restore
            # the µs-truncated timestamp here so every events oracle sees
            # one type at every scale, exactly what the Spark side sees.
            cols = con.execute(
                f"SELECT * FROM '{src}' LIMIT 0").description
            tstype = [c[1] for c in cols if c[0] == "ts"]
            if tstype and str(tstype[0]).upper() in ("NUMBER", "BIGINT"):
                sel = "* REPLACE (make_timestamp(ts // 1000) AS ts)"
        con.execute(f"CREATE VIEW {t} AS SELECT {sel} FROM '{src}'")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    results = {}
    for name in sorted(os.listdir(out_dir)):
        path = os.path.join(out_dir, name)
        if not os.path.isdir(path):
            continue
        files = [f for f in os.listdir(path) if f.endswith(".parquet")]
        if not files:
            results[name] = "NO_PARQUET"
            continue
        tbl = pq.read_table(os.path.join(path, files[0]))
        spark_cols = sorted(tbl.column_names)
        spark_rows = [tuple(r[c] for c in spark_cols) for r in tbl.to_pylist()]
        if name not in oracle:
            results[name] = f"NO_ORACLE rows={len(spark_rows)}"
            continue
        try:
            # Fetch via Arrow, NOT fetchall(): fetchall erases HUGEINT to
            # int and DECIMAL scale info, hiding exactly the type-class
            # mismatches the driver's hash gate catches (r18's
            # q_sample_weighted red row shipped because of this).
            duck_arrow = con.execute(oracle[name]).arrow()
        except Exception as e:
            results[name] = f"ORACLE_SQL_ERROR: {str(e)[:200]}"
            continue
        duck_cols_raw = duck_arrow.column_names
        # Rows are rebuilt by name lookup below; duplicate oracle column
        # names would silently collapse to one value per name and could
        # only be caught if the sorted name lists diverged (ADVICE r19).
        if len(set(duck_cols_raw)) != len(duck_cols_raw):
            results[name] = f"DUP_COLS duck={sorted(duck_cols_raw)}"
            continue
        duck_order = sorted(range(len(duck_cols_raw)),
                            key=lambda i: duck_cols_raw[i])
        duck_cols = [duck_cols_raw[i] for i in duck_order]
        if duck_cols != spark_cols:
            results[name] = f"COLS_MISMATCH spark={spark_cols} duck={duck_cols}"
            continue
        type_bad = None
        for c in spark_cols:
            sc = arrow_typeclass(tbl.schema.field(c).type)
            dc = arrow_typeclass(duck_arrow.schema.field(c).type)
            if not typeclass_compat(sc, dc):
                type_bad = (c, sc, dc)
                break
        if type_bad:
            results[name] = (f"TYPE_MISMATCH col={type_bad[0]} "
                             f"spark={type_bad[1]} duck={type_bad[2]}")
            continue
        duck_all = duck_arrow.to_pylist()
        duck_rows = [tuple(r[c] for c in duck_cols) for r in duck_all]
        if len(duck_rows) != len(spark_rows):
            results[name] = (f"ROWCOUNT spark={len(spark_rows)} "
                             f"duck={len(duck_rows)}")
            continue
        bad = None
        for ri, (sr, dr) in enumerate(zip(spark_rows, duck_rows)):
            for ci, (a, b) in enumerate(zip(sr, dr)):
                if not cmp_cell(a, b):
                    bad = (ri, spark_cols[ci], a, b)
                    break
            if bad:
                break
        if bad:
            results[name] = (f"VALUE_MISMATCH row={bad[0]} col={bad[1]} "
                             f"spark={bad[2]!r} duck={bad[3]!r}")
        else:
            results[name] = f"OK rows={len(spark_rows)}"
    n_ok = sum(1 for v in results.values() if v.startswith("OK"))
    n_rows_only = sum(1 for v in results.values() if v.startswith("NO_ORACLE"))
    for k in sorted(results):
        mark = "  " if results[k].startswith(("OK", "NO_ORACLE")) else "XX"
        print(f"{mark} {k}: {results[k]}")
    print(f"== {n_ok} OK, {n_rows_only} rows-only, "
          f"{len(results) - n_ok - n_rows_only} FAILING, "
          f"{len(results)} total")
    sys.exit(0 if len(results) - n_ok - n_rows_only == 0 else 1)

if __name__ == "__main__":
    main()
