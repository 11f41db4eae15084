#!/usr/bin/env python3
"""Local mimic of the driver's DuckDB-oracle correctness gate.

Usage: check_oracle.py <sfDir> <verifyOutDir>

For each query dir under verifyOutDir: read the Spark parquet result,
run the matching oracle_sql.json SQL in DuckDB with views over the sfDir
parquet tables, sort columns by name, and compare values. Reports both
strict (exact value) and tolerant (float rtol=1e-9) verdicts so we can
see how close to a hash match we are before the real driver runs.
Dev-time tooling only — the shipped engine is the Scala code.
"""
import json, sys, glob, os, hashlib
import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

# Oracle-result cache keyed by (query name, oracle-SQL hash, data
# fingerprint): the sf0.1 DuckDB sweep is ~50 min, dominated by
# IVF/graph CTE retrains, and unchanged queries should not re-pay the
# retrain on every re-verify. Any change to the SQL or the input
# parquet invalidates the entry. GRAFT_ORACLE_NO_CACHE=1 bypasses.
CACHE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         ".oracle_cache")


def data_fingerprint(sf_dir):
    parts = []
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isfile(p):
            st = os.stat(p)
            parts.append(f"{t}:{st.st_size}:{int(st.st_mtime)}")
        elif os.path.isdir(p):
            fs = sorted(glob.glob(f"{p}/**/*", recursive=True))
            sz = sum(os.path.getsize(f) for f in fs if os.path.isfile(f))
            mt = max((int(os.path.getmtime(f)) for f in fs
                      if os.path.isfile(f)), default=0)
            parts.append(f"{t}:{sz}:{mt}")
    return "|".join(parts)


def cached_oracle(con, name, sql, fp):
    """(arrow table, hit?) — DuckDB result memoized on disk."""
    if os.environ.get("GRAFT_ORACLE_NO_CACHE"):
        return con.sql(sql).fetch_arrow_table(), False
    key = hashlib.sha256(
        ("\x00".join([name, sql, fp])).encode()).hexdigest()
    path = os.path.join(CACHE_DIR, key + ".parquet")
    if os.path.exists(path):
        return pq.read_table(path), True
    want = con.sql(sql).fetch_arrow_table()
    os.makedirs(CACHE_DIR, exist_ok=True)
    tmp = path + ".tmp"
    pq.write_table(want, tmp)
    os.replace(tmp, path)
    return want, False


def norm_cell(v):
    # Normalize to comparable python values: Decimal kept exact, floats as-is.
    import decimal, datetime
    if isinstance(v, decimal.Decimal):
        return ("dec", str(v.normalize()))
    if isinstance(v, (datetime.datetime, datetime.date)):
        return ("ts", v.isoformat())
    if isinstance(v, float):
        return ("f", v)
    if isinstance(v, list):
        return ("l", tuple(norm_cell(x) for x in v))
    return (type(v).__name__, v)


def rows_of(table):
    cols = sorted(table.column_names)
    data = {c: table.column(c).to_pylist() for c in cols}
    n = table.num_rows
    return cols, [tuple(norm_cell(data[c][i]) for c in cols) for i in range(n)]


def close(a, b):
    if a == b:
        return True
    if isinstance(a, tuple) and isinstance(b, tuple) and len(a) == len(b):
        if a[0] == "f" and b[0] == "f":
            x, y = a[1], b[1]
            return abs(x - y) <= 1e-9 * max(1.0, abs(x), abs(y))
        if a[0] == "dec" and b[0] == "dec":
            from decimal import Decimal
            return abs(Decimal(a[1]) - Decimal(b[1])) <= Decimal("0.0001")
        return all(close(x, y) for x, y in zip(a, b))
    return False


def main(sf_dir, out_dir, only=None):
    con = duckdb.connect()
    # Bound DuckDB's memory and give it a spill directory: the heavy
    # graph/MMR CTE retrains at sf0.1 can otherwise balloon past the
    # box (round 15 observed the beam-search oracle exhausting 100 GiB
    # and poisoning every later query in the process) — with a limit +
    # temp dir they spill and finish.
    con.execute("SET memory_limit='40GB'")
    con.execute("SET temp_directory='/tmp/duckdb_oracle_spill'")
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    if only:
        names = [n for n in names if n in only]
    fp = data_fingerprint(sf_dir)
    n_exact = n_tol = n_fail = n_rowsonly = n_hit = 0
    for name in names:
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        got = pq.read_table(files[0]) if files else None
        if name not in oracles:
            status = f"rows-only ({got.num_rows if got is not None else 0} rows)"
            n_rowsonly += 1
            print(f"  {name:32s} {status}")
            continue
        try:
            want, hit = cached_oracle(con, name, oracles[name], fp)
            n_hit += 1 if hit else 0
        except Exception as e:
            print(f"  {name:32s} ORACLE-ERROR {str(e)[:120]}")
            n_fail += 1
            continue
        gc, gr = rows_of(got)
        wc, wr = rows_of(want)
        if gc != wc:
            print(f"  {name:32s} FAIL columns: spark={gc} oracle={wc}")
            n_fail += 1
            continue
        if len(gr) != len(wr):
            print(f"  {name:32s} FAIL rowcount: spark={len(gr)} oracle={len(wr)}")
            n_fail += 1
            continue
        if gr == wr:
            print(f"  {name:32s} EXACT ({len(gr)} rows)")
            n_exact += 1
        elif all(close(a, b) for a, b in zip(sorted(gr), sorted(wr))):
            bad = next(i for i, (a, b) in enumerate(zip(gr, wr)) if a != b)
            print(f"  {name:32s} TOLERANT-ONLY (first diff row {bad}):")
            print(f"    spark : {gr[bad]}")
            print(f"    oracle: {wr[bad]}")
            n_tol += 1
        else:
            bad = [i for i, (a, b) in enumerate(zip(gr, wr)) if not close(a, b)][:3]
            print(f"  {name:32s} FAIL values at rows {bad}:")
            for i in bad:
                print(f"    spark : {gr[i]}")
                print(f"    oracle: {wr[i]}")
            n_fail += 1
    print(f"\nexact={n_exact} tolerant={n_tol} fail={n_fail} "
          f"rows-only={n_rowsonly} (oracle cache hits: {n_hit})")
    return 0 if n_fail == 0 else 1


if __name__ == "__main__":
    # Optional 3rd+ args: restrict to these query names (a straggler
    # re-check after an OOM'd sweep should not re-pay the whole run).
    sys.exit(main(sys.argv[1], sys.argv[2],
                  set(sys.argv[3:]) if len(sys.argv) > 3 else None))
