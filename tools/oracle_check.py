#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage:
  python3 tools/oracle_check.py <verify_out_dir> <sf_dir> [query...]

Reads each <out>/<name> parquet (written by graft.Verify), runs the
matching oracle SQL from <out>/oracle_sql.json in DuckDB with the sf
tables registered as views, then compares: column names (sorted),
row count, and exact values after sorting rows. Dev tool only — the
shipped engine never depends on it.
"""
import sys, json, math, hashlib
from decimal import Decimal
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, Decimal):
        # no normalize: a DECIMAL where Spark emits BIGINT/DOUBLE must
        # surface as a mismatch, like the driver's dtype-sensitive hash
        return "dec:" + str(v)
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{canon(x)}" for k, x in sorted(v.items())) + "}"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


INT_WIDTHS = {"TINYINT", "SMALLINT", "INTEGER", "BIGINT"}


def type_class(t):
    # the driver's pandas compare treats all int widths alike but
    # rejects DECIMAL/HUGEINT where the other side has int64/float64
    return "INT" if t in INT_WIDTHS else t


def frame(con, rel):
    cols = rel.columns
    types = [type_class(str(t)) for t in rel.types]
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    rows = rel.fetchall()
    out = sorted(tuple(canon(r[i]) for i in order) for r in rows)
    return [cols[i] for i in order], [types[i] for i in order], out


# Above this many rows, skip the Python fetchall (which would hold two
# canonicalized copies in memory — 60M-row gates at sf10 are ~25 GB a
# side) and compare entirely inside DuckDB: sorted column names/type
# classes from a LIMIT 0 probe, then count + an order-insensitive
# sum-of-row-hashes over the name-sorted projection on BOTH sides —
# identical canonicalization because both sides go through DuckDB.
BIG_ROWS = 2_000_000


def meta(con, q):
    rel = con.sql(f"SELECT * FROM ({q}) t LIMIT 0")
    cols, types = rel.columns, [type_class(str(t)) for t in rel.types]
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return [cols[i] for i in order], [types[i] for i in order]


def big_sig(con, q, cols_sorted):
    sel = ", ".join(f'"{c}"' for c in cols_sorted)
    row = f"ROW({sel})" if len(cols_sorted) > 1 else f'ROW("{cols_sorted[0]}")'
    n, sig = con.sql(
        f"SELECT count(*), CAST(sum(CAST(hash({row}) AS HUGEINT)) AS VARCHAR) "
        f"FROM ({q}) t").fetchall()[0]
    return n, sig


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    con = duckdb.connect()
    # bound the oracle engine: DuckDB's default memory limit is 80% of
    # RAM, and a mis-planned oracle at sf10 (nested-loop on a <>
    # predicate) once grew past 60 GB and ENOSPC'd the disk with spill
    # next to concurrently-running Spark jobs. A hard cap + a dedicated
    # spill dir turns that failure mode into a clean per-query error.
    # ... but never HIGHER than DuckDB's own 80%-of-RAM default would
    # be: on a small host a flat 24GB would loosen the limit exactly
    # where pressure is worst.
    import os
    ram_gb = os.sysconf("SC_PAGE_SIZE") * os.sysconf("SC_PHYS_PAGES") / 2**30
    cap_gb = min(24, max(1, int(ram_gb * 0.6)))
    con.sql(f"SET memory_limit='{cap_gb}GB'")
    tmp = f"{out_dir}/.ducktmp"
    os.makedirs(tmp, exist_ok=True)
    con.sql(f"SET temp_directory='{tmp}'")
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        got_q = f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')"
        try:
            n_got = con.sql(f"SELECT count(*) FROM ({got_q}) t").fetchall()[0][0]
            if n_got > BIG_ROWS:
                got_cols, got_types = meta(con, got_q)
                exp_cols, exp_types = meta(con, sql)
                problems = []
                if got_cols != exp_cols:
                    problems.append(f"cols {got_cols} != {exp_cols}")
                if got_types != exp_types:
                    problems.append(f"types {got_types} != {exp_types}")
                if not problems:
                    gn, gs = big_sig(con, got_q, got_cols)
                    en, es = big_sig(con, sql, exp_cols)
                    if gn != en:
                        problems.append(f"rows {gn} != {en}")
                    elif gs != es:
                        problems.append(f"row-hash sum {gs} != {es}")
                if problems:
                    print(f"FAIL {name}: " + "; ".join(problems))
                    n_fail += 1
                else:
                    print(f"PASS {name} rows={n_got} hash=bigsig:{gs[:12]}")
                    n_pass += 1
                continue
            got_cols, got_types, got = frame(con, con.sql(got_q))
            exp_cols, exp_types, exp = frame(con, con.sql(sql))
        except Exception as e:
            print(f"FAIL {name}: exception {e}")
            n_fail += 1
            continue
        problems = []
        if got_cols != exp_cols:
            problems.append(f"cols {got_cols} != {exp_cols}")
        if got_types != exp_types:
            problems.append(f"types {got_types} != {exp_types}")
        if len(got) != len(exp):
            problems.append(f"rows {len(got)} != {len(exp)}")
        if not problems and got != exp:
            k = next(i for i, (a, b) in enumerate(zip(got, exp)) if a != b)
            problems.append(f"values differ at sorted row {k}:\n  spark={got[k]}\n  duck ={exp[k]}")
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            n_fail += 1
        else:
            h = hashlib.sha256(repr(got).encode()).hexdigest()[:12]
            print(f"PASS {name} rows={len(got)} hash={h}")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
