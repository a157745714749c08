#!/usr/bin/env python3
"""Self-test for check_driver.py — the gate that guards the gate.

Round 11's lesson: a comparator that silently normalizes differences
reports green on queries the driver fails, and every 'verified' claim
built on it is unfalsifiable. This script constructs tiny Spark-style
parquet outputs + oracle SQL pairs where the EXPECTED verdict is known
(clean pass, decimal-rendering mismatch, array column crash, row-count
mismatch, value mismatch, NULL-vs-NaN equivalence) and asserts
check_driver.py returns exactly those verdicts. Run:

    python3 tools/test_check_driver.py      # prints PASS/FAIL per case

Dev-only tool (driver-side python env); not part of the engine.
"""
import json
import os
import subprocess
import sys
import tempfile
from decimal import Decimal

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

HERE = os.path.dirname(os.path.abspath(__file__))


def write_spark_result(out_dir, name, table):
    d = os.path.join(out_dir, name)
    os.makedirs(d, exist_ok=True)
    pq.write_table(table, os.path.join(d, "part-0.parquet"))


def run_gate(out_dir, sf_dir, names):
    p = subprocess.run(
        [sys.executable, os.path.join(HERE, "check_driver.py"),
         out_dir, sf_dir] + names,
        capture_output=True, text=True)
    verdicts = {}
    for line in p.stdout.splitlines():
        if line.startswith("ok   "):
            verdicts[line.split()[1]] = "ok"
        elif line.startswith("FAIL "):
            verdicts[line.split()[1].rstrip(":")] = "fail"
    return verdicts, p.stdout


def main():
    tmp = tempfile.mkdtemp(prefix="gate_selftest_")
    sf_dir = os.path.join(tmp, "sf")
    os.makedirs(sf_dir)
    # minimal table set so the gate's CREATE VIEWs resolve
    for t in ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents", "embeddings"]:
        pq.write_table(pa.table({"x": pa.array([1], pa.int64())}),
                       os.path.join(sf_dir, f"{t}.parquet"))
    out = os.path.join(tmp, "out")
    os.makedirs(out)

    oracle = {}
    # 1) clean pass
    write_spark_result(out, "t1_pass", pa.table(
        {"k": pa.array([1, 2], pa.int64()),
         "v": pa.array([1.5, 2.5], pa.float64())}))
    oracle["t1_pass"] = "SELECT * FROM (VALUES (1, 1.5), (2, 2.5)) t(k, v)"
    # 2) DECIMAL publish: pyarrow keeps Decimal('1.50'), duckdb renders
    #    1.5 — the r11 q195/q199/q204 seam; MUST fail
    write_spark_result(out, "t2_decimal", pa.table(
        {"k": pa.array([1], pa.int64()),
         "v": pa.array([Decimal("1.50")], pa.decimal128(18, 2))}))
    oracle["t2_decimal"] = "SELECT 1 AS k, CAST(1.50 AS DOUBLE) AS v"
    # 3) ARRAY column: unhashable under the driver's sort — MUST fail
    write_spark_result(out, "t3_array", pa.table(
        {"k": pa.array([1], pa.int64()),
         "v": pa.array([[1.0, 2.0]], pa.list_(pa.float64()))}))
    oracle["t3_array"] = "SELECT 1 AS k, [1.0, 2.0] AS v"
    # 4) row-count mismatch — MUST fail
    write_spark_result(out, "t4_rows", pa.table(
        {"k": pa.array([1], pa.int64())}))
    oracle["t4_rows"] = "SELECT * FROM (VALUES (1), (2)) t(k)"
    # 5) value mismatch — MUST fail
    write_spark_result(out, "t5_value", pa.table(
        {"k": pa.array([1], pa.int64()), "v": pa.array([9.0])}))
    oracle["t5_value"] = "SELECT 1 AS k, 8.0 AS v"
    # 6) null BOOL: pyarrow None vs duckdb NaN — the gate collapses NA
    #    flavors, MUST pass (q37/q249 depend on it)
    write_spark_result(out, "t6_nullbool", pa.table(
        {"k": pa.array([1], pa.int64()),
         "b": pa.array([None], pa.bool_())}))
    oracle["t6_nullbool"] = "SELECT 1 AS k, CAST(NULL AS BOOLEAN) AS b"

    json.dump(oracle, open(os.path.join(out, "oracle_sql.json"), "w"))
    verdicts, raw = run_gate(out, sf_dir, list(oracle))
    expect = {"t1_pass": "ok", "t2_decimal": "fail", "t3_array": "fail",
              "t4_rows": "fail", "t5_value": "fail", "t6_nullbool": "ok"}
    bad = {k: (verdicts.get(k), expect[k]) for k in expect
           if verdicts.get(k) != expect[k]}
    for k in sorted(expect):
        mark = "PASS" if k not in bad else "FAIL"
        print(f"{mark} {k}: got={verdicts.get(k)} want={expect[k]}")
    if bad:
        print(raw)
        sys.exit(1)
    print("== gate self-test: all verdicts as expected")


if __name__ == "__main__":
    main()
