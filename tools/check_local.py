#!/usr/bin/env python3
"""DEPRECATED shim — use tools/check_driver.py.

The original check_local.py read BOTH the Spark output and the oracle
through duckdb's .df(), which coerced DECIMAL columns to float64 and
str-normalized exactly the value-rendering differences the driver's
comparator flags (that drift produced the r11 q185/q195/q199/q204 red
rows while this gate said green). check_driver.py reads the Spark side
via pandas/pyarrow like the driver does. This shim just forwards so any
stale invocation still runs the strict gate.
"""
import os
import sys

if __name__ == "__main__":
    here = os.path.dirname(os.path.abspath(__file__))
    os.execv(sys.executable,
             [sys.executable, os.path.join(here, "check_driver.py")]
             + sys.argv[1:])
