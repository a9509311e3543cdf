#!/usr/bin/env python
"""Diagnostic peek at a predictions warehouse (SQLite) — the engine's
twin of the reference's inspection tool (`scripts/peek_sqlite.py:
7-29`): row count, global KPIs, per-year KPIs, top-k errors.

A dev CLI, deliberately driver-only (stdlib sqlite3): the analytical
versions of these queries live in workshop3_etl_spark/operators/
analytics.py and run distributed; this exists to eyeball a sink
database after a streaming run.

Usage: python tools/peek.py /path/to/predictions.sqlite [k]
"""

from __future__ import annotations

import sqlite3
import sys


def peek(db_path: str, k: int = 10) -> None:
    con = sqlite3.connect(db_path)
    try:
        n = con.execute("SELECT COUNT(*) FROM predictions").fetchone()[0]
        print(f"rows: {n}")
        row = con.execute(
            """
            SELECT COUNT(*) AS n,
                   AVG(ABS(y_true - y_pred)) AS mae,
                   SQRT(AVG(POWER(y_true - y_pred, 2))) AS rmse
            FROM predictions WHERE is_test = 1
            """
        ).fetchone()
        print(f"test KPIs: n={row[0]} mae={row[1]:.6f} rmse={row[2]:.6f}")
        print("per-year:")
        for y, yn, mae, rmse in con.execute(
            """
            SELECT year, COUNT(*), AVG(ABS(y_true - y_pred)),
                   SQRT(AVG(POWER(y_true - y_pred, 2)))
            FROM predictions WHERE is_test = 1
            GROUP BY year ORDER BY year
            """
        ):
            print(f"  {y}: n={yn} mae={mae:.6f} rmse={rmse:.6f}")
        print(f"top-{k} errors:")
        for c, y, yt, yp in con.execute(
            """
            SELECT country, year, y_true, y_pred
            FROM predictions WHERE is_test = 1
            ORDER BY ABS(y_true - y_pred) DESC, country, year
            LIMIT ?
            """,
            (k,),
        ):
            print(f"  {c} {y}: y_true={yt:.3f} y_pred={yp:.3f}")
    finally:
        con.close()


if __name__ == "__main__":
    if len(sys.argv) < 2:
        sys.exit(__doc__)
    peek(sys.argv[1], int(sys.argv[2]) if len(sys.argv) > 2 else 10)
