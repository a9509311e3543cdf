"""S5: the SQLite peek diagnostic CLI (tools/peek.py), exercised
against a synthetic predictions warehouse — VERDICT r1 flagged this
surface as never tested."""

from __future__ import annotations

import sqlite3
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _make_db(path: Path) -> None:
    con = sqlite3.connect(path)
    con.execute(
        "CREATE TABLE predictions ("
        "country TEXT, year INTEGER, y_true REAL, y_pred REAL, "
        "is_train INTEGER, is_test INTEGER)"
    )
    rows = [
        ("ar", 2019, 6.0, 5.5, 0, 1),
        ("br", 2019, 6.5, 6.5, 0, 1),
        ("cl", 2020, 6.2, 5.0, 0, 1),
        ("de", 2020, 7.0, 7.1, 0, 1),
        ("es", 2019, 6.4, 6.0, 1, 0),  # train row: excluded from KPIs
    ]
    con.executemany("INSERT INTO predictions VALUES (?,?,?,?,?,?)", rows)
    con.commit()
    con.close()


def test_peek_reports_kpis_and_top_errors(tmp_path):
    db = tmp_path / "preds.sqlite"
    _make_db(db)
    out = subprocess.run(
        [sys.executable, str(REPO / "tools" / "peek.py"), str(db), "2"],
        capture_output=True,
        text=True,
        check=True,
    ).stdout
    assert "rows: 5" in out
    # test KPIs over the 4 is_test rows: mae = (0.5+0+1.2+0.1)/4 = 0.45
    assert "n=4" in out and "mae=0.450000" in out
    # per-year blocks present
    assert "2019:" in out and "2020:" in out
    # top-2 errors: cl (1.2) then ar (0.5)
    lines = [l.strip() for l in out.splitlines()]
    i = lines.index("top-2 errors:")
    assert lines[i + 1].startswith("cl 2020:")
    assert lines[i + 2].startswith("ar 2019:")


def test_peek_usage_exit():
    res = subprocess.run(
        [sys.executable, str(REPO / "tools" / "peek.py")],
        capture_output=True,
        text=True,
    )
    assert res.returncode != 0
