"""Canonical value comparison shared by the parity tests (twin of
tools/check_oracle.py, importable from pytest)."""

from __future__ import annotations

import math
from decimal import Decimal


def canon(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, Decimal):
        return repr(float(v))
    return str(v)


def frame_rows(cols, rows) -> list[str]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("\x1f".join(canon(r[i]) for i in order) for r in rows)


def compare(scols, srows, ocols, orows) -> list[str]:
    problems = []
    if sorted(scols) != sorted(ocols):
        problems.append(f"columns spark={sorted(scols)} oracle={sorted(ocols)}")
    if len(srows) != len(orows):
        problems.append(f"rowcount spark={len(srows)} oracle={len(orows)}")
    if not problems:
        a, b = frame_rows(scols, srows), frame_rows(ocols, orows)
        if a != b:
            diffs = [(x, y) for x, y in zip(a, b) if x != y]
            problems.append(
                f"{len(diffs)}/{len(a)} rows differ; first: spark={diffs[0][0][:200]!r} oracle={diffs[0][1][:200]!r}"
            )
    return problems
