"""CVSS base-score computation from vector strings.

The reference wraps the `cvss` library (severity_systems.py:49-131); this
kernel implements the published v2 / v3.x base-score formulas directly
(first.org specifications) as pure functions of the vector string, so the
Spark layer can score severities in a vectorized pandas UDF.
"""

from __future__ import annotations

import math

_V3_AV = {"N": 0.85, "A": 0.62, "L": 0.55, "P": 0.2}
_V3_AC = {"L": 0.77, "H": 0.44}
_V3_PR_UNCHANGED = {"N": 0.85, "L": 0.62, "H": 0.27}
_V3_PR_CHANGED = {"N": 0.85, "L": 0.68, "H": 0.5}
_V3_UI = {"N": 0.85, "R": 0.62}
_V3_CIA = {"H": 0.56, "L": 0.22, "N": 0.0}

_V2_AV = {"N": 1.0, "A": 0.646, "L": 0.395}
_V2_AC = {"L": 0.71, "M": 0.61, "H": 0.35}
_V2_AU = {"N": 0.704, "S": 0.56, "M": 0.45}
_V2_CIA = {"C": 0.660, "P": 0.275, "N": 0.0}


def _parse_vector(vector: str) -> dict[str, str]:
    metrics: dict[str, str] = {}
    for part in (vector or "").strip().split("/"):
        k, _, v = part.partition(":")
        if k and v:
            metrics[k.upper()] = v.upper()
    return metrics


def _roundup(x: float) -> float:
    """CVSS v3 Roundup: smallest 1-decimal value >= x (spec appendix A)."""
    intx = int(round(x * 100000))
    if intx % 10000 == 0:
        return intx / 100000.0
    return (math.floor(intx / 10000) + 1) / 10.0


def cvss3_base_score(vector: str) -> float | None:
    """CVSS v3.0/v3.1 base score from a vector like
    ``CVSS:3.1/AV:N/AC:L/PR:N/UI:N/S:U/C:H/I:H/A:H``."""
    m = _parse_vector(vector)
    try:
        scope_changed = m["S"] == "C"
        pr_table = _V3_PR_CHANGED if scope_changed else _V3_PR_UNCHANGED
        iss = 1 - (1 - _V3_CIA[m["C"]]) * (1 - _V3_CIA[m["I"]]) * (1 - _V3_CIA[m["A"]])
        impact = (7.52 * (iss - 0.029) - 3.25 * (iss - 0.02) ** 15
                  if scope_changed else 6.42 * iss)
        exploitability = (8.22 * _V3_AV[m["AV"]] * _V3_AC[m["AC"]]
                          * pr_table[m["PR"]] * _V3_UI[m["UI"]])
    except KeyError:
        return None
    if impact <= 0:
        return 0.0
    raw = impact + exploitability
    if scope_changed:
        raw = 1.08 * raw
    return _roundup(min(raw, 10.0))


def cvss2_base_score(vector: str) -> float | None:
    """CVSS v2 base score from a vector like ``AV:N/AC:L/Au:N/C:P/I:P/A:P``."""
    m = _parse_vector(vector)
    try:
        impact = 10.41 * (1 - (1 - _V2_CIA[m["C"]]) * (1 - _V2_CIA[m["I"]])
                          * (1 - _V2_CIA[m["A"]]))
        exploitability = 20 * _V2_AV[m["AV"]] * _V2_AC[m["AC"]] * _V2_AU[m["AU"]]
    except KeyError:
        return None
    f_impact = 0.0 if impact == 0 else 1.176
    return round(((0.6 * impact) + (0.4 * exploitability) - 1.5) * f_impact, 1)


def base_score(vector: str) -> float | None:
    """Dispatch on vector prefix; plain numeric strings pass through."""
    if not vector:
        return None
    v = vector.strip()
    if v.upper().startswith("CVSS:3"):
        return cvss3_base_score(v)
    if v.upper().startswith("CVSS:4"):
        from vulnerablecode_spark.kernel.cvss4 import cvss4_base_score

        return cvss4_base_score(v)
    try:
        return float(v)
    except ValueError:
        return cvss2_base_score(v)
