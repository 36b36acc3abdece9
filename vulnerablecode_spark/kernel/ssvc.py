"""SSVC (Stakeholder-Specific Vulnerability Categorization) scoring.

Reference: utils.py:752-864 (ssvc_calculator) — map an SSVC vector string
like ``SSVC:v2.0.3/E:A/A:Y/T:T/P:M/B:A/M:H/D:C/…`` to a decision via the
CISA coordinator decision tree. Implemented as a pure function over the
three decision points the CISA tree uses: Exploitation, Automatable,
Technical Impact (+ mission & well-being where present).
"""

from __future__ import annotations

# Decision points → human values
EXPLOITATION = {"N": "none", "P": "poc", "A": "active"}
AUTOMATABLE = {"N": "no", "Y": "yes"}
TECHNICAL_IMPACT = {"P": "partial", "T": "total"}
MISSION_WELLBEING = {"L": "low", "M": "medium", "H": "high"}

DECISIONS = ("Track", "Track*", "Attend", "Act")


def parse_ssvc_vector(vector: str) -> dict[str, str]:
    """``SSVC:v2.0.3/E:A/A:Y/T:T/M:H/2024-01-01`` → {metric: value}."""
    metrics: dict[str, str] = {}
    for part in (vector or "").split("/"):
        k, sep, v = part.partition(":")
        if sep and len(k) <= 2 and k.upper() not in ("SSVC",):
            metrics[k.upper()] = v.upper()
    return metrics


def ssvc_decision(vector: str) -> str | None:
    """CISA coordinator decision from an SSVC vector.

    Tree (CISA SSVC guide): exploitation none → Track (Track* when high
    mission impact); poc → Track/Track*/Attend by automatable + impact;
    active → Attend/Act by automatable + impact + mission/well-being.
    """
    m = parse_ssvc_vector(vector)
    e = EXPLOITATION.get(m.get("E", ""))
    a = AUTOMATABLE.get(m.get("A", ""))
    t = TECHNICAL_IMPACT.get(m.get("T", ""))
    mw = MISSION_WELLBEING.get(m.get("M", "M"), "medium")
    if e is None or a is None or t is None:
        return None

    if e == "none":
        return "Track*" if mw == "high" and (a == "yes" or t == "total") else "Track"
    if e == "poc":
        if mw == "high":
            return "Attend"
        if a == "yes" and t == "total":
            return "Track*"
        return "Track"
    # active exploitation
    if a == "yes" or mw == "high":
        return "Act" if t == "total" or mw == "high" else "Attend"
    return "Attend"
