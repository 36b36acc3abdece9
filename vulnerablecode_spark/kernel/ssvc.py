"""SSVC (Stakeholder-Specific Vulnerability Categorization) scoring.

Reference: utils.py:752-864 (ssvc_calculator) — build an SSVC vector string
and a decision from CVE "other/ssvc" metric content, and map an SSVC vector
like ``SSVCv2/E:A/A:Y/T:T/P:M/B:A/M:H/D:C/…`` back to a decision. The
decision table is the CISA coordinator table from the public CISA SSVC
guide (cisa-ssvc-guide 508c.pdf), reproduced exactly — 36 rows of
(Exploitation, Automatable, Technical Impact, Mission & Well-being).
"""

from __future__ import annotations

# Decision points → human values
EXPLOITATION = {"N": "none", "P": "poc", "A": "active"}
AUTOMATABLE = {"N": "no", "Y": "yes"}
TECHNICAL_IMPACT = {"P": "partial", "T": "total"}
MISSION_WELLBEING = {"L": "low", "M": "medium", "H": "high"}

DECISIONS = ("Track", "Track*", "Attend", "Act")

# (Mission Prevalence, Public Well-being Impact) → Mission & Well-being
# (utils.py:766-777)
MISSION_WELLBEING_TABLE = {
    ("minimal", "minimal"): "low",
    ("minimal", "material"): "medium",
    ("minimal", "irreversible"): "high",
    ("support", "minimal"): "medium",
    ("support", "material"): "medium",
    ("support", "irreversible"): "high",
    ("essential", "minimal"): "high",
    ("essential", "material"): "high",
    ("essential", "irreversible"): "high",
}

# CISA coordinator decision table (utils.py:817-853) — exact, not a
# hand-rolled approximation: (exploitation, automatable, technical impact,
# mission & well-being) → decision.
DECISION_TABLE = {
    ("none", "no", "partial", "low"): "Track",
    ("none", "no", "partial", "medium"): "Track",
    ("none", "no", "partial", "high"): "Track",
    ("none", "no", "total", "low"): "Track",
    ("none", "no", "total", "medium"): "Track",
    ("none", "no", "total", "high"): "Track*",
    ("none", "yes", "partial", "low"): "Track",
    ("none", "yes", "partial", "medium"): "Track",
    ("none", "yes", "partial", "high"): "Attend",
    ("none", "yes", "total", "low"): "Track",
    ("none", "yes", "total", "medium"): "Track",
    ("none", "yes", "total", "high"): "Attend",
    ("poc", "no", "partial", "low"): "Track",
    ("poc", "no", "partial", "medium"): "Track",
    ("poc", "no", "partial", "high"): "Track*",
    ("poc", "no", "total", "low"): "Track",
    ("poc", "no", "total", "medium"): "Track*",
    ("poc", "no", "total", "high"): "Attend",
    ("poc", "yes", "partial", "low"): "Track",
    ("poc", "yes", "partial", "medium"): "Track",
    ("poc", "yes", "partial", "high"): "Attend",
    ("poc", "yes", "total", "low"): "Track",
    ("poc", "yes", "total", "medium"): "Track*",
    ("poc", "yes", "total", "high"): "Attend",
    ("active", "no", "partial", "low"): "Track",
    ("active", "no", "partial", "medium"): "Track",
    ("active", "no", "partial", "high"): "Attend",
    ("active", "no", "total", "low"): "Track",
    ("active", "no", "total", "medium"): "Attend",
    ("active", "no", "total", "high"): "Act",
    ("active", "yes", "partial", "low"): "Attend",
    ("active", "yes", "partial", "medium"): "Attend",
    ("active", "yes", "partial", "high"): "Act",
    ("active", "yes", "total", "low"): "Attend",
    ("active", "yes", "total", "medium"): "Act",
    ("active", "yes", "total", "high"): "Act",
}

_DECISION_CODES = {"Track": "T", "Track*": "R", "Attend": "A", "Act": "C"}

# human value → vector letter, per decision point (utils.py:797-804)
_POINT_CODES = {
    "Exploitation": ("E", {"none": "N", "poc": "P", "active": "A"}),
    "Automatable": ("A", {"no": "N", "yes": "Y"}),
    "Technical Impact": ("T", {"partial": "P", "total": "T"}),
    "Public Well-being Impact": ("B", {"minimal": "M", "material": "A",
                                       "irreversible": "I"}),
    "Mission Prevalence": ("P", {"minimal": "M", "support": "S",
                                 "essential": "E"}),
    "Mission & Well-being": ("M", {"low": "L", "medium": "M", "high": "H"}),
}


def parse_ssvc_vector(vector: str) -> dict[str, str]:
    """``SSVC:v2.0.3/E:A/A:Y/T:T/M:H/2024-01-01`` → {metric: value}."""
    metrics: dict[str, str] = {}
    for part in (vector or "").split("/"):
        k, sep, v = part.partition(":")
        if sep and len(k) <= 2 and k.upper() not in ("SSVC",):
            metrics[k.upper()] = v.upper()
    return metrics


def ssvc_decision(vector: str) -> str | None:
    """CISA coordinator decision from an SSVC vector (exact table)."""
    m = parse_ssvc_vector(vector)
    e = EXPLOITATION.get(m.get("E", ""))
    a = AUTOMATABLE.get(m.get("A", ""))
    t = TECHNICAL_IMPACT.get(m.get("T", ""))
    mw = MISSION_WELLBEING.get(m.get("M", "M"), "medium")
    if e is None or a is None or t is None:
        return None
    return DECISION_TABLE.get((e, a, t, mw))


def ssvc_vector_and_decision(content: dict) -> tuple[str, str]:
    """Reference ``ssvc_calculator`` semantics (utils.py:752-864): CVE
    "other/ssvc" metric content ``{"options": [{point: value}, ...],
    "timestamp": ...}`` → (vector string, decision).

    Option order is preserved in the vector (as the reference does);
    missing Mission Prevalence / Public Well-being Impact default to
    minimal / material before the Mission & Well-being merge.
    """
    options = content.get("options", [])
    timestamp = content.get("timestamp")
    opts: dict[str, str] = {}
    for option in options:
        for k, v in option.items():
            opts[k] = str(v).lower()
    opts.setdefault("Mission Prevalence", "minimal")
    opts.setdefault("Public Well-being Impact", "material")
    # guarded lookups: the reference's unguarded table access runs under
    # per-advisory exception isolation in its pipeline loop; here a
    # KeyError inside a UDF would fail the whole Spark task, so invalid
    # feed values yield the empty result instead
    mw = MISSION_WELLBEING_TABLE.get(
        (opts["Mission Prevalence"], opts["Public Well-being Impact"]))
    if mw is None:
        return "", ""
    opts["Mission & Well-being"] = mw

    vector = "SSVCv2/"
    for key, value in opts.items():
        point = _POINT_CODES.get(key)
        if point is None:
            continue
        letter, codes = point
        code = codes.get(value)
        if code is None:  # unknown option value: skip, never emit 'None'
            continue
        vector += f"{letter}:{code}/"

    decision = DECISION_TABLE.get(
        (opts.get("Exploitation"), opts.get("Automatable"),
         opts.get("Technical Impact"), opts.get("Mission & Well-being")), "")
    if decision:
        vector += f"D:{_DECISION_CODES[decision]}/"
    if timestamp:
        ts = _format_timestamp(timestamp)
        if ts:
            vector += f"{ts}/"
    return vector, decision


def _format_timestamp(timestamp: str) -> str | None:
    """ISO-ish timestamp → ``%Y-%m-%dT%H:%M:%SZ`` (reference uses
    dateparser; ISO 8601 covers the CVE feed's actual values)."""
    from datetime import datetime

    raw = (timestamp or "").strip().replace("Z", "+00:00")
    try:
        return datetime.fromisoformat(raw).strftime("%Y-%m-%dT%H:%M:%SZ")
    except ValueError:
        return None
