"""CVSS v4.0 base-score computation (FIRST CVSS v4.0 specification).

The reference scores v4 vectors through the ``cvss`` library
(severity_systems.py:90-110, Cvssv4ScoringSystem.compute). This kernel
implements the published FIRST v4.0 scoring system directly — the
MacroVector method: classify the vector into six equivalence classes,
look the MacroVector up in the specification's score table, then
interpolate downward proportionally to the vector's severity distance
from its class maximum (FIRST CVSS v4.0 spec §8.2 / the official
cvss-v4-calculator scoring algorithm).

Pure functions of the vector string — callable row-wise from a
vectorized pandas UDF.
"""

from __future__ import annotations

import math

# Metric severity orderings, most→least severe (spec §8.2): distance
# between two values is the index difference.
_LEVELS = {
    "AV": ["N", "A", "L", "P"],
    "PR": ["N", "L", "H"],
    "UI": ["N", "P", "A"],
    "AC": ["L", "H"],
    "AT": ["N", "P"],
    "VC": ["H", "L", "N"],
    "VI": ["H", "L", "N"],
    "VA": ["H", "L", "N"],
    "SC": ["H", "L", "N"],
    "SI": ["S", "H", "L", "N"],
    "SA": ["S", "H", "L", "N"],
    "CR": ["H", "M", "L"],
    "IR": ["H", "M", "L"],
    "AR": ["H", "M", "L"],
    "E": ["A", "P", "U"],
}

# MacroVector score lookup (official FIRST cvss-v4-calculator table,
# key = EQ1 EQ2 EQ3 EQ4 EQ5 EQ6).
MACRO_LOOKUP = {
    "000000": 10.0, "000001": 9.9, "000010": 9.8, "000011": 9.5,
    "000020": 9.5, "000021": 9.2, "000100": 10.0, "000101": 9.6,
    "000110": 9.3, "000111": 8.7, "000120": 9.1, "000121": 8.1,
    "000200": 9.3, "000201": 9.0, "000210": 8.9, "000211": 8.0,
    "000220": 8.1, "000221": 6.8, "001000": 9.8, "001001": 9.5,
    "001010": 9.5, "001011": 9.2, "001020": 9.0, "001021": 8.4,
    "001100": 9.3, "001101": 9.2, "001110": 8.9, "001111": 8.1,
    "001120": 8.1, "001121": 6.5, "001200": 8.8, "001201": 8.0,
    "001210": 7.8, "001211": 7.0, "001220": 6.9, "001221": 4.8,
    "002001": 9.2, "002011": 8.2, "002021": 7.2, "002101": 7.9,
    "002111": 6.9, "002121": 5.0, "002201": 6.9, "002211": 5.5,
    "002221": 2.7, "010000": 9.9, "010001": 9.7, "010010": 9.5,
    "010011": 9.2, "010020": 9.2, "010021": 8.5, "010100": 9.5,
    "010101": 9.1, "010110": 9.0, "010111": 8.3, "010120": 8.4,
    "010121": 7.1, "010200": 9.2, "010201": 8.1, "010210": 8.2,
    "010211": 7.1, "010220": 7.2, "010221": 5.3, "011000": 9.5,
    "011001": 9.3, "011010": 9.2, "011011": 8.5, "011020": 8.5,
    "011021": 7.3, "011100": 9.2, "011101": 8.2, "011110": 8.0,
    "011111": 7.2, "011120": 7.0, "011121": 5.9, "011200": 8.4,
    "011201": 7.0, "011210": 7.1, "011211": 5.2, "011220": 5.0,
    "011221": 3.0, "012001": 8.6, "012011": 7.5, "012021": 5.2,
    "012101": 7.1, "012111": 5.2, "012121": 2.9, "012201": 6.3,
    "012211": 2.9, "012221": 1.7, "100000": 9.8, "100001": 9.5,
    "100010": 9.4, "100011": 8.7, "100020": 9.1, "100021": 8.1,
    "100100": 9.4, "100101": 8.9, "100110": 8.6, "100111": 7.4,
    "100120": 7.7, "100121": 6.4, "100200": 8.7, "100201": 7.5,
    "100210": 7.4, "100211": 6.3, "100220": 6.3, "100221": 4.9,
    "101000": 9.4, "101001": 8.9, "101010": 8.8, "101011": 7.7,
    "101020": 7.6, "101021": 6.7, "101100": 8.6, "101101": 7.6,
    "101110": 7.4, "101111": 5.8, "101120": 5.9, "101121": 5.0,
    "101200": 7.2, "101201": 5.7, "101210": 5.7, "101211": 5.2,
    "101220": 5.2, "101221": 2.5, "102001": 8.3, "102011": 7.0,
    "102021": 5.4, "102101": 6.5, "102111": 5.8, "102121": 2.6,
    "102201": 5.3, "102211": 2.1, "102221": 1.3, "110000": 9.5,
    "110001": 9.0, "110010": 8.8, "110011": 7.6, "110020": 7.6,
    "110021": 7.0, "110100": 9.0, "110101": 7.7, "110110": 7.5,
    "110111": 6.2, "110120": 6.1, "110121": 5.3, "110200": 7.7,
    "110201": 6.6, "110210": 6.8, "110211": 5.9, "110220": 5.2,
    "110221": 3.0, "111000": 8.9, "111001": 7.8, "111010": 7.6,
    "111011": 6.7, "111020": 6.2, "111021": 5.8, "111100": 7.4,
    "111101": 5.9, "111110": 5.7, "111111": 5.7, "111120": 4.7,
    "111121": 2.3, "111200": 6.1, "111201": 5.2, "111210": 5.7,
    "111211": 2.9, "111220": 2.4, "111221": 1.6, "112001": 7.1,
    "112011": 5.9, "112021": 3.0, "112101": 5.8, "112111": 2.6,
    "112121": 1.5, "112201": 2.3, "112211": 1.3, "112221": 0.6,
    "200000": 9.3, "200001": 8.7, "200010": 8.6, "200011": 7.2,
    "200020": 7.5, "200021": 5.8, "200100": 8.6, "200101": 7.4,
    "200110": 7.4, "200111": 6.1, "200120": 5.6, "200121": 3.4,
    "200200": 7.0, "200201": 5.4, "200210": 5.2, "200211": 4.0,
    "200220": 4.0, "200221": 2.2, "201000": 8.5, "201001": 7.5,
    "201010": 7.4, "201011": 5.5, "201020": 6.2, "201021": 5.1,
    "201100": 7.2, "201101": 5.7, "201110": 5.5, "201111": 4.1,
    "201120": 4.6, "201121": 1.9, "201200": 5.3, "201201": 3.6,
    "201210": 3.4, "201211": 1.9, "201220": 1.9, "201221": 0.8,
    "202001": 6.4, "202011": 5.1, "202021": 2.0, "202101": 4.7,
    "202111": 2.1, "202121": 1.1, "202201": 2.4, "202211": 0.9,
    "202221": 0.4, "210000": 8.8, "210001": 7.5, "210010": 7.3,
    "210011": 5.3, "210020": 6.0, "210021": 5.0, "210100": 7.3,
    "210101": 5.5, "210110": 5.9, "210111": 4.0, "210120": 4.1,
    "210121": 2.0, "210200": 5.4, "210201": 4.3, "210210": 4.5,
    "210211": 2.2, "210220": 2.0, "210221": 1.1, "211000": 7.5,
    "211001": 5.5, "211010": 5.8, "211011": 4.5, "211020": 4.0,
    "211021": 2.1, "211100": 6.1, "211101": 5.1, "211110": 4.8,
    "211111": 1.8, "211120": 2.0, "211121": 0.9, "211200": 4.6,
    "211201": 1.8, "211210": 1.7, "211211": 0.7, "211220": 0.8,
    "211221": 0.2, "212001": 5.3, "212011": 2.4, "212021": 1.4,
    "212101": 2.4, "212111": 1.2, "212121": 0.5, "212201": 1.0,
    "212211": 0.3, "212221": 0.1,
}

# Highest-severity sub-vectors per EQ class level (spec maxComposed).
_MAX_COMPOSED = {
    "eq1": {
        0: ["AV:N/PR:N/UI:N/"],
        1: ["AV:A/PR:N/UI:N/", "AV:N/PR:L/UI:N/", "AV:N/PR:N/UI:P/"],
        2: ["AV:P/PR:N/UI:N/", "AV:A/PR:L/UI:P/"],
    },
    "eq2": {
        0: ["AC:L/AT:N/"],
        1: ["AC:H/AT:N/", "AC:L/AT:P/"],
    },
    "eq3": {
        0: {0: ["VC:H/VI:H/VA:H/CR:H/IR:H/AR:H/"],
            1: ["VC:H/VI:H/VA:L/CR:M/IR:M/AR:H/",
                "VC:H/VI:H/VA:H/CR:M/IR:M/AR:M/"]},
        1: {0: ["VC:L/VI:H/VA:H/CR:H/IR:H/AR:H/",
                "VC:H/VI:L/VA:H/CR:H/IR:H/AR:H/"],
            1: ["VC:L/VI:H/VA:L/CR:H/IR:M/AR:H/",
                "VC:L/VI:H/VA:H/CR:H/IR:M/AR:M/",
                "VC:H/VI:L/VA:H/CR:M/IR:H/AR:M/",
                "VC:H/VI:L/VA:L/CR:M/IR:H/AR:H/",
                "VC:L/VI:L/VA:H/CR:H/IR:H/AR:M/"]},
        2: {1: ["VC:L/VI:L/VA:L/CR:H/IR:H/AR:H/"]},
    },
    "eq4": {
        0: ["SC:H/SI:S/SA:S/"],
        1: ["SC:H/SI:H/SA:H/"],
        2: ["SC:L/SI:L/SA:L/"],
    },
    "eq5": {
        0: ["E:A/"],
        1: ["E:P/"],
        2: ["E:U/"],
    },
}

# Maximum severity depth per EQ level ×0.1 (spec maxSeverity).
_MAX_SEVERITY = {
    "eq1": {0: 1, 1: 4, 2: 5},
    "eq2": {0: 1, 1: 2},
    "eq3eq6": {0: {0: 7, 1: 6}, 1: {0: 8, 1: 8}, 2: {1: 10}},
    "eq4": {0: 6, 1: 5, 2: 4},
    "eq5": {0: 1, 1: 1, 2: 1},
}


def parse_cvss4_vector(vector: str) -> dict[str, str] | None:
    """``CVSS:4.0/AV:N/...`` → {metric: value}, or None if not v4."""
    v = (vector or "").strip()
    if not v.upper().startswith("CVSS:4.0/"):
        return None
    metrics: dict[str, str] = {}
    for part in v.split("/")[1:]:
        k, sep, val = part.partition(":")
        if sep:
            metrics[k.upper()] = val.upper()
    return metrics


def _m(metrics: dict[str, str], name: str) -> str:
    """Effective metric value: modified overrides base; X → default
    (E→A, CR/IR/AR→H) per spec §8.2."""
    modified = metrics.get("M" + name, "X")
    if modified != "X" and name not in ("E", "CR", "IR", "AR"):
        return modified
    value = metrics.get(name, "X")
    if name == "E":
        return "A" if value == "X" else value
    if name in ("CR", "IR", "AR"):
        return "H" if value == "X" else value
    return value


def _macro_vector(m) -> str:
    eq1 = (0 if m("AV") == "N" and m("PR") == "N" and m("UI") == "N" else
           1 if (m("AV") == "N" or m("PR") == "N" or m("UI") == "N")
           and m("AV") != "P" else 2)
    eq2 = 0 if m("AC") == "L" and m("AT") == "N" else 1
    eq3 = (0 if m("VC") == "H" and m("VI") == "H" else
           1 if m("VC") == "H" or m("VI") == "H" or m("VA") == "H" else 2)
    eq4 = (0 if m("MSI") == "S" or m("MSA") == "S" else
           1 if m("SC") == "H" or m("SI") == "H" or m("SA") == "H" else 2)
    eq5 = {"A": 0, "P": 1, "U": 2}.get(m("E"), 0)
    eq6 = (0 if (m("CR") == "H" and m("VC") == "H")
           or (m("IR") == "H" and m("VI") == "H")
           or (m("AR") == "H" and m("VA") == "H") else 1)
    return f"{eq1}{eq2}{eq3}{eq4}{eq5}{eq6}"


def _severity_distance(metric: str, got: str, max_val: str) -> int:
    levels = _LEVELS[metric]
    return levels.index(got) - levels.index(max_val)


def cvss4_base_score(vector: str) -> float | None:
    """CVSS v4.0 score per the FIRST MacroVector method, 1 decimal."""
    metrics = parse_cvss4_vector(vector)
    if metrics is None:
        return None
    required = ("AV", "AC", "AT", "PR", "UI", "VC", "VI", "VA", "SC", "SI", "SA")
    if any(r not in metrics for r in required):
        return None

    def m(name):
        if name in ("MSI", "MSA"):
            return metrics.get(name, "X")
        return _m(metrics, name)

    try:
        if all(m(x) == "N" for x in ("VC", "VI", "VA", "SC", "SI", "SA")):
            return 0.0

        macro = _macro_vector(m)
        value = MACRO_LOOKUP.get(macro)
        if value is None:
            return None
        eq1, eq2, eq3, eq4, eq5, eq6 = (int(c) for c in macro)

        # scores of the next-lower macrovector along each EQ axis
        def lk(e1, e2, e3, e4, e5, e6):
            return MACRO_LOOKUP.get(f"{e1}{e2}{e3}{e4}{e5}{e6}", math.nan)

        lower1 = lk(eq1 + 1, eq2, eq3, eq4, eq5, eq6)
        lower2 = lk(eq1, eq2 + 1, eq3, eq4, eq5, eq6)
        lower4 = lk(eq1, eq2, eq3, eq4 + 1, eq5, eq6)
        lower5 = lk(eq1, eq2, eq3, eq4, eq5 + 1, eq6)
        if eq3 == 1 and eq6 == 1:
            lower36 = lk(eq1, eq2, eq3 + 1, eq4, eq5, eq6)
        elif eq3 == 0 and eq6 == 1:
            lower36 = lk(eq1, eq2, eq3 + 1, eq4, eq5, eq6)
        elif eq3 == 1 and eq6 == 0:
            lower36 = lk(eq1, eq2, eq3, eq4, eq5, eq6 + 1)
        elif eq3 == 0 and eq6 == 0:
            left = lk(eq1, eq2, eq3, eq4, eq5, eq6 + 1)
            right = lk(eq1, eq2, eq3 + 1, eq4, eq5, eq6)
            lower36 = max(left, right) if not (math.isnan(left)
                                               or math.isnan(right)) else (
                right if math.isnan(left) else left)
        else:  # eq3 == 2 (eq6 necessarily 1)
            lower36 = math.nan

        # severity distances of the vector from its class maximum: find the
        # max sub-vector combination where every per-metric distance >= 0
        eq36_max = _MAX_COMPOSED["eq3"][eq3][eq6]
        dist = {}
        for max1 in _MAX_COMPOSED["eq1"][eq1]:
            for max2 in _MAX_COMPOSED["eq2"][eq2]:
                for max36 in eq36_max:
                    for max4 in _MAX_COMPOSED["eq4"][eq4]:
                        for max5 in _MAX_COMPOSED["eq5"][eq5]:
                            maxes = {}
                            for part in (max1 + max2 + max36 + max4
                                         + max5).split("/"):
                                if ":" in part:
                                    k, _, v = part.partition(":")
                                    maxes[k] = v
                            d = {name: _severity_distance(name, m(name),
                                                          maxes[name])
                                 for name in ("AV", "PR", "UI", "AC", "AT",
                                              "VC", "VI", "VA", "SC", "SI",
                                              "SA", "CR", "IR", "AR")}
                            if all(x >= 0 for x in d.values()):
                                dist = d
                                break
                        if dist:
                            break
                    if dist:
                        break
                if dist:
                    break
            if dist:
                break
        if not dist:
            return None

        current = {
            "eq1": dist["AV"] + dist["PR"] + dist["UI"],
            "eq2": dist["AC"] + dist["AT"],
            "eq3eq6": (dist["VC"] + dist["VI"] + dist["VA"]
                       + dist["CR"] + dist["IR"] + dist["AR"]),
            "eq4": dist["SC"] + dist["SI"] + dist["SA"],
            "eq5": 0,
        }
        max_sev = {
            "eq1": _MAX_SEVERITY["eq1"][eq1] * 0.1,
            "eq2": _MAX_SEVERITY["eq2"][eq2] * 0.1,
            "eq3eq6": _MAX_SEVERITY["eq3eq6"][eq3][eq6] * 0.1,
            "eq4": _MAX_SEVERITY["eq4"][eq4] * 0.1,
            "eq5": _MAX_SEVERITY["eq5"][eq5] * 0.1,
        }
        lowers = {"eq1": lower1, "eq2": lower2, "eq3eq6": lower36,
                  "eq4": lower4, "eq5": lower5}

        total, n = 0.0, 0
        for eq, lower in lowers.items():
            if math.isnan(lower):
                continue
            available = value - lower
            percent = (current[eq] * 0.1) / max_sev[eq]
            total += available * percent
            n += 1
        adjusted = value - (total / n if n else 0.0)
        adjusted = min(max(adjusted, 0.0), 10.0)
        return float(f"{adjusted:.1f}")
    except (KeyError, ValueError):
        return None
