"""`vers` version-range parsing and containment.

Implements the subset of the vers spec the reference's data uses
(univers VersionRange via importer.py:29-31, utils.py:353-391):
``vers:<scheme>/<constraint>|<constraint>|...`` with comparators
``= != < <= > >= *``. Containment semantics:

- ``*`` matches everything;
- any ``=`` constraint matching → contained;
- any ``!=`` constraint matching → NOT contained;
- otherwise the version must satisfy interval logic over the ordered
  bound constraints (the common OSV shape ``>=intro|<fixed`` and unions
  of such intervals).
"""

from __future__ import annotations

from dataclasses import dataclass

from vulnerablecode_spark.kernel.versions import clean_version, compare

_COMPARATORS = (">=", "<=", "!=", ">", "<", "=")


class VersError(ValueError):
    pass


@dataclass(frozen=True)
class Constraint:
    op: str
    version: str


@dataclass(frozen=True)
class VersionRange:
    scheme: str
    constraints: tuple[Constraint, ...]

    def to_string(self) -> str:
        body = "|".join(
            c.version if c.op == "*" else f"{c.op}{c.version}"
            for c in self.constraints
        ) or "*"
        return f"vers:{self.scheme}/{body}"


def parse_vers(vers: str) -> VersionRange:
    if not vers or not vers.startswith("vers:"):
        raise VersError(f"not a vers range: {vers!r}")
    body = vers[5:]
    scheme, _, constraints_str = body.partition("/")
    if not scheme or not constraints_str:
        raise VersError(f"vers needs scheme and constraints: {vers!r}")
    constraints = []
    for raw in constraints_str.split("|"):
        raw = raw.strip()
        if not raw:
            continue
        if raw == "*":
            constraints.append(Constraint("*", ""))
            continue
        for op in _COMPARATORS:
            if raw.startswith(op):
                constraints.append(Constraint(op, raw[len(op):].strip()))
                break
        else:
            constraints.append(Constraint("=", raw))
    return VersionRange(scheme.lower(), tuple(constraints))


def contains(vers_range: VersionRange | str, version: str) -> bool:
    """True when ``version`` is inside the range."""
    if isinstance(vers_range, str):
        vers_range = parse_vers(vers_range)
    v = clean_version(version)
    scheme = vers_range.scheme

    equals, excludes, bounds = [], [], []
    for c in vers_range.constraints:
        if c.op == "*":
            return not any(
                x.op == "!=" and compare(v, clean_version(x.version), scheme) == 0
                for x in vers_range.constraints
            )
        (equals if c.op == "=" else excludes if c.op == "!=" else bounds).append(c)

    for c in excludes:
        if compare(v, clean_version(c.version), scheme) == 0:
            return False
    for c in equals:
        if compare(v, clean_version(c.version), scheme) == 0:
            return True
    if not bounds:
        return False

    # interval logic per the vers spec: walk bounds sorted by version,
    # pairing each lower bound with the next upper bound into an interval;
    # a leading upper bound means (-inf, upper], a trailing lower bound
    # means [lower, +inf).
    from vulnerablecode_spark.kernel.versions import sort_key

    bounds.sort(key=lambda c: sort_key(clean_version(c.version), scheme))

    def ok_low(c: Constraint | None) -> bool:
        if c is None:
            return True
        cmp = compare(v, clean_version(c.version), scheme)
        return cmp > 0 or (cmp == 0 and c.op == ">=")

    def ok_high(c: Constraint | None) -> bool:
        if c is None:
            return True
        cmp = compare(v, clean_version(c.version), scheme)
        return cmp < 0 or (cmp == 0 and c.op == "<=")

    intervals: list[tuple[Constraint | None, Constraint | None]] = []
    current_low: Constraint | None = None
    low_open = False
    for c in bounds:
        if c.op in (">", ">="):
            if not low_open:
                current_low, low_open = c, True
        else:
            intervals.append((current_low if low_open else None, c))
            current_low, low_open = None, False
    if low_open:
        intervals.append((current_low, None))

    return any(ok_low(lo) and ok_high(hi) for lo, hi in intervals)
