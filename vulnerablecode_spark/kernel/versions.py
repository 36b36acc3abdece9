"""Ecosystem-aware version parsing, comparison and sort-key encoding.

The reference defers to the univers library (models.py:1021-1028,
utils.py:603-610); this kernel implements the ordering semantics the engine
needs directly:

- ``semver``/``pypi``/``generic``: dotted numeric segments with pre-release
  ordering (``1.10 > 1.9``; ``1.0-alpha < 1.0``; pypi ``dev < a < b < rc <
  final < post``).
- ``deb``: Debian policy ordering — epoch, ``~`` sorts before everything
  (``1:1.0 > 2.0``; ``1.0~rc1 < 1.0``).

``sort_key(version, scheme)`` returns a tuple usable to rank-encode
versions ONCE per package group (the version_rank pattern,
compute_package_version_rank.py:33-94); all downstream joins/windows then
compare plain integers.
"""

from __future__ import annotations

import re

# pre-release tag ranks: anything unknown ranks as 0 (before final) except
# post/dev handling below; final release gets rank 1.
_PRE_RANKS = {"dev": -4, "alpha": -3, "a": -3, "beta": -2, "b": -2,
              "rc": -1, "c": -1, "pre": -1, "preview": -1}
_POST_TAGS = {"post", "rev", "r"}

_SEGMENT_RE = re.compile(r"(\d+|[a-zA-Z]+)")


def clean_version(version: str) -> str:
    """Strip whitespace and a leading 'v'/'V' (utils.py:371-375)."""
    return (version or "").replace(" ", "").lstrip("vV")


def _split_tokens(version: str) -> list[str]:
    return _SEGMENT_RE.findall(version)


def _generic_key(version: str) -> tuple:
    """Sortable tuple for dotted versions with pre/post-release tags.

    Encoding: a sequence of (kind, value) pairs where kind orders
    numeric segments against alphabetic tags, terminated by a final-release
    marker so ``1.0 > 1.0rc1`` and ``1.0.post1 > 1.0``.
    """
    tokens = _split_tokens(clean_version(version).lower())
    key: list[tuple] = []
    for tok in tokens:
        if tok.isdigit():
            key.append((1, int(tok)))
        elif tok in _POST_TAGS:
            # post sorts ABOVE the final-release terminator (-2) but
            # BELOW any numeric segment (>= 0): 1.0 < 1.0.post1 < 1.0.1
            # (the old (2, 0) kind outranked numerics, wrongly placing
            # 1.0.post1 after 1.0.1 — a false 'affected' hazard in
            # >=x.y.z range containment)
            key.append((1, -1))
        else:
            key.append((0, _PRE_RANKS.get(tok, -5), tok))
    # final-release terminator: a bare "1.0" must sort AFTER "1.0rc1"
    # (which continues with a (0, …) pre segment) and BEFORE "1.0.post1"
    # and "1.0.1" (which continue with (1, -1) / (1, n) segments).
    key.append((1, -2))
    return tuple(_pad(k) for k in key)


def _pad(part: tuple) -> tuple:
    # make all parts same-arity so tuple comparison never hits int-vs-str
    if len(part) == 2:
        return (part[0], part[1], "")
    return part


_DEB_NONDIGIT_RE = re.compile(r"^\D*")
_DEB_DIGIT_RE = re.compile(r"^\d*")


def _deb_char_order(ch: str) -> int:
    # Debian policy: '~' < '' < letters < non-letters
    if ch == "~":
        return -1
    if ch.isalpha():
        return ord(ch)
    return ord(ch) + 256


def _deb_part_key(part: str) -> tuple:
    """Encode one Debian upstream/revision string as a sortable tuple."""
    key: list = []
    s = part
    while s:
        nond = _DEB_NONDIGIT_RE.match(s).group(0)
        s = s[len(nond):]
        key.append(tuple(_deb_char_order(c) for c in nond) or (0,))
        dig = _DEB_DIGIT_RE.match(s).group(0)
        s = s[len(dig):]
        key.append(int(dig or 0))
    # trailing '~' must sort before "nothing": encode terminator
    key.append((0,))
    key.append(0)
    return tuple(key)


def _deb_key(version: str) -> tuple:
    v = (version or "").strip()
    epoch = 0
    if ":" in v:
        e, _, v = v.partition(":")
        if e.isdigit():
            epoch = int(e)
    upstream, _, revision = v.rpartition("-") if "-" in v else (v, "", "")
    if not upstream:
        upstream, revision = v, ""
    return (epoch, _deb_part_key(upstream), _deb_part_key(revision))


def sort_key(version: str, scheme: str = "generic") -> tuple:
    """Sortable key tuple for a version under an ecosystem's ordering."""
    if scheme in ("deb", "debian", "rpm"):
        return _deb_key(version)
    return _generic_key(version)


def compare(a: str, b: str, scheme: str = "generic") -> int:
    """-1/0/+1 three-way comparison."""
    ka, kb = sort_key(a, scheme), sort_key(b, scheme)
    return -1 if ka < kb else (1 if ka > kb else 0)
