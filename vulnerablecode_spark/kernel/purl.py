"""Package-URL (purl) parsing and normalization.

A minimal, dependency-free implementation of the purl spec subset the
reference uses (packageurl-python via utils.py:572-601, models.py:927-950):
parse, canonical string, plain purl (no qualifiers/subpath), version
replacement. Namespace/name case is preserved except for ecosystems that
are case-insensitive per spec (pypi, npm scope lowering is NOT applied —
pypi also normalizes ``_`` to ``-``).
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace
from urllib.parse import quote, unquote

# ecosystems whose namespace/name are case-insensitive per the purl spec
_LOWERCASE_TYPES = {"pypi", "npm", "deb", "golang", "hex", "composer"}

# characters that make an unencoded storage key ambiguous: '@' in the
# FINAL segment (name/version) would re-parse as a version delimiter,
# '?' / '#' anywhere as qualifier/subpath starts, '/' in a name or
# version segment as a spurious namespace split (and it breaks the
# final-segment '@' test), '%' anywhere as an escape introducer ('%'
# must escape FIRST). '@' inside a NAMESPACE segment is NOT ambiguous
# (npm scopes: 'pkg:npm/@babel/traverse') and stays literal —
# parse_purl only takes '@' after the last '/' as the version
# delimiter; '/' in a namespace segment is unrepresentable by
# construction (Purl.namespace is itself the '/'-joined path).
_RAW_UNSAFE = ("%", "@", "?", "#", "/")
_RAW_UNSAFE_NAMESPACE = ("%", "?", "#")
# qualifier values: '&' splits pairs, '#' is consumed as subpath BEFORE
# the qualifier split; '@'/'?' are unambiguous there and stay literal
_RAW_UNSAFE_QUALIFIER = ("%", "&", "#")


def _raw_escape(segment: str, unsafe: tuple = _RAW_UNSAFE) -> str:
    """Minimal percent-escape for ``to_raw_string`` segments — only the
    delimiter characters, so ordinary purls stay byte-identical to plain
    concatenation while reserved-character segments stay unambiguous and
    round-trip through ``parse_purl`` (which unquotes)."""
    for ch in unsafe:
        segment = segment.replace(ch, f"%{ord(ch):02X}")
    return segment


class PurlError(ValueError):
    pass


@dataclass(frozen=True)
class Purl:
    type: str
    namespace: str = ""
    name: str = ""
    version: str = ""
    qualifiers: dict = field(default_factory=dict)
    subpath: str = ""

    def to_string(self) -> str:
        parts = [f"pkg:{self.type}/"]
        if self.namespace:
            parts.append("/".join(quote(seg, safe="") for seg in self.namespace.split("/")) + "/")
        parts.append(quote(self.name, safe=""))
        if self.version:
            parts.append("@" + quote(self.version, safe=""))
        if self.qualifiers:
            pairs = "&".join(f"{k}={quote(str(v), safe='')}"
                             for k, v in sorted(self.qualifiers.items()) if v)
            if pairs:
                parts.append("?" + pairs)
        if self.subpath:
            parts.append("#" + self.subpath.strip("/"))
        return "".join(parts)

    def to_raw_string(self) -> str:
        """The engine's STORAGE join-key form: canonical field order,
        case/type normalization and qualifier sorting like
        ``to_string``, but segments left human-readable — matching how
        sources and materialize_packages build ``package_url`` by plain
        concatenation. Requests in either encoding parse (and unquote)
        to the same raw key, so the lookup join is encoding-insensitive.

        Only the characters that would make the key AMBIGUOUS are
        escaped (``%`` ``@`` ``?`` ``#`` ``/`` in name/version
        segments, plus ``&`` in qualifier values): without this, a
        name containing ``@`` would re-parse with a spurious version,
        a version containing ``/`` would fail the final-segment test,
        and two distinct purls could collide on one storage key.
        Ordinary purls (the overwhelming corpus) contain none of these
        and round-trip byte-identical to plain concatenation.

        Round-trip guarantee: ``parse_purl(to_raw_string(p)) == p``
        for every purl whose qualifier KEYS are free of ``=``/``&``
        and whose namespace segments are free of ``/`` — i.e. every
        purl constructible by ``parse_purl`` plus directly-built ones
        with reserved characters in name/version/qualifier-values.
        Qualifier keys are matched case-insensitively and never
        unquoted on parse (purl-spec keys are ``[a-z_.-]``), so a
        directly-constructed key containing ``=`` or ``&`` is outside
        the guarantee.
        """
        parts = [f"pkg:{self.type}/"]
        if self.namespace:
            parts.append("/".join(
                _raw_escape(seg, _RAW_UNSAFE_NAMESPACE)
                for seg in self.namespace.split("/")) + "/")
        parts.append(_raw_escape(self.name))
        if self.version:
            parts.append("@" + _raw_escape(self.version))
        if self.qualifiers:
            pairs = "&".join(
                f"{k}={_raw_escape(str(v), _RAW_UNSAFE_QUALIFIER)}"
                for k, v in sorted(self.qualifiers.items()) if v)
            if pairs:
                parts.append("?" + pairs)
        if self.subpath:
            parts.append("#" + self.subpath.strip("/"))
        return "".join(parts)

    @property
    def plain(self) -> "Purl":
        """purl minus qualifiers and subpath (utils.py:410-423)."""
        return replace(self, qualifiers={}, subpath="")

    @property
    def versionless(self) -> "Purl":
        """base purl: no version either (ImpactedPackage.base_purl)."""
        return replace(self, version="", qualifiers={}, subpath="")

    def with_version(self, version: str) -> "Purl":
        """update_purl_version (utils.py:157-174)."""
        return replace(self, version=version or "")


def parse_purl(purl: str) -> Purl:
    """Parse ``pkg:type/namespace/name@version?qualifiers#subpath``."""
    if not purl or not purl.startswith("pkg:"):
        raise PurlError(f"not a purl: {purl!r}")
    rest = purl[4:].lstrip("/")

    subpath = ""
    if "#" in rest:
        rest, subpath = rest.split("#", 1)
        subpath = "/".join(seg for seg in subpath.split("/")
                           if seg not in ("", ".", ".."))

    qualifiers: dict = {}
    if "?" in rest:
        rest, qs = rest.split("?", 1)
        for pair in qs.split("&"):
            if not pair:
                continue
            k, _, v = pair.partition("=")
            if v:
                qualifiers[k.lower()] = unquote(v)

    version = ""
    # only an '@' in the FINAL segment separates a version: a scope
    # marker like npm's raw 'pkg:npm/@babel/traverse' (no version) must
    # not be consumed as the delimiter
    at = rest.rfind("@")
    if at > rest.rfind("/"):
        rest, version = rest[:at], rest[at + 1:]
        version = unquote(version)

    segments = [unquote(seg) for seg in rest.split("/") if seg]
    if len(segments) < 2:
        ptype, name = (segments + [""])[0], (segments + ["", ""])[1]
        namespace = ""
    else:
        ptype, *middle, name = segments
        namespace = "/".join(middle)
    if not ptype or not name:
        raise PurlError(f"purl needs type and name: {purl!r}")

    ptype = ptype.lower()
    if ptype in _LOWERCASE_TYPES:
        namespace = namespace.lower()
        name = name.lower()
    if ptype == "pypi":
        name = name.replace("_", "-")
    return Purl(ptype, namespace, name, version, qualifiers, subpath)


def normalize_purl(purl: str) -> str:
    """Canonical purl string for a possibly messy input."""
    return parse_purl(purl).to_string()


def plain_purl(purl: str) -> str:
    """Canonical purl without qualifiers/subpath (utils.py:410-423)."""
    return parse_purl(purl).plain.to_string()


def raw_purl(purl: str) -> str:
    """Storage join-key form of a possibly messy/encoded input — see
    ``Purl.to_raw_string``."""
    return parse_purl(purl).to_raw_string()


def plain_raw_purl(purl: str) -> str:
    """Storage join-key form without qualifiers/subpath."""
    return parse_purl(purl).plain.to_raw_string()


def purl_to_dict(purl: str) -> dict:
    """Exploded struct fields, empty-string defaults (utils.py:572-592)."""
    p = parse_purl(purl)
    return {
        "type": p.type, "namespace": p.namespace, "name": p.name,
        "version": p.version,
        "qualifiers": "&".join(f"{k}={v}" for k, v in sorted(p.qualifiers.items())),
        "subpath": p.subpath,
    }
