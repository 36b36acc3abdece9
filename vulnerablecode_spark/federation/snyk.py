"""Snyk federation adapter (reference: vulntotal/datasources/snyk.py).

Snyk has no public advisory API — the reference scrapes the security
pages. This adapter re-implements the scrape with a small stdlib
``html.parser`` DOM (no BeautifulSoup in this environment), verified
against the reference's recorded page fixtures byte-for-byte:

- the package page's vulnerability table → {snyk_id: affected ranges};
- one advisory page per snyk id → CVE alias + "How to fix" versions;
- the CVE search page → {snyk_id: package advisory url}.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser
from urllib.parse import quote, unquote_plus

from pyspark.sql import DataFrame

from vulnerablecode_spark.federation.base import parse_stage
from vulnerablecode_spark.kernel.purl import Purl, parse_purl

DATASOURCE_ID = "snyk"

SUPPORTED_ECOSYSTEM = {
    "cargo": "cargo", "cocoapods": "cocoapods", "composer": "composer",
    "golang": "golang", "hex": "hex", "linux": "linux", "maven": "maven",
    "npm": "npm", "nuget": "nuget", "pub": "pub", "pypi": "pip",
    "gem": "rubygems",
    # purl types outside the table are implicitly "unmanaged"
    "unmanaged": "unmanaged",
}

_PACKAGE_URL = "https://security.snyk.io/package/{ecosystem}/{package}"
_UNMANAGED_URL = ("https://security.snyk.io/api/listing?search={package}"
                  "&type=unmanaged")

_FIXED_VERSION = re.compile(r"\b\d[\w.-]*\b")
_VOID_TAGS = frozenset(
    "area base br col embed hr img input link meta source track wbr".split())


def supported_ecosystem() -> dict[str, str]:
    return dict(SUPPORTED_ECOSYSTEM)


class _Node:
    __slots__ = ("tag", "attrs", "children", "_text")

    def __init__(self, tag: str, attrs=()):  # type: ignore[assignment]
        self.tag = tag
        self.attrs = dict(attrs)
        self.children: list = []
        self._text: list[str] = []

    def get(self, name: str, default=None):
        return self.attrs.get(name, default)

    def __getitem__(self, name: str):
        return self.attrs[name]

    @property
    def classes(self) -> list[str]:
        return (self.attrs.get("class") or "").split()

    @property
    def text(self) -> str:
        """All descendant text, document order (the BS4 ``.text``)."""
        parts = list(self._text)
        for child in self.children:
            parts.append(child.text)
        return "".join(parts)

    def _matches(self, tag: str | None, class_: str | None) -> bool:
        if tag is not None and self.tag != tag:
            return False
        if class_ is None:
            return True
        if " " in class_:  # multi-class query: exact attribute match
            return self.attrs.get("class") == class_
        return class_ in self.classes

    def find_all(self, tag: str | None = None,
                 class_: str | None = None) -> list["_Node"]:
        found = []
        for child in self.children:
            if child._matches(tag, class_):
                found.append(child)
            found.extend(child.find_all(tag, class_))
        return found

    def find(self, tag: str | None = None,
             class_: str | None = None) -> "_Node | None":
        for child in self.children:
            if child._matches(tag, class_):
                return child
            hit = child.find(tag, class_)
            if hit is not None:
                return hit
        return None


class _Dom(HTMLParser):
    """Tolerant tree builder: unquoted/valueless attributes, comments,
    void elements and unbalanced end tags all occur in real Snyk pages."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.root = _Node("#root")
        self._stack = [self.root]

    def handle_starttag(self, tag, attrs):
        node = _Node(tag, [(k, v if v is not None else "") for k, v in attrs])
        self._stack[-1].children.append(node)
        if tag not in _VOID_TAGS:
            self._stack.append(node)

    def handle_startendtag(self, tag, attrs):
        self._stack[-1].children.append(
            _Node(tag, [(k, v if v is not None else "") for k, v in attrs]))

    def handle_endtag(self, tag):
        for i in range(len(self._stack) - 1, 0, -1):
            if self._stack[i].tag == tag:
                del self._stack[i:]
                return

    def handle_data(self, data):
        # text always rides a leaf child so document order is preserved
        # regardless of how elements and text interleave
        self._stack[-1].children.append(_TextLeaf(data))


class _TextLeaf(_Node):
    def __init__(self, data: str):
        super().__init__("#text")
        self._text = [data]

    def _matches(self, tag, class_):
        return False


def _parse_dom(html_text: str) -> _Node:
    dom = _Dom()
    dom.feed(html_text)
    return dom.root


def package_advisory_url(purl: str) -> str | None:
    """Package security-page URL (snyk.py:130-171 parity): maven as
    percent-encoded namespace:name, golang/composer as namespace/name,
    linux prefixed with the distro qualifier; unsupported types fall
    back to the unmanaged pseudo-API search."""
    p = parse_purl(purl)
    if p.type == "unmanaged" or p.type not in SUPPORTED_ECOSYSTEM:
        return _UNMANAGED_URL.format(
            package=p.name if not p.namespace else f"{p.namespace}/{p.name}")
    name = p.name
    if p.type == "maven":
        if not p.namespace:
            return None
        name = quote(f"{p.namespace}:{p.name}", safe="")
    elif p.type in ("golang", "composer"):
        if p.namespace:
            name = quote(f"{p.namespace}/{p.name}", safe="")
    elif p.type == "linux":
        name = f"{p.qualifiers['distro']}/{p.name}"
    return _PACKAGE_URL.format(ecosystem=SUPPORTED_ECOSYSTEM[p.type],
                               package=name)


def purl_from_advisory_url(package_advisory_url: str) -> str | None:
    """Inverse mapping: Snyk package-page URL → canonical purl string
    (snyk.py:174-226)."""
    path = unquote_plus(package_advisory_url.replace(
        "https://security.snyk.io/package/", ""))
    reverse = {v: k for k, v in SUPPORTED_ECOSYSTEM.items()}
    parts = path.split("/")
    ptype = parts[0]
    name = namespace = None
    if ptype == "maven":
        namespace, _, name = parts[1].partition(":")
    elif ptype == "composer":
        name, namespace = parts[-1], parts[-2]
    elif ptype == "golang":
        name, namespace = parts[-1], "/".join(parts[1:-1])
    elif ptype == "npm":
        if "@" in path:
            namespace = parts[-2]
        name = parts[-1]
    elif ptype == "linux":
        # the distro path segment is NOT carried onto the purl —
        # reference parity (snyk.py:214-219 builds qualifiers but its
        # PackageURL call never passes them)
        name = parts[-1]
    elif ptype in ("cocoapods", "hex", "nuget", "pip", "rubygems",
                   "unmanaged"):
        name = parts[-1]
    if not ptype or not name:
        return None
    return Purl(reverse[ptype], namespace or "", name).to_string()


def request_for(purl: str) -> dict | None:
    url = package_advisory_url(purl)
    return {"method": "GET", "url": url} if url else None


def advisory_url(snyk_id: str) -> str:
    return f"https://security.snyk.io/vuln/{snyk_id}"


def cve_search_url(cve_id: str) -> str:
    return f"https://security.snyk.io/vuln?search={cve_id}"


def extract_advisories(page) -> dict[str, list[str]]:
    """Package page (HTML) or unmanaged pseudo-API response (dict) →
    {snyk_id: affected version ranges} (snyk.py:229-258)."""
    vulnerability: dict[str, list[str]] = {}
    if isinstance(page, dict):
        if page.get("status") == "ok":
            for vuln in page["vulnerabilities"]:
                vulnerability[vuln["id"]] = vuln["semver"]["vulnerable"]
        return vulnerability
    root = _parse_dom(page)
    table = root.find("tbody", class_="vue--table__tbody")
    if table is None:
        return vulnerability
    for row in table.find_all("tr", class_="vue--table__row"):
        anchor = row.find(class_="vue--anchor")
        chips = row.find_all(
            "span",
            class_="vue--chip vulnerable-versions__chip vue--chip--default")
        if anchor is None:
            continue
        vulnerability[anchor["href"].rsplit("/", 1)[-1]] = [
            chip.text.strip() for chip in chips]
    return vulnerability


def parse_html_advisory(advisory_html: str, snyk_id: str,
                        affected: list[str], purl: str) -> dict:
    """Advisory page → VendorData (snyk.py:261-296): the CVE anchor id
    as alias, "How to fix" paragraph versions as fixed."""
    p = parse_purl(purl)
    aliases: list[str] = []
    fixed_versions: list[str] = []
    root = _parse_dom(advisory_html)
    cve_span = root.find("span", class_="cve")
    if cve_span is not None:
        cve_anchor = cve_span.find("a", class_="vue--anchor")
        if cve_anchor is not None:
            aliases.append(cve_anchor.get("id"))
    how_to_fix = root.find(
        "div",
        class_="vue--block vuln-page__instruction-block "
               "vue--block--instruction")
    if how_to_fix is not None:
        paragraph = how_to_fix.find("p")
        if paragraph is not None and paragraph.text:
            fixed_versions = _FIXED_VERSION.findall(paragraph.text)
    aliases.append(snyk_id)
    return {
        "purl": p.versionless.to_string(),
        "aliases": aliases,
        "affected_versions": affected,
        "fixed_versions": fixed_versions,
    }


def parse_cve_advisory_html(cve_advisory_html: str) -> dict[str, str] | None:
    """CVE search page → {snyk_id: package advisory url}
    (snyk.py:299-324)."""
    root = _parse_dom(cve_advisory_html)
    table = root.find("tbody", class_="vue--table__tbody")
    if table is None:
        return None
    vulns: dict[str, str] = {}
    for row in table.find_all("tr", class_="vue--table__row"):
        anchors = row.find_all("a", class_="vue--anchor")
        if len(anchors) != 2:
            continue
        snyk_id = anchors[0]["href"].split("/")[1]
        vulns[snyk_id] = f"https://security.snyk.io{anchors[1]['href']}"
    return vulns


def parse_response(text: str, purl: str) -> list[dict]:
    """An advisory page response TAGGED ``snyk_id\\naffected\\nhtml`` by
    the fetch orchestration → VendorData rows.

    The tag prefix is mandatory: an UNTAGGED page (raw HTML straight
    from fetch_stage) would otherwise misparse its first two markup
    lines into an alias and an affected range — so anything whose first
    line does not look like a SNYK id yields no rows. The affected
    ranges in the tag are version-FILTERED against the purl's version
    here (the reference's ``"*" in affected or is_purl_in_affected``
    gate, vulntotal snyk.py) so a package page chip for a range the
    queried version is outside never becomes a claim."""
    from vulnerablecode_spark.federation.base import snyk_range_satisfied
    from vulnerablecode_spark.kernel.purl import PurlError

    snyk_id, _, rest = text.partition("\n")
    affected, _, html_text = rest.partition("\n")
    if not html_text or not snyk_id.startswith("SNYK-"):
        return []
    ranges = affected.split("|") if affected else []
    try:
        version = parse_purl(purl).version
    except PurlError:
        version = ""
    if version and ranges:
        if not any(r.strip() == "*" or snyk_range_satisfied(r, version)
                   for r in ranges):
            return []  # the queried version is outside every chip range
    return [parse_html_advisory(html_text, snyk_id, ranges, purl)]


def parse(responses: DataFrame) -> DataFrame:
    return parse_stage(responses, DATASOURCE_ID, parse_response)
