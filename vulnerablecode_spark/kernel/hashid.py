"""Content-defined, hash-based storage paths for the FederatedCode export
layout.

Reference: aboutcode/hashid/__init__.py:30-96 — packages and
vulnerabilities are distributed over many balanced directories so no git
repository or directory collects too many files. A package's data lives
under ``aboutcode-packages-<type>-<purl_hash>/<type>/[<ns>/]<name>/``
(holding ``purls.yml`` and ``vulnerabilities.yml``); a vulnerability's
YAML lives under ``aboutcode-vulnerabilities/<vcid[5:7]>/<VCID>.yml``.

The purl-hash scheme is specified by the reference's own doctests
(sha256 over the UTF-8 core-purl string → big-endian integer → modulo
2**bit_count → lowercase hex left-padded to ceil(bit_count/4) chars) and
is reimplemented here against this engine's purl kernel. The per-ecosystem
bit counts are the published FederatedCode sizing table
(aboutcode-org/federatedcode issue #3) — shared scheme data both
implementations must agree on, like the CISA SSVC decision table.
"""

from __future__ import annotations

from hashlib import sha256
from math import ceil
from urllib.parse import quote

from vulnerablecode_spark.kernel.purl import Purl, parse_purl

PACKAGE_REPOS_NAME_PREFIX = "aboutcode-packages"
VULNERABILITY_REPO_NAME = "aboutcode-vulnerabilities"
PURLS_FILENAME = "purls.yml"
VULNERABILITIES_FILENAME = "vulnerabilities.yml"

# 4-tier repository sizing: super-large ecosystems shard over 2**10
# repos, large over 2**7, medium 2**5, small ecosystems keep one repo
# (aboutcode/hashid/__init__.py:168-211).
BIT_COUNT_BY_ECOSYSTEM = {
    "github": 10,
    "npm": 10,
    "golang": 7,
    "maven": 7,
    "nuget": 7,
    "perl": 7,
    "php": 7,
    "pypi": 7,
    "ruby": 7,
    "alpm": 5,
    "bitbucket": 5,
    "cocoapods": 5,
    "composer": 5,
    "deb": 5,
    "docker": 5,
    "gem": 5,
    "generic": 5,
    "huggingface": 5,
    "mlflow": 5,
    "pub": 5,
    "rpm": 5,
    "bitnami": 0,
    "cargo": 0,
    "conan": 0,
    "conda": 0,
    "cpan": 0,
    "cran": 0,
    "hackage": 0,
    "hex": 0,
    "luarocks": 0,
    "swift": 0,
}


def core_purl_string(purl: str | Purl) -> str:
    """Canonical purl string with version/qualifiers/subpath dropped —
    the hash input (hashid get_core_purl: the hash must not change with
    version or qualifiers)."""
    p = parse_purl(purl) if isinstance(purl, str) else purl
    return p.versionless.to_string()


def get_purl_hash(purl: str | Purl, bit_count: int | None = None) -> str:
    """Short lowercase hex hash of the core purl.

    sha256 over the UTF-8 core-purl string, big-endian int, modulo
    2**bit_count, hex left-padded to ceil(bit_count/4) chars. With
    bit_count=0 the hash is the empty string's worth of buckets — one
    repo — rendered as '0' padded to zero chars, i.e. ''.
    """
    p = parse_purl(purl) if isinstance(purl, str) else purl
    if bit_count is None:
        bit_count = BIT_COUNT_BY_ECOSYSTEM.get(p.type, 0)
    digest = sha256(core_purl_string(p).encode("utf-8")).digest()
    short = int.from_bytes(digest, "big") % (2 ** bit_count)
    n_chars = ceil(bit_count / 4)
    return f"{short:0{n_chars}x}".lower()


def quote_more(qs: str) -> str:
    """Percent-quote every non-quoted character (including '/'),
    leaving existing %XX escapes alone — path-safe segment encoding for
    versions/qualifiers/subpaths."""
    if not qs:
        return qs
    return quote(qs, safe="%")


def package_path_elements(purl: str | Purl) -> tuple[str, str, str, str]:
    """(purl_hash, core_path, version, extra_path) — join with '/' to
    place package data co-located per package and balanced across
    directories. ``extra_path`` encodes qualifiers + '#subpath' when
    present."""
    p = parse_purl(purl) if isinstance(purl, str) else purl
    purl_hash = get_purl_hash(p)
    ns_name = f"{p.namespace}/{p.name}" if p.namespace else p.name
    extra = ""
    if p.qualifiers:
        pairs = "&".join(f"{k}={quote(str(v), safe='')}"
                         for k, v in sorted(p.qualifiers.items()) if v)
        extra = quote_more(pairs)
    if p.subpath:
        extra += quote_more(f"#{p.subpath.strip('/')}")
    return purl_hash, f"{p.type}/{ns_name}", quote_more(p.version), extra


def package_base_dir(purl: str | Purl) -> str:
    """Versionless base directory for a package's YAML files:
    ``aboutcode-packages-<type>-<hash>/<type>/[<ns>/]<name>``."""
    p = parse_purl(purl) if isinstance(purl, str) else purl
    phash, core_path, _v, _x = package_path_elements(p)
    return f"{PACKAGE_REPOS_NAME_PREFIX}-{p.type}-{phash}/{core_path}"


def package_purls_yml_path(purl: str | Purl) -> str:
    return f"{package_base_dir(purl)}/{PURLS_FILENAME}"


def package_vulnerabilities_yml_path(purl: str | Purl) -> str:
    return f"{package_base_dir(purl)}/{VULNERABILITIES_FILENAME}"


def vulnerability_yml_path(vcid: str) -> str:
    """``<two chars of the uid section>/<VCID>.yml`` — 32×32 = 1024
    balanced directories over the VCID alphabet."""
    return f"{vcid[5:5 + 2]}/{vcid}.yml"


def get_vcid_yml_file_path(vcid: str) -> str:
    return f"{VULNERABILITY_REPO_NAME}/{vulnerability_yml_path(vcid)}"
