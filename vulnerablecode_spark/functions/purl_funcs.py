"""Arrow-batched pandas UDFs over the purl kernel.

UDFs are the slow path — these exist ONLY for the operations Catalyst
cannot express (spec-compliant purl parsing). Everything downstream joins
on the *precomputed* canonical columns (package_url / plain_package_url),
mirroring the reference's denormalized purl columns
(models.py:865-877, 947-949) so the UDF runs once at write time, never in
the query hot path.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from vulnerablecode_spark.kernel import purl as _purl

_PURL_STRUCT = ("type string, namespace string, name string, version string, "
                "qualifiers string, subpath string")


@pandas_udf("string")
def normalize_purl(purls: pd.Series) -> pd.Series:
    def norm(s):
        try:
            return _purl.normalize_purl(s) if s else None
        except _purl.PurlError:
            return None
    return purls.map(norm)


@pandas_udf("string")
def plain_purl(purls: pd.Series) -> pd.Series:
    def plain(s):
        try:
            return _purl.plain_purl(s) if s else None
        except _purl.PurlError:
            return None
    return purls.map(plain)


@pandas_udf("string")
def raw_purl(purls: pd.Series) -> pd.Series:
    """Storage join-key form (unencoded segments) — the convention the
    engine's package_url column follows; see kernel.purl.Purl.to_raw_string."""
    def raw(s):
        try:
            return _purl.raw_purl(s) if s else None
        except _purl.PurlError:
            return None
    return purls.map(raw)


@pandas_udf("string")
def plain_raw_purl(purls: pd.Series) -> pd.Series:
    def plain_raw(s):
        try:
            return _purl.plain_raw_purl(s) if s else None
        except _purl.PurlError:
            return None
    return purls.map(plain_raw)


@pandas_udf("string")
def versionless_purl(purls: pd.Series) -> pd.Series:
    def base(s):
        try:
            return _purl.parse_purl(s).versionless.to_string() if s else None
        except _purl.PurlError:
            return None
    return purls.map(base)


@pandas_udf(_PURL_STRUCT)
def purl_struct(purls: pd.Series) -> pd.DataFrame:
    """Explode a purl string column into its canonical struct fields."""
    rows = []
    for s in purls:
        try:
            rows.append(_purl.purl_to_dict(s) if s else None)
        except _purl.PurlError:
            rows.append(None)
    return pd.DataFrame(
        [r or {k: None for k in
               ("type", "namespace", "name", "version", "qualifiers", "subpath")}
         for r in rows]
    )


def with_purl_columns(df, purl_col: str = "package_url"):
    """Attach the denormalized purl columns the engine joins on — in the
    RAW (unencoded) storage convention every join site uses
    (materialize_packages concatenation, operators/lookup raw keys,
    search prefix matches). The percent-encoded spec form stays available
    via ``normalize_purl`` for API rendering."""
    from vulnerablecode_spark import ensure_shipped

    ensure_shipped(df.sparkSession)
    return (
        df.withColumn("package_url", raw_purl(F.col(purl_col)))
        .withColumn("plain_package_url", plain_raw_purl(F.col(purl_col)))
        .withColumn("purl", purl_struct(F.col(purl_col)))
    )
