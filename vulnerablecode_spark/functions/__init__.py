"""Spark column functions wrapping the pure-Python kernels.

Split by domain:
- ``purl_funcs``     pandas UDFs over kernel.purl (normalize/plain/explode)
- ``version_funcs``  pandas UDFs over kernel.versions/vers (compare keys,
                     range containment) + the rank-encoding helper
- ``text_funcs``     pure Catalyst expressions for the reference's string
                     kernels (reference ids, identifier classification,
                     summary cleaning, alias URLs)
- ``risk``           weighted severity / exploitability / risk score
                     column expressions (risk.py semantics)
"""
