"""Engine-portable deterministic hash buckets — LEAF module.

One md5-derived 60-bit bucket in [0, DENOM) shared by every sampling /
split / curriculum decision in the package, with the matching DuckDB SQL
templates so each oracle reproduces the exact same assignment.  Lives in
its own module (importing nothing from the package) because BOTH
``datapipe.sampling`` and ``datapipe.text`` need it at module-import
time: sampling's module-level oracle builders import text attributes, so
a text → sampling module-level import would close a cycle whose
resolvability depended on statement ordering inside both files (the r14
CCNet gate originally hit exactly that).  ``sampling`` re-exports these
names, so existing ``from .sampling import hash_bucket`` call sites are
unaffected.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DENOM = 1_000_000  # ppm resolution for rates/weights


def hash_bucket(key: Column, denom: int = DENOM) -> Column:
    """Uniform bucket in [0, denom) from a key column's md5."""
    h = F.conv(F.substring(F.md5(key.cast("string")), 1, 15), 16, 10).cast("long")
    return h % denom


# DuckDB twin of hash_bucket (format with {k} = the key expression)
DUCK_BUCKET = (
    "CAST(concat('0x', substr(md5(CAST({k} AS VARCHAR)), 1, 15)) AS BIGINT)"
    f" % {DENOM}"
)

# salted bucket template: one source of truth for every salted md5 ppm
# bucket in the oracles (the salt must include its trailing separator)
DUCK_SALTED_BUCKET = (
    "CAST(concat('0x', substr(md5('<SALT>' || CAST({k} AS VARCHAR)), 1, 15))"
    f" AS BIGINT) % {DENOM}"
)
