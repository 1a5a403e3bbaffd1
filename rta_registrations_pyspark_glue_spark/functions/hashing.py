"""Hash functions: deterministic surrogate keys (SURVEY.md §2.8 F11).

The reference keys every dimension with
sha2(concat_ws('|', normalized attributes), 256)
(etl2_advclean_and_dimcreatin.py:156-162). Content-hash keys are the
right call at 100 TB: they need no coordination (unlike sequences),
are stable across reruns and partitionings, and make dims idempotently
re-buildable.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

HASH_BITS = 256  # reference: etl2_advclean_and_dimcreatin.py:61


def surrogate_key(*cols: Column | str, sep: str = "|", bits: int = HASH_BITS) -> Column:
    """sha2-256 over pipe-joined, lower(trim())-normalized parts.
    NULL parts: concat_ws skips NULLs (matching the reference's behavior,
    which relies on concat_ws NULL-skipping)."""
    parts = [
        F.lower(F.trim(F.col(c) if isinstance(c, str) else c)).cast("string") for c in cols
    ]
    return F.sha2(F.concat_ws(sep, *parts), bits)
