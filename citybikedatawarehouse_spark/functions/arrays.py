"""Array column helpers shared across plans.

Pure Catalyst higher-order-function expressions — no UDFs, no
shuffles; they run inside whole-stage codegen on each row's (already
capped) array, which is what makes the collect_set → HOF-pair-fan-out
shape beat a corpus-scale self-join for basket-pair generation
(measured 13 s → ~5 s on the q133 edge build at sf0.1; the same
rewrite applied to q237's co-occurrence training).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def ordered_pair_structs(arr: Column | str) -> Column:
    """All ordered pairs (p1 < p2 in array position) of a SORTED
    array, as ``array<struct<p1, p2>>``: for a deduped, ascending
    array this is exactly the canonical unordered-pair set the
    ``a.k < b.k`` self-join formulation produces, generated per row
    with zero joins. Feed it capped arrays (slice first) — the
    fan-out is C(|arr|, 2)."""
    arr = F.col(arr) if isinstance(arr, str) else arr
    return F.flatten(
        F.transform(
            arr,
            lambda x, i: F.transform(
                F.slice(
                    arr,
                    i + F.lit(2),
                    F.greatest(F.size(arr) - i - 1, F.lit(0)),
                ),
                lambda y: F.struct(x.alias("p1"), y.alias("p2")),
            ),
        )
    )
