"""Python user-defined table functions (Spark 4 ``@udtf``) — the
row-to-rows extensibility surface, the TVF sibling of the custom data
source in sources/pysource.py.

House rule unchanged: Python-per-row is NOT the hot path. The catalog
chunks documents natively (plans/text.chunk_manifest — zero UDFs,
pure narrow fan-out) and q274 exists to prove the TVF surface against
the same oracle semantics, not to replace the native plan. Use a UDTF
when the expansion logic genuinely cannot be expressed with
explode/sequence/transform (bespoke parsers, stateful tokenizers);
otherwise stay JVM-side.
"""

from __future__ import annotations

import hashlib
import re

from pyspark.sql.functions import udtf


@udtf(returnType="chunk_id int, n_tokens bigint, chunk_fp string")
class ChunkDoc:
    """Sliding-window chunker as a lateral table function:
    ``LATERAL chunk_doc(text, window, stride)`` emits one row per
    chunk — chunk starts every ``stride`` tokens while a token
    remains, ``n_tokens = min(window, dl - start)``, ``chunk_fp`` the
    md5 of the space-joined chunk. Tokenization mirrors
    plans/text.words (split on whitespace after trim, so an empty
    text yields one empty token) — the SAME convention the native
    chunker and its DuckDB oracle share, which is what lets one
    oracle check both implementations."""

    def eval(self, text: str, window: int, stride: int):
        toks = re.split(r"\s+", (text or "").strip())
        dl = len(toks)
        for chunk_id in range((dl - 1) // stride + 1):
            start = chunk_id * stride
            chunk = toks[start : start + window]
            yield (
                chunk_id,
                len(chunk),
                hashlib.md5(" ".join(chunk).encode()).hexdigest(),
            )


def register_udtfs(spark) -> None:
    """Idempotently register the catalog's UDTFs on a session."""
    spark.udtf.register("chunk_doc", ChunkDoc)
