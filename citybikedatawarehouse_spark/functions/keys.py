"""Surrogate-key generation.

The reference assigns ``uuid.uuid4()`` per dimension row
(/root/reference/src/check_and_create_db_v4.py:148 etc.). Random keys
are hostile to distributed execution: they are nondeterministic
(breaks task-retry idempotence and any golden test) and force a
join-back from the fact side to resolve them.

Default here: deterministic ``sha2(concat_ws(natural key), 256)``.
Both sides of a fact-dimension relationship can compute the same key
independently — which removes the dimension join from the fact build
entirely (no shuffle at all at 100 TB). ``uuid`` mode is kept for
behavioral parity with the reference.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ASCII unit/record separators: cannot appear in natural-key text, so
# concat_ws cannot collide across column boundaries. Oracle-SQL
# equivalents: chr(31) and chr(30)||'NULL'.
KEY_SEP = "\x1f"
NULL_TOKEN = "\x1eNULL"


def surrogate_key(*cols: Column | str, mode: str = "sha2") -> Column:
    """Deterministic (default) or random surrogate key.

    Null-safe: nulls are encoded as a sentinel so (null, 'x') and
    ('x', null) produce distinct keys, and a fully-null natural key
    still gets a key.
    """
    if mode == "uuid":
        return F.expr("uuid()")
    if mode != "sha2":
        raise ValueError(f"unknown surrogate key mode: {mode}")
    parts = [
        F.coalesce(
            (F.col(c) if isinstance(c, str) else c).cast("string"),
            F.lit(NULL_TOKEN),
        )
        for c in cols
    ]
    return F.sha2(F.concat_ws(KEY_SEP, *parts), 256)


def surrogate_key_sql(*exprs: str) -> str:
    """The DuckDB-SQL rendering of the same deterministic key — used
    by oracle queries so both engines derive identical ids."""
    parts = ", ".join(
        f"coalesce(CAST({e} AS VARCHAR), chr(30)||'NULL')" for e in exprs
    )
    return f"sha256(concat_ws(chr(31), {parts}))"


def cms_bucket(j: Column | str, key: Column | str, width: int) -> Column:
    """Count-min-sketch row hash: md5('cms'||j||':'||key) first 8 hex
    digits as an integer, mod ``width``. A pure function of (row,
    key) — identical on every engine, epoch, and partitioning, so
    per-epoch sketch slices merge by SUM and the DuckDB oracle
    replays it verbatim (`('0x'||substr(md5(...),1,8))::BIGINT %
    width`)."""
    j = F.col(j) if isinstance(j, str) else j
    key = F.col(key) if isinstance(key, str) else key
    return (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("cms"),
                        j.cast("string"),
                        F.lit(":"),
                        key.cast("string"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % width
    )
