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


def cms_buckets(key: Column | str, width: int, depth: int = 4) -> Column:
    """All ``depth`` count-min row buckets from ONE md5 call: the
    32-hex digest of 'cms:'||key splits into ``depth`` disjoint
    8-hex chunks (depth <= 4), each an independent 32-bit value mod
    ``width``. One digest per row instead of one per (row, j) — 4x
    less hashing on the sketch build's full-corpus scan (measured:
    the md5 projection dominated q243's cost), with the same
    purity contract as ``hll_parts``/``bloom_bit``: a pure function
    of the key, so per-epoch slices SUM-merge and the oracle replays it
    verbatim (``cms_buckets_sql``). Returns array<bigint> indexed by
    hash row j; pair with ``F.posexplode`` to get (j, bucket).

    Independence caveat: the ``depth`` chunks come from ONE digest,
    so they are correlated rather than d independently-keyed hashes —
    the classic CM-sketch error bound (eps = e/width with prob
    1 - e^-depth) formally assumes pairwise-independent rows. For
    this non-adversarial frequency-audit workload md5's avalanche
    makes the chunks behave independently in practice, but size
    depth*width with margin rather than at the bound when the
    guarantee matters."""
    if not 1 <= depth <= 4:
        raise ValueError("md5 yields 4 independent 8-hex chunks")
    key = F.col(key) if isinstance(key, str) else key
    h = F.md5(F.concat(F.lit("cms:"), key.cast("string")))
    # chunk % width only depends on the chunk's last k hex chars when
    # 16^k divides evenly into width's residue classes (16^k % width
    # == 0): parse just those — conv()'s cost is per-CHARACTER
    # (measured: conv on 2 chars is ~4x cheaper than on 8), and for
    # the default width 256, k = 2
    k = next((k for k in (1, 2, 3) if 16**k % width == 0), 8)
    return F.array(
        *[
            F.conv(F.substring(h, 1 + 8 * j + (8 - k), k), 16, 10).cast(
                "long"
            )
            % width
            for j in range(depth)
        ]
    )


def cms_buckets_sql(key_expr: str, width: int, j_expr: str) -> str:
    """DuckDB twin of ``cms_buckets``: the bucket for hash row
    ``j_expr`` of the single-md5 chunked CMS hash."""
    h = f"md5('cms:' || CAST({key_expr} AS VARCHAR))"
    return (
        f"(('0x' || substr({h}, 1 + 8 * CAST({j_expr} AS INTEGER), 8))"
        f"::BIGINT % {width})"
    )


HLL_BUCKETS = 256  # 2^8 registers
HLL_RHO_MAX = 57   # 56 payload bits + 1


def hll_parts(key: Column | str, tag: str = "hll") -> tuple[Column, Column]:
    """HyperLogLog (bucket, rho) for a key: md5(tag||':'||key) hex;
    first 2 hex digits select the register, the next 14 hex digits
    (56 bits) give rho = 1 + leading zero bits (HLL_RHO_MAX if the
    payload is all zeros). String-domain leading-zero math — no
    float log2, no engine-specific bit intrinsics — so Spark and the
    DuckDB oracle compute identical registers, and registers form a
    MAX-monoid (streaming slices merge losslessly)."""
    key = F.col(key) if isinstance(key, str) else key
    h = F.md5(F.concat(F.lit(tag + ":"), key.cast("string")))
    bucket = F.conv(F.substring(h, 1, 2), 16, 10).cast("int")
    payload = F.substring(h, 3, 14)
    zrun = F.length(F.regexp_extract(payload, "^(0*)", 1))
    first_nibble = F.conv(
        F.substring(payload, (zrun + 1).cast("int"), 1), 16, 10
    ).cast("int")
    nib_lz = (
        F.when(first_nibble >= 8, 0)
        .when(first_nibble >= 4, 1)
        .when(first_nibble >= 2, 2)
        .otherwise(3)
    )
    rho = F.when(zrun == 14, F.lit(HLL_RHO_MAX)).otherwise(
        zrun * 4 + nib_lz + 1
    )
    return bucket, rho.cast("int")


def hll_parts_sql(key_expr: str, tag: str = "hll") -> str:
    """DuckDB twin of ``hll_parts``: renders (bucket, rho) select
    expressions for the given key expression."""
    h = f"md5('{tag}:' || CAST({key_expr} AS VARCHAR))"
    payload = f"substr({h}, 3, 14)"
    zrun = f"length(regexp_extract({payload}, '^(0*)', 1))"
    first_nibble = f"('0x' || substr({payload}, {zrun} + 1, 1))::BIGINT"
    nib_lz = (
        f"CASE WHEN {first_nibble} >= 8 THEN 0 "
        f"WHEN {first_nibble} >= 4 THEN 1 "
        f"WHEN {first_nibble} >= 2 THEN 2 ELSE 3 END"
    )
    bucket = f"CAST(('0x' || substr({h}, 1, 2))::BIGINT AS INTEGER)"
    rho = (
        f"CAST(CASE WHEN {zrun} = 14 THEN {HLL_RHO_MAX} "
        f"ELSE {zrun} * 4 + {nib_lz} + 1 END AS INTEGER)"
    )
    return f"{bucket} AS bucket, {rho} AS rho"


def bloom_bit(j: Column | str, key: Column | str, m_bits: int) -> Column:
    """Bloom-filter bit position for hash row ``j``: md5-derived,
    pure function of (j, key) — the same contract as ``cms_buckets``
    / ``hll_parts``; bits form an OR-monoid (set-of-positions union)
    so per-epoch slices merge by DISTINCT union. Oracle twin:
    `('0x'||substr(md5('bloom'||j||':'||key),1,8))::BIGINT % m`."""
    j = F.col(j) if isinstance(j, str) else j
    key = F.col(key) if isinstance(key, str) else key
    return (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("bloom"),
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
        % m_bits
    )


KMV_DOMAIN = 1 << 60  # kmv_hash range: 60-bit md5 prefix


def kmv_hash(key: Column | str) -> Column:
    """KMV / theta-sketch hash: 60-bit integer md5 prefix of the key
    — pure, uniform over [0, 2^60), identical across engines (oracle
    twin: ``('0x' || substr(md5('kmv:' || key), 1, 15))::BIGINT``).
    Bottom-k sets of this hash form an idempotent commutative monoid
    (q275/q276 sketches, streaming/incremental.kmv_epoch_step)."""
    key = F.col(key) if isinstance(key, str) else key
    return F.conv(
        F.substring(
            F.md5(F.concat(F.lit("kmv:"), key.cast("string"))), 1, 15
        ),
        16,
        10,
    ).cast("bigint")
