"""THE canonical engine-portable hash pair.

Cross-engine hash-matching is this repo's central correctness
invariant: every oracle-checked query derives its deterministic ids /
samples / buckets from the SAME 60-bit md5 hash, expressed once here
for each engine. Edit them TOGETHER or the DuckDB correctness gate
breaks at the first query that mixes versions.

- ``HASH60``: Spark SQL text, ``.format(x=<string expr>)``.
- ``DUCK60``: the DuckDB twin producing the bit-identical BIGINT.

Both take the first 15 hex chars of md5 → a value in [0, 2^60), so
results are always non-negative (plain ``%`` equals ``pmod``) and fit
a signed 64-bit int with 3 bits to spare.
"""

HASH60 = "cast(conv(substring(md5({x}), 1, 15), 16, 10) as bigint)"

DUCK60 = "(('0x' || substr(md5({x}), 1, 15))::UBIGINT)::BIGINT"


def hash60_py(x) -> int:
    """Driver/pandas-side twin of HASH60/DUCK60: the same 60-bit
    md5-derived hash of ``str(x)`` (Spark's ``cast(v as string)`` of
    a long equals Python ``str``). Use this — never ``hash()``/crc32
    — whenever sequential parity ops must agree with a Catalyst scale
    twin on a derived shard/bucket (ADVICE r2: pds_sequential).

    Only int and str vertex ids are accepted: for any other type
    Python ``str()`` and Spark's cast-to-string diverge (bool
    ``'True'`` vs ``'true'``, floats in scientific notation,
    timestamps), which would silently shard a sequential op
    differently from its Catalyst twin (ADVICE r3)."""
    import hashlib

    if isinstance(x, bool) or not isinstance(x, (int, str)):
        raise TypeError(
            "hash60_py accepts int or str vertex ids only (got "
            f"{type(x).__name__}): str()/cast-to-string parity with the "
            "Catalyst HASH60 twin does not hold for other types"
        )
    return int(hashlib.md5(str(x).encode()).hexdigest()[:15], 16)
