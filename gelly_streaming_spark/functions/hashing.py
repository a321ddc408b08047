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
    twin on a derived shard/bucket (ADVICE r2: pds_sequential)."""
    import hashlib

    return int(hashlib.md5(str(x).encode()).hexdigest()[:15], 16)
