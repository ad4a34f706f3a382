"""Goldens for Lucene SmallFloat quantization (public Lucene 8 semantics)."""

import numpy as np
import pytest

from patapsco_spark.functions.smallfloat import (
    byte4_to_int,
    int_to_byte4,
    quantize_length,
    quantize_length_sql,
)


def ref_int_to_byte4(i: int) -> int:
    """Straight-line scalar re-statement of the published algorithm."""
    def long_to_int4(v):
        nbits = v.bit_length()
        if nbits < 4:
            return v
        shift = nbits - 4
        return ((v >> shift) & 0x07) | ((shift + 1) << 3)

    if i < 24:
        return i
    return 24 + long_to_int4(i - 24)


def ref_byte4_to_int(b: int) -> int:
    def int4_to_long(i):
        bits = i & 0x07
        shift = (i >> 3) - 1
        return bits if shift == -1 else (bits | 0x08) << shift

    if b < 24:
        return b
    return 24 + int4_to_long(b - 24)


def test_small_values_exact():
    v = np.arange(0, 24)
    assert (quantize_length(v) == v).all()


def test_roundtrip_against_scalar_reference():
    vals = np.unique(np.concatenate([
        np.arange(0, 5000),
        2 ** np.arange(0, 31),
        2 ** np.arange(0, 31) - 1,
        2 ** np.arange(0, 31) + 1,
    ]))
    enc = int_to_byte4(vals)
    dec = byte4_to_int(enc)
    for v, e, d in zip(vals.tolist(), enc.tolist(), dec.tolist()):
        assert e == ref_int_to_byte4(v), v
        assert d == ref_byte4_to_int(ref_int_to_byte4(v)), v


def test_monotone_and_idempotent():
    v = np.arange(0, 100000)
    q = quantize_length(v)
    assert (np.diff(q) >= 0).all()
    assert (quantize_length(q) == q).all()
    assert (q <= v).all()  # decoded value never exceeds the true length


def test_byte_range():
    assert int_to_byte4(np.array([2**31 - 1])).dtype == np.uint8


def test_sql_expression_matches_numpy():
    duckdb = pytest.importorskip("duckdb")
    expr = quantize_length_sql("dl")
    got = duckdb.sql(
        f"SELECT {expr} AS q FROM (SELECT unnest(range(0, 200000)) AS dl)"
    ).fetchnumpy()["q"]
    want = quantize_length(np.arange(0, 200000))
    assert (got == want).all()
