"""Posting codec roundtrips incl. property-based fuzzing."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from patapsco_spark.functions.codec import (
    block_meta,
    decode_postings,
    encode_postings,
    varbyte_decode,
    varbyte_encode,
)


def slow_varbyte_encode(values):
    out = bytearray()
    for v in values:
        groups = []
        while True:
            groups.append(v & 0x7F)
            v >>= 7
            if v == 0:
                break
        for g in reversed(groups[1:]):
            out.append(g | 0x80)
        out.append(groups[0])
    return bytes(out)


def test_varbyte_known_values():
    vals = np.array([0, 1, 127, 128, 129, 16383, 16384, 2**31, 2**62], dtype=np.int64)
    enc = varbyte_encode(vals)
    assert enc == slow_varbyte_encode(vals.tolist())
    assert (varbyte_decode(enc, len(vals)) == vals).all()


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**62), max_size=300))
def test_varbyte_roundtrip(vals):
    arr = np.array(vals, dtype=np.int64)
    enc = varbyte_encode(arr)
    assert enc == slow_varbyte_encode(vals)
    dec = varbyte_decode(enc, len(vals))
    assert (dec == arr).all()


@settings(max_examples=100, deadline=None)
@given(
    st.lists(st.tuples(st.integers(0, 10**9), st.integers(1, 10**6)),
             min_size=0, max_size=500),
    st.integers(0, 1000),
)
def test_postings_roundtrip(pairs, base):
    pairs = sorted({d: t for d, t in pairs}.items())
    docids = np.array([base + d for d, _ in pairs], dtype=np.int64)
    tfs = np.array([t for _, t in pairs], dtype=np.int64)
    blob = encode_postings(docids, tfs, base=base)
    d2, t2 = decode_postings(blob, len(docids), base=base)
    assert (d2 == docids).all()
    assert (t2 == tfs).all()


def test_block_meta():
    docids = np.arange(0, 300, dtype=np.int64)
    tfs = np.arange(1, 301, dtype=np.int64)
    dls = np.full(300, 50, dtype=np.int64)
    dls[130] = 7
    last, mtf, mdl = block_meta(docids, tfs, dls, block_size=128)
    assert last == [127, 255, 299]
    assert mtf == [128, 256, 300]
    assert mdl == [50, 7, 50]
