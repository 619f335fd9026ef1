"""Codec tests — varint round-trip at SmallNat boundaries (FIXTURES.md) and
posting-run round-trip; ports the reference's QuickCheck properties
(Data/SmallNat.hs:73-76, Posting2/Tests.hs:22-39)."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from simplir_spark.functions.codec import (
    MAX_SMALLNAT,
    decode_run,
    decode_varints,
    encode_run,
    encode_varints,
)

BOUNDARIES = [
    0, 1, 2,
    2**6 - 1, 2**6, 2**6 + 1,
    2**14 - 1, 2**14, 2**14 + 1,
    2**30 - 1, 2**30, 2**30 + 1,
    2**62 - 1,
]


def test_boundary_roundtrip():
    v = np.array(BOUNDARIES, dtype=np.uint64)
    buf = encode_varints(v)
    got = decode_varints(buf, len(v))
    assert got.tolist() == BOUNDARIES


def test_byte_lengths_match_smallnat_scheme():
    # SmallNat.hs:25-34: sizes 1/2/4/8 at the 6/14/30/62-bit thresholds
    for val, exp in [(0, 1), (63, 1), (64, 2), (2**14 - 1, 2), (2**14, 4),
                     (2**30 - 1, 4), (2**30, 8), (MAX_SMALLNAT, 8)]:
        assert len(encode_varints(np.array([val], dtype=np.uint64))) == exp


def test_tag_bits_layout():
    # 00zzzzzz / 01zzzzzz / 10zzzzzz / 11zzzzzz big-endian (SmallNat.hs:36-51)
    assert encode_varints(np.array([5], dtype=np.uint64)) == bytes([5])
    assert encode_varints(np.array([300], dtype=np.uint64)) == bytes([0x40 | (300 >> 8), 300 & 0xFF])
    v = 2**20 + 123
    b = encode_varints(np.array([v], dtype=np.uint64))
    assert b[0] >> 6 == 2 and len(b) == 4
    assert int.from_bytes(bytes([b[0] & 0x3F]) + b[1:], "big") == v


@settings(max_examples=300, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=MAX_SMALLNAT), max_size=200))
def test_roundtrip_hypothesis(vals):
    v = np.array(vals, dtype=np.uint64)
    assert decode_varints(encode_varints(v), len(v)).tolist() == vals


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2**40),
            st.integers(min_value=1, max_value=1000),
            st.integers(min_value=0, max_value=100000),
        ),
        min_size=1,
        max_size=300,
    )
)
def test_run_roundtrip(postings):
    postings.sort()
    dids = np.array([p[0] for p in postings], dtype=np.int64)
    # dedupe dids (runs are per-term, doc-unique)
    keep = np.concatenate([[True], np.diff(dids) > 0])
    dids = dids[keep]
    tfs = np.array([p[1] for p in postings], dtype=np.int64)[keep]
    dls = np.array([p[2] for p in postings], dtype=np.int64)[keep]
    run = encode_run(dids, tfs, dls)
    assert run["start_did"] == int(dids[0])
    assert run["end_did"] == int(dids[-1])
    assert run["n"] == len(dids)
    assert run["max_tf"] == int(tfs.max())
    assert run["sum_tf"] == int(tfs.sum())
    d2, t2, l2 = decode_run(run["start_did"], run["n"], run["deltas"], run["tfs"], run["dls"])
    assert d2.tolist() == dids.tolist()
    assert t2.tolist() == tfs.tolist()
    assert l2.tolist() == dls.tolist()


def test_rebase_run_without_reencode():
    # DiskIndex.merge shifts chunk docids only via the chunk's start
    # (Posting2/Merge.hs:47-69) — verify blob reuse under an offset.
    dids = np.array([3, 7, 8, 100], dtype=np.int64)
    tfs = np.array([1, 2, 3, 4], dtype=np.int64)
    dls = np.array([10, 20, 30, 40], dtype=np.int64)
    run = encode_run(dids, tfs, dls)
    off = 5000
    d2, t2, l2 = decode_run(run["start_did"] + off, run["n"], run["deltas"], run["tfs"], run["dls"])
    assert d2.tolist() == (dids + off).tolist()
    assert t2.tolist() == tfs.tolist() and l2.tolist() == dls.tolist()
