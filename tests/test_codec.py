"""Codec round-trip tests — analogue of the reference's codec tests
(io/codec/ColferCodec round-trips exercised via DefaultInvertedIndexTest)."""

import numpy as np
import pytest

from strucmotif_search_spark.codec import (
    delta_decode,
    delta_encode,
    pack_block,
    unpack_block,
    varint_decode,
    varint_encode,
)


def test_varint_empty():
    assert varint_encode(np.array([], dtype=np.uint64)) == b""
    assert varint_decode(b"").size == 0


def test_varint_known_values():
    # single-byte values
    assert varint_encode(np.array([0])) == b"\x00"
    assert varint_encode(np.array([1])) == b"\x01"
    assert varint_encode(np.array([127])) == b"\x7f"
    # two-byte boundary
    assert varint_encode(np.array([128])) == b"\x80\x01"
    assert varint_encode(np.array([300])) == b"\xac\x02"


@pytest.mark.parametrize("seed", [0, 1, 7])
def test_varint_roundtrip_random(seed):
    rng = np.random.default_rng(seed)
    vals = np.concatenate(
        [
            rng.integers(0, 128, 500),
            rng.integers(0, 1 << 14, 500),
            rng.integers(0, 1 << 28, 500),
            rng.integers(0, 1 << 45, 100).astype(np.uint64),
            np.array([0, 1, 127, 128, 16383, 16384, (1 << 63) - 1], dtype=np.uint64),
        ]
    ).astype(np.uint64)
    rng.shuffle(vals)
    out = varint_decode(varint_encode(vals))
    np.testing.assert_array_equal(out, vals)


def test_delta_roundtrip():
    rng = np.random.default_rng(3)
    ids = np.unique(rng.integers(0, 1 << 40, 2000).astype(np.uint64))
    np.testing.assert_array_equal(delta_decode(delta_encode(ids)), ids)


def test_pack_unpack_block():
    rng = np.random.default_rng(11)
    ids = np.unique(rng.integers(0, 10_000_000, 1000)).astype(np.int64)
    tfs = rng.integers(1, 500, ids.size).astype(np.int64)
    gaps, tfb = pack_block(ids, tfs)
    out_ids, out_tfs = unpack_block(gaps, tfb)
    np.testing.assert_array_equal(out_ids, ids)
    np.testing.assert_array_equal(out_tfs, tfs)
    # compression sanity: delta+varint beats raw int64
    assert len(gaps) < ids.size * 8


# ---- hypothesis property tests (round 4): arbitrary adversarial inputs ----
from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=300, deadline=None)
@given(
    st.lists(
        st.integers(min_value=0, max_value=(1 << 63) - 1),
        min_size=0,
        max_size=200,
    )
)
def test_varint_roundtrip_property(vals):
    arr = np.array(vals, dtype=np.uint64)
    np.testing.assert_array_equal(varint_decode(varint_encode(arr)), arr)


@settings(max_examples=300, deadline=None)
@given(
    st.sets(
        st.integers(min_value=0, max_value=(1 << 40) - 1),
        min_size=1,
        max_size=200,
    )
)
def test_pack_unpack_block_property(id_set):
    """pack/unpack is lossless for ANY strictly-ascending doc_id set with
    arbitrary tfs — the posting-block invariant every read path rests on."""
    ids = np.array(sorted(id_set), dtype=np.int64)
    rng = np.random.default_rng(ids[0] % (1 << 32))
    tfs = rng.integers(1, 1 << 20, ids.size).astype(np.int64)
    gaps, tfb = pack_block(ids, tfs)
    out_ids, out_tfs = unpack_block(gaps, tfb)
    np.testing.assert_array_equal(out_ids, ids)
    np.testing.assert_array_equal(out_tfs, tfs)
