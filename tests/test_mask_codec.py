"""Native COCO RLE codec vs. pure-python reference + round-trips."""
import numpy as np
import pytest

from canonicalsg2im_tpu.data.mask_codec import (
    _expand_counts,
    _rle_counts_from_string,
    decode_rle,
    polygons_to_mask,
    seg_to_mask,
)
from canonicalsg2im_tpu.native import load_cocomask


def _encode_counts(counts):
    """COCO RLE string encoder (inverse of the decoder) for round-trip tests."""
    s = bytearray()
    for i, c in enumerate(counts):
        x = int(c)
        if i > 2:
            x -= int(counts[i - 2])
        more = True
        while more:
            chunk = x & 0x1F
            x >>= 5
            more = not (x == 0 and not (chunk & 0x10)
                        or x == -1 and (chunk & 0x10))
            if more:
                chunk |= 0x20
            s.append(chunk + 48)
    return s.decode()


def _mask_to_counts(mask):
    flat = np.asarray(mask, dtype=np.uint8).T.reshape(-1)  # column-major
    counts = []
    val, run = 0, 0
    for p in flat:
        if p == val:
            run += 1
        else:
            counts.append(run)
            val ^= 1
            run = 1
    counts.append(run)
    return counts


@pytest.mark.parametrize("seed", range(4))
def test_rle_string_round_trip(seed):
    rng = np.random.default_rng(seed)
    h, w = 23, 17
    mask = (rng.uniform(size=(h, w)) > 0.6).astype(np.uint8)
    counts = _mask_to_counts(mask)
    s = _encode_counts(counts)
    # decoder parses the string back to the same counts
    assert _rle_counts_from_string(s.encode()) == counts
    got = decode_rle({"size": [h, w], "counts": s})
    np.testing.assert_array_equal(got, mask)


def test_native_codec_available_and_matches_python():
    lib = load_cocomask()
    assert lib is not None, "C++ codec failed to build (g++ missing?)"
    rng = np.random.default_rng(9)
    h, w = 31, 19
    mask = (rng.uniform(size=(h, w)) > 0.5).astype(np.uint8)
    counts = _mask_to_counts(mask)
    want = _expand_counts(counts, h, w)
    got = decode_rle({"size": [h, w], "counts": counts})
    np.testing.assert_array_equal(got, want)
    np.testing.assert_array_equal(got, mask)


def test_uncompressed_counts():
    # runs go down columns: col0=[0,1,1], col1=[0,0,0], col2=[1,1,0]
    counts = [1, 2, 3, 2, 1]
    got = decode_rle({"size": [3, 3], "counts": counts})
    want = np.array([[0, 0, 1], [1, 0, 1], [1, 0, 0]], dtype=np.uint8)
    np.testing.assert_array_equal(got, want)


def test_polygon_fill_square():
    mask = polygons_to_mask([[2, 2, 8, 2, 8, 8, 2, 8]], 10, 10)
    assert mask[5, 5] == 1
    assert mask[0, 0] == 0
    assert mask[2:8, 2:8].all()
    assert mask.sum() == 36


def test_seg_to_mask_dispatch():
    m1 = seg_to_mask([[0, 0, 4, 0, 4, 4, 0, 4]], width=8, height=6)
    assert m1.shape == (6, 8)
    m2 = seg_to_mask({"size": [4, 4], "counts": [8, 8]}, width=4, height=4)
    assert m2.shape == (4, 4) and m2.sum() == 8
