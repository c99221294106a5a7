"""Device decode vs the golden oracle and liblz4.

The reference's correctness contract is cross-implementation: bytes
compressed by one implementation must decode bit-exactly under another
(lz4e_bdev/lz4e_chunk.c:119-137 decompresses LZ4E output with stock kernel
LZ4). Here: blocks compressed by the golden encoder AND by liblz4 must both
decode bit-exactly on the device path.
"""

import numpy as np
import pytest

from lz4_sgori_tpu import format as F
from lz4_sgori_tpu import golden
from lz4_sgori_tpu.ops import decompress_blocks_device
from lz4_sgori_tpu.utils import oracle


def _blocks_of(data: bytes, block_size: int) -> list[bytes]:
    return [data[i:i + block_size] for i in range(0, len(data), block_size)] or [b""]


def _pack(comps: list[bytes], slot: int):
    comp = np.zeros((len(comps), slot), np.uint8)
    clen = np.zeros(len(comps), np.int32)
    for j, c in enumerate(comps):
        comp[j, :len(c)] = np.frombuffer(c, np.uint8)
        clen[j] = len(c)
    return comp, clen


def _decode_and_check(raw_blocks, comps, block_size):
    slot = F.compress_bound(block_size) + 8
    comp, clen = _pack(comps, slot)
    out, out_len, err = decompress_blocks_device(comp, clen, block_size)
    out, out_len, err = np.asarray(out), np.asarray(out_len), np.asarray(err)
    for j, rawb in enumerate(raw_blocks):
        assert not err[j], f"block {j}: unexpected decode error"
        assert out_len[j] == len(rawb), f"block {j}: length mismatch"
        assert bytes(out[j, :out_len[j]].tobytes()) == rawb, f"block {j}: bytes differ"


@pytest.mark.parametrize("block_size", [4096, 65536])
def test_roundtrip_golden_compressed(fixtures, block_size):
    for name, data in fixtures.items():
        raw_blocks = _blocks_of(data, block_size)
        comps = [golden.compress(rb) for rb in raw_blocks]
        _decode_and_check(raw_blocks, comps, block_size)


@pytest.mark.parametrize("block_size", [4096, 65536])
def test_roundtrip_liblz4_compressed(fixtures, block_size):
    if not oracle.available():
        pytest.skip("liblz4 not available")
    for name, data in fixtures.items():
        if not data:
            continue
        raw_blocks = _blocks_of(data, block_size)
        comps = [oracle.compress(rb) if rb else b"\x00" for rb in raw_blocks]
        _decode_and_check(raw_blocks, comps, block_size)


def test_empty_block():
    # A lone zero token: empty literal-only terminal sequence.
    comp, clen = _pack([b"\x00"], 64)
    out, out_len, err = decompress_blocks_device(comp, clen, 4096)
    assert not np.asarray(err)[0]
    assert int(np.asarray(out_len)[0]) == 0


def test_mixed_batch_compressibility(fixtures):
    bs = 4096
    datas = [fixtures["zeros_4k"], fixtures["random_4k"],
             fixtures["text_small"][:bs], fixtures["rle_short_period"][:bs]]
    comps = [golden.compress(d) for d in datas]
    _decode_and_check(datas, comps, bs)


@pytest.mark.parametrize("case", [
    b"",                      # empty input
    b"\xff",                  # truncated LSIC literal length
    b"\x10",                  # literal run exceeds input
    b"\x04" + b"abcd" + b"\x00\x00\x00",   # zero offset
    b"\x04" + b"abcd" + b"\xff\xff\x00",   # offset outside output
    b"\x14a\x00",             # match but offset truncated
])
def test_malformed_inputs_flag_error(case):
    comp, clen = _pack([case], 64)
    out, out_len, err = decompress_blocks_device(comp, clen, 4096)
    assert np.asarray(err)[0], f"malformed input accepted: {case!r}"
    # golden decoder must agree that it is malformed
    with pytest.raises(golden.DecodeError):
        golden.decompress(case, 4096)


def test_overlap_matches_all_periods():
    # periods 1..9 stress the modulo self-overlap collapse
    for p in range(1, 10):
        data = (bytes(range(ord("a"), ord("a") + p)) * (3000 // p + 1))[:3000]
        comp = golden.compress(data)
        _decode_and_check([data], [comp], 4096)


def test_output_capacity_error():
    data = bytes(8192)
    comp = golden.compress(data)
    packed, clen = _pack([comp], F.compress_bound(8192) + 8)
    out, out_len, err = decompress_blocks_device(packed, clen, 4096)
    assert np.asarray(err)[0]
