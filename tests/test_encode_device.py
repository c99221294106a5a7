"""Device encode: round-trip, cross-implementation decodability, and the
compressed-size contract (<= LZ4_compress_default, BASELINE.md north star).

The reference proves its encoder by decompressing every write with stock
LZ4 (lz4e_bdev/lz4e_chunk.c:119-137). Mirrored here: every device-encoded
block must decode bit-exactly under (a) the golden scalar decoder,
(b) liblz4, and (c) the device decoder.
"""

import numpy as np
import pytest

from lz4_sgori_tpu import format as F
from lz4_sgori_tpu import golden
from lz4_sgori_tpu.ops import compress_blocks_device, decompress_blocks_device
from lz4_sgori_tpu.utils import oracle


def _blocks_of(data: bytes, block_size: int) -> list[bytes]:
    return [data[i:i + block_size] for i in range(0, len(data), block_size)] or [b""]


def _pack_raw(blocks: list[bytes], block_size: int):
    raw = np.zeros((len(blocks), block_size), np.uint8)
    rlen = np.zeros(len(blocks), np.int32)
    for j, blk in enumerate(blocks):
        raw[j, :len(blk)] = np.frombuffer(blk, np.uint8)
        rlen[j] = len(blk)
    return raw, rlen


def _encode(blocks: list[bytes], block_size: int) -> list[bytes]:
    raw, rlen = _pack_raw(blocks, block_size)
    comp, clen = compress_blocks_device(raw, rlen, block_size)
    comp, clen = np.asarray(comp), np.asarray(clen)
    return [comp[j, :clen[j]].tobytes() for j in range(len(blocks))]


@pytest.mark.parametrize("block_size", [4096, 65536])
def test_roundtrip_golden_decode(fixtures, block_size):
    for name, data in fixtures.items():
        raw_blocks = _blocks_of(data, block_size)
        for rb, cb in zip(raw_blocks, _encode(raw_blocks, block_size)):
            got = golden.decompress(cb, block_size)
            assert got == rb, f"{name}: golden decode mismatch"


@pytest.mark.parametrize("block_size", [4096, 65536])
def test_roundtrip_liblz4_decode(fixtures, block_size):
    if not oracle.available():
        pytest.skip("liblz4 not available")
    for name, data in fixtures.items():
        raw_blocks = _blocks_of(data, block_size)
        for rb, cb in zip(raw_blocks, _encode(raw_blocks, block_size)):
            got = oracle.decompress(cb, block_size)
            assert got == rb, f"{name}: liblz4 decode mismatch"


@pytest.mark.parametrize("block_size", [4096, 65536])
def test_roundtrip_device_decode(fixtures, block_size):
    slot = F.compress_bound(block_size) + 8
    for name, data in fixtures.items():
        raw_blocks = _blocks_of(data, block_size)
        comps = _encode(raw_blocks, block_size)
        comp = np.zeros((len(comps), slot), np.uint8)
        clen = np.zeros(len(comps), np.int32)
        for j, c in enumerate(comps):
            comp[j, :len(c)] = np.frombuffer(c, np.uint8)
            clen[j] = len(c)
        out, out_len, err = decompress_blocks_device(comp, clen, block_size)
        out, out_len, err = np.asarray(out), np.asarray(out_len), np.asarray(err)
        for j, rb in enumerate(raw_blocks):
            assert not err[j], f"{name} block {j}: device decode error"
            assert out[j, :out_len[j]].tobytes() == rb, f"{name} block {j}"


@pytest.mark.parametrize("block_size", [4096, 65536])
def test_size_beats_or_matches_lz4(fixtures, block_size):
    """Device-encoder compressed size vs LZ4_compress_default (BASELINE.json
    north star). The sort-based exact match finder + lazy parse dominate the
    reference's collision-prone single-probe table on virtually all inputs;
    a whisker of slack (0.1% + 8B) absorbs rare greedy-parse tie-breaks —
    the strict per-block <= guarantee lives in the verified framing path
    (test_blocks.test_framing_size_dominates_lz4)."""
    if not oracle.available():
        pytest.skip("liblz4 not available")
    total_ours = total_ref = 0
    for name, data in fixtures.items():
        if not data:
            continue
        raw_blocks = _blocks_of(data, block_size)
        ours = sum(len(c) for c in _encode(raw_blocks, block_size))
        ref = sum(len(oracle.compress(rb)) if rb else 1 for rb in raw_blocks)
        total_ours += ours
        total_ref += ref
        assert ours <= ref * 1.001 + 8, f"{name}: {ours} > lz4 {ref}"
    # aggregate must strictly win
    assert total_ours <= total_ref, (total_ours, total_ref)


def test_empty_and_tiny_blocks():
    for blk in [b"", b"A", b"hello world!", b"aaaaaaaaaaaaa"]:
        [cb] = _encode([blk], 4096)
        assert golden.decompress(cb, 4096) == blk
        assert len(cb) <= F.compress_bound(len(blk))


def test_compressbound_holds_on_random():
    rng = np.random.default_rng(7)
    blocks = [rng.integers(0, 256, 4096, dtype=np.uint8).tobytes()
              for _ in range(8)]
    for blk, cb in zip(blocks, _encode(blocks, 4096)):
        assert len(cb) <= F.compress_bound(4096)
        assert golden.decompress(cb, 4096) == blk
