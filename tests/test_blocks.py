"""Framing layer: split/join, container serialization, verified compress."""

import numpy as np
import pytest

from lz4_sgori_tpu import blocks, format as F
from lz4_sgori_tpu.utils.stats import Stats


def test_split_join_roundtrip():
    rng = np.random.default_rng(1)
    for n in [0, 1, 4095, 4096, 4097, 100_000]:
        data = rng.integers(0, 256, n, dtype=np.uint8).tobytes()
        raw, rlen = blocks.split_blocks(data, 4096)
        assert raw.shape[1] == 4096
        assert int(rlen.sum()) == n
        assert blocks.join_blocks(raw, rlen) == data


@pytest.mark.parametrize("name", ["text_large", "zeros_64k", "random_4k", "mixed"])
def test_container_roundtrip(fixtures, name):
    data = fixtures[name]
    stats = Stats()
    container = blocks.compress(data, 4096, stats=stats)
    out = blocks.decompress(container, stats=stats)
    assert out == data
    d = stats.as_dict()
    assert d["write"]["reqs_total"] == 1 and d["read"]["reqs_total"] == 1
    assert d["read"]["data_bytes"] == len(data)
    assert stats.encode_fallbacks == 0


def test_container_ratio_sane(fixtures):
    cb = blocks.compress_to_blocks(fixtures["zeros_64k"], 4096)
    assert cb.ratio > 50  # zeros compress massively
    cb = blocks.compress_to_blocks(fixtures["random_4k"], 4096)
    assert 0.9 < cb.ratio <= 1.01  # incompressible stays ~1:1 under bound


def test_container_header_validation(fixtures):
    container = blocks.compress(b"hello world, hello world, hello!", 4096)
    with pytest.raises(ValueError, match="magic"):
        blocks.CompressedBlocks.from_container(b"XXXX" + container[4:])
    with pytest.raises(ValueError, match="version"):
        blocks.CompressedBlocks.from_container(
            container[:4] + b"\xff" + container[5:])
    with pytest.raises(ValueError, match="too short"):
        blocks.CompressedBlocks.from_container(b"LZ4J")


def test_framing_size_dominates_lz4(fixtures):
    """The verified framing path guarantees every block's encoding is
    <= LZ4_compress_default's (the BASELINE ratio contract, enforced by the
    host-codec min in compress_to_blocks)."""
    from lz4_sgori_tpu import native
    from lz4_sgori_tpu.utils import oracle
    if not (native.available() and oracle.available()):
        pytest.skip("native/liblz4 unavailable")
    for name in ["mixed", "text_large", "structured", "random_4k"]:
        data = fixtures[name]
        for bs in (4096,):
            cb = blocks.compress_to_blocks(data, bs, verify=True)
            for j in range(cb.num_blocks):
                blk = data[j * bs:(j + 1) * bs]
                ref = len(oracle.compress(blk)) if blk else 1
                assert cb.comp_len[j] <= ref, (name, j)


def test_compressed_blocks_accessors(fixtures):
    data = fixtures["text_large"]
    cb = blocks.compress_to_blocks(data, 4096)
    assert cb.num_blocks == -(-len(data) // 4096)
    assert cb.raw_size == len(data)
    assert cb.compressed_size == int(cb.comp_len.sum())
    assert cb.ratio > 1.5


def test_size_dominance_warns_without_native_even_unverified(monkeypatch):
    """The size_dominance contract must never no-op silently — including
    with verify=False (round-4 advisor item 5: the warning used to hide
    inside the verify branch)."""
    import warnings

    import pytest

    from lz4_sgori_tpu import blocks, native

    monkeypatch.setattr(native, "available", lambda: False)
    with pytest.warns(UserWarning, match="size_dominance"):
        blocks.compress(b"hello world " * 100, block_size=4096,
                        verify=False, size_dominance=True)
    # and with native "available", no warning and the knob enforces
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        monkeypatch.undo()
        if native.available():
            out = blocks.compress(b"hello world " * 100, block_size=4096,
                                  verify=False, size_dominance=True)
            assert blocks.decompress(out) == b"hello world " * 100
