"""Encoder-side adversarial-input fuzz (round-4 verdict item 9).

Decode fuzz runs at scale (2048+512 compiled mutants); this is the
encoder's counterpart: structured adversarial *inputs* — RLE edges,
short periods, matches at the MFLIMIT boundary, 0xFF LSIC length
boundaries, 64 KiB-window-straddling repeats, incompressible tails —
through BOTH production encode engines, asserting the reference
cross-decoder contract (lz4e_bdev/lz4e_chunk.c:119-137): liblz4 must
decode every produced block back to the original bytes, and the
aggregate size must not exceed LZ4_compress_default's.

The compiled TPU lane runs ~1k blocks through the seg and enc3
engines; the default CPU lane runs a representative interpret-mode
subset through the seg engine.
"""

import numpy as np
import pytest

from lz4_sgori_tpu import golden
from lz4_sgori_tpu.utils import oracle

BS = 65536


def adversarial_blocks(n: int, block_size: int = BS, seed: int = 0):
    """Deterministic structured adversarial inputs, cycling families."""
    rng = np.random.RandomState(seed)
    out = []
    lorem = (b"Lorem ipsum dolor sit amet, consectetur adipiscing elit, "
             b"sed do eiusmod tempor incididunt ut labore. ")

    def rnd(k):
        return rng.randint(0, 256, k).astype(np.uint8).tobytes()

    fam = 0
    while len(out) < n:
        f = fam % 16
        fam += 1
        if f == 0:                       # all zeros (RLE offset-1)
            b = bytes(block_size)
        elif f == 1:                     # short periods 1..8
            p = (fam % 8) + 1
            b = (rnd(p) * (block_size // p + 1))[:block_size]
        elif f == 2:                     # literal run hitting RUN_MASK
            # lengths around 15, 270, 270+255 ... LSIC 0xFF boundaries
            k = [14, 15, 16, 269, 270, 271, 524, 525][fam % 8]
            b = (rnd(k) + bytes(8) + rnd(k) + bytes(8))
            b = (b * (block_size // len(b) + 1))[:block_size]
        elif f == 3:                     # match ending exactly at MFLIMIT
            tail = 12 + (fam % 4)
            b = rnd(block_size - 64 - tail) + bytes(64 + tail)
        elif f == 4:                     # window-straddling repeats
            unit = rnd(1024)
            gap = bytes(65535 - 1024 + (fam % 3) - 1)
            b = (unit + gap + unit + rnd(block_size))[:block_size]
        elif f == 5:                     # incompressible
            b = rnd(block_size)
        elif f == 6:                     # compressible head, random tail
            b = (lorem * 200)[:block_size // 2] + rnd(block_size // 2)
        elif f == 7:                     # match lengths at ML_MASK edges
            k = [18, 19, 20, 274, 275, 276][fam % 6]
            unit = rnd(8) + rnd(4) * (k // 4)
            b = (unit * (block_size // len(unit) + 1))[:block_size]
        elif f == 8:                     # alternating zero/random pages
            parts = []
            for i in range(block_size // 256):
                parts.append(bytes(256) if i % 2 else rnd(256))
            b = b"".join(parts)
        elif f == 9:                     # text
            b = (lorem * (block_size // len(lorem) + 1))[:block_size]
        elif f == 10:                    # 0xFF fill (LSIC byte value)
            b = b"\xff" * block_size
        elif f == 11:                    # short block (partial tail)
            b = rnd(13 + (fam % 77))
        elif f == 12:                    # barely-compressible
            b = b"".join(rnd(255) + rnd(1) for _ in range(
                block_size // 256))[:block_size]
        elif f == 13:                    # long match after long literal
            b = (rnd(4096) + (b"Q" * 4096)) * (block_size // 8192)
        elif f == 14:                    # period straddling seg starts
            b = ((b"x" * 4095) + b"Z") * (block_size // 4096)
        else:                            # mixed structured
            t = np.arange(block_size // 2, dtype=np.float32)
            b = (np.sin(t / 50).astype(np.float16).tobytes()
                 + rnd(block_size - 2 * (block_size // 2)))
            b = b[:block_size]
        out.append(b[:block_size])
    return out[:n]


def _pack(blocks, block_size):
    raw = np.zeros((len(blocks), block_size), np.uint8)
    rlen = np.zeros(len(blocks), np.int32)
    for j, b in enumerate(blocks):
        raw[j, :len(b)] = np.frombuffer(b, np.uint8)
        rlen[j] = len(b)
    return raw, rlen


def _check_contract(blocks, comp, clen, label):
    """liblz4 round-trip + per-batch size dominance."""
    comp = np.asarray(comp)
    clen = np.asarray(clen)
    total = 0
    lz4_total = 0
    for j, b in enumerate(blocks):
        assert clen[j] > 0 or len(b) == 0, f"{label}: block {j} failed"
        stream = comp[j, :clen[j]].tobytes()
        if oracle.available():
            got = oracle.decompress(stream, len(b))
            lz4_total += len(oracle.compress(b))
        else:
            got = golden.decompress(stream, len(b))
            lz4_total += len(golden.compress(b))
        assert got == b, f"{label}: round-trip mismatch at block {j}"
        total += clen[j]
    assert total <= lz4_total, \
        f"{label}: aggregate size {total} > lz4 {lz4_total}"


def test_encode_fuzz_cpu_seg_subset():
    """Default lane: 12 adversarial 8 KiB blocks through the seg engine
    (interpret mode)."""
    from lz4_sgori_tpu.ops.pallas.lockstep_enc3 import (
        compress_blocks_lockstep_seg)
    bs = 8192
    blocks = adversarial_blocks(12, bs, seed=3)
    raw, rlen = _pack(blocks, bs)
    comp, clen, err = compress_blocks_lockstep_seg(
        raw, rlen, bs, seg=4096, interpret=True)
    assert not np.asarray(err).any()
    _check_contract(blocks, comp, clen, "seg-interpret")


@pytest.mark.tpu
def test_encode_fuzz_tpu_scale():
    """~1k adversarial 64 KiB blocks through BOTH production engines on
    hardware; liblz4 round-trip + size contract per engine."""
    from lz4_sgori_tpu.ops.pallas.lockstep_enc3 import (
        compress_blocks_lockstep_enc3, compress_blocks_lockstep_seg)

    n = 1024
    blocks = adversarial_blocks(n, BS, seed=17)
    raw, rlen = _pack(blocks, BS)
    for label, fn in (
            ("seg", lambda r, ln: compress_blocks_lockstep_seg(
                r, ln, BS, seg=4096)),
            ("enc3", lambda r, ln: compress_blocks_lockstep_enc3(
                r, ln, BS)[:3])):
        comps, clens = [], []
        for s in range(0, n, 512):
            comp, clen, err = fn(raw[s:s + 512], rlen[s:s + 512])
            err = np.asarray(err)
            # err folds to comp_len 0 upstream; here require clean runs
            assert not err.any(), f"{label}: kernel err at slice {s}"
            comps.append(np.asarray(comp))
            clens.append(np.asarray(clen))
        comp = np.concatenate(comps)
        clen = np.concatenate(clens)
        _check_contract(blocks, comp, clen, label)
