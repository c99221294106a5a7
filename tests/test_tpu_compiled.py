"""Opt-in on-device lane (VERDICT r1 item 8): parity + malformed-stream
suites against the *compiled* Pallas kernels.

Run during the bench session:
    LZ4J_TPU_TESTS=1 python -m pytest tests/test_tpu_compiled.py -m tpu -q

Interpret-mode tests (the default CPU lane) cannot observe compiled-only
failure modes: out-of-bounds SMEM indexing is masked by numpy clamping and
Mosaic's scalar-loop lowering differs from the interpreter. These tests
exercise the real compiled artifacts, including the decoder's err-flag
paths on corrupt streams.
"""

import numpy as np
import pytest

import jax

from lz4_sgori_tpu import format as F
from lz4_sgori_tpu import golden

pytestmark = pytest.mark.tpu


def _on_tpu() -> bool:
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False


@pytest.fixture(scope="module", autouse=True)
def require_tpu():
    if not _on_tpu():
        pytest.skip("no TPU backend attached")


BS = 4096


def _pack(blocks, width):
    arr = np.zeros((len(blocks), width), np.uint8)
    lens = np.zeros(len(blocks), np.int32)
    for j, b in enumerate(blocks):
        arr[j, :len(b)] = np.frombuffer(b, np.uint8)
        lens[j] = len(b)
    return arr, lens


def test_compiled_encode_parity(fixtures):
    from lz4_sgori_tpu.ops.pallas.encode_kernel import compress_blocks_pallas

    names = ["text_small", "zeros_4k", "rle_period3", "random_4k"]
    raws = [fixtures[n][:BS] for n in names]
    raw, rlen = _pack(raws, BS)
    comp, clen = compress_blocks_pallas(raw, rlen, BS)
    comp, clen = np.asarray(comp), np.asarray(clen)
    for j, data in enumerate(raws):
        want = bytes(golden.compress(data))
        got = comp[j, :clen[j]].tobytes()
        assert got == want, names[j]


def test_compiled_decode_parity(fixtures):
    from lz4_sgori_tpu.ops.pallas.decode_kernel import (
        PALLAS_MAX_BLOCK, decompress_blocks_pallas)

    del PALLAS_MAX_BLOCK
    names = ["text_small", "zeros_4k", "rle_short_period", "random_4k",
             "structured"]
    raws = [fixtures[n][:BS] for n in names]
    comps = [bytes(golden.compress(d)) for d in raws]
    slot = F.compress_bound(BS) + 8
    comp, clen = _pack(comps, slot)
    out, olen, err = decompress_blocks_pallas(comp, clen, BS)
    out, olen, err = np.asarray(out), np.asarray(olen), np.asarray(err)
    for j, data in enumerate(raws):
        assert not err[j], names[j]
        assert olen[j] == len(data), names[j]
        assert out[j, :olen[j]].tobytes() == data, names[j]


def _mutate(comp: bytes, rng) -> bytes:
    """Random single-point corruption strategies used by the fuzz test."""
    b = bytearray(comp)
    mode = rng.integers(0, 5)
    if mode == 0 and len(b) > 2:          # flip a random byte
        i = int(rng.integers(0, len(b)))
        b[i] ^= int(rng.integers(1, 256))
    elif mode == 1:                        # truncate
        b = b[:int(rng.integers(1, len(b)))]
    elif mode == 2:                        # huge literal length chain
        b = bytearray([0xF0]) + b"\xff" * int(rng.integers(4, 64)) + b
    elif mode == 3 and len(b) > 4:         # zero an offset
        b[3] = 0
        b[4] = 0
    else:                                  # garbage tail
        b = b + bytes(rng.integers(0, 256, size=16, dtype=np.uint8))
    return bytes(b)


def test_compiled_decode_malformed_fuzz(fixtures):
    """Compiled decoder on corrupt streams: must flag err or decode to
    exactly what the golden safe decoder produces — never crash the
    worker, never write out of bounds (the round-1 OOB fix is only
    observable here, not in interpret mode)."""
    from lz4_sgori_tpu.ops.pallas.decode_kernel import \
        decompress_blocks_pallas

    rng = np.random.default_rng(0xFADE)
    base = bytes(golden.compress(fixtures["text_small"][:BS]))
    muts = [_mutate(base, rng) for _ in range(24)]
    slot = F.compress_bound(BS) + 8
    muts = [m[:slot] for m in muts]
    comp, clen = _pack(muts, slot)
    out, olen, err = decompress_blocks_pallas(comp, clen, BS)
    out, olen, err = np.asarray(out), np.asarray(olen), np.asarray(err)
    agree = 0
    for j, m in enumerate(muts):
        try:
            want = golden.decompress(m, BS)
            ok_ref = True
        except ValueError:
            ok_ref = False
        if err[j]:
            # kernel flagged: the golden decoder must also reject, OR the
            # stream decodes but only with the relaxed terminal rule the
            # kernel enforces strictly — accept flagging either way
            continue
        assert ok_ref, f"mutant {j}: kernel accepted, golden rejected"
        assert olen[j] == len(want)
        assert out[j, :olen[j]].tobytes() == want
        agree += 1
    # sanity: the fuzz exercised both accept and reject paths
    assert err.any()


def test_compiled_roundtrip_64k(fixtures):
    from lz4_sgori_tpu.ops.pallas.decode_kernel import \
        decompress_blocks_pallas
    from lz4_sgori_tpu.ops.pallas.encode_kernel import compress_blocks_pallas

    data = fixtures["mixed"][:65536]
    raw, rlen = _pack([data], 65536)
    comp, clen = compress_blocks_pallas(raw, rlen, 65536)
    slot = F.compress_bound(65536) + 8
    padded = np.zeros((1, slot), np.uint8)
    padded[0, :comp.shape[1]] = np.asarray(comp)[0]
    out, olen, err = decompress_blocks_pallas(padded, np.asarray(clen),
                                              65536)
    assert not np.asarray(err)[0]
    assert np.asarray(out)[0, :len(data)].tobytes() == data
