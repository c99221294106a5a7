"""Lane-lockstep decode engine: helper-network unit tests + golden parity.

The lockstep machine is pure jnp, so the whole engine runs under CPU jit
here; the Pallas wrapper reuses the identical round function on TPU.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lz4_sgori_tpu import format as F, golden
from lz4_sgori_tpu.ops.pallas import lockstep as LK

rng = np.random.default_rng(0x10C)


# ---------------------------------------------------------------------------
# helper networks vs numpy references
# ---------------------------------------------------------------------------


def test_extract_rows_matches_numpy():
    R = 200
    tape = rng.integers(-2**31, 2**31, (R, 128)).astype(np.int32)
    row0 = rng.integers(-70, R + 40, (1, 128)).astype(np.int32)
    w = 26
    got = np.asarray(LK.extract_rows(jnp.asarray(tape), jnp.asarray(row0), w))
    want = np.zeros((w, 128), np.int32)
    for L in range(128):
        for i in range(w):
            r = row0[0, L] + i
            if 0 <= r < R:
                want[i, L] = tape[r, L]
    np.testing.assert_array_equal(got, want)


def test_extract_bytes_matches_numpy():
    R = 64
    raw = rng.integers(0, 256, (R * 4, 128)).astype(np.uint8)
    tape = (raw[0::4].astype(np.int32) | (raw[1::4].astype(np.int32) << 8)
            | (raw[2::4].astype(np.int32) << 16)
            | (raw[3::4].astype(np.int32) << 24))
    pos = rng.integers(-9, R * 4 + 9, (1, 128)).astype(np.int32)
    w = 10
    got = np.asarray(LK.extract_bytes(jnp.asarray(tape), jnp.asarray(pos), w))
    for L in range(128):
        for i in range(w):
            word = 0
            for k in range(4):
                p = pos[0, L] + 4 * i + k
                v = int(raw[p, L]) if 0 <= p < R * 4 else 0
                word |= v << (8 * k)
            assert got[i, L] == np.int32(np.uint32(word)), (L, i)


def test_funnel_matches_numpy():
    W = 40
    raw = rng.integers(0, 256, (W * 4, 128)).astype(np.uint8)
    win = (raw[0::4].astype(np.int32) | (raw[1::4].astype(np.int32) << 8)
           | (raw[2::4].astype(np.int32) << 16)
           | (raw[3::4].astype(np.int32) << 24))
    t = rng.integers(0, 106, (1, 128)).astype(np.int32)
    w_out = 26
    got = np.asarray(LK.funnel(jnp.asarray(win), jnp.asarray(t), w_out))
    for L in range(128):
        valid = W * 4 - int(t[0, L]) - 3
        for j in range(min(w_out * 4, valid)):
            byte = (got[j // 4, L] >> (8 * (j % 4))) & 255
            assert byte == raw[t[0, L] + j, L], (L, j)


def test_place_matches_numpy():
    SR = 128
    stag = rng.integers(-2**31, 2**31, (SR, 128)).astype(np.int32)
    stream_raw = rng.integers(0, 256, (LK.CAPW * 4, 128)).astype(np.uint8)
    stream = (stream_raw[0::4].astype(np.int32)
              | (stream_raw[1::4].astype(np.int32) << 8)
              | (stream_raw[2::4].astype(np.int32) << 16)
              | (stream_raw[3::4].astype(np.int32) << 24))
    k = rng.integers(0, LK.CAP + 1, (1, 128)).astype(np.int32)
    dst = np.zeros((1, 128), np.int32)
    for L in range(128):
        dst[0, L] = rng.integers(0, SR * 4 - k[0, L] + 1)
    got = np.asarray(LK.place(jnp.asarray(stag), jnp.asarray(stream),
                              jnp.asarray(dst), jnp.asarray(k)))
    want_b = np.zeros((SR * 4, 128), np.uint8)
    for L in range(128):
        for r in range(SR):
            for b in range(4):
                want_b[4 * r + b, L] = (stag[r, L] >> (8 * b)) & 255
        for j in range(int(k[0, L])):
            want_b[dst[0, L] + j, L] = stream_raw[j, L]
    want = (want_b[0::4].astype(np.int32)
            | (want_b[1::4].astype(np.int32) << 8)
            | (want_b[2::4].astype(np.int32) << 16)
            | (want_b[3::4].astype(np.int32) << 24))
    np.testing.assert_array_equal(got, want)


# ---------------------------------------------------------------------------
# machine parity vs golden
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=8)
def _decoder(out_cap, sr):
    return jax.jit(functools.partial(LK.decode_tapes, out_cap=out_cap,
                                     sr=sr))


def _run_tapes(comps, out_cap, sr=256):
    """comps: list of <=128 byte strings -> per-lane (out, out_len, err)."""
    n = len(comps)
    assert n <= 128
    slot = max(max((len(c) for c in comps), default=1), 1)
    u8 = np.zeros((128, slot), np.uint8)
    clen = np.zeros(128, np.int32)
    for j, c in enumerate(comps):
        u8[j, :len(c)] = np.frombuffer(c, np.uint8)
        clen[j] = len(c)
    tape = LK.pack_tapes(jnp.asarray(u8), jnp.asarray(clen))
    olen = jnp.full((1, 128), out_cap, jnp.int32)
    out, out_len, err = _decoder(out_cap, sr)(
        tape, jnp.asarray(clen).reshape(1, 128), olen)
    data = np.asarray(LK.unpack_tapes(out)).reshape(128, -1)
    return data, np.asarray(out_len)[0], np.asarray(err)[0]


def _check_roundtrip(cases, out_cap, sr=256):
    comps = [golden.compress(d) for d in cases]
    data, out_len, err = _run_tapes(comps, out_cap, sr)
    for j, want in enumerate(cases):
        assert err[j] == 0, f"case {j}: unexpected err"
        assert out_len[j] == len(want), \
            f"case {j}: len {out_len[j]} != {len(want)}"
        assert data[j, :len(want)].tobytes() == want, f"case {j}: bytes"


def test_roundtrip_spectrum(fixtures):
    cases = [
        b"", b"A" * 1, b"hello world!", b"aaaaaaaaaaaaa",
        fixtures["zeros_4k"],
        fixtures["text_small"][:4096],
        fixtures["random_4k"],
        fixtures["rle_short_period"][:4096],
        fixtures["rle_period3"][:4096],
        fixtures["structured"][:4096],
        fixtures["mixed"][:4096],
    ]
    # fill all 128 lanes with rotated variants
    all_cases = (cases * 12)[:128]
    _check_roundtrip(all_cases, out_cap=4096)


def test_overlap_periods():
    cases = []
    for p in [1, 2, 3, 4, 5, 7, 8, 16, 17, 63, 64, 95, 96, 97, 127, 128,
              129, 255, 256]:
        pat = bytes((i % 255) + 1 for i in range(p))
        cases.append((pat * (2048 // p + 2))[:2048])
    _check_roundtrip((cases * 7)[:128], out_cap=2048, sr=128)


def test_window_crossing_small_sr():
    # sr=32 rows = 128 B windows: every copy crosses windows repeatedly
    rng2 = np.random.default_rng(7)
    cases = []
    for j in range(128):
        base = rng2.integers(0, 256, 97, dtype=np.uint8).tobytes()
        cases.append((base * 40)[:1024 + (j % 128)])
    _check_roundtrip(cases, out_cap=2048, sr=32)


def test_long_lsic_chains():
    rng2 = np.random.default_rng(9)
    big_lit = rng2.integers(0, 256, 3000, dtype=np.uint8).tobytes()
    cases = [
        big_lit + bytes(1000),          # long literal LSIC + long match
        bytes(4000),                    # max single match chain
        big_lit[:300] + b"x" * 3700,    # literal then RLE
    ]
    _check_roundtrip((cases * 43)[:128], out_cap=4096)


def test_varying_sizes_one_batch(fixtures):
    rng2 = np.random.default_rng(11)
    cases = []
    for j in range(128):
        n = int(rng2.integers(0, 4097))
        mode = j % 3
        if mode == 0:
            cases.append(fixtures["text_large"][:n])
        elif mode == 1:
            cases.append(bytes(n))
        else:
            cases.append(rng2.integers(0, 256, n, dtype=np.uint8).tobytes())
    _check_roundtrip(cases, out_cap=4096)


@pytest.mark.slow
def test_tpu_wrapper_interpret(fixtures):
    """The production (v6 ring) pallas_call wrapper in interpret mode
    matches golden end-to-end, including non-multiple-of-128 batches and
    the empty-pad path."""
    from lz4_sgori_tpu.ops.pallas.lockstep_v6 import (
        decompress_blocks_lockstep_v6)
    cases = [
        fixtures["text_small"][:4096], bytes(4096),
        fixtures["random_4k"], b"", fixtures["rle_period3"][:4096],
    ] * 5  # 25 blocks -> one padded group
    comps = [golden.compress(d) for d in cases]
    slot = max(len(c) for c in comps) + 1
    comp = np.zeros((len(comps), slot), np.uint8)
    clen = np.zeros(len(comps), np.int32)
    for j, c in enumerate(comps):
        comp[j, :len(c)] = np.frombuffer(c, np.uint8)
        clen[j] = len(c)
    out, out_len, err = decompress_blocks_lockstep_v6(
        comp, clen, 4096, interpret=True)
    out, out_len, err = np.asarray(out), np.asarray(out_len), np.asarray(err)
    for j, want in enumerate(cases):
        assert not err[j], f"case {j}"
        assert out_len[j] == len(want), f"case {j}"
        assert out[j, :len(want)].tobytes() == want, f"case {j}"


def test_malformed_streams_match_golden(fixtures):
    """For each mutated stream: err != 0 iff golden raises; on success the
    bytes agree. (The golden semantics are lz4e_decompress.c:62-460.)"""
    out_cap = 2048
    rng2 = np.random.default_rng(13)
    base = golden.compress(fixtures["text_small"][:1800])
    muts = []
    for _ in range(124):
        m = bytearray(base)
        op = rng2.integers(0, 4)
        if op == 0 and len(m) > 2:
            m = m[:rng2.integers(1, len(m))]          # truncate
        elif op == 1:
            m[rng2.integers(0, len(m))] = rng2.integers(0, 256)
        elif op == 2:
            m[rng2.integers(0, len(m))] = 255          # LSIC bombs
        else:
            i = rng2.integers(0, len(m) - 1)
            m[i:i + 2] = b"\xff\xff"                   # huge offset/LSIC
        muts.append(bytes(m))
    muts += [b"", b"\x10", b"\x00\x01", b"\xf0"]       # degenerate headers
    data, out_len, err = _run_tapes(muts, out_cap)
    for j, m in enumerate(muts):
        try:
            want = golden.decompress(m, out_cap)
            ok = True
        except golden.DecodeError:
            ok = False
        if ok:
            assert err[j] == 0, f"mut {j}: spurious err"
            assert out_len[j] == len(want), f"mut {j}: len"
            assert data[j, :len(want)].tobytes() == want, f"mut {j}: bytes"
        else:
            assert err[j] != 0, f"mut {j}: missed error"
