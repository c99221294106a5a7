"""Payload-carrying pass-1 (mlen precompute) parity vs golden.dense_mcode.

Round-5 groundwork for the wb-walk elimination (docs/Performance.md
round-5 encode section): the bucket sort carries the raw words
(v32, w+4, w+8, w-4) alongside the keys, and the d16 pass emits exact
verified candidates + capped match-length/catch-up codes. VMEM payload
tapes bound the probe to <= 16 KiB blocks; parity here is the
correctness gate for the HBM-chunked production variant.
"""

import numpy as np
import pytest

from lz4_sgori_tpu import golden

BS = 8192


@pytest.mark.parametrize("case", [
    "text",
    pytest.param("mixed", marks=pytest.mark.slow),
    pytest.param("rle", marks=pytest.mark.slow),
    pytest.param("random", marks=pytest.mark.slow),
])
def test_mlen_cand_parity(case):
    from lz4_sgori_tpu.ops.pallas.lockstep_enc3 import (
        compress_blocks_lockstep_enc3)

    rng = np.random.RandomState(41)
    lorem = (b"Lorem ipsum dolor sit amet, consectetur adipiscing "
             b"elit, sed do eiusmod tempor incididunt ut labore. ")
    data = {
        "text": (lorem * 100)[:BS],
        "mixed": (lorem * 30)[:2048] + bytes(2048)
        + rng.randint(0, 256, 2048).astype(np.uint8).tobytes()
        + (b"ab" * 1024),
        "rle": b"x" * 4000 + b"yz" * 2000 + b"Q" * 96,
        "random": rng.randint(0, 256, BS).astype(np.uint8).tobytes(),
    }[case][:BS]

    raw = np.zeros((1, BS), np.uint8)
    raw[0, :len(data)] = np.frombuffer(data, np.uint8)
    rlen = np.array([len(data)], np.int32)
    cand, mcode, dens = compress_blocks_lockstep_enc3(
        raw, rlen, BS, interpret=True, cand_only=True, mlen_cand=True)
    cand = np.asarray(cand)[0, :, 0]
    mcode = np.asarray(mcode)[0, :, 0]
    want_d, want_m = golden.dense_mcode(data)
    got_d = cand & 0xFFFF
    got_m = mcode & 0xFFFF
    n = len(data)
    for p in range(n):
        assert got_d[p] == want_d[p], (case, p, got_d[p], want_d[p])
        assert got_m[p] == want_m[p], (case, p, got_m[p], want_m[p])


@pytest.mark.slow
def test_mlen_cand_hbm_parity():
    """The HBM-chunked payload sort (the production 64 KiB shape's
    variant) against the same oracle — exercised at 32 KiB to keep the
    interpret run tractable while still taking the NP > 16384 path."""
    from lz4_sgori_tpu.ops.pallas.lockstep_enc3 import (
        compress_blocks_lockstep_enc3)

    bs = 32768
    rng = np.random.RandomState(5)
    lorem = (b"Lorem ipsum dolor sit amet, consectetur adipiscing "
             b"elit, sed do eiusmod tempor incididunt ut labore. ")
    data = ((lorem * 120)[:16000] + bytes(4096)
            + rng.randint(0, 256, 4096).astype(np.uint8).tobytes()
            + (b"seg" * 3000))[:bs]
    raw = np.zeros((1, bs), np.uint8)
    raw[0, :len(data)] = np.frombuffer(data, np.uint8)
    rlen = np.array([len(data)], np.int32)
    cand, mcode, dens = compress_blocks_lockstep_enc3(
        raw, rlen, bs, interpret=True, cand_only=True, mlen_cand=True)
    cand = np.asarray(cand)[0, :, 0]
    mcode = np.asarray(mcode)[0, :, 0]
    want_d, want_m = golden.dense_mcode(data)
    bad = [(p, cand[p] & 0xFFFF, want_d[p], mcode[p] & 0xFFFF, want_m[p])
           for p in range(len(data))
           if (cand[p] & 0xFFFF) != want_d[p]
           or (mcode[p] & 0xFFFF) != want_m[p]]
    assert not bad, bad[:5]


@pytest.mark.slow
def test_mlen_parse_byte_parity_seg():
    """The wb-free parse (mlen=True) must produce byte-identical output
    to the window-verify parse and the golden oracle — catch-up re-cap
    at 4 with PREP continuation, lcp cap at 12 with EXT continuation,
    and vr-zeroed candidates are all parse-neutral by construction."""
    from lz4_sgori_tpu.ops.pallas.lockstep_enc3 import (
        compress_blocks_lockstep_seg)

    bs, sg, w = 4096, 512, 4096
    rng = np.random.RandomState(77)
    lorem = (b"Lorem ipsum dolor sit amet, consectetur adipiscing "
             b"elit, sed do eiusmod tempor incididunt ut labore. ")
    blocks = [
        (lorem * 40)[:bs],
        bytes(1000) + rng.randint(0, 256, 2000).astype(
            np.uint8).tobytes() + (b"ab" * 600)[:1096],
        b"abcabcabcabcabcabc",
        bytes(bs),
        (b"x" * 511 + b"Q") * 8,          # matches crossing seg starts
        (b"Q" * 37 + b"R" * 3) * 100,     # catch-up exercise
        b"",                              # empty block
        b"tiny",                          # < MIN_LENGTH
    ]
    raw = np.zeros((len(blocks), bs), np.uint8)
    rlen = np.zeros(len(blocks), np.int32)
    for i, b in enumerate(blocks):
        raw[i, :len(b)] = np.frombuffer(b, np.uint8)
        rlen[i] = len(b)
    base = compress_blocks_lockstep_seg(
        raw, rlen, bs, seg=sg, window=w, interpret=True)
    fast = compress_blocks_lockstep_seg(
        raw, rlen, bs, seg=sg, window=w, interpret=True, mlen=True)
    cb, lb, eb = map(np.asarray, base)
    cf, lf, ef = map(np.asarray, fast)
    assert not eb.any() and not ef.any()
    for i, b in enumerate(blocks):
        got_b = cb[i, :lb[i]].tobytes()
        got_f = cf[i, :lf[i]].tobytes()
        assert got_f == got_b, (i, len(got_f), len(got_b))
        want = golden.compress_dense_seg(b, seg=sg, window=w)
        assert got_f == want, i


def test_env_hook_routes_mlen(monkeypatch):
    """LZ4J_ENC_MLEN=1 flips the seg dispatch into the wb-free parse
    (greedy <= 64 KiB only)."""
    from lz4_sgori_tpu.ops import encode as enc
    from lz4_sgori_tpu.ops.pallas import lockstep_enc3 as E

    seen = {}

    def spy(raw, raw_len, block_size, **kw):
        seen["mlen"] = kw.get("mlen", False)
        seen["depth"] = kw.get("depth")
        nb = raw.shape[0]
        comp = np.zeros((nb, 64), np.uint8)
        cl = np.zeros(nb, np.int32)
        if kw.get("return_nseq"):
            return comp, cl, np.zeros(nb, bool), cl
        return comp, cl, np.zeros(nb, bool)

    monkeypatch.setattr(E, "compress_blocks_lockstep_seg", spy)
    monkeypatch.setenv("LZ4J_ENC_MLEN", "1")
    raw = np.zeros((1, 8192), np.uint8)
    raw[0, :40] = np.frombuffer(b"hello world hello world hello vorld hell",
                                np.uint8)
    rlen = np.array([8192], np.int32)
    enc.compress_blocks_seg_dispatch(raw, rlen, 8192)
    assert seen["mlen"] is True
    monkeypatch.setenv("LZ4J_ENC_MLEN", "0")
    enc.compress_blocks_seg_dispatch(raw, rlen, 8192, depth=3)
    assert seen["mlen"] is False


@pytest.mark.slow
def test_mlen_parse_byte_parity_enc3():
    """The wb-free parse on the block-per-lane engine (the < 8 KiB
    band): mlen on == off == golden.compress_dense."""
    from lz4_sgori_tpu.ops.pallas.lockstep_enc3 import (
        compress_blocks_lockstep_enc3)

    bs = 4096
    rng = np.random.RandomState(9)
    lorem = (b"Lorem ipsum dolor sit amet, consectetur adipiscing "
             b"elit, sed do eiusmod tempor incididunt ut labore. ")
    blocks = [
        (lorem * 40)[:bs],
        bytes(bs),
        rng.randint(0, 256, bs).astype(np.uint8).tobytes(),
        (b"Q" * 37 + b"R" * 3) * 50,
        b"",
    ]
    raw = np.zeros((len(blocks), bs), np.uint8)
    rlen = np.zeros(len(blocks), np.int32)
    for i, b in enumerate(blocks):
        raw[i, :len(b)] = np.frombuffer(b, np.uint8)
        rlen[i] = len(b)
    base = compress_blocks_lockstep_enc3(raw, rlen, bs, interpret=True)
    fast = compress_blocks_lockstep_enc3(raw, rlen, bs, interpret=True,
                                         mlen=True)
    cb, lb, eb = map(np.asarray, base[:3])
    cf, lf, ef = map(np.asarray, fast[:3])
    assert not eb.any() and not ef.any()
    for i, b in enumerate(blocks):
        assert cf[i, :lf[i]].tobytes() == cb[i, :lb[i]].tobytes(), i
        assert cf[i, :lf[i]].tobytes() == golden.compress_dense(b), i
