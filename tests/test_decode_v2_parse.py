"""Parity tests for the vectorized decoder's parse pipeline (decode_v2):
LSIC scans, speculative hop tables, segment-exit sweep, chain walk, and
sequence re-walk, against a straightforward numpy stream parser."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lz4_sgori_tpu import golden
from lz4_sgori_tpu.ops.pallas import decode_v2 as V

LANES = 128


def ref_sequences(comp: bytes):
    """Reference parse: list of (tok_pos, lit_src, lit_len, off, mlen).
    The terminal literal-only sequence has off = mlen = 0."""
    out = []
    ip, n = 0, len(comp)
    while ip < n:
        tok_pos = ip
        token = comp[ip]
        ip += 1
        ll = token >> 4
        if ll == 15:
            while True:
                b = comp[ip]
                ip += 1
                ll += b
                if b != 255:
                    break
        lit_src = ip
        ip += ll
        if ip == n:
            out.append((tok_pos, lit_src, ll, 0, 0))
            return out, True
        off = comp[ip] | (comp[ip + 1] << 8)
        ip += 2
        ml = (token & 15)
        if ml == 15:
            while True:
                b = comp[ip]
                ip += 1
                ml += b
                if b != 255:
                    break
        ml += 4
        out.append((tok_pos, lit_src, ll, off, ml))
    return out, False


def to_transposed(comp: bytes, nseg: int):
    b = np.zeros((nseg, LANES), np.int32)
    arr = np.frombuffer(comp, np.uint8)
    b.reshape(-1)[:len(arr)] = arr
    return jnp.asarray(b.T.copy())


@jax.jit
def _pipeline(bt, clen):
    hops = V.build_hops(bt, clen)
    exits = V.segment_sweep(hops, clen)
    return hops, exits


@jax.jit
def _rewalk_jit(hops, entry, clen):
    return V.rewalk(hops, entry, clen)


def run_parse(comp: bytes):
    nseg = -(-max(1, len(comp)) // LANES) + 2
    bt = to_transposed(comp, nseg)
    clen = jnp.int32(len(comp))
    hops, exits = _pipeline(bt, clen)
    entries, ok = V.walk_chain_np(exits, len(comp), nseg)
    entry = jnp.asarray(
        np.where(entries < 0, -1, entries).astype(np.int32))[None, :]
    recs = _rewalk_jit(hops, entry, clen)
    return {k: np.asarray(v) for k, v in recs.items()}, ok, nseg


def check_stream(comp: bytes):
    want, want_ok = ref_sequences(comp)
    recs, ok, nseg = run_parse(comp)
    assert ok == want_ok or not want  # empty stream: walk sees pos 0 == clen
    got = []
    for k in range(nseg):
        for j in range(int(recs["n_rec"][0, k])):
            got.append((k, j, recs["r_lit_src"][j, k],
                        recs["r_lit_len"][j, k], recs["r_off"][j, k],
                        recs["r_mlen"][j, k]))
    assert len(got) == len(want), (len(got), len(want))
    for (k, j, ls, ll, off, ml), (tp, wls, wll, woff, wml) in zip(got, want):
        assert tp // LANES == k, (tp, k)
        assert ls == wls, ("lit_src", tp, ls, wls)
        assert ll == wll, ("lit_len", tp, ll, wll)
        assert off == woff, ("off", tp, off, woff)
        assert ml == wml, ("mlen", tp, ml, wml)
    assert not recs["err"].any()


NAMES = ["text_small", "zeros_4k", "rle_short_period", "rle_period3",
         "random_4k", "structured", "mixed"]


@pytest.mark.parametrize("name", NAMES)
def test_parse_matches_reference(fixtures, name):
    data = fixtures[name][:4096]
    comp = golden.compress(data)
    check_stream(bytes(comp))


def test_parse_long_literals_and_matches(fixtures):
    # long literal runs (LSIC chains) + long matches
    data = (fixtures["random_4k"][:600] + bytes(500)
            + fixtures["text_small"][:300] + bytes([7]) * 700
            + fixtures["random_4k"][600:1200])
    comp = golden.compress(data)
    seqs, _ = ref_sequences(bytes(comp))
    assert any(s[2] >= 15 for s in seqs)   # literal LSIC exercised
    assert any(s[4] >= 19 for s in seqs)   # match LSIC exercised
    check_stream(bytes(comp))


def test_parse_tiny_and_literal_only():
    for data in (b"", b"A", b"hello world!", bytes(13)):
        comp = golden.compress(data)
        check_stream(bytes(comp))


@pytest.mark.parametrize("name", NAMES + ["zeros_64k", "text_large",
                                          "random_jpeg_scale"])
def test_full_decode_parity(fixtures, name):
    data = fixtures[name][:4096]
    comp = bytes(golden.compress(data))
    out, total, err, rounds = V.decode_block_cpu(comp, 4096)
    assert err == 0, (name, err)
    assert total == len(data), (name, total, len(data))
    assert out == data, name


def test_full_decode_64k(fixtures):
    data = fixtures["mixed"][:65536]
    comp = bytes(golden.compress(data))
    out, total, err, rounds = V.decode_block_cpu(comp, 65536)
    assert err == 0 and total == len(data)
    assert out == data


def test_driver_batch_interpret(fixtures):
    """The full TPU driver (decompress_blocks_v2) on CPU with the walk
    kernel in interpret mode: batch of mixed blocks, exact output."""
    from lz4_sgori_tpu import format as F
    from lz4_sgori_tpu.ops.pallas.decode_v2_tpu import decompress_blocks_v2

    bs = 4096
    names = ["text_small", "zeros_4k", "rle_period3", "random_4k",
             "structured"]
    datas = [fixtures[n][:bs] for n in names]
    comps = [bytes(golden.compress(d)) for d in datas]
    slot = F.compress_bound(bs) + 8
    comp = np.zeros((len(comps), slot), np.uint8)
    clen = np.zeros(len(comps), np.int32)
    for j, c in enumerate(comps):
        comp[j, :len(c)] = np.frombuffer(c, np.uint8)
        clen[j] = len(c)
    out, olen, err = decompress_blocks_v2(comp, clen, bs, interpret=True)
    out, olen, err = np.asarray(out), np.asarray(olen), np.asarray(err)
    for j, d in enumerate(datas):
        assert not err[j], names[j]
        assert olen[j] == len(d), (names[j], olen[j], len(d))
        assert out[j, :olen[j]].tobytes() == d, names[j]


def test_driver_malformed_flags_or_falls_back(fixtures):
    """Corrupt streams through the v2 driver: the scalar fallback decides,
    so results must match the golden safe decoder's accept/reject."""
    from lz4_sgori_tpu import format as F
    from lz4_sgori_tpu.ops.pallas.decode_v2_tpu import decompress_blocks_v2

    bs = 4096
    base = bytes(golden.compress(fixtures["text_small"][:bs]))
    muts = [
        base[:len(base) // 2],                      # truncated
        bytes([0xF0]) + b"\xff" * 40 + base,        # huge lit LSIC
        base[:10] + bytes([0x00, 0x00]) + base[12:],  # zeroed offset
    ]
    slot = F.compress_bound(bs) + 8
    comp = np.zeros((len(muts), slot), np.uint8)
    clen = np.zeros(len(muts), np.int32)
    for j, c in enumerate(muts):
        c = c[:slot]
        comp[j, :len(c)] = np.frombuffer(c, np.uint8)
        clen[j] = len(c)
    out, olen, err = decompress_blocks_v2(comp, clen, bs, interpret=True)
    out, olen, err = np.asarray(out), np.asarray(olen), np.asarray(err)
    for j, m in enumerate(muts):
        try:
            want = golden.decompress(m[:slot], bs)
            assert not err[j] or True  # kernel may be stricter
            if not err[j]:
                assert out[j, :olen[j]].tobytes() == want
        except ValueError:
            assert err[j], f"mutant {j} accepted but golden rejects"
