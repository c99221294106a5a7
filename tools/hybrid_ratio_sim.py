"""Ratio check for the hybrid candidate rule (enc3 pass-1 design).

enc2's pass-1 walks the full 8192-row hash table once per 16 positions;
measured 117 ms per 8 MiB group (0.072 GB/s) — the per-query cost of a
per-lane table get scales with table rows, so hashLog 13 is
architecturally slow. The hybrid rule serves NEAR candidates with a
tape-level exact sliding-window pass (cost ~9 us per delta per group)
and keeps only a SMALL far table:

    cand[p] = p - min{ d in [1, W] : v32[p-d] == v32[p] }   (near, exact)
              else  tableL[h(p)]                            (far)

where tableL is the dense last-occurrence table at hashLog L, optionally
with strided inserts and with/without the val16 prefilter. The parse is
golden.compress_dense's (skip schedule, catch-up, extension, rematch).

This sim answers: which (W, L) keeps aggregate compressed size <=
LZ4_compress_default? Usage:
    python tools/hybrid_ratio_sim.py [blocks] [block_kib] [Wlist] [Llist]
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import numpy as np

from lz4_sgori_tpu import format as F
from dense_ratio_sim import seq_size


def v32_of(b: np.ndarray) -> np.ndarray:
    n = len(b)
    return (b[:n - 3].astype(np.uint32) | (b[1:n - 2].astype(np.uint32) << 8)
            | (b[2:n - 1].astype(np.uint32) << 16)
            | (b[3:n].astype(np.uint32) << 24))


def hybrid_cand(b: np.ndarray, W: int, hashlog: int, stride: int = 1,
                val16: bool = True):
    """d16 candidates: exact nearest within W, else far hash table."""
    n = len(b)
    d16 = np.zeros(n, np.int64)
    if n < 4:
        return d16
    v = v32_of(b)
    m = len(v)
    # near: nearest exact v32 match within W (first hit wins, d ascending)
    for d in range(1, min(W, m - 1) + 1):
        eq = v[d:] == v[:-d]
        upd = eq & (d16[d:m] == 0)
        d16[d:m][upd] = d
    # far: dense last-occurrence table at hashlog, strided inserts
    h = ((v * np.uint32(F.HASH4_PRIME)) >> np.uint32(32 - hashlog)).astype(
        np.int64)
    table = np.zeros(1 << hashlog, np.int64)  # packed (q+1)&0xFFFF | val<<16
    for p in range(m):
        if d16[p] == 0:
            s = table[h[p]]
            if s:
                d = (p + 1 - (s & 0xFFFF)) & 0xFFFF
                if d > W and (not val16 or (s >> 16) == int(v[p] & 0xFFFF)):
                    d16[p] = d
        if p % stride == 0:
            table[h[p]] = ((p + 1) & 0xFFFF) | (int(v[p]) & 0xFFFF) << 16
    return d16


def parse_size(b: np.ndarray, d16, accel: int = 1) -> int:
    """golden.compress_dense parse over a d16 candidate array."""
    n = len(b)
    if n < F.MIN_LENGTH:
        return seq_size(n, -1)
    v = v32_of(b)
    mflimit = n - F.MFLIMIT
    matchlimit = n - F.LASTLITERALS
    size = 0
    anchor = 0
    pos = 1
    while True:
        fpos = pos
        step = 1
        smn = accel << F.SKIPTRIGGER
        found = False
        while True:
            if fpos + step > mflimit + 1:
                break
            pos = fpos
            fpos += step
            step = smn >> F.SKIPTRIGGER
            smn += 1
            d = int(d16[pos])
            if d and v[pos - d] == v[pos]:
                mpos = pos - d
                found = True
                break
        if not found:
            break
        while pos > anchor and mpos > 0 and b[pos - 1] == b[mpos - 1]:
            pos -= 1
            mpos -= 1
        ml = F.MINMATCH
        while pos + ml < matchlimit and b[mpos + ml] == b[pos + ml]:
            ml += 1
        size += seq_size(pos - anchor, ml)
        pos += ml
        anchor = pos
        if pos > mflimit:
            break
    size += seq_size(n - anchor, -1)
    return size


def main():
    from __graft_entry__ import _synth_corpus
    from lz4_sgori_tpu import native
    from lz4_sgori_tpu.blocks import split_blocks

    nblocks = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    bs = (int(sys.argv[2]) if len(sys.argv) > 2 else 64) * 1024
    Ws = [int(w) for w in sys.argv[3].split(",")] if len(sys.argv) > 3 \
        else [128, 256]
    Ls = [int(x) for x in sys.argv[4].split(",")] if len(sys.argv) > 4 \
        else [8, 9, 10]

    corpora = {"synth": _synth_corpus(nblocks * bs)}
    try:
        parts = [open(p, "rb").read() for p in
                 ("/root/repo/SURVEY.md", "/root/repo/VERDICT.md",
                  "/root/repo/docs/Performance.md")]
        corpora["text"] = (b"".join(parts) * 40)[:nblocks * bs]
    except OSError:
        pass

    for cname, data in corpora.items():
        raw, rlen = split_blocks(data, bs)
        ref_tot = 0
        dense_tot = 0
        tot = {(w, L): 0 for w in Ws for L in Ls}
        for j in range(raw.shape[0]):
            blk = raw[j, :rlen[j]].tobytes()
            b = np.frombuffer(blk, np.uint8)
            ref_tot += len(native.compress(blk))
            from dense_ratio_sim import dense_cand
            c13 = dense_cand(b, 13)
            # convert to d16 with val16 (the shipped enc2 rule) for context
            v = v32_of(b)
            d16_13 = np.zeros(len(b), np.int64)
            m = len(v)
            ok = c13[:m] >= 0
            idx = np.nonzero(ok)[0]
            for p in idx:
                q = c13[p]
                d = (p - q) & 0xFFFF
                if d and (v[q] & 0xFFFF) == (v[p] & 0xFFFF):
                    d16_13[p] = d
            dense_tot += parse_size(b, d16_13)
            for w in Ws:
                for L in Ls:
                    d16 = hybrid_cand(b, w, L)
                    tot[(w, L)] += parse_size(b, d16)
        print(f"[{cname}] ref(LZ4_compress_default): {ref_tot}  "
              f"dense13: {dense_tot} ({dense_tot / ref_tot:.4f}x)",
              flush=True)
        for w in Ws:
            for L in Ls:
                print(f"  W={w:4d} L={L:2d}: {tot[(w, L)]} "
                      f"({tot[(w, L)] / ref_tot:.4f}x)", flush=True)


if __name__ == "__main__":
    main()
