"""Ratio check for the dense-insertion greedy parse (encoder v2 design).

The v2 TPU encoder replaces the reference's parse-dependent hash table
(insert only at probed/fill positions, lz4e_compress.c:291-336,459-464)
with a parse-INDEPENDENT dense table: cand[p] = the latest q < p with
hash(q) == hash(p), over ALL positions. That makes pass 1 perfectly
batchable on the VPU. This sim answers the contract question: is the
resulting compressed size <= LZ4_compress_default (hashLog 13 sparse) at
a given dense hashLog? Parse semantics otherwise mirror golden.compress
exactly: skip acceleration, catch-up, REMATCH, mflimit/matchlimit.

Usage: python tools/dense_ratio_sim.py [blocks] [block_kib]
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import numpy as np

from lz4_sgori_tpu import format as F


def dense_cand(src: np.ndarray, hashlog: int):
    """cand[p] = latest q < p with hash4(q)==hash4(p); -1 if none."""
    n = len(src)
    if n < 4:
        return np.full(n, -1, np.int64)
    s = src.astype(np.uint32)
    v = s[:-3] | (s[1:-2] << 8) | (s[2:-1] << 16) | (s[3:] << 24)
    h = ((v * np.uint32(F.HASH4_PRIME)) >> np.uint32(32 - hashlog))
    h = h.astype(np.int64)
    cand = np.full(n, -1, np.int64)
    last = np.full(1 << hashlog, -1, np.int64)
    for p in range(n - 3):
        hp = h[p]
        cand[p] = last[hp]
        last[hp] = p
    return cand


def seq_size(lit: int, ml: int) -> int:
    """Emission bytes for one sequence: token + lit LSIC + lits + off +
    match LSIC (ml == -1: final literal-only sequence, no offset)."""
    sz = 1 + lit
    if lit >= F.RUN_MASK:
        sz += 1 + (lit - F.RUN_MASK) // 255
    if ml < 0:
        return sz
    sz += 2
    m = ml - F.MINMATCH
    if m >= F.ML_MASK:
        sz += 1 + (m - F.ML_MASK) // 255
    return sz


def dense_compress_size(src: bytes, hashlog: int, accel: int = 1) -> int:
    """Compressed size of the dense-candidate greedy parse."""
    b = np.frombuffer(src, np.uint8)
    n = len(b)
    if n < F.MIN_LENGTH:
        return seq_size(n, -1)
    cand = dense_cand(b, hashlog)
    rd32 = b[:max(n - 3, 0)].astype(np.uint32)
    v32 = (rd32 | (b[1:n - 2].astype(np.uint32) << 8)
           | (b[2:n - 1].astype(np.uint32) << 16)
           | (b[3:n].astype(np.uint32) << 24))
    mflimit = n - F.MFLIMIT
    matchlimit = n - F.LASTLITERALS
    size = 0
    anchor = 0
    pos = 1
    step = 1
    smn = accel << F.SKIPTRIGGER
    rematch = False
    while True:
        # ---- find a match at/after pos ----
        found = False
        while True:
            if pos + step > mflimit + 1 and not rematch:
                break
            if pos > mflimit:
                break
            c = cand[pos]
            if rematch:
                rematch = False
                nxt = pos + 1
            else:
                nxt = pos + step
                step = smn >> F.SKIPTRIGGER
                smn += 1
            if c >= 0 and pos - c <= F.DISTANCE_MAX and v32[c] == v32[pos]:
                found = True
                break
            pos = nxt
        if not found or pos > mflimit:
            size += seq_size(n - anchor, -1)
            return size
        m = int(cand[pos])
        # catch-up
        while pos > anchor and m > 0 and b[pos - 1] == b[m - 1]:
            pos -= 1
            m -= 1
        # forward extension
        ml = F.MINMATCH
        while pos + ml < matchlimit and b[m + ml] == b[pos + ml]:
            ml += 1
        size += seq_size(pos - anchor, ml)
        pos += ml
        anchor = pos
        if pos > mflimit:
            size += seq_size(n - anchor, -1)
            return size
        # immediate rematch at the new position (zero-literal token)
        step = 1
        smn = accel << F.SKIPTRIGGER
        rematch = True


def main():
    from __graft_entry__ import _synth_corpus
    from lz4_sgori_tpu import native
    from lz4_sgori_tpu.blocks import split_blocks

    nblocks = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    bs = (int(sys.argv[2]) if len(sys.argv) > 2 else 64) * 1024

    corpora = {"synth": _synth_corpus(nblocks * bs)}
    try:
        parts = []
        for pth in ("/root/repo/SURVEY.md", "/root/repo/VERDICT.md",
                    "/root/repo/docs/Performance.md"):
            parts.append(open(pth, "rb").read())
        text = (b"".join(parts) * 40)[:nblocks * bs]
        corpora["text"] = text
    except OSError:
        pass

    for cname, data in corpora.items():
        raw, rlen = split_blocks(data, bs)
        ref_tot = 0
        dense_tot = {11: 0, 12: 0, 13: 0}
        worst = {11: 0.0, 12: 0.0, 13: 0.0}
        for j in range(raw.shape[0]):
            blk = raw[j, :rlen[j]].tobytes()
            ref = len(native.compress(blk))
            ref_tot += ref
            for hl in dense_tot:
                dz = dense_compress_size(blk, hl)
                dense_tot[hl] += dz
                worst[hl] = max(worst[hl], dz / ref)
        print(f"[{cname}] ref(LZ4_compress_default): {ref_tot}")
        for hl in sorted(dense_tot):
            r = dense_tot[hl] / ref_tot
            print(f"  dense hashLog={hl}: {dense_tot[hl]} "
                  f"(agg {r:.4f}x, worst-block {worst[hl]:.4f}x)",
                  flush=True)


if __name__ == "__main__":
    main()
