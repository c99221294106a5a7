"""Ratio check for a window-limited nearest-match candidate pass.

The enc2 pass-1 hash table costs O(positions x table-bands) on the VPU;
a direct windowed candidate search costs O(positions x W/chunk-regs)
with exact 4-byte equality (no collisions, no val16 prefilter):

    cand[p] = p - min{ delta in [1, W] : v32[p-delta] == v32[p] }

This sim answers: at which W does the greedy parse (same semantics as
dense_ratio_sim / golden.compress_dense) stay <= LZ4_compress_default?
Candidates beyond W are lost (worse ratio); candidates within W can be
BETTER than the hash table's (which only keeps the last occurrence and
loses collisions).

Usage: python tools/window_ratio_sim.py [blocks] [block_kib]
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import numpy as np

from lz4_sgori_tpu import format as F
from dense_ratio_sim import seq_size


def window_cand(src: np.ndarray, W: int):
    """cand[p] = nearest q < p with v32(q)==v32(p) and p-q <= W; -1 if
    none."""
    n = len(src)
    cand = np.full(n, -1, np.int64)
    if n < 4:
        return cand
    s = src.astype(np.uint32)
    v = s[:-3] | (s[1:-2] << 8) | (s[2:-1] << 16) | (s[3:] << 24)
    m = len(v)
    best = np.full(m, np.iinfo(np.int64).max, np.int64)
    for d in range(1, min(W, m - 1) + 1):
        eq = v[d:] == v[:-d]
        upd = eq & (best[d:] == np.iinfo(np.int64).max)
        best[d:][upd] = d
    has = best != np.iinfo(np.int64).max
    cand[:m][has] = np.nonzero(has)[0] - best[has]
    return cand


def parse_size(b: np.ndarray, cand, accel: int = 1) -> int:
    n = len(b)
    if n < F.MIN_LENGTH:
        return seq_size(n, -1)
    v32 = (b[:n - 3].astype(np.uint32) | (b[1:n - 2].astype(np.uint32) << 8)
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
        found = False
        while True:
            if pos + step > mflimit + 1 and not rematch:
                break
            if pos > mflimit:
                break
            c = cand[pos]
            if rematch:
                rematch = False
            else:
                step = smn >> F.SKIPTRIGGER
                smn += 1
            if c >= 0 and pos - c <= F.DISTANCE_MAX and v32[c] == v32[pos]:
                found = True
                break
            pos = pos + (1 if rematch else step)
        if not found or pos > mflimit:
            size += seq_size(n - anchor, -1)
            return size
        m = int(cand[pos])
        while pos > anchor and m > 0 and b[pos - 1] == b[m - 1]:
            pos -= 1
            m -= 1
        ml = F.MINMATCH
        while pos + ml < matchlimit and b[m + ml] == b[pos + ml]:
            ml += 1
        size += seq_size(pos - anchor, ml)
        pos += ml
        anchor = pos
        if pos > mflimit:
            size += seq_size(n - anchor, -1)
            return size
        step = 1
        smn = accel << F.SKIPTRIGGER
        rematch = True


def main():
    from __graft_entry__ import _synth_corpus
    from lz4_sgori_tpu import native
    from lz4_sgori_tpu.blocks import split_blocks

    nblocks = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    bs = (int(sys.argv[2]) if len(sys.argv) > 2 else 64) * 1024
    Ws = [int(w) for w in sys.argv[3].split(",")] if len(sys.argv) > 3 \
        else [256, 1024, 4096, 16384]

    corpora = {"synth": _synth_corpus(nblocks * bs)}
    try:
        parts = []
        for pth in ("/root/repo/SURVEY.md", "/root/repo/VERDICT.md",
                    "/root/repo/docs/Performance.md"):
            parts.append(open(pth, "rb").read())
        corpora["text"] = (b"".join(parts) * 40)[:nblocks * bs]
    except OSError:
        pass

    for cname, data in corpora.items():
        raw, rlen = split_blocks(data, bs)
        ref_tot = 0
        tot = {w: 0 for w in Ws}
        worst = {w: 0.0 for w in Ws}
        for j in range(raw.shape[0]):
            blk = raw[j, :rlen[j]].tobytes()
            ref_tot += len(native.compress(blk))
            b = np.frombuffer(blk, np.uint8)
            for w in Ws:
                sz = parse_size(b, window_cand(b, w))
                tot[w] += sz
                worst[w] = max(worst[w], sz / len(native.compress(blk)))
        print(f"[{cname}] ref(LZ4_compress_default): {ref_tot}")
        for w in Ws:
            print(f"  window W={w}: {tot[w]} (agg {tot[w] / ref_tot:.4f}x,"
                  f" worst-block {worst[w]:.4f}x)", flush=True)


if __name__ == "__main__":
    main()
