"""Ring-staging round simulator for the lockstep decode engine (v6 design).

v4 policy (shipped): all lanes synchronize at every sr-word window
boundary, and a match goes "far" (committed-history banded scan) whenever
src < win_base — even offset-8 matches right after a boundary.

Ring policy (v6): the staging buffer is a per-lane ring holding the LAST
sr*4 output bytes of that lane. No window sync exists (each lane flushes
its own completed rows); a match is far only when its offset exceeds the
ring span (d > sr*4), which in LZ4 data is rare for spans >= 2 KiB.

Prices: T = rounds*c_base + far_rounds*c_far + flushes*c_flush, with the
v5e-measured constants from round_sim2/docs/Performance.md.

Usage: python tools/round_sim4.py [block_kib] [sr] [unroll]
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

from round_sim import parse_sequences  # noqa: E402

CAP = 96
LSIC_P = 8
EW_B = 160
TOK, LLSIC, LIT, OFF, MLSIC, MATCH, DONE = range(7)


class RingLane:
    """round_sim2.Lane with ring semantics: no window end; far iff the
    match offset exceeds the ring span; writes clamp to the unflushed
    ring headroom."""

    def __init__(self, seqs, out_size):
        self.seqs = seqs
        self.out = out_size
        self.si = 0
        self.mode = TOK
        self.op = 0
        self.fl = 0                       # flushed frontier (bytes)
        self.lit = self.ml = self.d = self.dd = 0
        self.hdr_left = self.mh_left = 0

    def step(self, ring_b, allow_far=True):
        if self.mode == DONE:
            return None
        w_end = self.fl + ring_b          # ring write headroom
        cons = 0
        if self.mode == TOK:
            if self.si >= len(self.seqs):
                self.mode = DONE
                return None
            ll, hdr, ml_s, d_s, mh_s = self.seqs[self.si]
            self.lit = ll
            self.ml, self.d = ml_s, d_s
            self.dd = d_s
            take = min(hdr, 1 + LSIC_P)
            self.hdr_left = hdr - take
            cons = take
            self.mode = LLSIC if self.hdr_left > 0 else LIT
            self.mh_left = max(0, mh_s - 2 - LSIC_P)
        elif self.mode == LLSIC:
            take = min(self.hdr_left, LSIC_P)
            self.hdr_left -= take
            cons = take
            if self.hdr_left == 0:
                self.mode = LIT

        if self.mode == LIT:
            avail = EW_B - cons - 3
            k = max(0, min(self.lit, CAP, w_end - self.op, avail))
            self.op += k
            self.lit -= k
            cons += k
            if self.lit == 0:
                if self.ml == 0:
                    self.si += 1
                    self.mode = DONE if self.si >= len(self.seqs) else TOK
                    return None
                self.mode = OFF
            elif self.op >= w_end:
                return 'ringfull'

        if self.mode == OFF:
            if self.mh_left > 0:
                self.mode = MLSIC
                return None
            self.mode = MATCH
        elif self.mode == MLSIC:
            self.mh_left -= min(self.mh_left, LSIC_P)
            if self.mh_left == 0:
                self.mode = MATCH
            return None

        if self.mode == MATCH:
            far = self.d > ring_b         # src below the ring span
            if far and not allow_far:
                return 'parked'
            k = max(0, min(self.ml, CAP, self.dd, w_end - self.op))
            if k == 0:
                return 'ringfull'
            self.op += k
            self.ml -= k
            if k == self.dd and self.dd < CAP:
                self.dd *= 2
            if self.ml == 0:
                self.si += 1
                self.mode = TOK
            return ('copy', far)
        return None


def simulate_ring(all_seqs, out_size, sr, unroll=1, fh_bytes=None):
    ring_b = sr * 4
    if fh_bytes is None:
        fh_bytes = ring_b // 2
    lanes = [RingLane(s, out_size) for s in all_seqs]
    rounds = far_rounds = flushes = 0
    while any(ln.mode != DONE for ln in lanes):
        rounds += 1
        far = False
        parked = set()
        need_flush = False
        for u in range(unroll):
            for li, ln in enumerate(lanes):
                if li in parked or ln.mode == DONE:
                    continue
                r = ln.step(ring_b, allow_far=(u == 0))
                if r == 'parked':
                    parked.add(li)
                elif r == 'ringfull':
                    need_flush = True
                elif isinstance(r, tuple) and r[1]:
                    far = True
            # headroom check between sub-steps mirrors the kernel's
            # once-per-round flush: flush only between rounds
        far_rounds += far
        # flush policy: when any lane is near ring-full, every lane with
        # >= fh unflushed bytes flushes fh (one shared banded store)
        if need_flush or any(ln.op - ln.fl >= ring_b - CAP - EW_B
                             for ln in lanes):
            flushes += 1
            for ln in lanes:
                n = ((ln.op - ln.fl) // fh_bytes) * fh_bytes
                ln.fl += max(n, 0)
    return rounds, far_rounds, flushes


def main():
    import numpy as np

    from __graft_entry__ import _synth_corpus
    from lz4_sgori_tpu import native
    from lz4_sgori_tpu.blocks import split_blocks

    bs = (int(sys.argv[1]) if len(sys.argv) > 1 else 64) * 1024
    srs = ([int(sys.argv[2])] if len(sys.argv) > 2
           else [256, 512, 1024, 2048])
    unrolls = ([int(sys.argv[3])] if len(sys.argv) > 3 else [1, 2, 4])
    lanes = 128

    data = _synth_corpus(lanes * bs)
    raw_np, rlen_np = split_blocks(data, bs)
    comps = [native.compress(raw_np[j, :rlen_np[j]].tobytes())
             for j in range(lanes)]
    order = np.argsort([len(c) for c in comps])
    comps = [comps[i] for i in order]
    seqs = [parse_sequences(c) for c in comps]

    for sr in srs:
        for unroll in unrolls:
            rounds, far, fls = simulate_ring(seqs, bs, sr, unroll=unroll)
            c_base = 0.77 + 0.60 * (unroll - 1)
            c_far = 1.2
            c_flush = 1.2
            t_ms = (rounds * c_base + far * c_far + fls * c_flush) / 1000.0
            gbps = lanes * bs / (t_ms * 1e-3) / 1e9
            print(f"ring sr={sr:5d} u={unroll}  rounds={rounds:6d} "
                  f"far={far:6d} ({100.0 * far / max(rounds, 1):3.0f}%) "
                  f"flushes={fls:4d}  T={t_ms:6.2f}ms -> {gbps:5.2f} GB/s",
                  flush=True)


if __name__ == "__main__":
    main()
