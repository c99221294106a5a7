"""Global-lockstep round/cost simulator for the lockstep decode engine.

Unlike round_sim.py (per-lane schedules joined by window maxima), this
replays all 128 lanes ROUND BY ROUND in lockstep, so it can count the
rounds on which the expensive far-read banded scan actually fires and
price designs with the measured cost model:

    T = rounds * c_base + far_rounds * c_far
    (v5e measured: c_base ~= 0.77 us, c_far ~= 0.95 us @ 64 KiB tape)

Policies evaluated:
  * prevw K  -- keep the last K committed windows in registers; the far
    scan fires only for src < win_base - K*sr*4.
  * unroll U -- U sequences-phases per round sharing one cond + one far
    scan (models a U-times unrolled kernel body; rounds/U, far merged).

Usage: python tools/round_sim2.py [block_kib] [sr] [prevw] [unroll]
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from round_sim import parse_sequences  # noqa: E402

CAP = 96
LSIC_P = 8
EW_B = 160
TOK, LLSIC, LIT, OFF, MLSIC, MATCH, DONE = range(7)


class Lane:
    def __init__(self, seqs, out_size):
        self.seqs = seqs
        self.out = out_size
        self.si = 0
        self.mode = TOK
        self.op = 0
        self.lit = self.ml = self.d = self.dd = 0
        self.hdr_left = self.mh_left = 0

    def step(self, win_base, win_end, far_bound=None, allow_far=True):
        """One v4 round. Returns ('copy', src) for an executed match copy,
        'parked' when a far match was deferred to the next round's
        sub-step 0, or None."""
        if self.mode == DONE or self.op >= win_end:
            return None
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
            k = max(0, min(self.lit, CAP, win_end - self.op, avail))
            self.op += k
            self.lit -= k
            cons += k
            if self.lit == 0:
                if self.ml == 0:  # literal-only last sequence
                    self.si += 1
                    self.mode = DONE if self.si >= len(self.seqs) else TOK
                    return None
                self.mode = OFF

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
            src = self.op - self.d
            if far_bound is not None and src < far_bound and not allow_far:
                return 'parked'
            k = max(0, min(self.ml, CAP, self.dd, win_end - self.op))
            self.op += k
            self.ml -= k
            if k == self.dd and self.dd < CAP:
                self.dd *= 2
            if self.ml == 0:
                self.si += 1
                self.mode = TOK
            return ('copy', src)
        return None


def simulate(all_seqs, out_size, sr, prevw=0, unroll=1):
    """Unrolled-round policy: U sub-steps per round share one cond and
    ONE far scan, fired at sub-step 0. A lane that reaches a far match
    (src < win_base - prevw*sr*4) at sub-step > 0 parks until the next
    round's sub-step 0."""
    lanes = [Lane(s, out_size) for s in all_seqs]
    n_win = (out_size + sr * 4 - 1) // (sr * 4)
    rounds = far_rounds = 0
    for w in range(n_win):
        win_base, win_end = w * sr * 4, (w + 1) * sr * 4
        fb = win_base - prevw * sr * 4
        while True:
            active = [ln for ln in lanes
                      if ln.mode != DONE and ln.op < win_end]
            if not active:
                break
            rounds += 1
            far = False
            parked = set()
            for u in range(unroll):
                for li, ln in enumerate(lanes):
                    if li in parked:
                        continue
                    r = ln.step(win_base, win_end, far_bound=fb,
                                allow_far=(u == 0))
                    if r == 'parked':
                        parked.add(li)
                    elif isinstance(r, tuple) and r[1] < fb:
                        far = True
            far_rounds += far
    return rounds, far_rounds


def main():
    import numpy as np

    from __graft_entry__ import _synth_corpus
    from lz4_sgori_tpu import native
    from lz4_sgori_tpu.blocks import split_blocks

    bs = (int(sys.argv[1]) if len(sys.argv) > 1 else 64) * 1024
    sr = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    prevw = int(sys.argv[3]) if len(sys.argv) > 3 else 0
    unroll = int(sys.argv[4]) if len(sys.argv) > 4 else 1
    lanes = 128

    data = _synth_corpus(lanes * bs)
    raw_np, rlen_np = split_blocks(data, bs)
    comps = [native.compress(raw_np[j, :rlen_np[j]].tobytes())
             for j in range(lanes)]
    order = np.argsort([len(c) for c in comps])
    comps = [comps[i] for i in order]
    seqs = [parse_sequences(c) for c in comps]

    rounds, far = simulate(seqs, bs, sr, prevw=prevw, unroll=unroll)
    # measured v5e cost model (Performance.md round-2): base round cost
    # scales mildly with unroll (parse+place duplicated, cond shared)
    c_base = 0.77 + 0.60 * (unroll - 1)
    c_far = 0.95
    t_ms = (rounds * c_base + far * c_far) / 1000.0
    gbps = lanes * bs / (t_ms * 1e-3) / 1e9
    print(f"block={bs} sr={sr} prevw={prevw} unroll={unroll}")
    print(f"  rounds={rounds}  far_rounds={far} "
          f"({100.0 * far / max(rounds, 1):.0f}%)")
    print(f"  modeled T={t_ms:.2f} ms -> {gbps:.2f} GB/s "
          f"(c_base={c_base:.2f}us c_far={c_far}us)")


if __name__ == "__main__":
    main()
