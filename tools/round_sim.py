"""Host-side round-count simulator for the lockstep decode engine.

Replays the exact per-lane round scheduling of lockstep_v4 (window
parking, CAP-capped copies, d-doubling warmup, EW-limited literal
chunks, LSIC_P-limited header parses) in pure Python and reports
sum-over-windows of max-over-lanes rounds — the quantity that, times
the measured per-round cost, is the kernel's wall time.

Lets CAP / sr / EW / LSIC_P / deferred-deep policies be evaluated
offline, without a TPU compile per design point.

Usage: python tools/round_sim.py [block_kib] [sr] [cap] [defer] [nearb]
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")


def parse_sequences(c: bytes):
    """[(lit_len, lit_cons_bytes, match_len, d, mlsic_cons)] per block.
    cons values = compressed bytes consumed by each header piece."""
    seqs = []
    ip, n = 0, len(c)
    while ip < n:
        tok = c[ip]
        ip += 1
        hdr = 1
        ll = tok >> 4
        if ll == 15:
            while True:
                b = c[ip]
                ip += 1
                hdr += 1
                ll += b
                if b != 255:
                    break
        ip += ll
        if ip >= n:
            seqs.append((ll, hdr, 0, 0, 0))
            break
        d = c[ip] | (c[ip + 1] << 8)
        ip += 2
        mh = 2
        ml = tok & 15
        if ml == 15:
            while True:
                b = c[ip]
                ip += 1
                mh += 1
                ml += b
                if b != 255:
                    break
        seqs.append((ll, hdr, ml + 4, d, mh))
    return seqs


def lane_rounds(seqs, out_size, sr, cap, lsic_p, ew_bytes,
                defer=1, nearb=1 << 30, period_fill=False, queue_n=0):
    """Faithful per-lane round schedule: one round advances through up
    to all four phases (header, literal chunk, offset header, match
    chunk) exactly as lockstep_v4._round does. Returns per-window round
    counts. Deep matches (src < win_base - nearb) copy only on rounds
    where the global round counter % defer == 0 (deferred far policy);
    period_fill skips the d-doubling warmup."""
    n_win = (out_size + sr * 4 - 1) // (sr * 4)
    rounds = [0] * n_win
    op = 0
    w = 0
    r_global = 0
    si = 0
    # lane mode machine
    TOK, LLSIC, LIT, OFF, MLSIC, MATCH, DONE = range(7)
    mode = TOK
    lit = ml = d = dd = 0
    hdr_left = mh_left = 0
    cons = 0
    slots_used = 0

    while mode != DONE and si <= len(seqs):
        if op >= (w + 1) * sr * 4:
            w += 1
            if w >= n_win:
                break
            continue
        # ---- one round ----
        rounds[w] += 1
        r_global += 1
        cons = 0
        win_end = (w + 1) * sr * 4
        win_base = w * sr * 4

        if mode == TOK:
            if si >= len(seqs):
                mode = DONE
                continue
            ll, hdr, ml_s, d_s, mh_s = seqs[si]
            lit = ll
            ml, d = ml_s, d_s
            dd = d
            take = min(hdr, 1 + lsic_p)
            hdr_left = hdr - take
            cons = take
            mode = LLSIC if hdr_left > 0 else LIT
            mh_left = max(0, mh_s - 2 - lsic_p)
        elif mode == LLSIC:
            take = min(hdr_left, lsic_p)
            hdr_left -= take
            cons = take
            if hdr_left == 0:
                mode = LIT

        if mode == LIT:
            avail = ew_bytes - cons - 3
            k = max(0, min(lit, cap, win_end - op, avail))
            op += k
            lit -= k
            cons += k
            if lit == 0:
                if ml == 0:
                    si += 1
                    mode = DONE if si >= len(seqs) else DONE \
                        if seqs[si - 1][2] == 0 and si >= len(seqs) else OFF
                    if seqs[si - 1][2] == 0:
                        mode = DONE if si >= len(seqs) else TOK
                        continue
                    mode = OFF
                else:
                    mode = OFF

        if mode == OFF:
            # offset + inline mlsic parsed this round
            if mh_left > 0:
                mode = MLSIC
                continue
            mode = MATCH
        elif mode == MLSIC:
            mh_left -= min(mh_left, lsic_p)
            if mh_left == 0:
                mode = MATCH
            else:
                continue

        if mode == MATCH:
            src = op - d
            deep = src < win_base - nearb
            if deep and (r_global % defer) != 0:
                # pending queue: a deep match whose full body fits the
                # window and a free slot is absorbed with zero stall;
                # slots recycle at each service tick
                if (queue_n > 0 and slots_used < queue_n and ml <= cap
                        and op + ml <= win_end):
                    slots_used += 1
                    op += ml
                    ml = 0
                    si += 1
                    mode = TOK
                    continue
                continue
        if r_global % defer == 0:
            slots_used = 0
            if period_fill:
                k = min(ml, cap, win_end - op)
            else:
                k = min(ml, cap, dd, win_end - op)
            k = max(0, k)
            op += k
            ml -= k
            if k == dd and dd < cap:
                dd *= 2
            if ml == 0:
                si += 1
                mode = TOK
    return rounds


def main():
    import numpy as np

    from __graft_entry__ import _synth_corpus
    from lz4_sgori_tpu import native
    from lz4_sgori_tpu.blocks import split_blocks

    bs = (int(sys.argv[1]) if len(sys.argv) > 1 else 64) * 1024
    sr = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    cap = int(sys.argv[3]) if len(sys.argv) > 3 else 96
    defer = int(sys.argv[4]) if len(sys.argv) > 4 else 1
    nearb = int(sys.argv[5]) if len(sys.argv) > 5 else (1 << 30)
    ew_bytes = int(sys.argv[6]) if len(sys.argv) > 6 else 160
    pfill = bool(int(sys.argv[7])) if len(sys.argv) > 7 else False
    qn = int(sys.argv[8]) if len(sys.argv) > 8 else 0
    lanes = 128

    data = _synth_corpus(lanes * bs)
    raw_np, rlen_np = split_blocks(data, bs)
    comps = [native.compress(raw_np[j, :rlen_np[j]].tobytes())
             for j in range(lanes)]
    order = np.argsort([len(c) for c in comps])  # the kernel's sort
    comps = [comps[i] for i in order]

    n_win = (bs + sr * 4 - 1) // (sr * 4)
    per_lane = []
    for c in comps:
        seqs = parse_sequences(c)
        r = lane_rounds(seqs, bs, sr, cap, 8, ew_bytes,
                        defer=defer, nearb=nearb, period_fill=pfill,
                        queue_n=qn)
        r += [0] * (n_win - len(r))
        per_lane.append(r[:n_win])
    arr = np.array(per_lane)  # (lanes, n_win)
    wmax = arr.max(axis=0)
    total = int(wmax.sum())
    mean_lane = arr.sum(axis=1).mean()
    print(f"block={bs} sr={sr} cap={cap} defer={defer} nearb={nearb} "
          f"ew={ew_bytes} pfill={pfill} queue={qn}")
    print(f"  total rounds (sum of window maxima): {total}")
    print(f"  mean lane rounds: {mean_lane:.0f}  "
          f"max lane: {arr.sum(axis=1).max()}  "
          f"lockstep overhead: {total / max(mean_lane, 1):.2f}x")


if __name__ == "__main__":
    main()
