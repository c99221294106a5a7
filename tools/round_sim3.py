"""Sliding-window round simulator for the lockstep decode engine.

round_sim2.py models the shipped v4 policy: all lanes synchronize at
every sr-word window boundary (shared win_base). This simulator prices
the SLIDING policy: the staging buffer covers W consecutive windows and
each lane has its own window cursor; a lane parks only when it runs W
windows ahead of the slowest lane. The oldest window commits (one
dynamic-sublane store) once every lane has passed it, then the coverage
slides. Rounds ~ max over lanes of total per-lane rounds, instead of
sum over windows of per-window maxima.

Also compares lane-grouping keys: comp_len (shipped), sequence count,
and exact per-lane round need (oracle).

Usage: python tools/round_sim3.py [block_kib] [sr] [W] [unroll] [key]
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

from round_sim import parse_sequences  # noqa: E402
from round_sim2 import Lane, DONE  # noqa: E402


def simulate_sliding(all_seqs, out_size, sr, W=2, unroll=1):
    """Lanes advance independently inside a W-window staging span.

    Far scan: fires (shared, once per round) when any executed match
    reads below the staging span's base. allow_far at sub-step 0 only,
    as in the v4 unrolled kernel.
    """
    lanes = [Lane(s, out_size) for s in all_seqs]
    win_bytes = sr * 4
    n_win = (out_size + win_bytes - 1) // win_bytes
    rounds = far_rounds = commits = 0
    base_w = 0  # oldest staged window index
    while True:
        active = [ln for ln in lanes if ln.mode != DONE]
        if not active:
            break
        # slide: commit every window all lanes have passed
        min_w = min((ln.op // win_bytes) for ln in active)
        while base_w < min_w and base_w < n_win - 1:
            base_w += 1
            commits += 1
        span_base = base_w * win_bytes
        span_end = min(base_w + W, n_win) * win_bytes
        rounds += 1
        far = False
        parked = set()
        for u in range(unroll):
            for li, ln in enumerate(lanes):
                if li in parked or ln.mode == DONE:
                    continue
                # per-lane window clamp inside the span: ranges still
                # clip to the lane's own op window to model place()
                r = ln.step(span_base, span_end, far_bound=span_base,
                            allow_far=(u == 0))
                if r == 'parked':
                    parked.add(li)
                elif isinstance(r, tuple) and r[1] < span_base:
                    far = True
        far_rounds += far
    return rounds, far_rounds, commits


def lane_rounds_alone(seqs, out_size, sr):
    """Rounds one lane needs with no lockstep partners (oracle key)."""
    ln = Lane(seqs, out_size)
    win_bytes = sr * 4
    n_win = (out_size + win_bytes - 1) // win_bytes
    r = 0
    for w in range(n_win):
        while ln.mode != DONE and ln.op < (w + 1) * win_bytes:
            ln.step(w * win_bytes, (w + 1) * win_bytes)
            r += 1
    return r


def main():
    import numpy as np

    from __graft_entry__ import _synth_corpus
    from lz4_sgori_tpu import native
    from lz4_sgori_tpu.blocks import split_blocks

    bs = (int(sys.argv[1]) if len(sys.argv) > 1 else 64) * 1024
    sr = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    W = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    unroll = int(sys.argv[4]) if len(sys.argv) > 4 else 1
    key = sys.argv[5] if len(sys.argv) > 5 else "clen"
    lanes = 128

    data = _synth_corpus(lanes * bs)
    raw_np, rlen_np = split_blocks(data, bs)
    comps = [native.compress(raw_np[j, :rlen_np[j]].tobytes())
             for j in range(lanes)]
    seqs_all = [parse_sequences(c) for c in comps]
    if key == "clen":
        keys = [len(c) for c in comps]
    elif key == "nseq":
        keys = [len(s) for s in seqs_all]
    else:  # oracle
        keys = [lane_rounds_alone(s, bs, sr) for s in seqs_all]
    order = np.argsort(keys)
    seqs_all = [seqs_all[i] for i in order]

    alone = [lane_rounds_alone(s, bs, sr) for s in seqs_all]
    print(f"block={bs} sr={sr} W={W} unroll={unroll} key={key}")
    print(f"  per-lane alone rounds: mean={np.mean(alone):.0f} "
          f"max={np.max(alone)}")

    rounds, far, commits = simulate_sliding(seqs_all, bs, sr, W=W,
                                            unroll=unroll)
    c_base = 0.77 + 0.60 * (unroll - 1)
    c_far = 0.95
    t_ms = (rounds * c_base + far * c_far) / 1000.0
    gbps = lanes * bs / (t_ms * 1e-3) / 1e9
    print(f"  rounds={rounds} far={far} ({100.0 * far / max(rounds, 1):.0f}%)"
          f" commits={commits}")
    print(f"  modeled T={t_ms:.2f} ms -> {gbps:.2f} GB/s")


if __name__ == "__main__":
    main()
