"""Stint-scheduling simulator: predicts what re-sorting/re-packing the
lockstep decode lanes every R rounds buys, with walk SPANS priced in.

Round-4 established (docs/Performance.md):
  * rounds: sum-of-group-maxes under nseq sorting = 17.1k on the bench
    corpus vs a 12.9k balanced makespan — a 1.28x round-count lever;
  * the v9 chain engine realized the round cut but LOST end-to-end
    because its shared banded walks cost ~cross-lane position span and
    chained lanes diverge across chain slots.

A STINT engine (v10) takes the other route to the same makespan: run
the unmodified v7 machine for R rounds, checkpoint the lane state,
re-sort live lanes by progress and re-pack them into groups (dropping
finished lanes), repeat. Spans stay tight (lanes are re-clustered by
actual position every stint) and rounds approach the makespan (live
lanes backfill finished lanes' slots at stint granularity).

Model: lane trajectories are simulated solo (RingLane, one sequence
per round, CAP-limited copies); a group's wrapper round t costs
    c0 + cw * (ip_span(t) + 2 * op_span(t)) / 4096
with spans in bytes over the group's live lanes (refill walks scan the
comp tape ~ip span; far + flush walks scan the out tape ~op span).
c0 and cw are calibrated so policy A reproduces the two measured
anchors: v7 production 41.3 ms and the same-block bound 22.7 ms at
64 KiB x 512. Stint permutes are priced at PERM ms each (MXU one-hot
estimate: ~33k rows x 512 x 512 x 2 halves ~ 0.45 ms).

Run: python tools/stint_sim.py [block_kib] [nblocks]
"""

from __future__ import annotations

import sys
import pathlib

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))

from round_sim import parse_sequences  # noqa: E402
from round_sim4 import RingLane, DONE  # noqa: E402

LANES = 128
MEAS_V7_MS = 41.3       # measured: v7 u6, 64 KiB x 512, nseq-sorted
MEAS_SAME_MS = 22.7     # measured: same-block bound (1.48 GB/s, 32 MiB)
PERM_MS = 0.45          # est. per-stint one-hot permute of comp+out+state


def lane_traj(seqs, out_size, sr=512):
    """Solo trajectory: per-round (ip, op) for one lane. ip advance is
    approximated from the sequence's compressed-byte footprint spread
    over its rounds (parse cost model, good to a few %)."""
    ln = RingLane(seqs, out_size)
    ips, ops = [], []
    # per-sequence comp bytes: hdr + lit + 2 + mlsic
    comp_of_seq = [h + ll + (2 + mh if ml else 0)
                   for (ll, h, ml, d, mh) in seqs]
    total_comp = sum(comp_of_seq)
    while ln.mode != DONE:
        ln.step(sr * 4)
        ln.fl = max(ln.fl, ln.op - sr * 2)   # self-service flush
        si = min(ln.si, len(seqs) - 1)
        frac_in_seq = 0.5
        ip = sum(comp_of_seq[:si]) + frac_in_seq * comp_of_seq[si] \
            if seqs else 0
        ips.append(min(ip, total_comp))
        ops.append(ln.op)
    return np.asarray(ips), np.asarray(ops)


def group_cost(trajs, members, c0, cw):
    """Wrapper rounds + span cost for a static group of lanes."""
    if not members:
        return 0.0, 0
    R = max(len(trajs[m][0]) for m in members)
    cost = 0.0
    for t in range(R):
        ips = [trajs[m][0][min(t, len(trajs[m][0]) - 1)] for m in members
               if t < len(trajs[m][0])]
        ops = [trajs[m][1][min(t, len(trajs[m][1]) - 1)] for m in members
               if t < len(trajs[m][1])]
        if not ips:
            break
        span_ip = max(ips) - min(ips)
        span_op = max(ops) - min(ops)
        cost += c0 + cw * (span_ip + 2 * span_op) / 4096.0
    return cost, R


def policy_static(trajs, order, c0, cw):
    """nseq-sorted groups of 128 (today's v7 policy)."""
    total = 0.0
    rounds = 0
    for g in range(0, len(order), LANES):
        c, r = group_cost(trajs, list(order[g:g + LANES]), c0, cw)
        total += c
        rounds += r
    return total, rounds


def policy_stint(trajs, order, R, c0, cw, perm_ms=PERM_MS,
                 key="remaining"):
    """Every R rounds: drop finished lanes, re-sort by progress, re-pack
    into groups of 128. Groups run concurrently per stint, so a stint
    costs the max over its groups — but on one chip groups serialize
    (grid), so stint cost = sum over groups of their R-round cost."""
    n = len(order)
    pos = np.zeros(n, np.int64)            # rounds consumed per lane
    lens = np.array([len(trajs[i][0]) for i in range(n)])
    live = list(order)
    total = 0.0
    stints = 0
    while live:
        stints += 1
        if key == "remaining":
            live.sort(key=lambda i: lens[i] - pos[i])
        else:                               # current output position
            live.sort(key=lambda i: trajs[i][1][min(pos[i],
                                                    lens[i] - 1)])
        for g in range(0, len(live), LANES):
            members = live[g:g + LANES]
            span_r = min(R, max(lens[m] - pos[m] for m in members))
            for t in range(span_r):
                ips, ops = [], []
                for m in members:
                    tt = pos[m] + t
                    if tt < lens[m]:
                        ips.append(trajs[m][0][tt])
                        ops.append(trajs[m][1][tt])
                if not ips:
                    break
                total += c0 + cw * ((max(ips) - min(ips))
                                    + 2 * (max(ops) - min(ops))) / 4096.0
        for m in list(live):
            pos[m] += R
        live = [m for m in live if pos[m] < lens[m]]
        total += perm_ms if live else 0.0
    return total, stints


def policy_chain_dense(trajs, nseq, comp_lens, chain, c0, cw):
    """v9-style chains with DENSE comp packing: one group of 128 lanes,
    each lane runs `chain` blocks back-to-back; ip continuous (dense
    packing), op continuous (full blocks). Snake-dealt by nseq."""
    n = len(nseq)
    order = np.argsort(-nseq)
    mat = order.reshape(chain, n // chain)
    mat = mat.copy()
    mat[1::2] = mat[1::2, ::-1]
    cols = mat.T                           # [cols, chain]
    total = 0.0
    rounds = 0
    for g in range(0, cols.shape[0], LANES):
        members = cols[g:g + LANES]
        # build concatenated trajectories per lane
        lt = []
        for row in members:
            ip_off = op_off = 0
            ips, ops = [], []
            for b in row:
                i, o = trajs[b]
                ips.append(i + ip_off)
                ops.append(o + op_off)
                ip_off += comp_lens[b]
                op_off += o[-1] if len(o) else 0
            lt.append((np.concatenate(ips), np.concatenate(ops)))
        R = max(len(x[0]) for x in lt)
        rounds += R
        for t in range(R):
            ips = [x[0][min(t, len(x[0]) - 1)] for x in lt]
            ops = [x[1][min(t, len(x[1]) - 1)] for x in lt]
            total += c0 + cw * ((max(ips) - min(ips))
                                + 2 * (max(ops) - min(ops))) / 4096.0
    return total, rounds


def main():
    from __graft_entry__ import _synth_corpus
    from lz4_sgori_tpu import native
    from lz4_sgori_tpu.blocks import split_blocks
    from chain_sim import count_sequences

    bs = (int(sys.argv[1]) if len(sys.argv) > 1 else 64) * 1024
    nb = int(sys.argv[2]) if len(sys.argv) > 2 else 512

    data = _synth_corpus(nb * bs)
    raw_np, rlen_np = split_blocks(data, bs)
    comps = [native.compress(raw_np[j, :rlen_np[j]].tobytes())
             for j in range(nb)]
    nseq = np.asarray([count_sequences(c) for c in comps])
    trajs = [lane_traj(parse_sequences(c), bs) for c in comps]
    comp_lens = np.asarray([len(c) for c in comps])
    order = np.argsort(-nseq)

    # ---- calibrate c0, cw on policy A against the measured anchors ----
    # same-block: all lanes identical -> spans 0 -> cost = c0 * rounds.
    # pick the median-nseq block as "the" same-block trajectory
    med = int(np.argsort(nseq)[nb // 2])
    same_rounds = (nb // LANES) * len(trajs[med][0])
    c0 = MEAS_SAME_MS / same_rounds
    # production: fit cw so policy A reproduces MEAS_V7_MS
    base_c, base_r = policy_static(trajs, order, c0, 0.0)
    span_c, _ = policy_static(trajs, order, 0.0, 1.0)
    cw = (MEAS_V7_MS - base_c) / span_c if span_c > 0 else 0.0
    print(f"calibration: c0={c0 * 1e3:.3f} us/round  cw={cw * 1e3:.3f} "
          f"us/4KiB-span  (A rounds={base_r}, span term "
          f"{MEAS_V7_MS - base_c:.1f} ms of {MEAS_V7_MS} ms)")

    tot_mb = nb * bs / 1e6
    a_ms, a_r = policy_static(trajs, order, c0, cw)
    print(f"A  static nseq-sorted      : {a_ms:7.2f} ms  "
          f"{tot_mb / a_ms:.3f} GB/s  rounds={a_r}")
    for R in (256, 512, 1024, 2048):
        for key in ("remaining", "op"):
            s_ms, s_n = policy_stint(trajs, order, R, c0, cw, key=key)
            print(f"B  stint R={R:5d} key={key:9s}: {s_ms:7.2f} ms  "
                  f"{tot_mb / s_ms:.3f} GB/s  stints={s_n} "
                  f"(+{s_n * PERM_MS:.1f} ms perm)")
    for chain in (2, 4):
        c_ms, c_r = policy_chain_dense(trajs, nseq, comp_lens, chain,
                                       c0, cw)
        print(f"C  dense-chain x{chain}         : {c_ms:7.2f} ms  "
              f"{tot_mb / c_ms:.3f} GB/s  rounds={c_r}")


if __name__ == "__main__":
    main()
