"""Lane-chaining makespan simulator: how much decode throughput is left
on the table by round-count divergence, using REAL per-block sequence
counts from the bench corpus.

Background (round-4 ceiling work, docs/Performance.md): the v7 decode
machine runs groups of 128 lanes in lockstep; a group runs until its
slowest lane finishes, so wall time ~ sum over groups of max(rounds in
group), and rounds ~ nseq (corr 0.9999). nseq-sorted grouping is already
OPTIMAL for that objective (sum of every 128th order statistic), so the
remaining divergence loss cannot be recovered by better grouping — only
by changing the objective: let each LANE decode a CHAIN of blocks
(per-lane block queues, LPT bin-packing by nseq), which converts
sum-of-group-maxes into ~total/128 (the balanced-lane makespan).

This tool measures, on the actual bench corpus distribution:
  A) sum-of-group-maxes under nseq-sorted grouping   (today's cost)
  B) LPT-packed per-lane makespan at chain=4          (the chained cost)
  C) the ratio A/B = upper bound on the chaining speedup, and the same
     with a per-transition overhead charged (ring/history reset is a
     handful of vector ops, modeled as N rounds each).

OUTCOME (round 4): the predicted round cut is real, but the built
engine (ops/pallas/lockstep_v9.py) measured SLOWER than v7 end-to-end
(59.6/69.7 ms at chain 2/4 vs 41.3 ms) — this model prices rounds only,
and the machine's shared banded walks cost ~span-of-lane-positions,
which inflates chain-fold once lanes diverge across chain slots. The
model stays valid for any machine with per-lane-range walk service
(the v8 DMA mechanism). See docs/Performance.md round-4 "lane
chaining".

Run: python tools/chain_sim.py
"""
import sys
import pathlib

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from lz4_sgori_tpu import native  # noqa: E402
from __graft_entry__ import _synth_corpus  # noqa: E402

BLOCK = 65536
LANES = 128


def count_sequences(comp: bytes) -> int:
    """Token-walk an LZ4 block, counting sequences (no output built)."""
    i, n, nseq = 0, len(comp), 0
    while i < n:
        tok = comp[i]
        i += 1
        nseq += 1
        lit = tok >> 4
        if lit == 15:
            while True:
                b = comp[i]
                i += 1
                lit += b
                if b != 255:
                    break
        i += lit
        if i >= n:
            break  # last literals
        ml = tok & 15
        i += 2  # offset
        if ml == 15:
            while True:
                b = comp[i]
                i += 1
                ml += b
                if b != 255:
                    break
    return nseq


def main() -> None:
    data = _synth_corpus(32 << 20)
    nblocks = len(data) // BLOCK
    nseq = np.empty(nblocks, np.int64)
    for b in range(nblocks):
        comp = native.compress(data[b * BLOCK:(b + 1) * BLOCK])
        nseq[b] = count_sequences(comp)
    print(f"blocks={nblocks} nseq min={nseq.min()} max={nseq.max()} "
          f"mean={nseq.mean():.0f} sum={nseq.sum()}")

    # A) today's cost: nseq-sorted groups of 128, sum of group maxes
    order = np.sort(nseq)[::-1]
    groups = order.reshape(-1, LANES)
    cost_now = int(groups.max(axis=1).sum())

    # B) chained: LPT bin-packing into 128 lanes (chain = nblocks/128)
    lane_tot = np.zeros(LANES, np.int64)
    lane_cnt = np.zeros(LANES, np.int64)
    chain = nblocks // LANES
    for v in order:  # LPT: biggest first onto the lightest eligible lane
        elig = np.where(lane_cnt < chain)[0]
        j = elig[np.argmin(lane_tot[elig])]
        lane_tot[j] += v
        lane_cnt[j] += 1
    cost_chain = int(lane_tot.max())
    ideal = int(np.ceil(nseq.sum() / LANES))

    print(f"A sum-of-group-maxes (today) : {cost_now} rounds")
    print(f"B LPT chained makespan       : {cost_chain} rounds "
          f"(ideal {ideal}, gap {(cost_chain / ideal - 1) * 100:.2f}%)")
    print(f"   predicted speedup A/B     : {cost_now / cost_chain:.3f}x")
    for ovh in (8, 32, 128):
        c = cost_chain + (chain - 1) * ovh
        print(f"   with {ovh:4d} rounds/transition overhead: "
              f"{cost_now / c:.3f}x")


if __name__ == "__main__":
    main()
