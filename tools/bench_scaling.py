"""Block-parallel scaling benchmark over a device mesh.

Reports GB/s for the sharded write pipeline (compress + decode-verify +
psum stats) at mesh sizes 1..N — the BASELINE.md scaling metric (1 chip ->
1 host -> N hosts). On a real TPU slice the numbers are end-to-end chip
throughput; on the CPU backend (the default in this single-chip
environment) the run validates the sharded program's structure and
collective layout, not absolute speed.

Usage:
  python tools/bench_scaling.py [--devices 1 2 4 8] [--blocks-per-device 16]
      [--block-size 65536] [--platform cpu|leave]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, nargs="+", default=[1, 2, 4, 8])
    ap.add_argument("--blocks-per-device", type=int, default=16)
    ap.add_argument("--block-size", type=int, default=65536)
    ap.add_argument("--platform", default="cpu",
                    help="'cpu' forces the host backend with a virtual "
                         "device count; 'leave' uses whatever is attached")
    args = ap.parse_args()

    if args.platform == "cpu":
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                f"{flags} --xla_force_host_platform_device_count="
                f"{max(args.devices)}").strip()
    import jax
    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")

    import numpy as np
    from __graft_entry__ import _synth_corpus
    from lz4_sgori_tpu.blocks import split_blocks
    from lz4_sgori_tpu.parallel import make_mesh, write_pipeline_sharded

    bs = args.block_size
    results = []
    base = None
    for nd in args.devices:
        if nd > len(jax.devices()):
            print(f"# skipping {nd} devices (have {len(jax.devices())})",
                  file=sys.stderr)
            continue
        nblocks = nd * args.blocks_per_device
        data = _synth_corpus(nblocks * bs, seed=13)
        raw, rlen = split_blocks(data, bs)
        mesh = make_mesh(nd)
        # warmup + compile
        comp, clen, ok, stats = write_pipeline_sharded(raw, rlen, bs, mesh)
        ok.block_until_ready()
        assert bool(np.asarray(ok).all()), "pipeline verify failed"
        t0 = time.perf_counter()
        iters = 3
        for _ in range(iters):
            comp, clen, ok, stats = write_pipeline_sharded(raw, rlen, bs, mesh)
        ok.block_until_ready()
        dt = (time.perf_counter() - t0) / iters
        gbps = len(data) / dt / 1e9
        if base is None:
            base = gbps / nd
        results.append({
            "devices": nd,
            "pipeline_gbps": round(gbps, 4),
            "scaling_efficiency": round(gbps / (base * nd), 4),
        })
    print(json.dumps({"metric": "write_pipeline_scaling",
                      "block_size": bs,
                      "platform": jax.devices()[0].platform,
                      "results": results}))


if __name__ == "__main__":
    main()
