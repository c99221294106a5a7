"""On-TPU probe for the lane-lockstep encoder.

Usage: python tools/enc_probe.py [block_size_kib] [groups] [sr] [accel]

Builds a mixed corpus (same recipe as bench.py), encodes it with the
lockstep Pallas engine, asserts byte parity against golden.compress on a
sample, and reports GB/s + per-round cost.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/lz4j_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from __graft_entry__ import _synth_corpus
from lz4_sgori_tpu import golden
from lz4_sgori_tpu.blocks import split_blocks
from lz4_sgori_tpu.ops.pallas.lockstep_enc_tpu import compress_blocks_lockstep


def main():
    bs = int(sys.argv[1]) * 1024 if len(sys.argv) > 1 else 65536
    groups = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    sr = int(sys.argv[3]) if len(sys.argv) > 3 else 256
    accel = int(sys.argv[4]) if len(sys.argv) > 4 else 1
    nb = 128 * groups
    data = _synth_corpus(nb * bs)
    raw_np, rlen_np = split_blocks(data, bs)
    dev = jax.devices()[0]
    print(f"device {dev}, {nb} blocks of {bs}, sr={sr}, accel={accel}")
    raw = jax.device_put(raw_np, dev)
    rlen = jax.device_put(rlen_np, dev)

    t0 = time.time()
    comp, clen = compress_blocks_lockstep(raw, rlen, bs, acceleration=accel,
                                          sr=sr)
    total = int(jnp.sum(clen))
    print(f"warmup+compile {time.time() - t0:.1f}s, compressed {total}")
    assert total > 0, "encoder failed to converge"

    # parity sample: 4 blocks host-checked
    comp_h = np.asarray(comp[:4])
    clen_h = np.asarray(clen[:4])
    for j in range(4):
        want = golden.compress(data[j * bs:(j + 1) * bs], acceleration=accel)
        got = bytes(comp_h[j, :clen_h[j]])
        assert got == want, f"block {j}: {len(got)} vs {len(want)}"
    print("parity ok (4 host-checked blocks)")

    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        _, cl = compress_blocks_lockstep(raw, rlen, bs, acceleration=accel,
                                         sr=sr)
        int(jnp.sum(cl))
        best = min(best, time.perf_counter() - t0)
    gbps = len(data) / best / 1e9
    print(f"encode {best * 1e3:.2f} ms = {gbps:.3f} GB/s "
          f"({best / groups * 1e3:.2f} ms/group)")


if __name__ == "__main__":
    main()
