"""Hardware byte-parity check: seg encoder with mlen=True vs mlen=False.

Interpret-mode parity is already pinned (tests/test_mlen_cand.py); this
runs the compiled kernels on the real chip, where SMEM OOB indexing and
DMA alignment bugs that interpret masks would surface as mismatches or
faults. Usage: python tools/mlen_parity_tpu.py [block_kib] [nblocks]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                 "/tmp/lz4j_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    bs_kib = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    nb = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    bs = bs_kib * 1024

    from __graft_entry__ import _synth_corpus
    from lz4_sgori_tpu.blocks import split_blocks
    from lz4_sgori_tpu.ops.pallas.lockstep_enc3 import (
        compress_blocks_lockstep_seg)
    from lz4_sgori_tpu.ops.routing import seg_for

    data = _synth_corpus(nb * bs)
    raw_np, rlen_np = split_blocks(data, bs)
    dev = jax.devices()[0]
    print(f"[parity] {nb} x {bs} on {dev}", flush=True)
    raw_d = jax.device_put(raw_np, dev)
    rlen_d = jax.device_put(rlen_np, dev)
    segsz = seg_for(bs) if bs > 65536 else 4096

    outs = {}
    for flag in (False, True):
        c, cl, e = compress_blocks_lockstep_seg(
            raw_d, rlen_d, bs, seg=segsz, mlen=flag)
        cl_np = np.asarray(cl)
        e_np = np.asarray(e)
        c_np = np.asarray(c)
        assert int(e_np.sum()) == 0, f"mlen={flag}: errors {e_np.sum()}"
        outs[flag] = (c_np, cl_np)
        print(f"[parity] mlen={flag}: total clen {int(cl_np.sum())}",
              flush=True)

    c0, l0 = outs[False]
    c1, l1 = outs[True]
    assert np.array_equal(l0, l1), "clen mismatch"
    bad = 0
    for i in range(nb):
        n = int(l0[i])
        if not np.array_equal(c0[i, :n], c1[i, :n]):
            bad += 1
            if bad <= 3:
                d = np.nonzero(c0[i, :n] != c1[i, :n])[0]
                print(f"[parity] block {i}: first diff at {d[0]} "
                      f"({c0[i, d[0]]} vs {c1[i, d[0]]})", flush=True)
    assert bad == 0, f"{bad}/{nb} blocks differ"
    print(f"[parity] OK: {nb} blocks byte-identical on hardware",
          flush=True)


if __name__ == "__main__":
    main()
