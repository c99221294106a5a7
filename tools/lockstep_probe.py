"""On-TPU probe for the lane-lockstep decode engine.

Usage: python tools/lockstep_probe.py [block_size_kib] [groups] [sr]

Builds a mixed corpus (same recipe as bench.py), compresses on the host
with the native codec, decodes on the TPU with the lockstep kernel,
verifies bit-exactness on device, and reports GB/s (scalar-fetch timing:
the sum data-depends on every output byte).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                 "/tmp/lz4j_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    bs_kib = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    groups = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    sr = int(sys.argv[3]) if len(sys.argv) > 3 else 1024
    bs = bs_kib * 1024
    nb = groups * 128

    from __graft_entry__ import _synth_corpus
    from lz4_sgori_tpu import native
    from lz4_sgori_tpu.blocks import split_blocks
    from lz4_sgori_tpu.ops.pallas.lockstep_tpu import (
        decompress_blocks_lockstep)

    data = _synth_corpus(nb * bs)
    raw_np, rlen_np = split_blocks(data, bs)
    comps = [native.compress(raw_np[j, :rlen_np[j]].tobytes())
             for j in range(nb)]
    slot = -(-(max(len(c) for c in comps) + 8) // 32) * 32
    comp = np.zeros((nb, slot), np.uint8)
    clen = np.zeros(nb, np.int32)
    for j, c in enumerate(comps):
        comp[j, :len(c)] = np.frombuffer(c, np.uint8)
        clen[j] = len(c)
    ratio = nb * bs / clen.sum()
    print(f"[probe] {nb} x {bs} B blocks, slot {slot}, ratio {ratio:.3f}",
          flush=True)

    dev = jax.devices()[0]
    print(f"[probe] device {dev}", flush=True)
    comp_d = jax.device_put(comp, dev)
    clen_d = jax.device_put(clen, dev)

    def run():
        out, out_len, err = decompress_blocks_lockstep(
            comp_d, clen_d, bs, sr=sr)
        s = (jnp.sum(out.astype(jnp.int32)) + jnp.sum(out_len)
             + jnp.sum(err))
        return out, out_len, err, int(s)

    t0 = time.perf_counter()
    out, out_len, err, _ = run()
    print(f"[probe] compile+first run {time.perf_counter() - t0:.1f}s",
          flush=True)

    nerr = int(jnp.sum(err))
    print(f"[probe] errors: {nerr}", flush=True)
    assert nerr == 0, "decode errors on well-formed corpus"
    lens_ok = int(jnp.sum(out_len.astype(jnp.int64))) == len(data)
    # bit-exactness on device
    raw_d = jax.device_put(raw_np, dev)
    valid = jnp.arange(bs)[None, :] < jax.device_put(rlen_np, dev)[:, None]
    mism = int(jnp.sum(jnp.where(valid, out != raw_d, False)))
    print(f"[probe] len_ok={lens_ok} mismatches={mism}", flush=True)
    assert lens_ok and mism == 0

    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        run()
        best = min(best, time.perf_counter() - t0)
    gbps = len(data) / best / 1e9
    print(f"[probe] RESULT block={bs} sr={sr} groups={groups} "
          f"best={best * 1e3:.2f} ms  {gbps:.3f} GB/s", flush=True)


if __name__ == "__main__":
    main()
