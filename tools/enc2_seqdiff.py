"""Locate the first diverging SEQUENCE between the enc2 kernel and the
compress_dense oracle on a failing corpus block.

Usage: python tools/enc2_seqdiff.py [block_idx] [block_kib] [interpret]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

interp = len(sys.argv) > 3 and sys.argv[3] == "1"
if interp:
    jax.config.update("jax_platforms", "cpu")
else:
    jax.config.update("jax_compilation_cache_dir", "/tmp/lz4j_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np

from __graft_entry__ import _synth_corpus
from lz4_sgori_tpu import golden
from lz4_sgori_tpu.blocks import split_blocks
from lz4_sgori_tpu.ops.pallas.lockstep_enc2 import (
    compress_blocks_lockstep_enc2)


def parse_seqs(c: bytes):
    """(in_pos, lit, ml, off) per sequence of an LZ4 block."""
    seqs = []
    ip = 0
    opos = 0
    n = len(c)
    while ip < n:
        tok = c[ip]
        ip += 1
        lit = tok >> 4
        if lit == 15:
            while True:
                b = c[ip]
                ip += 1
                lit += b
                if b != 255:
                    break
        ip += lit
        if ip >= n:
            seqs.append((opos, lit, 0, 0))
            break
        off = c[ip] | (c[ip + 1] << 8)
        ip += 2
        ml = (tok & 15) + 4
        if tok & 15 == 15:
            while True:
                b = c[ip]
                ip += 1
                ml += b
                if b != 255:
                    break
        seqs.append((opos, lit, ml, off))
        opos += lit + ml
    return seqs


def main():
    bi = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    bs = (int(sys.argv[2]) if len(sys.argv) > 2 else 64) * 1024
    data = _synth_corpus(128 * bs)
    raw, rlen = split_blocks(data, bs)
    blk = raw[bi, :rlen[bi]].tobytes()

    want = golden.compress_dense(blk)
    raw1 = np.zeros((1, bs), np.uint8)
    raw1[0, :len(blk)] = np.frombuffer(blk, np.uint8)
    comp, clen, err = compress_blocks_lockstep_enc2(
        raw1, np.asarray([len(blk)], np.int32), bs, interpret=interp)
    got = bytes(np.asarray(comp)[0, :int(clen[0])])
    print(f"block {bi}: got {len(got)}B want {len(want)}B "
          f"err={bool(np.asarray(err)[0])}", flush=True)
    if got == want:
        print("IDENTICAL")
        return
    sg = parse_seqs(got)
    sw = parse_seqs(want)
    for i, (a, b) in enumerate(zip(sg, sw)):
        if a != b:
            print(f"seq {i} diverges:")
            for j in range(max(0, i - 3), min(len(sg), len(sw), i + 3)):
                print(f"  seq {j}: got {sg[j]}  want {sw[j]}")
            a_pos = a[0]
            print(f"  input around got-anchor {a_pos + a[1]}: "
                  f"{blk[max(0, a_pos + a[1] - 8):a_pos + a[1] + 24].hex()}")
            return
    print(f"prefix equal; counts {len(sg)} vs {len(sw)}")


if __name__ == "__main__":
    main()
