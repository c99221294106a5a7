"""Sequence-level diff of lockstep encoder vs golden on the failing block."""
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from lz4_sgori_tpu import golden
from lz4_sgori_tpu import format as F
from lz4_sgori_tpu.ops.pallas import lockstep as LK
from lz4_sgori_tpu.ops.pallas import lockstep_enc as LE


def parse_seqs(blob):
    """Parse an LZ4 block into [(src_pos, lit, off, mc)]."""
    seqs = []
    ip = 0
    opos = 0
    n = len(blob)
    while True:
        tok = blob[ip]; ip += 1
        lit = tok >> 4
        if lit == 15:
            while True:
                b = blob[ip]; ip += 1
                lit += b
                if b != 255:
                    break
        ip += lit
        if ip == n:
            seqs.append((opos, lit, None, None))
            return seqs
        off = blob[ip] | (blob[ip + 1] << 8); ip += 2
        mc = tok & 15
        if mc == 15:
            while True:
                b = blob[ip]; ip += 1
                mc += b
                if b != 255:
                    break
        seqs.append((opos, lit, off, mc))
        opos += lit + mc + 4


def main():
    rng = np.random.default_rng(7)
    # rebuild fixture list exactly as enc_check
    fixtures = []
    fixtures.append(b"")
    fixtures.append(b"a")
    fixtures.append(b"hello world " * 3)
    fixtures.append(bytes(64))
    fixtures.append(bytes(rng.integers(0, 256, 64, dtype=np.uint8)))
    fixtures.append(b"abcabcabcabc" * 40)
    fixtures.append(bytes(4096))
    fixtures.append(bytes(rng.integers(0, 256, 4096, dtype=np.uint8)))
    text = (b"the quick brown fox jumps over the lazy dog. " * 120)[:4096]
    fixtures.append(text)
    lo = bytes(rng.integers(0, 4, 4096, dtype=np.uint8))
    fixtures.append(lo)

    blk = lo
    want = golden.compress(blk)

    bs = 4096
    lens = np.full(128, len(blk), np.int32)
    u8 = np.tile(np.frombuffer(blk, np.uint8)[None, :], (128, 1))
    src = LK.pack_tapes(u8, lens)
    sr = 256
    cb = F.compress_bound(bs)
    out_cap = -(-cb // (4 * sr)) * (4 * sr)
    fn = jax.jit(LE.encode_tapes, static_argnames=("out_cap", "sr", "accel"))
    out, clen, err = fn(src, np.asarray(lens)[None, :], out_cap=out_cap,
                        sr=sr, accel=1)
    data = LK.unpack_tapes(out)
    got = bytes(np.asarray(data[0, :int(clen[0, 0])]))

    sg = parse_seqs(got)
    sw = parse_seqs(want)
    print(f"lens: got {len(got)} want {len(want)}; nseq {len(sg)} vs {len(sw)}")
    for i, (a, b) in enumerate(zip(sg, sw)):
        if a != b:
            print(f"first seq diff at #{i}: got {a} want {b}")
            for j in range(max(0, i - 3), min(len(sg), i + 4)):
                print(f"  #{j}: got {sg[j]}  want {sw[j]}")
            break
    else:
        print("sequences identical up to common length")


if __name__ == "__main__":
    main()
