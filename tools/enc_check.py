"""Quick CPU parity check of the lockstep encoder vs golden.compress."""
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


def run_case(blocks, bs, accel=1, sr=256):
    lens = np.array([len(b) for b in blocks], np.int32)
    u8 = np.zeros((128, bs), np.uint8)
    for i, b in enumerate(blocks):
        u8[i, :len(b)] = np.frombuffer(b, np.uint8)
    src = LK.pack_tapes(u8, lens)
    cb = F.compress_bound(bs)
    out_cap = -(-cb // (4 * sr)) * (4 * sr)
    fn = jax.jit(LE.encode_tapes, static_argnames=("out_cap", "sr", "accel"))
    out, clen, err = fn(src, np.asarray(lens)[None, :], out_cap=out_cap,
                        sr=sr, accel=accel)
    data = LK.unpack_tapes(out)
    assert int(np.sum(np.asarray(err))) == 0, "encoder did not converge"
    ok = 0
    for i, b in enumerate(blocks):
        want = golden.compress(b, acceleration=accel)
        got = bytes(np.asarray(data[i, :int(clen[0, i])]))
        if got != want:
            print(f"block {i} len {len(b)}: got {len(got)} want {len(want)}")
            for j in range(min(len(got), len(want))):
                if got[j] != want[j]:
                    print(f"  first diff at {j}: {got[j]:02x} vs {want[j]:02x}")
                    print(f"  got  {got[max(0,j-8):j+8].hex()}")
                    print(f"  want {want[max(0,j-8):j+8].hex()}")
                    break
            return False
        ok += 1
    print(f"  {ok}/{len(blocks)} blocks byte-identical (bs={bs}, accel={accel})")
    return True


def main():
    rng = np.random.default_rng(7)
    fixtures = []
    # compressibility spectrum
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
    # long literal runs (LSIC stress) and long matches
    fixtures.append(bytes(rng.integers(0, 256, 2000, dtype=np.uint8)) + bytes(500))
    fixtures.append(bytes([1, 2, 3, 4]) * 1000)
    blocks = (fixtures * 12)[:128]
    assert run_case(blocks, 4096)
    assert run_case(blocks, 4096, accel=4)

    big = []
    big.append((text * 20)[:65536])
    big.append(bytes(rng.integers(0, 256, 65536, dtype=np.uint8)))
    big.append(bytes(65536))
    big.append(bytes(rng.integers(0, 3, 65536, dtype=np.uint8)))
    print("done-small")
    blocks = (big * 32)[:128]
    assert run_case(blocks, 65536, sr=1024)
    print("ALL OK")


if __name__ == "__main__":
    main()
