"""Single-step the engine on the failing block; dump rounds near seq #287."""
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from lz4_sgori_tpu import golden
from lz4_sgori_tpu import format as F
from lz4_sgori_tpu.ops.pallas import lockstep as LK
from lz4_sgori_tpu.ops.pallas import lockstep_enc as LE


def main():
    rng = np.random.default_rng(7)
    for _ in range(9):
        rng.integers(0, 256, 1)  # burn nothing; regenerate fixtures properly
    rng = np.random.default_rng(7)
    rng.integers(0, 256, 64, dtype=np.uint8)
    rng.integers(0, 256, 4096, dtype=np.uint8)
    blk = bytes(rng.integers(0, 4, 4096, dtype=np.uint8))

    # golden probe trace around pos 1400-1415
    # (re-run golden with a tiny shim recording table ops)
    import types
    trace = []
    src_b = blk
    n = len(src_b)

    def rd32(i):
        return int.from_bytes(src_b[i:i + 4], "little")

    hashlog = F.hashlog_for_input(n)
    mflimit = n - F.MFLIMIT
    matchlimit = n - F.LASTLITERALS
    table = [0] * (1 << hashlog)
    table[F.hash4(rd32(0), hashlog)] = 0
    pos = 1
    fh = F.hash4(rd32(1), hashlog)
    anchor = 0
    LOG_LO, LOG_HI = 1380, 1425
    while True:
        fpos = pos
        step = 1
        smn = 1 << F.SKIPTRIGGER
        found = False
        while True:
            h = fh
            if fpos + step > mflimit + 1:
                break
            pos = fpos
            fpos += step
            step = smn >> F.SKIPTRIGGER
            smn += 1
            mpos = table[h]
            fh = F.hash4(rd32(fpos), hashlog)
            table[h] = pos
            if LOG_LO <= pos <= LOG_HI:
                trace.append(("SRCH", pos, h, mpos, rd32(mpos) == rd32(pos)))
            if rd32(mpos) == rd32(pos):
                found = True
                break
        if not found:
            break
        while pos > anchor and mpos > 0 and src_b[pos - 1] == src_b[mpos - 1]:
            pos -= 1
            mpos -= 1
        while True:
            p = pos + F.MINMATCH
            m = mpos + F.MINMATCH
            cl = matchlimit - p
            mc = 0
            while mc < cl and src_b[p + mc] == src_b[m + mc]:
                mc += 1
            if LOG_LO <= pos <= LOG_HI:
                trace.append(("SEQ", anchor, pos, mpos, pos - mpos, mc))
            pos = p + mc
            anchor = pos
            if pos > mflimit:
                break
            h2 = F.hash4(rd32(pos - 2), hashlog)
            table[h2] = pos - 2
            h = F.hash4(rd32(pos), hashlog)
            mpos = table[h]
            table[h] = pos
            if LOG_LO <= pos <= LOG_HI:
                trace.append(("REM", pos, h, h2, mpos, rd32(mpos) == rd32(pos)))
            if rd32(mpos) == rd32(pos):
                continue
            break
        if pos > mflimit:
            break
        pos += 1
        fh = F.hash4(rd32(pos), hashlog)

    print("golden trace:")
    for t in trace:
        print(" ", t)

    # engine single-step
    bs = 4096
    lens = np.full(128, len(blk), np.int32)
    u8 = np.tile(np.frombuffer(blk, np.uint8)[None, :], (128, 1))
    src = LK.pack_tapes(u8, lens)
    sr = 256
    nj = jnp.asarray(lens)[None, :]

    round_j = jax.jit(LE._enc_round, static_argnames=("sr", "accel"))

    z = jnp.zeros((1, 128), jnp.int32)
    st = dict(mode=z + LE.SRCH, fpos=z + 1, step=z + 1,
              smn=z + (1 << F.SKIPTRIGGER),
              pos=z, mpos=z, anchor=z, lit=z, mc=z, d=z, opos=z,
              hk=z, ldone=z, rounds=z)
    tbl = jnp.zeros((LE.TROWS, 128), jnp.int32)
    win_base = 0
    stag = jnp.zeros((sr, 128), jnp.int32)
    names = {0: "SRCH", 1: "PREP", 2: "EXTEND", 3: "EMIT", 4: "HDR",
             5: "LIT", 6: "TAIL", 7: "REMATCH", 8: "FHDR", 9: "FLIT",
             10: "DONE"}
    print("\nengine rounds (lane 0) near pos 1380-1425:")
    for r in range(12000):
        mode0 = int(st["mode"][0, 0])
        pos0 = int(st["pos"][0, 0])
        fpos0 = int(st["fpos"][0, 0])
        opos0 = int(st["opos"][0, 0])
        win_end = win_base + sr * 4
        if opos0 >= win_end:
            # park: new window
            win_base = win_end
            stag = jnp.zeros((sr, 128), jnp.int32)
        interesting = (1380 <= pos0 <= 1425) or (1380 <= fpos0 <= 1425 and mode0 == 0)
        if interesting:
            print(f"  r{r}: mode={names[mode0]} pos={pos0} fpos={fpos0} "
                  f"mpos={int(st['mpos'][0,0])} anchor={int(st['anchor'][0,0])} "
                  f"lit={int(st['lit'][0,0])} mc={int(st['mc'][0,0])} "
                  f"d={int(st['d'][0,0])} step={int(st['step'][0,0])} "
                  f"smn={int(st['smn'][0,0])} opos={opos0}")
        if mode0 == 10 and pos0 > 1425:
            break
        if pos0 > 1460:
            break
        st, stag, tbl = round_j(st, stag, tbl, src, nj, win_base, sr=sr,
                                accel=1)


if __name__ == "__main__":
    main()
