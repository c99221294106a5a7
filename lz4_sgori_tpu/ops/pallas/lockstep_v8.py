"""Lane-lockstep LZ4 decoder v8: the v7 machine behind HBM-resident tapes.

Lifts the lockstep decoder's VMEM block-size cap (v7 holds every lane's
comp + full output in VMEM: 256 KiB blocks are ~32 MB; 1-4 MiB would be
128-512 MB). v8 keeps the v7 hot-ring round (`lockstep_v7._round`,
byte-identical semantics) and changes only where the tapes live:

  * comp + out stay in HBM (memory_space ANY); the kernel DMAs comp
    forward into a VMEM COMP RING (incremental 1 MiB pieces — every
    comp byte crosses HBM->VMEM once) and parses from it; lanes whose
    ip runs past the resident window park until the ring advances
    (`run_ok`), so arbitrarily divergent lanes stay correct.
  * flushes are DMA read-modify-writes: read the out slab, blend each
    lane's flushed ring rows over it, write it back — other lanes'
    columns (including finished lanes') are preserved unconditionally,
    so no cross-lane frontier-spread constraint exists.
  * every blended slab also lands in a VMEM HISTORY RING (last 128 KiB
    of each lane's committed rows, per-lane validity); the far-match
    service scans it instead of the out tape, which keeps far reads
    VMEM-resident: a lane's far source is always >= fl*4 - 65535, well
    inside its own history span.

The fio envelope's top block sizes (512 KiB-4 MiB, test_4m.fio) decode
on this kernel; <= 256 KiB blocks keep the pure-VMEM v7 path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import lockstep as LK
from .lockstep import CAP, CAPW, FR, _bcast, _iota_rows, byteshift_up, \
    rotate_up
from .lockstep_v4 import BAND, LW, RESERVE
from .lockstep_v6 import BIG, FH
from .lockstep_v7 import (DONE, HOT, HOT_D, HSPAN, MATCH, _round,
                          transfer_frames)

LANES = LK.LANES
CRING = 32768          # comp ring rows (16 MB): resident comp window
CCH = 2048             # comp DMA piece rows (1 MiB; CRING % CCH == 0)
HR = 32768             # history ring rows (128 KiB span per lane, 16 MB)
FROWS = 32


def extract_rows_ring(ref, row0, w: int, lim_rows, nslab_log: int):
    """Per-lane row window from a VMEM ring ref: out[i, L] =
    ref[(row0[L] + i) mod R, L] for absolute rows in [0, lim_rows),
    0 outside. R = nslab * BAND with nslab = 1 << nslab_log. Banded
    walk over absolute slab indices [min, max] — cost scales with the
    cross-lane span, slot = slab mod nslab."""
    blog = BAND.bit_length() - 1
    K = -(-(w + BAND - 1) // BAND)
    b_idx = row0 >> blog
    b_lo = jnp.min(b_idx)
    b_hi = jnp.max(b_idx) + K
    regs = [jnp.zeros((BAND, LANES), jnp.int32) for _ in range(K)]
    nmask = (1 << nslab_log) - 1

    def body(b, regs):
        bc = jnp.maximum(b, 0) & nmask
        slab = ref[pl.ds(bc << blog, BAND), :]
        return tuple(
            jnp.where(_bcast(b_idx == b - k, BAND), slab, regs[k])
            for k in range(K))

    regs = jax.lax.fori_loop(b_lo, b_hi, body, tuple(regs))
    win = jnp.concatenate(regs, axis=0)
    out = rotate_up(win, row0 - (b_idx << blog), K * BAND)[:w]
    absr = _bcast(row0, w) + _iota_rows(w)
    return jnp.where((absr >= 0) & (absr < _bcast(lim_rows, w)), out, 0)


def extract_bytes_ring(ref, bytepos, w: int, lim_rows, nslab_log: int):
    win = extract_rows_ring(ref, bytepos >> 2, w + 1, lim_rows, nslab_log)
    return byteshift_up(win, bytepos & 3)[:w]


def _kernel(comp_ref, clen_ref, olen_ref, out_ref, len_ref, err_ref,
            loc_ref, locb_ref, scr_ref, fl_ref, cring_ref, hist_ref,
            fslab_ref, stg_ref, sbounds_ref, chi_ref, sem, *,
            CR: int, OR: int, sr: int,
            unroll: int = 4, transfers: int = 2,
            debug_rounds: bool = False):
    g = pl.program_id(0)
    clen = clen_ref[0]
    olen = olen_ref[0]

    z = clen * 0
    st = dict(mode=z, ip=z, op=z, hb=z, lit=z, mlen=z, acc=z, ml0=z,
              d=z, rounds=z)
    LWU = 1 << (LW * unroll - 1).bit_length()
    locb_ref[...] = z - LWU * 8
    fl_ref[...] = z
    chi_ref[0] = 0
    max_rounds = jnp.int32(4 * (CR + OR) + 4096)
    blog = BAND.bit_length() - 1
    fhlog = FH.bit_length() - 1
    rspan = sr * 4
    nclog = (CRING // BAND).bit_length() - 1
    nhlog = (HR // BAND).bit_length() - 1

    def advance_cring(hi_t):
        """DMA comp rows [chi, hi_t) into the ring, CCH rows at a time
        (static piece size; hi stays CCH-aligned so pieces never wrap
        mid-piece)."""
        for _ in range(CRING // CCH):
            hi = chi_ref[0]

            @pl.when(hi < hi_t)
            def _piece(hi=hi):
                dma = pltpu.make_async_copy(
                    comp_ref.at[g, pl.ds(hi, CCH), :],
                    cring_ref.at[pl.ds(hi & (CRING - 1), CCH), :],
                    sem)
                dma.start()
                dma.wait()
                chi_ref[0] = hi + CCH

    def flush_dma(stag, fl, nfl, byte_lim=None):
        """DMA read-modify-write flush of every lane's ring rows
        [fl, fl+nfl) to the out tape + the per-lane-masked history
        mirror. Each slab visit costs ~us of DMA round trip, so this
        walks PER-LANE slab ranges (visits scale with rows actually
        flushed, not with the fleet's frontier spread): lane L's bounds
        come from an SMEM mirror of fl/nfl, and consecutive lanes with
        an identical range (same-cost groups cluster) are deduped
        against the previous lane's interval."""
        nb = sr // BAND

        def rmw(b, _):
            bc = jnp.minimum(b << blog, jnp.int32(OR - BAND))
            rd = pltpu.make_async_copy(
                out_ref.at[g, pl.ds(bc, BAND), :], fslab_ref, sem)
            rd.start()
            ringslab = jnp.zeros((BAND, LANES), jnp.int32)
            for s in range(nb):
                ringslab = jnp.where(
                    _bcast(b & (nb - 1) == s, BAND),
                    stag[s * BAND:(s + 1) * BAND], ringslab)
            absr = _bcast(b << blog, BAND) + _iota_rows(BAND)
            m = (absr >= _bcast(fl, BAND)) & (absr < _bcast(fl + nfl, BAND))
            if byte_lim is not None:
                bm = jnp.zeros((BAND, LANES), jnp.int32)
                for kk in range(4):
                    inb = absr * 4 + kk < _bcast(byte_lim, BAND)
                    bm = bm | jnp.where(inb, jnp.int32(255 << (8 * kk))
                                        if kk < 3 else jnp.int32(-(1 << 24)),
                                        0)
                ringslab = ringslab & bm
            rd.wait()
            new = jnp.where(m, ringslab, fslab_ref[...])
            fslab_ref[...] = new
            # history mirror is PER-LANE masked: only a lane's own
            # flushed rows may touch its history column — an unmasked
            # write would let a leader's walk clobber a laggard's slots
            # with that laggard's (unflushed, garbage) out content
            # whenever lanes sit > HR rows apart (mod-HR aliasing).
            hslot = ((bc >> blog) & ((1 << nhlog) - 1)) << blog
            hcur = hist_ref[pl.ds(hslot, BAND), :]
            hist_ref[pl.ds(hslot, BAND), :] = jnp.where(m, new, hcur)
            wr = pltpu.make_async_copy(
                fslab_ref, out_ref.at[g, pl.ds(bc, BAND), :], sem)
            wr.start()
            wr.wait()
            return _

        # mirror per-lane bounds into SMEM ((8,128): 1-sublane DMAs
        # hardware-fault — the block must be a full int32 tile)
        stg_ref[0:1, :] = fl
        stg_ref[1:2, :] = fl + nfl
        cp = pltpu.make_async_copy(stg_ref, sbounds_ref, sem)
        cp.start()
        cp.wait()

        def lane(li, prev):
            plo, phi = prev
            lo = sbounds_ref[0, li] >> 6
            hi = (sbounds_ref[1, li] + BAND - 1) >> 6
            hi = jnp.where(lo >= hi, lo, hi)         # empty range
            # dedupe against the previous lane's interval
            start = jnp.where((lo >= plo) & (hi <= phi), hi,      # nested
                              jnp.where((lo >= plo) & (lo < phi), phi,
                                        lo))                      # overlap
            jax.lax.fori_loop(start, hi, rmw, 0)
            return lo, hi

        jax.lax.fori_loop(0, LANES, lane, (jnp.int32(0), jnp.int32(0)))

    def cond(c):
        st, _stag, _hot = c
        return jnp.any(st["mode"] < DONE) & jnp.all(
            st["rounds"] < max_rounds)

    def body(c):
        st, stag, hot = c
        fl = fl_ref[...]
        mode, ip, op, d = st["mode"], st["ip"], st["op"], st["d"]
        hb = st["hb"]
        live = mode < DONE

        # ---- comp ring advance + in-window parking ----
        ip_lo = jnp.min(jnp.where(live, ip, BIG))
        hi_t = jnp.minimum(
            jnp.int32(CR),
            (((ip_lo >> 2) >> 11) << 11) + CRING)    # CCH=2048-aligned
        advance_cring(hi_t)
        hi = chi_ref[0]
        # fully-loaded ring (hi == CR) always qualifies: the refill
        # extraction zero-masks rows past hi, so a lane whose tail sits
        # within a parse window of the PADDED tape end must not wait
        # for ring rows that will never exist (1 MiB livelock: the
        # largest-clen lane parked forever when CR*4 - clen < LWU*4)
        in_win = (ip + LWU * 4 + 8 <= hi * 4) | (hi >= CR)
        run_ok = in_win

        # ---- batched round-start decisions ----
        t = ip - locb_ref[...]
        r_need = live & in_win & (t > LWU * 4 - unroll * RESERVE)
        far_wait = live & (mode == MATCH) & (d > HOT_D)
        flushed_ok = (op - d + 4 * CAPW) <= fl * 4
        served = far_wait & flushed_ok
        f_need = (live & (hb + (transfers + 1) * 128 > fl * 4 + rspan)) \
            | (far_wait & ~flushed_ok)
        packed = jnp.sum(r_need.astype(jnp.int32)
                         + (served.astype(jnp.int32) << 8)
                         + (f_need.astype(jnp.int32) << 16))
        ipc = jnp.where(live & in_win, ip, ip_lo)
        src_f = jnp.where(served, op - d, BIG)
        far_lo = jnp.min(src_f)
        scan_src = jnp.where(served, op - d, far_lo)
        hbr = hb >> 2
        nfl = jnp.maximum(((hbr - fl) >> fhlog) << fhlog, 0)

        @pl.when((packed & 255) != 0)
        def _refill():
            loc_ref[...] = extract_bytes_ring(
                cring_ref, ipc, LWU, hi, nclog)
            locb_ref[...] = ipc

        @pl.when(((packed >> 16) & 255) != 0)
        def _do_flush():
            flush_dma(stag, fl, nfl)
            fl_ref[...] = fl + nfl

        @pl.when(((packed >> 8) & 255) != 0)
        def _far_read():
            # per-lane history validity: rows below the lane's own
            # flush frontier (the wrapper re-reads fl post-flush)
            scr_ref[...] = extract_bytes_ring(
                hist_ref, scan_src, CAPW, fl_ref[...], nhlog)

        fl2 = fl_ref[...]
        hb2 = hb
        for _ in range(transfers):
            elig = (op - hb2 >= 128) & (fl2 >= (hb2 >> 2) + FROWS - sr)
            stag, hb2 = transfer_frames(stag, hot, hb2, elig)
        st = dict(st)
        st["hb"] = hb2

        none = served != served
        cur = (st, stag, hot)
        for u in range(unroll):
            stx, stagx, hotx = cur
            stx, stagx, hotx = _round(stx, stagx, hotx, fl2,
                                      served if u == 0 else none,
                                      loc_ref[...], locb_ref[...],
                                      scr_ref[...], clen, olen,
                                      run_ok=run_ok)
            cur = (stx, stagx, hotx)
        return cur

    st, stag, hot = jax.lax.while_loop(
        cond, body, (st, _bcast(z, sr), _bcast(z, HOT)))

    # ---- drain + final flush (byte_lim zeroes past op) ----
    def drain(i, c):
        st, stag = c
        hb = st["hb"]
        fl = fl_ref[...]
        hbr = hb >> 2
        nfl = jnp.maximum(((hbr - fl) >> fhlog) << fhlog, 0)
        flush_dma(stag, fl, nfl)
        fl_ref[...] = fl + nfl
        elig = (st["hb"] < st["op"]) \
            & (fl + nfl >= ((st["hb"] >> 2) + FROWS - sr))
        stag, hb = transfer_frames(stag, hot, st["hb"], elig)
        st = dict(st)
        st["hb"] = hb
        return st, stag

    st, stag = jax.lax.fori_loop(0, HOT // FROWS + 1, drain, (st, stag))
    fl = fl_ref[...]
    nfl = jnp.int32(OR) - fl
    flush_dma(stag, fl, nfl, byte_lim=st["op"])
    err = (st["mode"] != DONE).astype(jnp.int32)
    len_ref[0] = jnp.where(err != 0, 0, st["op"])
    err_ref[0] = st["rounds"] if debug_rounds else err


@functools.partial(jax.jit,
                   static_argnames=("out_size", "sr", "unroll", "interpret",
                                    "sort", "transfers", "debug_rounds"))
def decompress_blocks_lockstep_v8(comp, comp_len, out_size: int,
                                  sr: int = 2048, unroll: int = 4,
                                  interpret: bool = False,
                                  sort: bool = True,
                                  sort_key=None,
                                  transfers: int = 2,
                                  debug_rounds: bool = False):
    """Decode a batch of independent LZ4 blocks (v8 HBM-tape engine).

    Same contract as decompress_blocks_lockstep_v7; intended for block
    sizes beyond the VMEM engines' residency (512 KiB - 4 MiB, the fio
    envelope's top; /root/reference/test/fio_tests/test_4m.fio).
    """
    comp = jnp.asarray(comp, jnp.uint8)
    comp_len = jnp.asarray(comp_len, jnp.int32)
    nb, slot = comp.shape
    out_cap = -(-max(out_size, 1) // (4 * BAND)) * (4 * BAND)
    ng = -(-nb // LANES)
    pad = ng * LANES - nb
    if pad:
        comp = jnp.pad(comp, ((0, pad), (0, 0)))
        comp_len = jnp.pad(comp_len, (0, pad), constant_values=1)
        comp = comp.at[nb:, 0].set(0)
    if sort and ng > 1:
        key = comp_len if sort_key is None else \
            jnp.asarray(sort_key, jnp.int32)
        if sort_key is not None and pad:
            key = jnp.pad(key, (0, pad))
        order = jnp.argsort(key)
        inv = jnp.argsort(order)
        comp = comp[order]
        comp_len = comp_len[order]
    g8 = comp.reshape(ng, LANES, slot)
    gl = comp_len.reshape(ng, LANES)
    tapes = jax.vmap(LK.pack_tapes)(g8, gl)
    cr = tapes.shape[1]
    if cr % CCH:
        tapes = jnp.pad(tapes, ((0, 0), (0, CCH - cr % CCH), (0, 0)))
        cr = tapes.shape[1]
    orr = out_cap // 4
    olen = jnp.full((ng, 1, LANES), out_size, jnp.int32)
    clen2 = gl.reshape(ng, 1, LANES)

    LWU = 1 << (LW * unroll - 1).bit_length()
    out, out_len, err = pl.pallas_call(
        functools.partial(_kernel, CR=cr, OR=orr, sr=sr, unroll=unroll,
                          transfers=transfers, debug_rounds=debug_rounds),
        grid=(ng,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),       # comp (HBM)
            pl.BlockSpec((1, 1, LANES), lambda g: (g, 0, 0)),
            pl.BlockSpec((1, 1, LANES), lambda g: (g, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),       # out (HBM)
            pl.BlockSpec((1, 1, LANES), lambda g: (g, 0, 0)),
            pl.BlockSpec((1, 1, LANES), lambda g: (g, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((ng, orr, LANES), jnp.int32),
            jax.ShapeDtypeStruct((ng, 1, LANES), jnp.int32),
            jax.ShapeDtypeStruct((ng, 1, LANES), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((LWU, LANES), jnp.int32),        # loc
            pltpu.VMEM((1, LANES), jnp.int32),          # locb
            pltpu.VMEM((CAPW, LANES), jnp.int32),       # scr
            pltpu.VMEM((1, LANES), jnp.int32),          # fl
            pltpu.VMEM((CRING, LANES), jnp.int32),      # comp ring
            pltpu.VMEM((HR, LANES), jnp.int32),         # history ring
            pltpu.VMEM((BAND, LANES), jnp.int32),       # flush RMW slab
            pltpu.VMEM((8, LANES), jnp.int32),          # bounds staging
            pltpu.SMEM((8, LANES), jnp.int32),          # bounds (scalars)
            pltpu.SMEM((1,), jnp.int32),                # comp ring high
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
    )(tapes, clen2, olen)

    data = jax.vmap(LK.unpack_tapes)(out)
    data = data.reshape(ng * LANES, out_cap)
    out_len = out_len.reshape(-1)
    err = err.reshape(-1)
    if sort and ng > 1:
        data = data[inv]
        out_len = out_len[inv]
        err = err[inv]
    if debug_rounds:
        return data[:nb, :out_size], out_len[:nb], err[:nb]
    return (data[:nb, :out_size], out_len[:nb], err[:nb].astype(bool))
