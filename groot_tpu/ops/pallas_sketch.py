"""Fused Pallas read-sketching kernel (hot loop #2).

Computes KHF MinHash sketches of a read batch in one VMEM-resident pass:

  codes u8 [B, L] -> (hi, lo) uint32 [B, s]

fusing canonical ntHash (prefix-XOR scan + rotates), the per-slot multihash
(u64 multiply + xorshift) and the min-reduction, so the [B, nk, s] multihash
tensor never exists in HBM (the XLA path in ops.nthash materialises ~80MB per
4k-read batch; this kernel's working set is one [TB, L] tile).

TPU mapping notes (see /opt/skills/guides/pallas_guide.md):
  * 64-bit values are (hi, lo) uint32 pairs (no x64 on TPU);
  * the seed lookup is 5 where-selects against host-precomputed
    position-rotated seed tables (rortab[m] = ror(seed[base], m mod 64)),
    avoiding in-kernel gathers;
  * the prefix-XOR scan is Hillis-Steele over lanes via pltpu.roll + mask;
  * lane-dependent 64-bit rotates decompose into 6 staged constant-distance
    rotates selected by the bits of the rotate amount;
  * everything runs on the VPU over [TB, L] tiles; grid = B / TB.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from . import nthash, u64

# pallas imports are deferred into the kernel builder: importing
# jax.experimental.pallas costs ~1.7s and the default host sketch path
# never needs it
pl = None
pltpu = None


def _import_pallas():
    global pl, pltpu
    if pl is None:
        from jax.experimental import pallas as _pl
        from jax.experimental.pallas import tpu as _pltpu

        pl, pltpu = _pl, _pltpu

TB = 8  # reads per grid step (sublane tile)


def _rortabs(L: int):
    """Host-precomputed position-rotated seed tables, uint32 pairs [5, L]."""
    m = np.arange(L, dtype=np.uint64) % np.uint64(64)
    with np.errstate(over="ignore"):
        def ror(x, r):
            return np.where(
                r == 0, x, (x >> r) | (x << (np.uint64(64) - r))
            ).astype(np.uint64)

        def rol(x, r):
            return np.where(
                r == 0, x, (x << r) | (x >> (np.uint64(64) - r))
            ).astype(np.uint64)

        fwd = ror(nthash.SEEDS_NP[:, None], m[None, :])      # [5, L] t[m] tables
        rev = rol(nthash.SEEDS_RC_NP[:, None], m[None, :])   # [5, L] u[m] tables
    split = lambda a: (
        (a >> np.uint64(32)).astype(np.uint32),
        (a & np.uint64(0xFFFFFFFF)).astype(np.uint32),
    )
    return split(fwd), split(rev)


def _sel_seed(codes, tab_hi_ref, tab_lo_ref):
    """t[b, m] = tab[codes[b, m], m] via 5 selects against static ref rows
    (row slices are memory loads; value-level fancy indexing would emit a
    gather Mosaic can't lower)."""
    hi = jnp.zeros_like(codes, dtype=jnp.uint32)
    lo = jnp.zeros_like(codes, dtype=jnp.uint32)
    for c in range(5):
        is_c = codes == c
        hi = jnp.where(is_c, tab_hi_ref[c : c + 1, :], hi)
        lo = jnp.where(is_c, tab_lo_ref[c : c + 1, :], lo)
    return hi, lo


def _shift_lanes(x, dist: int):
    """Shift lanes right by dist along axis 1, filling with zeros."""
    L = x.shape[1]
    rolled = pltpu.roll(x, dist, axis=1)
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(lane >= dist, rolled, jnp.uint32(0))


def _prefix_xor(pair, L: int):
    hi, lo = pair
    d = 1
    while d < L:
        hi = hi ^ _shift_lanes(hi, d)
        lo = lo ^ _shift_lanes(lo, d)
        d *= 2
    return hi, lo


def _rol_const(pair, r: int):
    """Constant-distance 64-bit rotate left of a uint32 pair."""
    r %= 64
    hi, lo = pair
    if r == 0:
        return pair
    if r == 32:
        return (lo, hi)
    if r > 32:
        hi, lo = lo, hi
        r -= 32
    return (
        (hi << np.uint32(r)) | (lo >> np.uint32(32 - r)),
        (lo << np.uint32(r)) | (hi >> np.uint32(32 - r)),
    )


def _rol_by_lane(pair, amount):
    """Rotate left by a per-element amount via 6 staged constant rotates."""
    out = pair
    for bit in range(6):
        dist = 1 << bit
        rolled = _rol_const(out, dist)
        take = (amount & np.uint32(dist)) != 0
        out = (
            jnp.where(take, rolled[0], out[0]),
            jnp.where(take, rolled[1], out[1]),
        )
    return out


def _kernel(
    codes_ref, vlen_ref, fhi_ref, flo_ref, rhi_ref, rlo_ref,
    out_hi_ref, out_lo_ref, *, k: int, s: int, mults,
):
    codes = codes_ref[:].astype(jnp.int32)  # [TB, L]
    L = codes.shape[1]
    nk = L - k + 1
    FULL = jnp.uint32(0xFFFFFFFF)

    t = _sel_seed(codes, fhi_ref, flo_ref)
    u_ = _sel_seed(codes, rhi_ref, rlo_ref)
    X = _prefix_xor(t, L)
    Y = _prefix_xor(u_, L)

    # window xor over lanes: W[i] = X[i+k-1] ^ X[i-1] (lane i holds k-mer i)
    def window(pair):
        hi, lo = pair
        # lane i <- X[i+k-1]; pltpu.roll requires non-negative shifts, so
        # roll by L-(k-1) (mod-L equivalent of -(k-1))
        whi = pltpu.roll(hi, L - (k - 1), axis=1)
        wlo = pltpu.roll(lo, L - (k - 1), axis=1)
        phi = _shift_lanes(hi, 1)                # lane i <- X[i-1]
        plo = _shift_lanes(lo, 1)
        return (whi ^ phi, wlo ^ plo)

    wx = window(X)
    wy = window(Y)
    lane = jax.lax.broadcasted_iota(jnp.uint32, codes.shape, 1)
    fwd = _rol_by_lane(wx, (lane + np.uint32(k - 1)) & np.uint32(63))
    rev = _rol_by_lane(wy, (np.uint32(64) - (lane & np.uint32(63))) & np.uint32(63))
    c = u64.minimum(fwd, rev)

    # mask invalid k-mer lanes (ragged reads + the k-1 tail lanes)
    nk_valid = jnp.maximum(vlen_ref[:] - np.int32(k - 1), 0)  # [TB, 1]
    valid = lane.astype(jnp.int32) < nk_valid
    c = (jnp.where(valid, c[0], FULL), jnp.where(valid, c[1], FULL))

    # per-slot multihash + min-reduce, one slot at a time (VMEM-resident).
    # Mosaic has no unsigned reductions: min in sign-flipped int32 space
    # (x ^ 0x8000_0000 bitcast to int32 preserves unsigned order).
    SGN = jnp.uint32(0x80000000)

    def umin_rows(x):  # uint32 [TB, L] -> uint32 [TB, 1]
        xs = jax.lax.bitcast_convert_type(x ^ SGN, jnp.int32)
        m = jnp.min(xs, axis=1, keepdims=True)
        return jax.lax.bitcast_convert_type(m, jnp.uint32) ^ SGN

    for slot in range(s):
        if slot == 0:
            h = c
        else:
            h = u64.mul(c, (jnp.uint32(mults[slot] >> 32),
                            jnp.uint32(mults[slot] & 0xFFFFFFFF)))
            h = u64.xor(h, u64.shr(h, nthash.MULTISHIFT))
            h = (jnp.where(valid, h[0], FULL), jnp.where(valid, h[1], FULL))
        mhi = umin_rows(h[0])  # [TB, 1]
        big_lo = jnp.where(h[0] == mhi, h[1], FULL)
        mlo = umin_rows(big_lo)
        out_hi_ref[:, slot : slot + 1] = mhi
        out_lo_ref[:, slot : slot + 1] = mlo


_ON_TPU = None


def _on_accel() -> bool:
    """Cached accelerator check: jax.default_backend() takes the (axon)
    client lock, which deadlocks when an ingest worker thread asks while
    the main thread is in dispatch/drain — resolve it once, on the main
    thread, and never again."""
    global _ON_TPU
    if _ON_TPU is None:
        _ON_TPU = jax.default_backend() not in ("cpu", "METAL")
    return _ON_TPU


def sketch_reads(codes, valid_len, k: int, s: int, prescreen=None):
    """Batch sketching with automatic backend dispatch. Default is the
    batched host path (numpy prefix-XOR scans, ~0.1s per 4k reads): the
    single-chip read stream is host-fed anyway, so a host sketch removes
    the per-process device compile from the critical path entirely.
    GROOT_DEVICE_SKETCH=1 selects the fused Pallas kernel on TPU (the
    multi-chip fused step always sketches on device, parallel/device_index).
    Pads B to the tile size and L to the lane width as needed."""
    import os as _os

    import numpy as _np

    on_tpu = _on_accel()
    if not (on_tpu and _os.environ.get("GROOT_DEVICE_SKETCH")):
        from ..io import native as _native

        u = _native.sketch(
            _np.asarray(codes), _np.asarray(valid_len), k, s,
            prescreen=prescreen,
        )
        if u is None:
            u = nthash.khf_sketch_np_batch(
                _np.asarray(codes), _np.asarray(valid_len), k, s
            )
        return (
            (u >> _np.uint64(32)).astype(_np.uint32),
            (u & _np.uint64(0xFFFFFFFF)).astype(_np.uint32),
        )
    B, L = codes.shape
    Bp = -(-B // TB) * TB
    Lp = -(-L // 128) * 128
    if (Bp, Lp) != (B, L):
        padded = _np.full((Bp, Lp), 4, _np.uint8)
        padded[:B, :L] = codes
        vl = _np.zeros(Bp, _np.int32)
        vl[:B] = valid_len
        codes, valid_len = padded, vl
    hi, lo = khf_sketch_pallas(jnp.asarray(codes), jnp.asarray(valid_len), k, s)
    return hi[:B], lo[:B]


def sketch_reads_u64(codes, valid_len, k: int, s: int, prescreen=None):
    """Batch sketching straight to the native sketcher's u64 [B, s] output
    (None when the native library is unavailable or device sketching was
    forced — callers fall back to sketch_reads). Skips the hi/lo split
    that sketch_reads performs for the device-facing API; pair with
    query_batch_np(q64=...) to avoid the recombination pass too."""
    import os as _os

    import numpy as _np

    on_tpu = _on_accel()
    if on_tpu and _os.environ.get("GROOT_DEVICE_SKETCH"):
        return None
    from ..io import native as _native

    return _native.sketch(
        _np.asarray(codes), _np.asarray(valid_len), k, s, prescreen=prescreen
    )


@partial(jax.jit, static_argnames=("k", "s", "interpret"))
def khf_sketch_pallas(codes, valid_len, k: int, s: int, interpret: bool = False):
    """codes u8 [B, L], valid_len i32 [B] -> (hi, lo) uint32 [B, s]."""
    _import_pallas()
    B, L = codes.shape
    assert B % TB == 0, "batch must be a multiple of the tile size"
    (fhi, flo), (rhi, rlo) = _rortabs(L)
    with np.errstate(over="ignore"):
        kseed = np.uint64(np.uint64(k) * np.uint64(nthash.MULTISEED))
        mults = tuple(int(np.uint64(i) ^ kseed) for i in range(s))

    kernel = partial(_kernel, k=k, s=s, mults=mults)
    grid = (B // TB,)
    out_hi, out_lo = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TB, L), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((5, L), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((5, L), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((5, L), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((5, L), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((TB, s), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, s), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, s), jnp.uint32),
            jax.ShapeDtypeStruct((B, s), jnp.uint32),
        ),
        interpret=interpret,
    )(
        codes,
        valid_len.astype(jnp.int32)[:, None],
        jnp.asarray(fhi),
        jnp.asarray(flo),
        jnp.asarray(rhi),
        jnp.asarray(rlo),
    )
    return out_hi, out_lo
