"""Measure compile+run time of _pair_cascade per (sig, C, Np, Nq) on TPU."""
import sys, time

sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

from groot_tpu.align.device_cascade import _pair_cascade


def one(Gs, Pb, Lb, Nb, C, Np, Nq, Lr=160):
    rng = np.random.default_rng(0)
    dev = (
        jnp.asarray(rng.integers(0, 5, (Gs, Pb, Lb), dtype=np.uint8)),
        jnp.asarray(rng.integers(-1, Lb // 2, (Gs, Nb, Pb)).astype(np.int32)),
        jnp.asarray(rng.integers(1, 60, (Gs, Nb)).astype(np.int32)),
        jnp.asarray(np.full((Gs, Pb), Lb // 2, np.int32)),
        jnp.asarray(np.zeros((Gs, Pb), bool)),
    )
    args = (
        jnp.asarray(rng.integers(0, Gs, C).astype(np.int32)),
        jnp.asarray(rng.integers(0, 4, (C, Lr), dtype=np.uint8)),
        jnp.asarray(np.full(C, Lr, np.int32)),
        jnp.asarray(np.sort(rng.integers(0, C, Np)).astype(np.int32)),
        jnp.asarray(np.ones(Np, bool)),
        jnp.asarray(rng.integers(0, Nb, Np).astype(np.int32)),
        jnp.asarray(np.zeros(Np, np.int32)),
        jnp.asarray(np.full(Np, 180, np.int32)),
        jnp.asarray(np.sort(rng.integers(0, Np, Nq)).astype(np.int32)),
        jnp.asarray(rng.integers(0, Nb, Nq).astype(np.int32)),
        jnp.asarray(rng.integers(0, 90, Nq).astype(np.int32)),
    )
    t0 = time.time()
    out = _pair_cascade(*dev, *args)
    _ = np.asarray(out)
    t_compile = time.time() - t0
    t0 = time.time()
    n = 3
    for _ in range(n):
        out = _pair_cascade(*dev, *args)
        _ = np.asarray(out)
    t_run = (time.time() - t0) / n
    print(
        f"sig=({Pb},{Lb},{Nb}) Gs={Gs} C={C} Np={Np} Nq={Nq}: "
        f"compile+first={t_compile:.1f}s run={t_run*1000:.1f}ms",
        flush=True,
    )


if __name__ == "__main__":
    one(394, 16, 2048, 640, 512, 2048, 32768)
    one(151, 16, 1024, 640, 512, 2048, 32768)
    one(4, 256, 2048, 640, 128, 1024, 16384)
    one(11, 64, 2048, 640, 512, 2048, 32768)
    one(23, 16, 4096, 640, 128, 1024, 16384)
