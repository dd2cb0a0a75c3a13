"""Measure compile+run time of _device_cascade_g per (sig, G, Mx) on TPU."""
import sys, time

sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

from groot_tpu.align.device_cascade import _device_cascade_g, RB, CN

def one(Gs, Pb, Lb, Nb, G, Mx, Lr=160):
    rng = np.random.default_rng(0)
    dev = (
        jnp.asarray(rng.integers(0, 5, (Gs, Pb, Lb), dtype=np.uint8)),
        jnp.asarray(np.full((Gs, Nb, Pb), -1, np.int32)),
        jnp.asarray(np.zeros((Gs, Nb), np.int32)),
        jnp.asarray(np.full((Gs, Pb), Lb // 2, np.int32)),
        jnp.asarray(np.zeros((Gs, Pb), bool)),
    )
    args = (
        jnp.asarray(np.zeros(G, np.int32)),
        jnp.asarray(rng.integers(0, 4, (G, RB, Lr), dtype=np.uint8)),
        jnp.asarray(np.full((G, RB), Lr, np.int32)),
        jnp.asarray(np.zeros((G, RB, Mx), bool)),
        jnp.asarray(np.full((G, RB, Mx), Nb - 1, np.int32)),
        jnp.asarray(np.zeros((G, RB, Mx), np.int32)),
        jnp.asarray(np.full((G, RB, Mx), -1, np.int32)),
        jnp.asarray(np.full((G, RB, Mx, CN), Nb - 1, np.int32)),
    )
    t0 = time.time()
    out = _device_cascade_g(*dev, *args)
    out.block_until_ready()
    t_compile = time.time() - t0
    t0 = time.time()
    for _ in range(3):
        out = _device_cascade_g(*dev, *args)
    out.block_until_ready()
    t_run = (time.time() - t0) / 3
    print(f"sig=({Pb},{Lb},{Nb}) Gs={Gs} G={G} Mx={Mx}: "
          f"compile+first={t_compile:.1f}s run={t_run*1000:.1f}ms", flush=True)

if __name__ == "__main__":
    Gs = 32
    for (Pb, Lb, G, Mx) in [
        (16, 2048, 8, 16),
        (16, 2048, 32, 16),
        (16, 2048, 128, 16),
    ]:
        one(Gs, Pb, Lb, 640, G, Mx)
