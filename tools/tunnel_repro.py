#!/usr/bin/env python
"""Minimal repro + mitigation matrix for the axon repeat-dispatch stall.

Round-3 finding (tools/device_step_bench.py): through the tunnelled TPU,
the FIRST execution of a jitted program returns promptly but REPEAT
executions of the same compiled program stall for minutes. This tool
isolates that with the smallest possible program and tries each obvious
mitigation in its own subprocess-friendly mode so a hang in one mode
doesn't block the rest:

  plain      jit(f)(x) in a loop, fresh host numpy input each step
  resident   inputs jax.device_put once, reused every step
  donate     donate_argnums on a (x -> x-shaped) step, chained output->input
  scan       K inner steps fused with lax.scan per dispatch
  async      2-deep dispatch queue, block on step i-2 only
  nosync     no D2H at all until the very end (block only once)

Usage: python tools/tunnel_repro.py MODE [--steps 8] [--size 1024]
       [--timeout 60]

Each step prints its wall time immediately (line-buffered) so a stalled
step is visible before any timeout kills the process.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=[
        "plain", "resident", "donate", "scan", "async", "nosync"])
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--size", type=int, default=1024)
    ap.add_argument("--scan-k", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    cache_dir = os.path.expanduser("~/.cache/groot_tpu/jax")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    n = args.size
    print(f"# mode={args.mode} backend={jax.default_backend()} size={n}",
          flush=True)

    def f(x):
        # one matmul + elementwise: tiny but unmistakably device work
        return jnp.tanh(x @ x) * 1.0001

    rng = np.random.default_rng(0)
    x_host = rng.standard_normal((n, n), dtype=np.float32)

    if args.mode == "plain":
        step = jax.jit(f)
        t0 = time.time()
        y = step(x_host)
        jax.block_until_ready(y)
        print(f"# compile+first {time.time()-t0:.2f}s", flush=True)
        for i in range(args.steps):
            t0 = time.time()
            y = step(x_host)
            jax.block_until_ready(y)
            print(f"step {i}: {time.time()-t0:.3f}s", flush=True)

    elif args.mode == "resident":
        step = jax.jit(f)
        x = jax.device_put(x_host)
        t0 = time.time()
        y = step(x)
        jax.block_until_ready(y)
        print(f"# compile+first {time.time()-t0:.2f}s", flush=True)
        for i in range(args.steps):
            t0 = time.time()
            y = step(x)
            jax.block_until_ready(y)
            print(f"step {i}: {time.time()-t0:.3f}s", flush=True)

    elif args.mode == "donate":
        step = jax.jit(f, donate_argnums=(0,))
        x = jax.device_put(x_host)
        t0 = time.time()
        x = step(x)
        jax.block_until_ready(x)
        print(f"# compile+first {time.time()-t0:.2f}s", flush=True)
        for i in range(args.steps):
            t0 = time.time()
            x = step(x)
            jax.block_until_ready(x)
            print(f"step {i}: {time.time()-t0:.3f}s", flush=True)

    elif args.mode == "scan":
        K = args.scan_k

        @jax.jit
        def step(x):
            def body(c, _):
                return f(c), ()
            out, _ = jax.lax.scan(body, x, None, length=K)
            return out

        x = jax.device_put(x_host)
        t0 = time.time()
        y = step(x)
        jax.block_until_ready(y)
        print(f"# compile+first {time.time()-t0:.2f}s ({K} inner steps)",
              flush=True)
        for i in range(args.steps):
            t0 = time.time()
            y = step(x)
            jax.block_until_ready(y)
            dt = time.time() - t0
            print(f"step {i}: {dt:.3f}s ({dt/K*1e3:.1f} ms/inner)",
                  flush=True)

    elif args.mode == "async":
        step = jax.jit(f)
        x = jax.device_put(x_host)
        t0 = time.time()
        y = step(x)
        jax.block_until_ready(y)
        print(f"# compile+first {time.time()-t0:.2f}s", flush=True)
        from collections import deque
        q = deque()
        for i in range(args.steps):
            t0 = time.time()
            q.append(step(x))
            if len(q) > 2:
                jax.block_until_ready(q.popleft())
            print(f"step {i}: {time.time()-t0:.3f}s (dispatch)", flush=True)
        t0 = time.time()
        jax.block_until_ready(list(q))
        print(f"drain: {time.time()-t0:.3f}s", flush=True)

    elif args.mode == "nosync":
        step = jax.jit(f)
        x = jax.device_put(x_host)
        t0 = time.time()
        y = step(x)
        jax.block_until_ready(y)
        print(f"# compile+first {time.time()-t0:.2f}s", flush=True)
        t0 = time.time()
        ys = []
        for i in range(args.steps):
            ys.append(step(x))
        print(f"dispatch all: {time.time()-t0:.3f}s", flush=True)
        t0 = time.time()
        jax.block_until_ready(ys)
        dt = time.time() - t0
        print(f"drain all: {dt:.3f}s ({dt/args.steps*1e3:.1f} ms/step)",
              flush=True)

    return 0


if __name__ == "__main__":
    sys.exit(main())
