#!/usr/bin/env python3
"""Microbenchmark: does packed bf16 elementwise math beat f32 on the VPU?

The intersection kernels are VPU-flop-bound (ARCHITECTURE.md: within
~2x of the flops floor). If Mosaic lowers bf16 elementwise chains to
packed 2-per-lane ops, a bf16 coarse intersection prefilter could halve
kernel time; if bf16 runs at f32 rate, the idea is dead. This measures
exactly the plane+edge op mix (mul/add/compare/select) per dtype.

Run on TPU: python tools/microbench_bf16.py

Findings on v5e through the axon tunnel (2026-08-17):
- Mosaic DOES pack bf16 2-per-lane (vector<8x128x2xbf16>) but rejects
  packed-bf16 comparisons ("Target does not support this comparison"),
  so the intersection kernels' compare/select mix cannot stay in bf16.
- Sub-millisecond per-call timings through the tunnel are NOT
  trustworthy: repeated or even chained dispatches report rates far
  above both the VPU and HBM speed-of-light. Treat relative numbers
  from this tool with suspicion unless each call is several ms.
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS, COLS = 256, 1024      # per-program tile
GRID = 8                    # programs per call (small: keep HBM traffic
                            # negligible so the chain is ALU-bound)
STEPS = 128                 # op-chain repeats inside the kernel


def _kernel(a_ref, b_ref, o_ref, *, dtype):
    # Pure mul/add chain: v5e Mosaic packs bf16 2-per-lane
    # (vector<8x128x2xbf16>) but rejects packed-bf16 comparisons
    # ("Target does not support this comparison"), so the measurable
    # question is arithmetic-only throughput.
    a = a_ref[...]
    b = b_ref[...]
    acc = jnp.zeros_like(a)
    for _ in range(STEPS):
        # 8 VPU mul/add ops per element per step.
        t = a * b + acc
        u = t * a - b
        v = u * b + t
        acc = v * a - u
    o_ref[...] = acc


def bench(dtype, iters=200):
    kern = functools.partial(_kernel, dtype=dtype)
    call = pl.pallas_call(
        kern,
        grid=(GRID,),
        in_specs=[pl.BlockSpec((ROWS, COLS), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec((ROWS, COLS), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ROWS * GRID, COLS), dtype),
    )
    f = jax.jit(call)
    k = jax.random.PRNGKey(0)
    a = jax.random.uniform(k, (ROWS * GRID, COLS), jnp.float32
                           ).astype(dtype) * 0.1 + 0.9
    b = (a * 0.5).astype(dtype)
    f(a, b).block_until_ready()
    # Chain each call's output into the next call's input: identical
    # (executable, args) pairs can be served from a cache by the runtime
    # layer, which makes repeated f(a, b) timings meaningless.
    t0 = time.perf_counter()
    out = a
    for _ in range(iters):
        out = f(out, b)
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / iters
    ops = ROWS * GRID * COLS * STEPS * 8
    return dt * 1e3, ops / dt / 1e12


def main():
    for dtype in (jnp.float32, jnp.bfloat16):
        ms, tops = bench(dtype)
        print(f"{jnp.dtype(dtype).name:9s}: {ms:7.3f} ms/call  "
              f"{tops:6.2f} Tops/s")


if __name__ == "__main__":
    sys.exit(main())
