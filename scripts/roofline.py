"""Measure this chip's achievable HBM bandwidth and VPU vector-op rate,
then derive the megastep kernel's speed-of-light (STATUS.md roofline).

Three microbenchmarks, all with forced device_get readback (the
tunneled backend's block_until_ready can lie):

1. HBM copy bandwidth: y = x + 1.0 over a 1 GB f32 array (reads 1 GB,
   writes 1 GB; the canonical stream triad-lite).
2. VPU fma rate: a Pallas kernel that runs a long dependency-broken
   chain of vector fmas on [8, 128]-tile registers resident in VMEM —
   no HBM traffic in the timed loop beyond one tile in/out.
3. The megastep kernel phase times (reuses profile_kernel_split's
   numbers if run separately).

Usage: python scripts/roofline.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from marl_hideandseek_tpu.utils.runtime import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timed(fn, *args, iters=20):
    out = fn(*args)
    jax.block_until_ready(out)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def hbm_bw():
    n = 256 * 1024 * 1024  # 1 GB f32
    x = jnp.zeros((n,), jnp.float32)
    f = jax.jit(lambda x: x + 1.0)
    dt = timed(f, x)
    gb = 2 * n * 4 / 1e9
    print(f"HBM copy: {dt * 1e3:8.2f} ms for {gb:.1f} GB moved "
          f"-> {gb / dt:6.1f} GB/s")
    return gb / dt


def vpu_rate():
    # K independent single-vreg accumulators, kept REGISTER-resident
    # ([8, 128] f32 = one vreg each; a [256, 128] tile per accumulator
    # would be 32 vregs x 8 accs = 256 live vregs and Mosaic spills the
    # chain to VMEM — that variant measures spill bandwidth, ~0.2
    # vreg-fma/cycle, not the ALU). UNROLL fmas per fori_loop
    # iteration amortize the loop bookkeeping.
    LANE = 128
    ROWS = 8            # one f32 vreg per accumulator
    K = 8               # independent accumulators (break the dep chain)
    UNROLL = 64         # K-wide fma groups per loop iteration
    REPS = 2048         # loop iterations

    def kernel(x_ref, o_ref):
        x = x_ref[:]

        def body(_, accs):
            for i in range(UNROLL // K):
                c = 1.0 + 1e-7 * (i + 1)
                accs = tuple(a * c + 1e-9 for a in accs)
            return accs

        accs = tuple(x * (1.0 + 0.125 * i) for i in range(K))
        accs = jax.lax.fori_loop(0, REPS, body, accs)
        s = accs[0]
        for a in accs[1:]:
            s = s + a
        o_ref[:] = s

    @jax.jit
    def run(x):
        return pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec((ROWS, LANE), lambda: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((ROWS, LANE), lambda: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((ROWS, LANE), jnp.float32),
        )(x)

    x = jnp.ones((ROWS, LANE), jnp.float32)
    dt = timed(run, x, iters=50)
    # Each chain step is one vector fma over ROWS*LANE elements.
    vregs = REPS * UNROLL
    fmas = vregs * ROWS * LANE
    print(f"VPU chain: {dt * 1e6:8.1f} us for {fmas / 1e6:.1f} M fma "
          f"elements -> {fmas / dt / 1e9:6.1f} Gfma/s "
          f"({vregs / dt / 1e6:.0f} M vreg-fma/s, "
          f"{vregs / dt / 0.94e9:.2f} vreg-fma/cycle @940MHz)")
    return fmas / dt


def main():
    dev = jax.devices()[0]
    print(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}")
    bw = hbm_bw()
    rate = vpu_rate()
    print()
    print("derived (16K worlds, megastep ~10.9 ms/step at 1.51M steps/s):")
    # Kernel HBM IO per step (f32 planes x 16384 worlds x 4 B):
    kernel_mb = (560 + 380) * 16384 * 4 / 1e6
    print(f"  kernel HBM IO ~{kernel_mb:.0f} MB/step -> "
          f"{kernel_mb / 1e3 / bw * 1e3:.2f} ms at {bw:.0f} GB/s "
          f"(BW-bound floor)")
    obs_mb = 314 * 4 * 16384 * 4 / 1e6 * 2
    print(f"  obs assembly IO ~{obs_mb:.0f} MB/step -> "
          f"{obs_mb / 1e3 / bw * 1e3:.2f} ms")
    print(f"  VPU rate {rate / 1e9:.1f} Gfma-elem/s = "
          f"{rate / 1024 / 1e6:.0f} M vreg-ops/s")


if __name__ == "__main__":
    main()
