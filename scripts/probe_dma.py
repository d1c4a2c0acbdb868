"""DMA-granularity probe: copy the same bytes through a Pallas kernel as
(a) 22 small [r, k, W] arrays vs (b) one packed [R, W] array.
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

LANE = 128
W = 16384

shapes = [(17, 3), (17, 4), (17, 3), (17, 3), (17,), (17, 3), (17,),
          (17,), (17, 3), (17,), (17, 3), (17, 3), (37, 3), (37, 3),
          (37,), (1, 3), (1, 3), (1,), (6,), (6, 3), (6, 4), (6,)]


def many_kernel(*args):
    n = len(args) // 2
    ins, outs = args[:n], args[n:]
    for i, o in zip(ins, outs):
        o[:] = i[:] * 1.0000001


def one_kernel(i_ref, o_ref):
    o_ref[:] = i_ref[:] * 1.0000001


def wspec(*prefix):
    rank = len(prefix)
    return pl.BlockSpec(prefix + (LANE,),
                        lambda i, _r=rank: (0,) * _r + (i,),
                        memory_space=pltpu.VMEM)


def bench(name, fn, *args, iters=30):
    fn = jax.jit(fn)
    out = fn(*args)
    jax.block_until_ready(out)
    start = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    leaf = jax.tree_util.tree_leaves(out)[0]
    _ = jax.device_get(leaf.ravel()[0])
    dt = (time.perf_counter() - start) / iters
    print(f"{name:34s} {dt * 1e3:9.2f} ms", flush=True)


def main():
    key = jax.random.PRNGKey(0)
    arrs = [jax.random.normal(jax.random.fold_in(key, i), s + (W,))
            for i, s in enumerate(shapes)]
    total_rows = sum((s[0] * (s[1] if len(s) > 1 else 1)) for s in shapes)
    print("logical rows:", total_rows)

    def many(arrs):
        specs = [wspec(*s) for s in shapes]
        return pl.pallas_call(
            many_kernel, grid=(W // LANE,),
            in_specs=specs, out_specs=specs,
            out_shape=[jax.ShapeDtypeStruct(s + (W,), jnp.float32)
                       for s in shapes],
        )(*arrs)

    bench("22 small arrays", many, arrs)

    R = ((total_rows + 7) // 8) * 8
    big = jax.random.normal(key, (R, W))

    def one(big):
        return pl.pallas_call(
            one_kernel, grid=(W // LANE,),
            in_specs=[wspec(R)], out_specs=wspec(R),
            out_shape=jax.ShapeDtypeStruct((R, W), jnp.float32),
        )(big)

    bench("one packed array", one, big)

    def pack_then_one(arrs):
        flat = [a.reshape(-1, W) for a in arrs]
        big = jnp.concatenate(flat, axis=0)
        pad = R - big.shape[0]
        big = jnp.pad(big, ((0, pad), (0, 0)))
        return one(big)

    bench("XLA pack + one array", pack_then_one, arrs)

    def one_unpack(big):
        out = one(big)
        # slice back out per logical array
        outs = []
        r = 0
        for s in shapes:
            k = s[0] * (s[1] if len(s) > 1 else 1)
            outs.append(out[r:r + k].reshape(s + (W,)))
            r += k
        return outs

    bench("one array + XLA unpack", one_unpack, big)


if __name__ == "__main__":
    main()
