"""Split fused-kernel time into physics (manifold+substeps) vs ray sweep
by timing the physics-only kernel against the fused kernel on identical
packed inputs, at 1 and 4 substeps.

Usage: python scripts/profile_kernel_split.py [num_worlds]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from marl_hideandseek_tpu.utils.runtime import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp

from marl_hideandseek_tpu.config import EnvConfig, SimFlags
from marl_hideandseek_tpu.env import packed as P
from marl_hideandseek_tpu.ops import pallas_step, pallas_physics


def bench(name, fn, *args, iters=30):
    fn = jax.jit(fn)
    out = fn(*args)
    jax.block_until_ready(out)
    start = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    # force a real roundtrip (tunnel block_until_ready can lie)
    leaf = jax.tree_util.tree_leaves(out)[0]
    _ = jax.device_get(leaf.ravel()[0])
    dt = (time.perf_counter() - start) / iters
    print(f"{name:44s} {dt * 1e3:9.2f} ms", flush=True)
    return out


def main():
    w = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    cfg = EnvConfig(
        num_worlds=w, min_hiders=2, max_hiders=2, min_seekers=2,
        max_seekers=2,
        sim_flags=SimFlags.ZeroAgentVelocity | SimFlags.RandomFlipTeams)
    env = P.PackedEnv(cfg)
    ps, _ = jax.jit(env.init)(jax.random.PRNGKey(5))
    n_body = cfg.num_dyn_bodies
    f = jnp.zeros((n_body, 3, w))
    tq = jnp.zeros((n_body, 3, w))

    for nsub in (1, 4):
        c = cfg.replace(num_physics_substeps=nsub) if nsub != 4 else cfg
        bench(f"fused kernel (substeps={nsub})",
              lambda s, c=c: pallas_step.fused_step_packed(c, s, f, tq),
              ps)

    def phys_only(s, c):
        b = s.bodies
        dynamic = b.active & ~b.locked
        return pallas_physics._physics_pallas(
            c, False, s.statics.wall_pos.shape[0],
            s.statics.plane_point.shape[0],
            b.pos, b.quat, b.vel, b.omega,
            jnp.where(dynamic, b.inv_mass, 0.0),
            jnp.where(dynamic[:, None], b.inv_inertia, 0.0),
            dynamic.astype(jnp.float32), b.active.astype(jnp.float32),
            b.half_ext, b.friction_mu, f, tq,
            s.statics.wall_pos, s.statics.wall_half_ext,
            s.statics.wall_active.astype(jnp.float32),
            s.statics.plane_point, s.statics.plane_normal,
            s.statics.plane_active.astype(jnp.float32),
            s.grab.target.astype(jnp.float32), s.grab.r2, s.grab.rel_q,
            s.grab.sep)

    for nsub in (1, 4):
        c = cfg.replace(num_physics_substeps=nsub) if nsub != 4 else cfg
        bench(f"physics-only kernel (substeps={nsub})",
              lambda s, c=c: phys_only(s, c), ps)


if __name__ == "__main__":
    main()
