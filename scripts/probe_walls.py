import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from marl_hideandseek_tpu.utils.runtime import enable_compilation_cache
enable_compilation_cache()
import jax, jax.numpy as jnp
from marl_hideandseek_tpu.config import EnvConfig, SimFlags
from marl_hideandseek_tpu.env import packed as P
from marl_hideandseek_tpu.ops import pallas_step

def bench(name, fn, *args, iters=30):
    fn = jax.jit(fn)
    out = fn(*args); jax.block_until_ready(out)
    for _ in range(5): out = fn(*args)
    jax.block_until_ready(out)
    _ = jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    start = time.perf_counter()
    for _ in range(iters): out = fn(*args)
    jax.block_until_ready(out)
    _ = jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    dt = (time.perf_counter() - start) / iters
    print(f"{name:40s} {dt * 1e3:9.2f} ms", flush=True)

w = 16384
cfg = EnvConfig(num_worlds=w, min_hiders=2, max_hiders=2, min_seekers=2,
                max_seekers=2,
                sim_flags=SimFlags.ZeroAgentVelocity | SimFlags.RandomFlipTeams)
env = P.PackedEnv(cfg)
ps, _ = jax.jit(env.init)(jax.random.PRNGKey(5))
n_body = cfg.num_dyn_bodies
f = jnp.zeros((n_body, 3, w))
tq = jnp.zeros((n_body, 3, w))

def with_walls(s, n):
    st = s.statics
    st = st.replace(wall_pos=st.wall_pos[:n], wall_half_ext=st.wall_half_ext[:n],
                    wall_active=st.wall_active[:n])
    return s.replace(statics=st)

for n in (37, 16, 4, 1):
    psn = jax.jit(lambda s, n=n: with_walls(s, n))(ps)
    bench(f"fused kernel n_wall={n}",
          lambda s: pallas_step.fused_step_packed(cfg, s, f, tq), psn)
