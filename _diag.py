import time, jax, jax.numpy as jnp
from marl_hideandseek_tpu.config import EnvConfig, SimFlags
from marl_hideandseek_tpu.env import HideAndSeekEnv

W = 16384
cfg = EnvConfig(num_worlds=W, min_hiders=2, max_hiders=2, min_seekers=2,
                max_seekers=2,
                sim_flags=SimFlags.ZeroAgentVelocity | SimFlags.RandomFlipTeams,
                rand_seed=5)
env = HideAndSeekEnv(cfg)
key = jax.random.PRNGKey(5)
t0 = time.perf_counter(); state, _ = jax.jit(env.init)(key)
jax.block_until_ready(state.bodies.pos)
print("init", time.perf_counter() - t0)

@jax.jit
def chunk(state, base):
    def body(i, state):
        k = jax.random.fold_in(key, base + i)
        move = jax.random.randint(k, (W, cfg.max_agents, 3), 0, 5)
        gl = jnp.zeros((W, cfg.max_agents, 2), jnp.int32)
        state, _ = env.step(state, jnp.concatenate([move, gl], -1))
        return state
    return jax.lax.fori_loop(0, 10, body, state)

t0 = time.perf_counter(); s = chunk(state, 0); jax.block_until_ready(s.bodies.pos)
print("chunk compile+run", time.perf_counter() - t0)
for c in range(3):
    t0 = time.perf_counter(); s = chunk(s, 10*(c+1)); jax.block_until_ready(s.bodies.pos)
    print("chunk(10 steps)", time.perf_counter() - t0)

# single jitted step for comparison
step = jax.jit(lambda s, a: env.step(s, a)[0])
a = jnp.full((W, cfg.max_agents, 5), 2, jnp.int32).at[..., 3:].set(0)
s2 = step(state, a); jax.block_until_ready(s2.bodies.pos)
t0 = time.perf_counter()
for _ in range(10): s2 = step(s2, a)
jax.block_until_ready(s2.bodies.pos)
print("10 plain steps", time.perf_counter() - t0)
