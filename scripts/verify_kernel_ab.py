"""On-TPU A/B assertion: the fused megastep kernel vs the jnp fallback
path at PRODUCTION capacity (VERDICT r3 next-#6).

Phase 1 (this process, TPU): drives the packed env with random actions
through the megastep kernel; saves every pre-step state, the actions,
and the kernel's post-step results to an npz bundle.
Phase 2 (subprocess, JAX_PLATFORMS=cpu): replays each saved pre-step
state through the packed XLA fallback path (the semantic reference) and
compares against the kernel results — physics within the interpret-test
bars, grab/lock/reward/score semantics near-exact.

Covers both the 2v2 bench/training config and the full
9-box/2-ramp/6-agent capacity (the production kernel instantiations the
reduced-capacity interpret tests cannot afford).

Run: python scripts/verify_kernel_ab.py [steps]   (wired into the
verify skill; exits non-zero on mismatch).
"""

import os
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

if "--child" in sys.argv:
    # Must run BEFORE any import that initializes the JAX backend
    # (flax's import is enough): the machine image pins the TPU backend
    # via sitecustomize and the JAX_PLATFORMS env var alone does not
    # win. Without a real CPU backend the "fallback" still routes its
    # physics through the fused kernel and the A/B compares the kernel
    # with itself.
    import jax as _jax

    _jax.config.update("jax_platforms", "cpu")

from marl_hideandseek_tpu.utils.runtime import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

from marl_hideandseek_tpu.config import EnvConfig, SimFlags
from marl_hideandseek_tpu.env import packed as P

W = 256

CONFIGS = {
    "bench2v2": dict(min_hiders=2, max_hiders=2, min_seekers=2,
                     max_seekers=2),
    "fullcap": dict(min_hiders=1, max_hiders=3, min_seekers=1,
                    max_seekers=3),
}


def _mk_cfg(name):
    return EnvConfig(
        num_worlds=W,
        sim_flags=SimFlags.ZeroAgentVelocity | SimFlags.RandomFlipTeams,
        **CONFIGS[name])


def _flat(tree):
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    return [np.asarray(x) for x in leaves], treedef


def record(name, steps, path):
    cfg = _mk_cfg(name)
    env = P.PackedEnv(cfg)
    ps, _ = jax.jit(env.init)(jax.random.PRNGKey(5))
    step = jax.jit(lambda s, a: env.step(s, a))
    key = jax.random.PRNGKey(17)
    n_move = 5 if cfg.zero_agent_velocity else 11

    out = {}
    for i in range(steps):
        k1, k2 = jax.random.split(jax.random.fold_in(key, i))
        acts = jnp.concatenate([
            jax.random.randint(k1, (cfg.max_agents, 3, W), 0, n_move),
            jax.random.randint(k2, (cfg.max_agents, 2, W), 0, 2),
        ], axis=1)
        leaves, _ = _flat(ps)
        for j, leaf in enumerate(leaves):
            out[f"s{i}_state_{j}"] = leaf
        out[f"s{i}_acts"] = np.asarray(acts)
        ps2, res = step(ps, acts)
        for key_name, val in (
                ("pos", ps2.bodies.pos), ("quat", ps2.bodies.quat),
                ("vel", ps2.bodies.vel),
                ("locked", ps2.bodies.locked.astype(np.int32)),
                ("gtarget", ps2.grab.target),
                ("rewards", res.rewards),
                ("lidar", res.obs["self_lidar"]),
                ("visa", res.obs["vis_agents_mask"]),
                ("scores", ps2.running_scores)):
            out[f"s{i}_k_{key_name}"] = np.asarray(val)
        ps = ps2
    np.savez_compressed(path, steps=steps, **out)


def replay_and_compare(name, path):
    """Child (CPU backend): fallback step per saved state, compare."""
    cfg = _mk_cfg(name)
    env = P.PackedEnv(cfg, force_fallback=True)
    ps0, _ = jax.jit(env.init)(jax.random.PRNGKey(5))  # for the treedef
    _, treedef = jax.tree_util.tree_flatten(ps0)
    step = jax.jit(lambda s, a: env.step(s, a))

    data = np.load(path)
    steps = int(data["steps"])
    n_leaves = len([k for k in data.files if k.startswith("s0_state_")])
    ok = True

    def check(tag, a, b, tol, min_frac=0.995):
        nonlocal ok
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        frac = (np.abs(a - b) < tol).mean()
        good = frac >= min_frac
        # Print every tag (pass or fail) so the log is a full ledger.
        print(f"  {tag:22s} agree {frac * 100:6.2f}%  "
              f"max|d| {np.abs(a - b).max():.2e}  "
              f"{'OK' if good else 'FAIL'}", flush=True)
        ok = ok and good

    for i in range(steps):
        leaves = [data[f"s{i}_state_{j}"] for j in range(n_leaves)]
        ps = jax.tree_util.tree_unflatten(treedef, leaves)
        # restore dtypes from the template
        ps = jax.tree.map(lambda t, x: jnp.asarray(x, t.dtype), ps0, ps)
        acts = jnp.asarray(data[f"s{i}_acts"])
        ps2, res = step(ps, acts)
        if i % 5 == 0 or i == steps - 1:
            print(f" step {i}:", flush=True)
            check("pos", ps2.bodies.pos, data[f"s{i}_k_pos"], 5e-3)
            check("quat", ps2.bodies.quat, data[f"s{i}_k_quat"], 5e-3)
            check("vel", ps2.bodies.vel, data[f"s{i}_k_vel"], 0.5)
            check("locked", ps2.bodies.locked.astype(np.int32),
                  data[f"s{i}_k_locked"], 0.5, 1.0)
            check("grab_target", ps2.grab.target,
                  data[f"s{i}_k_gtarget"], 0.5, 0.999)
            check("rewards", res.rewards, data[f"s{i}_k_rewards"],
                  1e-4, 0.999)
            check("lidar", res.obs["self_lidar"], data[f"s{i}_k_lidar"],
                  1e-2, 0.999)
            check("vis_agents", res.obs["vis_agents_mask"],
                  data[f"s{i}_k_visa"], 0.5, 0.999)
            check("scores", ps2.running_scores, data[f"s{i}_k_scores"],
                  0.5, 0.999)
    return ok


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        assert jax.devices()[0].platform == "cpu"
        ok = replay_and_compare(sys.argv[2], sys.argv[3])
        sys.exit(0 if ok else 1)

    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 15
    all_ok = True
    for name in CONFIGS:
        print(f"== {name} ==", flush=True)
        with tempfile.NamedTemporaryFile(suffix=".npz") as f:
            record(name, steps, f.name)
            env = dict(os.environ, JAX_PLATFORMS="cpu")
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--child",
                 name, f.name], env=env)
            all_ok &= (r.returncode == 0)
    print("A/B:", "PASS" if all_ok else "FAIL")
    sys.exit(0 if all_ok else 1)


if __name__ == "__main__":
    main()
