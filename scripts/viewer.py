"""Interactive console viewer: drive an agent, watch the world.

Capability analogue of the reference's Vulkan viewer controls
(reference: src/viewer.cpp:250-342 — WASDQE move/turn, G grab, L lock,
R/1-9 reset to level, M/N save/load checkpoint) for headless TPU hosts:
commands are read from stdin and each step renders a PNG frame.

Usage:
  python scripts/viewer.py --out viewer_frames [--world 0] [--agent 0]

Commands:  w/a/s/d move, q/e turn, g grab, l lock, <enter> idle step,
           r reset, 1-8 reset to level N, m save ckpt, n load ckpt,
           p print obs, f toggle follow camera, x quit.

`--follow` (or the `f` command) additionally renders the driven agent's
first-person 64x64 RGBD view (viz/rgbd.py) beside each top-down frame —
the capability analogue of the reference viewer's agent follow camera
(reference: src/sim.cpp:943-954, viewer.cpp:148-179).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from marl_hideandseek_tpu.utils.runtime import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

from marl_hideandseek_tpu.config import EnvConfig, SimFlags
from marl_hideandseek_tpu.env import HideAndSeekEnv
from marl_hideandseek_tpu.viz.render2d import render_world


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", type=str, default="viewer_frames")
    p.add_argument("--world", type=int, default=0)
    p.add_argument("--agent", type=int, default=0)
    p.add_argument("--num-hiders", type=int, default=2)
    p.add_argument("--num-seekers", type=int, default=2)
    p.add_argument("--follow", action="store_true",
                   help="render the driven agent's first-person RGBD "
                        "view beside the top-down frame")
    args = p.parse_args()

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    cfg = EnvConfig(
        num_worlds=1,
        min_hiders=args.num_hiders, max_hiders=args.num_hiders,
        min_seekers=args.num_seekers, max_seekers=args.num_seekers,
        sim_flags=SimFlags.ZeroAgentVelocity | SimFlags.IgnoreEpisodeLength,
    )
    env = HideAndSeekEnv(cfg)
    state, result = jax.jit(env.init)(jax.random.PRNGKey(5))
    step = jax.jit(env.step)
    save_ck = jax.jit(env.save_checkpoints)
    load_ck = jax.jit(env.load_checkpoints)
    ckpt = None

    os.makedirs(args.out, exist_ok=True)
    frame = 0
    follow = args.follow

    def draw():
        if follow:
            from marl_hideandseek_tpu.viz.rgbd import render_rgbd
            fig, (ax, axf) = plt.subplots(
                1, 2, figsize=(11, 5),
                gridspec_kw={"width_ratios": [1.2, 1]})
            render_world(cfg, state, args.world,
                         title=f"step {int(state.step[0])}", ax=ax)
            rgb, depth = render_rgbd(cfg, state, 64, 64)
            axf.imshow(np.asarray(rgb[args.world, args.agent, ..., :3]))
            axf.set_title(f"agent {args.agent} follow cam")
            axf.axis("off")
        else:
            ax = render_world(cfg, state, args.world,
                              title=f"step {int(state.step[0])}")
            fig = ax.figure
        path = os.path.join(args.out, f"frame_{frame:05d}.png")
        fig.savefig(path, dpi=80)
        plt.close(fig)
        print(f"  -> {path}")

    draw()
    print(__doc__)
    while True:
        try:
            cmd = input("viewer> ").strip().lower()
        except EOFError:
            break
        if cmd == "x":
            break

        # Neutral action (reference: actions consumed to neutral,
        # src/sim.cpp:363-369).
        act = np.full((1, cfg.max_agents, 5), 2, np.int32)
        act[..., 3:] = 0
        a = args.agent
        resets = None
        if cmd == "w":
            act[0, a, 1] = 4
        elif cmd == "s":
            act[0, a, 1] = 0
        elif cmd == "a":
            act[0, a, 0] = 0
        elif cmd == "d":
            act[0, a, 0] = 4
        elif cmd == "q":
            act[0, a, 2] = 4
        elif cmd == "e":
            act[0, a, 2] = 0
        elif cmd == "g":
            act[0, a, 3] = 1
        elif cmd == "l":
            act[0, a, 4] = 1
        elif cmd == "r":
            resets = jnp.ones((1,), jnp.int32)
        elif cmd.isdigit() and 1 <= int(cmd) <= 8:
            resets = jnp.full((1,), int(cmd), jnp.int32)
        elif cmd == "m":
            ckpt = save_ck(state)
            print("  checkpoint saved")
            continue
        elif cmd == "n":
            if ckpt is None:
                print("  no checkpoint")
                continue
            state, result = load_ck(state, ckpt, jnp.ones((1,), jnp.int32))
            frame += 1
            draw()
            continue
        elif cmd == "p":
            for k, v in result.obs.items():
                print(f"  {k}: {np.asarray(v)[0, a]}")
            continue
        elif cmd == "f":
            follow = not follow
            print(f"  follow camera {'on' if follow else 'off'}")
            frame += 1
            draw()
            continue

        state, result = step(state, jnp.asarray(act), resets)
        frame += 1
        draw()


if __name__ == "__main__":
    main()
