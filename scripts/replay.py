"""Replay viewer: render a recorded checkpoint log to PNG frames / MP4.

The TPU build's record/replay path (reference capability: viewer.cpp
--replay which force-loads every recorded Checkpoint, viewer.cpp:186-217):
reads a native checkpoint log, restores each frame through the env's
load_checkpoints (regenerating the level from the stored keys), and renders
top-down 2-D frames.

Usage:
  python scripts/replay.py record.bin --out frames/ --world 0 --every 5
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
from marl_hideandseek_tpu.env.checkpoint import unpack_checkpoints
from marl_hideandseek_tpu.utils.ckptlog import CkptLogReader
from marl_hideandseek_tpu.viz.render2d import render_world


def main():
    p = argparse.ArgumentParser()
    p.add_argument("log")
    p.add_argument("--out", type=str, default="replay_frames")
    p.add_argument("--world", type=int, default=0)
    p.add_argument("--every", type=int, default=5)
    p.add_argument("--num-hiders", type=int, default=3)
    p.add_argument("--num-seekers", type=int, default=3)
    args = p.parse_args()

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    with CkptLogReader(args.log) as reader:
        cfg = EnvConfig(
            num_worlds=reader.num_worlds,
            min_hiders=args.num_hiders, max_hiders=args.num_hiders,
            min_seekers=args.num_seekers, max_seekers=args.num_seekers,
            sim_flags=SimFlags.ZeroAgentVelocity,
        )
        env = HideAndSeekEnv(cfg)
        state, _ = jax.jit(env.init)(jax.random.PRNGKey(0))
        load = jax.jit(env.load_checkpoints)

        os.makedirs(args.out, exist_ok=True)
        n = 0
        for i in range(0, reader.num_frames, args.every):
            blob = jnp.asarray(reader.read(i))
            ckpt = unpack_checkpoints(cfg, blob)
            loaded, _ = load(state, ckpt,
                             jnp.ones((cfg.num_worlds,), jnp.int32))
            ax = render_world(cfg, loaded, args.world,
                              title=f"frame {i}")
            ax.figure.savefig(
                os.path.join(args.out, f"frame_{i:06d}.png"), dpi=80)
            plt.close(ax.figure)
            n += 1
        print(f"wrote {n} frames to {args.out}/")


if __name__ == "__main__":
    main()
