"""Top-down 2-D world renderer (matplotlib).

The TPU build's replacement for the reference's Vulkan viewer
(SURVEY.md §2.4 E11): renders walls, boxes, ramps and agents from the
environment state for debugging and episode replay. Consumes either a live
EnvState or a recorded checkpoint stream (scripts/infer.py --record-log).
"""

from __future__ import annotations

import numpy as np

from marl_hideandseek_tpu.config import ARENA_HALF, EnvConfig
from marl_hideandseek_tpu.types import AGENT_HIDER, body_slot_ranges


def render_world(cfg: EnvConfig, state, world_idx: int = 0, ax=None,
                 title=None):
    """Draw one world onto a matplotlib Axes (created if None)."""
    import matplotlib

    matplotlib.use("Agg", force=False)
    import matplotlib.pyplot as plt
    from matplotlib.patches import Polygon, Rectangle, Circle

    if ax is None:
        _, ax = plt.subplots(figsize=(7, 7))

    def w(arr):
        return np.asarray(arr)[world_idx]

    # Walls (axis-aligned boxes).
    wall_pos = w(state.statics.wall_pos)
    wall_half = w(state.statics.wall_half_ext)
    wall_act = w(state.statics.wall_active)
    for p, h, a in zip(wall_pos, wall_half, wall_act):
        if not a:
            continue
        ax.add_patch(Rectangle(
            (p[0] - h[0], p[1] - h[1]), 2 * h[0], 2 * h[1],
            color="#444444"))

    (box_lo, box_hi), (ramp_lo, ramp_hi), (agent_lo, agent_hi) = \
        body_slot_ranges(cfg)
    pos = w(state.bodies.pos)
    quat = w(state.bodies.quat)
    half = w(state.bodies.half_ext)
    active = w(state.bodies.active)
    locked = w(state.bodies.locked)

    def yaw_of(q):
        return np.arctan2(2 * (q[0] * q[3] + q[1] * q[2]),
                          1 - 2 * (q[2] ** 2 + q[3] ** 2))

    def obb_corners(p, q, h):
        c, s = np.cos(yaw_of(q)), np.sin(yaw_of(q))
        rot = np.array([[c, -s], [s, c]])
        corners = np.array([[-h[0], -h[1]], [h[0], -h[1]],
                            [h[0], h[1]], [-h[0], h[1]]])
        return corners @ rot.T + p[:2]

    for i in range(box_lo, box_hi):
        if not active[i]:
            continue
        color = "#c0392b" if locked[i] else "#e67e22"
        ax.add_patch(Polygon(obb_corners(pos[i], quat[i], half[i]),
                             closed=True, color=color, alpha=0.8))
    for i in range(ramp_lo, ramp_hi):
        if not active[i]:
            continue
        color = "#7f8c8d" if locked[i] else "#9b59b6"
        ax.add_patch(Polygon(
            obb_corners(pos[i], quat[i], [1.0, 1.5, 1.0]),
            closed=True, color=color, alpha=0.8))

    agent_types = w(state.agent_type)
    agent_act = w(state.agent_active)
    for i in range(agent_hi - agent_lo):
        if not agent_act[i]:
            continue
        p = pos[agent_lo + i]
        q = quat[agent_lo + i]
        color = "#27ae60" if agent_types[i] == AGENT_HIDER else "#2980b9"
        ax.add_patch(Circle(p[:2], 0.9, color=color))
        yaw = yaw_of(q)
        fwd = np.array([-np.sin(yaw), np.cos(yaw)])  # body +y
        ax.plot([p[0], p[0] + 1.6 * fwd[0]], [p[1], p[1] + 1.6 * fwd[1]],
                color="black", lw=1.5)

    lim = ARENA_HALF + 2
    ax.set_xlim(-lim, lim)
    ax.set_ylim(-lim, lim)
    ax.set_aspect("equal")
    if title:
        ax.set_title(title)
    return ax


def save_episode_frames(cfg: EnvConfig, states, world_idx, out_dir,
                        every: int = 10):
    """Write PNG frames for a list of states (or checkpoint-loaded states)."""
    import matplotlib.pyplot as plt
    import os

    os.makedirs(out_dir, exist_ok=True)
    for t, state in enumerate(states):
        if t % every:
            continue
        ax = render_world(cfg, state, world_idx, title=f"step {t}")
        ax.figure.savefig(os.path.join(out_dir, f"frame_{t:05d}.png"),
                          dpi=80)
        plt.close(ax.figure)
