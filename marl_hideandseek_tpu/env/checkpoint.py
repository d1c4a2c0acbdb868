"""Sim-state checkpoints: save/load/pack per world.

Mirrors the reference's in-sim checkpoint capability (Checkpoint singleton
src/sim.hpp:283-313, save/load task graphs src/sim.cpp:956-1137, exported
as a [W, sizeof(Checkpoint)] u8 tensor src/mgr.cpp:1217-1227) with one
deliberate improvement: the level-gen key is stored explicitly, so loading
regenerates the exact level without the reference's RNG-burn hack
(src/sim.cpp:976-980; see SURVEY.md §5 Checkpoint/resume).

A checkpoint stores only the dynamic state; walls and per-slot shape
constants are reproduced by re-running the level generator from the saved
key. `pack`/`unpack` give a flat [W, nbytes] uint8 view for binary record
logs (the viewer/record-replay path, reference: jax_infer.py:125,
viewer.cpp:13-26).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from marl_hideandseek_tpu.config import EnvConfig
from marl_hideandseek_tpu.env import levelgen
from marl_hideandseek_tpu.types import EnvState, GrabState


@struct.dataclass
class Checkpoint:
    """Per-world dynamic snapshot (leading axis = worlds when batched)."""

    ep_key: jnp.ndarray          # [2] u32
    level_key: jnp.ndarray       # [2] u32
    step: jnp.ndarray            # [] i32
    running_scores: jnp.ndarray  # [2] i32
    finished_scores: jnp.ndarray  # [2] f32
    seekers_first: jnp.ndarray   # [] bool
    num_hiders: jnp.ndarray      # [] i32
    num_seekers: jnp.ndarray     # [] i32

    pos: jnp.ndarray             # [B, 3]
    quat: jnp.ndarray            # [B, 4]
    vel: jnp.ndarray             # [B, 3]
    omega: jnp.ndarray           # [B, 3]
    locked: jnp.ndarray          # [B] bool
    owner: jnp.ndarray           # [B] i32

    grab_target: jnp.ndarray     # [A] i32
    grab_r2: jnp.ndarray         # [A, 3]
    grab_rel_q: jnp.ndarray      # [A, 4]
    grab_sep: jnp.ndarray        # [A]


def save_checkpoints(cfg: EnvConfig, state: EnvState) -> Checkpoint:
    """Snapshot every world (cheap: pure array copies, no reverse-mapping
    needed since grabs are already slot-indexed)."""
    b = state.bodies
    g = state.grab
    return Checkpoint(
        ep_key=state.ep_key,
        level_key=state.level_key,
        step=state.step,
        running_scores=state.running_scores,
        finished_scores=state.finished_scores,
        seekers_first=state.seekers_first,
        num_hiders=state.num_hiders,
        num_seekers=state.num_seekers,
        pos=b.pos, quat=b.quat, vel=b.vel, omega=b.omega,
        locked=b.locked, owner=b.owner,
        grab_target=g.target, grab_r2=g.r2, grab_rel_q=g.rel_q,
        grab_sep=g.sep,
    )


def _load_one(cfg: EnvConfig, state: EnvState, ckpt: Checkpoint) -> EnvState:
    """Restore one world: regenerate the level from the saved keys, then
    overwrite the dynamic state (reference: loadCheckpointSystem
    src/sim.cpp:956-1044)."""
    new = levelgen.generate_world(
        cfg, ckpt.level_key, ckpt.ep_key, jnp.array(1, jnp.int32),
        ckpt.num_hiders, ckpt.num_seekers, ckpt.seekers_first)

    bodies = new.bodies.replace(
        pos=ckpt.pos, quat=ckpt.quat, vel=ckpt.vel, omega=ckpt.omega,
        locked=ckpt.locked, owner=ckpt.owner)
    grab = GrabState(target=ckpt.grab_target, r2=ckpt.grab_r2,
                     rel_q=ckpt.grab_rel_q, sep=ckpt.grab_sep)
    return new.replace(
        bodies=bodies,
        grab=grab,
        step=ckpt.step,
        running_scores=ckpt.running_scores,
        finished_scores=ckpt.finished_scores,
        # curWorldEpisode keeps running (the reference also does not restore
        # it), so post-load episodes diverge from the recorded run.
        episode_counter=state.episode_counter,
    )


def load_checkpoints(cfg: EnvConfig, state: EnvState, ckpt: Checkpoint,
                     should_load: jnp.ndarray) -> EnvState:
    """Restore the worlds where should_load != 0."""
    loaded = jax.vmap(lambda s, c: _load_one(cfg, s, c))(state, ckpt)
    mask = should_load.astype(bool)
    return jax.tree.map(
        lambda new, old: jnp.where(
            mask.reshape((-1,) + (1,) * (new.ndim - 1)), new, old),
        loaded, state)


# ---------------------------------------------------------------------------
# Flat byte packing for binary record logs.
# ---------------------------------------------------------------------------


def _leaves(ckpt: Checkpoint):
    return jax.tree_util.tree_leaves(ckpt)


def pack_checkpoints(ckpt: Checkpoint) -> jnp.ndarray:
    """[W, nbytes] uint8 view of a batched checkpoint (device-side)."""
    parts = []
    for leaf in _leaves(ckpt):
        w = leaf.shape[0]
        flat = leaf.reshape(w, -1)
        if flat.dtype == jnp.bool_:
            flat = flat.astype(jnp.uint8)
        by = jax.lax.bitcast_convert_type(flat, jnp.uint8)
        parts.append(by.reshape(w, -1))
    return jnp.concatenate(parts, axis=-1)


def unpack_checkpoints(cfg: EnvConfig, packed: jnp.ndarray) -> Checkpoint:
    """Inverse of pack_checkpoints."""
    template = save_checkpoints(
        cfg, _template_state(cfg, packed.shape[0]))
    out = []
    off = 0
    for leaf in _leaves(template):
        w = leaf.shape[0]
        inner = leaf.shape[1:]
        if leaf.dtype == jnp.bool_:
            store_dtype = jnp.uint8
        else:
            store_dtype = leaf.dtype
        ib = jnp.dtype(store_dtype).itemsize
        n = int(jnp.prod(jnp.array(inner))) if inner else 1
        nbytes = n * ib
        chunk = packed[:, off:off + nbytes]
        off += nbytes
        vals = jax.lax.bitcast_convert_type(
            chunk.reshape(w, n, ib), store_dtype).reshape((w,) + inner)
        if leaf.dtype == jnp.bool_:
            vals = vals.astype(jnp.bool_)
        out.append(vals)
    return jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(template), out)


def _template_state(cfg: EnvConfig, num_worlds: int) -> EnvState:
    one = levelgen.empty_world(cfg)
    return jax.tree.map(
        lambda x: jnp.broadcast_to(x, (num_worlds,) + x.shape), one)
