"""Batch RGBD renderer tests (reference tensors: rgb [W*A, H, W, 4] u8 /
depth [W*A, H, W, 1] f32, src/mgr.cpp:1329-1335)."""

import jax
import jax.numpy as jnp
import numpy as np

from marl_hideandseek_tpu import math3d
from marl_hideandseek_tpu.config import EnvConfig
from marl_hideandseek_tpu.env import levelgen
from marl_hideandseek_tpu.types import AGENT_HIDER, AGENT_SEEKER
from marl_hideandseek_tpu.viz import rgbd

CFG = EnvConfig(num_worlds=1, min_hiders=1, max_hiders=3,
                min_seekers=1, max_seekers=3)
H = W = 32


def _state_agent_facing_cube():
    """One agent at the origin facing +y; one cube 6 units ahead."""
    state = levelgen.empty_world(CFG)
    qi = math3d.quat_identity()
    state = levelgen._add_box_body(
        state, CFG, 0, [0.0, 6.0, 1.0], qi, levelgen.CUBE_HALF)
    state = levelgen._add_agent(state, CFG, 0, [0.0, 0.0, 1.0], qi,
                                AGENT_HIDER)
    return state


def _batched(state):
    return jax.tree.map(lambda x: x[None], state)


def test_shapes_dtypes():
    state = _batched(_state_agent_facing_cube())
    rgb, depth = rgbd.render_rgbd(CFG, state, H, W)
    assert rgb.shape == (1, CFG.max_agents, H, W, 4)
    assert rgb.dtype == jnp.uint8
    assert depth.shape == (1, CFG.max_agents, H, W, 1)
    assert depth.dtype == jnp.float32


def test_floor_sky_and_cube():
    state = _batched(_state_agent_facing_cube())
    rgb, depth = rgbd.render_rgbd(CFG, state, H, W)
    rgb0 = np.asarray(rgb)[0, 0]
    d0 = np.asarray(depth)[0, 0, :, :, 0]
    # Central pixels: the cube face ~5 units ahead (6 - half 1).
    cx, cy = H // 2, W // 2
    assert abs(d0[cx, cy] - 5.0) < 0.3, d0[cx, cy]
    np.testing.assert_array_equal(rgb0[cx, cy, :3] > 0, [True] * 3)
    # Cube base color is the box orange (shaded, so just check hue
    # ordering R > G > B).
    r, g, b = rgb0[cx, cy, :3].astype(int)
    assert r > g > b, (r, g, b)
    # Top rows: sky (miss -> depth 0, sky blue B > R).
    assert d0[0].max() == 0.0
    assert rgb0[0, 0, 2] > rgb0[0, 0, 0]
    # Bottom rows: floor in front of the agent (finite small depth,
    # gray-ish: channels nearly equal).
    assert 0.0 < d0[-1, cy] < 5.0
    fr, fg, fb = rgb0[-1, cy, :3].astype(int)
    assert abs(fr - fg) <= 2 and abs(fg - fb) <= 2
    # Alpha is opaque everywhere.
    assert np.asarray(rgb)[..., 3].min() == 255


def test_team_colors():
    """A seeker directly in a hider's view renders blue-ish; the hider
    in the seeker's view renders green-ish."""
    state = levelgen.empty_world(CFG)
    qi = math3d.quat_identity()
    # agent 0 at y=0 facing +y; agent 1 at y=6 facing +y (back turned)
    state = levelgen._add_agent(state, CFG, 0, [0.0, 0.0, 1.0], qi,
                                AGENT_HIDER)
    state = levelgen._add_agent(state, CFG, 1, [0.0, 6.0, 1.0], qi,
                                AGENT_SEEKER)
    rgb, depth = rgbd.render_rgbd(CFG, _batched(state), H, W)
    rgb = np.asarray(rgb)
    cx, cy = H // 2, W // 2
    # Hider (agent 0) sees the seeker: blue dominant.
    r0 = rgb[0, 0, cx, cy, :3].astype(int)
    assert r0[2] > r0[0] and r0[2] > r0[1] * 0.8, r0
    d0 = np.asarray(depth)[0, 0, cx, cy, 0]
    assert abs(d0 - 5.0) < 0.5, d0


def test_packed_entrypoint():
    from marl_hideandseek_tpu.env.packed import pack_state

    state = _batched(_state_agent_facing_cube())
    rgb_c, depth_c = rgbd.render_rgbd(CFG, state, 16, 16)
    rgb_p, depth_p = rgbd.render_rgbd_packed(CFG, pack_state(state),
                                             16, 16)
    np.testing.assert_array_equal(np.asarray(rgb_c), np.asarray(rgb_p))
    np.testing.assert_array_equal(np.asarray(depth_c),
                                  np.asarray(depth_p))


def test_world_chunk_remainder_matches_unchunked():
    """World counts that don't divide world_chunk must run the chunked
    path (full chunks + remainder) and agree exactly with the
    fully-vmapped render."""
    one = _state_agent_facing_cube()
    state = jax.tree.map(
        lambda x: jnp.stack([x] * 5), one)         # 5 worlds
    rgb_ref, depth_ref = rgbd.render_rgbd(CFG, state, 16, 16,
                                          world_chunk=8)   # unchunked
    rgb_c, depth_c = rgbd.render_rgbd(CFG, state, 16, 16,
                                      world_chunk=2)       # 2+2+1
    np.testing.assert_array_equal(np.asarray(rgb_c), np.asarray(rgb_ref))
    np.testing.assert_allclose(np.asarray(depth_c), np.asarray(depth_ref),
                               rtol=1e-6)


def test_pallas_rgbd_matches_jnp():
    """The Pallas RGBD kernel (interpret mode) must reproduce the jnp
    ray caster: depth allclose everywhere, colors equal on >=99.5% of
    pixels (normals come from the slab entry axis vs the hit-point
    dominant ratio — identical except exactly on face edges)."""
    from marl_hideandseek_tpu.env import levelgen as lg
    from marl_hideandseek_tpu.env.packed import pack_state
    from marl_hideandseek_tpu.ops import pallas_rgbd
    from marl_hideandseek_tpu.types import AGENT_SEEKER

    # A world with every primitive class: boxes, a ramp, two agents.
    state = _state_agent_facing_cube()
    state = lg._add_box_body(
        state, CFG, 1, [3.0, 5.0, 1.0],
        jnp.asarray([0.924, 0.0, 0.0, 0.383]), lg.CUBE_HALF)
    state = lg._add_ramp_body(
        state, CFG, 0, [-3.0, 6.0, 1.0], math3d.quat_identity())
    state = lg._add_agent(state, CFG, 1, [-1.0, -2.0, 1.0],
                          jnp.asarray([0.924, 0.0, 0.0, 0.383]),
                          AGENT_SEEKER)
    state = state.replace(
        bodies=state.bodies.replace(
            locked=state.bodies.locked.at[0].set(True)))

    # 128 worlds (lane-aligned) of the same scene.
    wstate = jax.tree.map(lambda x: jnp.stack([x] * 128), state)
    ps = pack_state(wstate)

    packed, depth = pallas_rgbd.render_rgbd_packed_fast(
        CFG, ps, 32, 32, interpret=True)
    rgb_k, d_k = pallas_rgbd.to_reference_layout(CFG, packed, depth,
                                                 32, 32)
    rgb_j, d_j = rgbd.render_rgbd(CFG, wstate, 32, 32)

    rgb_k = np.asarray(rgb_k[0])          # identical worlds: check one
    rgb_j = np.asarray(rgb_j[0])
    d_k = np.asarray(d_k[0])
    d_j = np.asarray(d_j[0])
    np.testing.assert_allclose(d_k, d_j, atol=1e-3, rtol=1e-4)
    same = (rgb_k == rgb_j).all(axis=-1)
    frac = same.mean()
    assert frac >= 0.995, f"only {frac:.4f} of pixels match"
    # The sky must be exactly equal (miss path has no normal ambiguity).
    sky = (d_j[..., 0] == 0.0)
    assert (same | ~sky).all()
