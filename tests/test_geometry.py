"""Wall grammar invariants (reference behavior: src/geo_gen.cpp:429-505)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from marl_hideandseek_tpu.config import MAX_WALLS, ARENA_HALF
from marl_hideandseek_tpu.env import geometry


@pytest.fixture(scope="module")
def wallsets():
    keys = jax.random.split(jax.random.PRNGKey(0), 32)
    return jax.jit(jax.vmap(geometry.make_walls))(keys)


def test_wall_count_bounds(wallsets):
    n = np.asarray(wallsets.n)
    # 4 border walls always; every op adds at most 4; op budget <= 12.
    assert (n >= 4).all()
    assert (n <= MAX_WALLS).all()
    # Grammar always applies >= 1 connect and >= 4 door ops, so some worlds
    # must exceed the initial 4 walls.
    assert (n > 4).any()


def test_walls_sorted_and_axis_aligned(wallsets):
    p1 = np.asarray(wallsets.p1)
    p2 = np.asarray(wallsets.p2)
    n = np.asarray(wallsets.n)
    for w in range(p1.shape[0]):
        live1, live2 = p1[w, : n[w]], p2[w, : n[w]]
        # Sorted endpoints.
        assert (live1 <= live2 + 1e-5).all()
        # Every wall is axis-aligned: one coordinate pair equal.
        horiz = np.abs(live1[:, 1] - live2[:, 1]) < 1e-5
        vert = np.abs(live1[:, 0] - live2[:, 0]) < 1e-5
        assert (horiz | vert).all()


def test_walls_in_unit_square(wallsets):
    n = np.asarray(wallsets.n)
    for arr in (np.asarray(wallsets.p1), np.asarray(wallsets.p2)):
        for w in range(arr.shape[0]):
            live = arr[w, : n[w]]
            assert (live >= -1e-5).all() and (live <= 1 + 1e-5).all()


def test_scale_and_obbs(wallsets):
    scaled = jax.vmap(
        lambda ws: geometry.scale_walls(ws, -ARENA_HALF, ARENA_HALF)
    )(wallsets)
    pos, half, active = jax.vmap(geometry.walls_to_obbs)(scaled)
    pos, half, active = map(np.asarray, (pos, half, active))
    n = np.asarray(wallsets.n)
    assert (active.sum(-1) == n).all()
    for w in range(pos.shape[0]):
        p, h = pos[w, active[w]], half[w, active[w]]
        assert (np.abs(p[:, :2]) <= ARENA_HALF + 1e-4).all()
        # Wall height from the collision mesh: z in [0, 2.5].
        np.testing.assert_allclose(p[:, 2], 1.25)
        np.testing.assert_allclose(h[:, 2], 1.25)
        # Thickness on the minor axis.
        assert (np.minimum(h[:, 0], h[:, 1]) <= 0.2 + 1e-5).all()


def test_deterministic():
    key = jax.random.PRNGKey(7)
    a = geometry.make_walls(key)
    b = geometry.make_walls(key)
    np.testing.assert_array_equal(np.asarray(a.p1), np.asarray(b.p1))
    np.testing.assert_array_equal(np.asarray(a.n), np.asarray(b.n))


def test_doors_create_gaps(wallsets):
    """At least one world has a door: two collinear walls with a gap."""
    found_gap = False
    n = np.asarray(wallsets.n)
    p1 = np.asarray(wallsets.p1)
    p2 = np.asarray(wallsets.p2)
    for w in range(p1.shape[0]):
        for i in range(n[w]):
            for j in range(i + 1, n[w]):
                h_i = abs(p1[w, i, 1] - p2[w, i, 1]) < 1e-5
                h_j = abs(p1[w, j, 1] - p2[w, j, 1]) < 1e-5
                if h_i and h_j and abs(p1[w, i, 1] - p1[w, j, 1]) < 1e-5:
                    gap = max(p1[w, j, 0] - p2[w, i, 0],
                              p1[w, i, 0] - p2[w, j, 0])
                    if 0.01 < gap < 0.3:
                        found_gap = True
    assert found_gap


def test_walls_share_one_z_slab(wallsets):
    """Kernel contract (ops/pallas_step.py): every wall slot shares one z
    center/half-extent per world, so the fused kernel hoists the wall-loop
    z slab from slot 0. Debug fixtures must uphold it too."""
    from marl_hideandseek_tpu.config import EnvConfig
    from marl_hideandseek_tpu.env import levelgen

    ws = geometry.scale_walls(wallsets, -ARENA_HALF, ARENA_HALF)
    pos, half, act = jax.vmap(geometry.walls_to_obbs)(ws)
    pos, half = np.asarray(pos), np.asarray(half)
    assert (pos[..., 2] == pos[..., :1, 2]).all()
    assert (half[..., 2] == half[..., :1, 2]).all()

    cfg = EnvConfig(num_worlds=1)
    for level in range(2, 9):
        st = levelgen.generate_world(
            cfg, jnp.zeros((2,), jnp.uint32), jnp.zeros((2,), jnp.uint32),
            jnp.int32(level), jnp.int32(1), jnp.int32(1), jnp.array(False))
        wp = np.asarray(st.statics.wall_pos)
        wh = np.asarray(st.statics.wall_half_ext)
        wa = np.asarray(st.statics.wall_active)
        if wa.any():
            assert (wp[wa, 2] == wp[0, 2]).all(), level
            assert (wh[wa, 2] == wh[0, 2]).all(), level
