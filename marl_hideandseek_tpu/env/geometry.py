"""Procedural wall/door grammar in fixed-shape JAX.

Re-implements the capability of the reference's room generator
(reference: src/geo_gen.cpp:429-505): start from the unit-square border walls,
apply a random sequence of two operations —

  * ``WallConnectAndAddDoor``: connect two parallel walls with a
    perpendicular connector wall, then cut a door into the connector
    (reference: src/geo_gen.cpp:311-409), and
  * ``WallAddDoor``: cut a door into a random sufficiently-long wall
    (reference: src/geo_gen.cpp:411-421),

then scale everything to the [-18, 18]^2 arena. The TPU design replaces the
reference's tmp-alloc growable arrays and data-dependent loops with a fixed
wall-slot capacity (``MAX_WALLS``) and bounded ``lax`` loops, so the grammar
traces into a single static-shape XLA program and can be vmapped over worlds.

RNG parity is structural, not bit-exact: the same draws are made in the same
order with `jax.random` threefry keys instead of the engine RNG (see SURVEY.md
§2.4 E7).

All functions in this module are single-world; `levelgen.py` vmaps them.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from marl_hideandseek_tpu.config import MAX_WALLS

# Normalized door widths (reference: src/geo_gen.cpp:272, 412).
DOOR_SIZE_CONNECT = 0.1
DOOR_SIZE_ADD = 0.2

# Operation-count bounds (reference: src/geo_gen.cpp:430-440).
MAX_ADD_DOORS = 7
MAX_CONNECT = 6
# connect ops: 1 + U[0, 6) in [1, 6]; door ops: 4 + U[0, 3) in [4, 6].
MAX_TOTAL_OPS = 12

_EPS_H = 1e-6  # horizontal test tolerance (reference: src/geo_gen.cpp:68)


@struct.dataclass
class WallSet:
    """Fixed-capacity wall segments for one world (normalized unit square)."""

    p1: jnp.ndarray  # [MAX_WALLS, 2] f32, componentwise p1 <= p2
    p2: jnp.ndarray  # [MAX_WALLS, 2] f32
    n: jnp.ndarray   # scalar i32, number of live walls


def _sort_endpoints(p1, p2):
    """Wall invariant: p1 < p2 componentwise (reference: src/geo_gen.cpp:60-65)."""
    swap = (p1[0] > p2[0]) | (p1[1] > p2[1])
    return (jnp.where(swap, p2, p1), jnp.where(swap, p1, p2))


def wall_is_horizontal(ws: WallSet) -> jnp.ndarray:
    return jnp.abs(ws.p1[:, 1] - ws.p2[:, 1]) < _EPS_H


def wall_length(ws: WallSet) -> jnp.ndarray:
    horiz = wall_is_horizontal(ws)
    return jnp.where(horiz, ws.p2[:, 0] - ws.p1[:, 0], ws.p2[:, 1] - ws.p1[:, 1])


def wall_active(ws: WallSet) -> jnp.ndarray:
    return jnp.arange(MAX_WALLS) < ws.n


# Traced-index reads/writes below are one-hot select/reduce, NOT
# arr[idx] / arr.at[idx].set: under vmap over 16K worlds those lower to
# batched gather/scatter, which the TPU executes as serial loops — the
# wall grammar went from ~1s to ~ms per regen step with this form.


def _row_read(arr: jnp.ndarray, idx) -> jnp.ndarray:
    """arr[idx] for arr [K, ...] with traced scalar idx, gather-free."""
    oh = jnp.arange(arr.shape[0]) == idx
    oh = oh.reshape(oh.shape + (1,) * (arr.ndim - 1))
    return jnp.sum(jnp.where(oh, arr, 0), axis=0)


def _row_write(arr: jnp.ndarray, idx, val, do) -> jnp.ndarray:
    """arr.at[idx].set(val) where do, scatter-free."""
    oh = (jnp.arange(arr.shape[0]) == idx) & do
    oh = oh.reshape(oh.shape + (1,) * (arr.ndim - 1))
    return jnp.where(oh, val, arr)


def _append_wall(ws: WallSet, p1, p2, do) -> WallSet:
    p1, p2 = _sort_endpoints(p1, p2)
    idx = jnp.clip(ws.n, 0, MAX_WALLS - 1)
    return ws.replace(p1=_row_write(ws.p1, idx, p1, do),
                      p2=_row_write(ws.p2, idx, p2, do),
                      n=ws.n + do.astype(jnp.int32))


def _set_wall(ws: WallSet, idx, p1, p2, do) -> WallSet:
    p1, p2 = _sort_endpoints(p1, p2)
    return ws.replace(p1=_row_write(ws.p1, idx, p1, do),
                      p2=_row_write(ws.p2, idx, p2, do))


def _pick_nth_true(mask: jnp.ndarray, nth: jnp.ndarray) -> jnp.ndarray:
    """Slot index of the nth (0-based) set element of mask; 0 if none."""
    cs = jnp.cumsum(mask.astype(jnp.int32))
    return jnp.argmax(cs == nth + 1)


def add_door(ws: WallSet, idx, door_size, key, do) -> WallSet:
    """Cut a door of width `door_size` into wall `idx`
    (reference: src/geo_gen.cpp:275-307).

    The wall is shortened to end at door_lo and a new wall [door_hi, old_end]
    is appended; the door position is uniform in the middle 40% of the span.
    """
    p1 = _row_read(ws.p1, idx)
    p2 = _row_read(ws.p2, idx)
    horiz = jnp.abs(p1[1] - p2[1]) < _EPS_H

    u = jax.random.uniform(key)
    rat = 0.3 + 0.4 * u

    # Work on the wall's major axis: 0 for horizontal, 1 for vertical.
    # Componentwise selects instead of p[ax] (traced-index ops batch badly).
    is_x = horiz
    lo = jnp.where(is_x, p1[0], p1[1]) + door_size
    hi = jnp.where(is_x, p2[0], p2[1]) - door_size
    c = lo + rat * (hi - lo)

    old_end = jnp.where(is_x, p2[0], p2[1])

    def set_ax(v, val):
        return jnp.stack([jnp.where(is_x, val, v[0]),
                          jnp.where(is_x, v[1], val)])

    shrunk_p2 = set_ax(p2, c - 0.5 * door_size)
    new_p1 = set_ax(p1, c + 0.5 * door_size)
    new_p2 = set_ax(p1, old_end)

    ws = _set_wall(ws, idx, p1, shrunk_p2, do)
    ws = _append_wall(ws, new_p1, new_p2, do)
    return ws


def _swap_xy(ws: WallSet) -> WallSet:
    return ws.replace(p1=ws.p1[:, ::-1], p2=ws.p2[:, ::-1])


def _select_ws(pred, a: WallSet, b: WallSet) -> WallSet:
    """where(pred, a, b) over a WallSet (pred scalar)."""
    return WallSet(p1=jnp.where(pred, a.p1, b.p1),
                   p2=jnp.where(pred, a.p2, b.p2),
                   n=jnp.where(pred, a.n, b.n))


def _find_another_wall(ws: WallSet, list_mask, chosen, min_len, key):
    """Vectorized findAnotherWall (reference: src/geo_gen.cpp:177-270),
    specialized to horizontal walls (callers canonicalize by swapping axes).

    Returns (slot index, found flag). Candidate order matches the reference:
    rotate through the orientation list from a random start, take the first
    candidate that (a) overlaps the chosen wall's x-span, (b) passes the
    length floor, and (c) has no third wall strictly between the two y's
    over the shared x-range.
    """
    k = jnp.arange(MAX_WALLS)
    cand = list_mask & (k != chosen)

    cp1 = _row_read(ws.p1, chosen)
    cp2 = _row_read(ws.p2, chosen)
    cy = cp1[1]
    c_len = cp2[0] - cp1[0]

    jy = ws.p1[:, 1]
    j_len = ws.p2[:, 0] - ws.p1[:, 0]

    overlap = ~((cp1[0] >= ws.p2[:, 0]) | (cp2[0] <= ws.p1[:, 0]))
    len_ok = (c_len >= min_len) & (j_len >= min_len)

    # "No wall in between" check: [K_cand, K_blocker].
    high = jnp.minimum(cp2[0], ws.p2[:, 0])  # [K] per candidate j
    low = jnp.maximum(cp1[0], ws.p1[:, 0])
    bp1x = ws.p1[:, 0][None, :]
    bp2x = ws.p2[:, 0][None, :]
    by = ws.p1[:, 1][None, :]
    ib_lo = jnp.maximum(bp1x, low[:, None] - 0.1)
    ib_hi = jnp.minimum(bp2x, high[:, None] + 0.1)
    y_min = jnp.minimum(cy, jy)[:, None]
    y_max = jnp.maximum(cy, jy)[:, None]
    blocker = (
        list_mask[None, :]
        & (k[None, :] != k[:, None])
        & (ib_lo < ib_hi)
        & (by > y_min)
        & (by < y_max)
    )
    blocked = jnp.any(blocker, axis=1)

    valid = cand & overlap & len_ok & ~blocked

    # Rotated-order first valid candidate.
    list_len = jnp.sum(list_mask.astype(jnp.int32))
    pos = jnp.cumsum(list_mask.astype(jnp.int32)) - 1  # list position per slot
    start = jax.random.randint(key, (), 0, jnp.maximum(list_len, 1))
    rank = jnp.where(valid, (pos - start) % jnp.maximum(list_len, 1), MAX_WALLS + 1)
    best = jnp.argmin(rank)
    found = jnp.any(valid)
    return best, found


def _connect_walls_canonical(ws: WallSet, list_mask, idx_a, idx_b, key, do):
    """Connect two horizontal walls with a vertical connector + door
    (reference: src/geo_gen.cpp:340-375), canonical horizontal case."""
    ya = _row_read(ws.p1, idx_a)[1]
    yb = _row_read(ws.p1, idx_b)[1]
    # "first" has the lower y (reference: src/geo_gen.cpp:346).
    first = jnp.where(ya <= yb, idx_a, idx_b)
    second = jnp.where(ya <= yb, idx_b, idx_a)

    f_p1 = _row_read(ws.p1, first)
    f_p2 = _row_read(ws.p2, first)
    s_p1 = _row_read(ws.p1, second)
    s_p2 = _row_read(ws.p2, second)

    high = jnp.minimum(f_p2[0], s_p2[0])
    low = jnp.maximum(f_p1[0], s_p1[0])
    k_rat, k_door = jax.random.split(key)
    rat = 0.4 + 0.2 * jax.random.uniform(k_rat)
    x = low + rat * (high - low)

    connector_idx = ws.n  # slot of the wall we are about to append
    ws = _append_wall(
        ws, jnp.array([x, f_p1[1]]), jnp.array([x, s_p1[1]]), do)

    # Split both walls at x.
    f_old_end = f_p2[0]
    s_old_end = s_p2[0]
    ws = _set_wall(ws, first, f_p1, f_p2.at[0].set(x), do)
    ws = _set_wall(ws, second, s_p1, s_p2.at[0].set(x), do)
    ws = _append_wall(
        ws, jnp.array([x, f_p1[1]]), jnp.array([f_old_end, f_p1[1]]), do)
    ws = _append_wall(
        ws, jnp.array([x, s_p1[1]]), jnp.array([s_old_end, s_p1[1]]), do)

    ws = add_door(ws, connector_idx, DOOR_SIZE_CONNECT, k_door, do)
    return ws


def op_connect_and_add_door(ws: WallSet, key, do) -> WallSet:
    """WallConnectAndAddDoor with up to 5 retry attempts
    (reference: src/geo_gen.cpp:311-409, retry cap at :334)."""

    def attempt(carry, akey):
        ws, done = carry
        k_orient, k_wall, k_find, k_conn = jax.random.split(akey, 4)

        horiz = jax.random.randint(k_orient, (), 0, 2) == 1
        act = wall_active(ws)
        h_mask = act & wall_is_horizontal(ws)
        list_mask = jnp.where(horiz, h_mask, act & ~h_mask)

        # Canonicalize: vertical case runs on xy-swapped geometry.
        # jnp.where, not lax.cond: under vmap a batched cond lowers to
        # machinery far more expensive than this 2-element select.
        ws_c = _select_ws(horiz, ws, _swap_xy(ws))
        list_mask_c = jnp.where(
            horiz, h_mask, act & wall_is_horizontal(_swap_xy(ws)))
        min_len = jnp.where(horiz, 0.3, 0.5)

        list_len = jnp.sum(list_mask_c.astype(jnp.int32))
        nth = jax.random.randint(k_wall, (), 0, jnp.maximum(list_len, 1))
        chosen = _pick_nth_true(list_mask_c, nth)

        other, found = _find_another_wall(
            ws_c, list_mask_c, chosen, min_len, k_find)

        do_here = do & (~done) & found & (list_len > 0)
        ws_c = _connect_walls_canonical(
            ws_c, list_mask_c, chosen, other, k_conn, do_here)
        ws_new = _select_ws(horiz, ws_c, _swap_xy(ws_c))

        return (ws_new, done | found), None

    keys = jax.random.split(key, 5)
    (ws, _), _ = jax.lax.scan(attempt, (ws, jnp.array(False)), keys)
    return ws


def op_add_door(ws: WallSet, key, do) -> WallSet:
    """WallAddDoor (reference: src/geo_gen.cpp:411-421): random wall,
    door only if length > 3 * door size."""
    k_wall, k_door = jax.random.split(key)
    idx = jax.random.randint(k_wall, (), 0, jnp.maximum(ws.n, 1))
    length = _row_read(wall_length(ws), idx)
    do = do & (length > 3.0 * DOOR_SIZE_ADD)
    return add_door(ws, idx, DOOR_SIZE_ADD, k_door, do)


def make_walls(key: jnp.ndarray) -> WallSet:
    """Full grammar for one world (reference: src/geo_gen.cpp:429-465).

    Seeds the unit-square border, samples op counts, then applies ops chosen
    uniformly among op types with remaining budget until both budgets hit 0.
    """
    p1 = jnp.zeros((MAX_WALLS, 2))
    p2 = jnp.zeros((MAX_WALLS, 2))
    ws = WallSet(p1=p1, p2=p2, n=jnp.array(0, jnp.int32))

    t = jnp.array(True)
    ws = _append_wall(ws, jnp.array([0.0, 0.0]), jnp.array([1.0, 0.0]), t)
    ws = _append_wall(ws, jnp.array([0.0, 0.0]), jnp.array([0.0, 1.0]), t)
    ws = _append_wall(ws, jnp.array([0.0, 1.0]), jnp.array([1.0, 1.0]), t)
    ws = _append_wall(ws, jnp.array([1.0, 1.0]), jnp.array([1.0, 0.0]), t)

    k_counts, k_ops = jax.random.split(key)
    k_c, k_d = jax.random.split(k_counts)
    n_connect = 1 + jax.random.randint(k_c, (), 0, MAX_CONNECT)
    n_door = 4 + jax.random.randint(k_d, (), 0, MAX_ADD_DOORS - 4)

    def body(carry, op_key):
        ws, counts = carry
        k_sel, k_op = jax.random.split(op_key)

        avail = counts > 0
        n_avail = jnp.sum(avail.astype(jnp.int32))
        # Uniform over *available op types* (reference:
        # src/geo_gen.cpp:122-136 selects uniformly over the live list).
        r = jax.random.randint(k_sel, (), 0, jnp.maximum(n_avail, 1))
        op = _pick_nth_true(avail, r)
        do = n_avail > 0
        counts = counts.at[op].add(jnp.where(do, -1, 0))

        # Both ops run, select after (a vmapped lax.cond would do the same
        # with extra overhead; the op bodies are cheap select chains).
        is_connect = op == 0
        ws_a = op_connect_and_add_door(ws, k_op, do & is_connect)
        ws_b = op_add_door(ws, k_op, do & ~is_connect)
        ws = _select_ws(is_connect, ws_a, ws_b)
        return (ws, counts), None

    counts = jnp.array([0, 0], jnp.int32)
    counts = counts.at[0].set(n_connect)
    counts = counts.at[1].set(n_door)
    op_keys = jax.random.split(k_ops, MAX_TOTAL_OPS)
    (ws, _), _ = jax.lax.scan(body, (ws, counts), op_keys)
    return ws


def scale_walls(ws: WallSet, lo: float, hi: float) -> WallSet:
    """Scale normalized walls into [lo, hi]^2 (reference: src/geo_gen.cpp:163-174)."""
    rng = hi - lo
    return ws.replace(p1=lo + rng * ws.p1, p2=lo + rng * ws.p2)


# World-space wall geometry constants (reference: src/geo_gen.cpp:487-497
# scale (len, 0.2, 1) applied to wall_collision.obj whose local box is
# x,y in [-1,1], z in [0, 2.5]).
WALL_HALF_THICKNESS = 0.2
WALL_HEIGHT = 2.5


def walls_to_obbs(ws: WallSet):
    """Convert wall segments to static axis-aligned boxes.

    Returns (pos [K,3], half_ext [K,3], active [K]). Degenerate
    (near-zero-length) walls produced by door cuts on short walls are kept,
    matching the reference which instantiates every wall slot.
    """
    horiz = wall_is_horizontal(ws)
    center2 = 0.5 * (ws.p1 + ws.p2)
    half_len_x = jnp.where(horiz, ws.p2[:, 0] - center2[:, 0], WALL_HALF_THICKNESS)
    half_len_y = jnp.where(horiz, WALL_HALF_THICKNESS, ws.p2[:, 1] - center2[:, 1])
    pos = jnp.stack(
        [center2[:, 0], center2[:, 1],
         jnp.full_like(center2[:, 0], 0.5 * WALL_HEIGHT)], axis=-1)
    half = jnp.stack(
        [half_len_x, half_len_y, jnp.full_like(half_len_x, 0.5 * WALL_HEIGHT)],
        axis=-1)
    return pos, half, wall_active(ws)
