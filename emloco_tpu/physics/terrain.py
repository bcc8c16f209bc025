"""Heightfield terrain: on-device height/normal queries + host-side generators.

TPU-native replacement for the reference's triangle-mesh terrain
(/root/reference/pacer/pacer/env/tasks/humanoid_pedestrain_terrain.py:1135-1463
and isaacgym/python/isaacgym/terrain_utils.py:17-360). Instead of
heightfield → trimesh → PhysX BVH, the heightfield itself IS the collision
representation: contact and the policy's height-map sensor both read the same
(H, W) grid with gather + lerp — no trees, no branching, MXU/VPU friendly.

Generators run host-side in numpy at setup time (same place the reference
builds terrain, once per training run).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct


class Heightfield(struct.PyTreeNode):
    """Static world geometry as a pytree (device arrays; shared across envs)."""

    heights: jnp.ndarray               # (H, W) float32 meters
    cell: float = struct.field(pytree_node=False, default=0.1)
    origin: tuple = struct.field(pytree_node=False, default=(0.0, 0.0))
    # sampling table of valid spawn locations (world xy), used for resets
    # (reference: walkable_field + coord sampling, terrain.sample_valid_locations,
    # humanoid_pedestrain_terrain.py:1196-1210)
    spawnable_xy: jnp.ndarray | None = None  # (S, 2) float32
    # Packed cell-corner textures (built by make_heightfield). TPU gathers pay
    # per-row, not per-byte: one (H-1,W-1,4) corner fetch replaces four scalar
    # gathers in the contact path (~4x fewer gather rows), and the min2 texture
    # halves the sensor's lookups. Optional — queries fall back to raw gathers.
    corner_tex: jnp.ndarray | None = None    # (H-1, W-1, 4): h00,h10,h01,h11
    min2_tex: jnp.ndarray | None = None      # (H-1, W-1): min(h00, h11)

    @property
    def shape(self):
        return self.heights.shape


def make_heightfield(heights, cell, origin, spawnable_xy) -> Heightfield:
    """Build a Heightfield with packed corner textures from an (H, W) grid."""
    h = jnp.asarray(heights, jnp.float32)
    h00, h10 = h[:-1, :-1], h[1:, :-1]
    h01, h11 = h[:-1, 1:], h[1:, 1:]
    return Heightfield(
        heights=h, cell=cell, origin=tuple(origin),
        spawnable_xy=jnp.asarray(spawnable_xy),
        corner_tex=jnp.stack([h00, h10, h01, h11], axis=-1),
        min2_tex=jnp.minimum(h00, h11),
    )


def flat_terrain(extent: float = 40.0, cell: float = 0.1) -> Heightfield:
    n = int(extent / cell)
    return make_heightfield(
        heights=jnp.zeros((n, n), jnp.float32),
        cell=cell,
        origin=(-extent / 2, -extent / 2),
        spawnable_xy=jnp.zeros((1, 2), jnp.float32),
    )


def _grid_coords_xy(hf: Heightfield, x, y):
    """World x/y component arrays → fractional grid coords, clamped."""
    gx = (x - hf.origin[0]) / hf.cell
    gy = (y - hf.origin[1]) / hf.cell
    H, W = hf.heights.shape
    gx = jnp.clip(gx, 0.0, H - 1.001)
    gy = jnp.clip(gy, 0.0, W - 1.001)
    return gx, gy


def _grid_coords(hf: Heightfield, xy: jnp.ndarray):
    """World xy → fractional grid coords, clamped inside the grid."""
    return _grid_coords_xy(hf, xy[..., 0], xy[..., 1])


def _corners(hf: Heightfield, x0, y0):
    """Cell corner heights (h00, h10, h01, h11) — ONE packed gather when the
    corner texture exists, else four raw gathers."""
    if hf.corner_tex is not None:
        t = hf.corner_tex[x0, y0]                        # (..., 4)
        return t[..., 0], t[..., 1], t[..., 2], t[..., 3]
    h = hf.heights
    return h[x0, y0], h[x0 + 1, y0], h[x0, y0 + 1], h[x0 + 1, y0 + 1]


def _bilinear_parts(hf: Heightfield, xy: jnp.ndarray):
    gx, gy = _grid_coords(hf, xy)
    x0 = jnp.floor(gx).astype(jnp.int32)
    y0 = jnp.floor(gy).astype(jnp.int32)
    fx = gx - x0
    fy = gy - y0
    return x0, y0, fx, fy


def height_at_min2_xy(hf: Heightfield, x, y) -> jnp.ndarray:
    """Component-array variant of height_at_min2 (avoids trailing-2 stacks —
    TPU lane-padding; see envs/observations.py heightmap_obs).

    The lookup reads min(h00, h11) from the 4-channel CORNER texture with a
    linearized row take — not `min2_tex[x0, y0]`. Inside the compiled train
    epoch, XLA's alternate-memory assignment promotes the 1.7 MB min2
    table into VMEM and lowers its gather to a ~10 ns/lookup scalar
    "custom fusion" (round-5 trace: 16.6 ms/step for the 1,600-env 32x32
    sensor — 53% of the 1.005 s epoch; the same op in a bare env.step scan
    stays a fast HBM gather). A plain linearized take still promotes
    (0.841 s); the 6.9 MB corner texture exceeds the promotion budget, so
    the gather stays on the HBM DMA path in every program context measured:
    epoch 1.005 -> 0.690 s (scripts/epoch_gather_probe.py). Values are
    bit-identical (min2_tex IS min of corner channels 0 and 3)."""
    gx, gy = _grid_coords_xy(hf, x, y)
    x0 = jnp.floor(gx).astype(jnp.int32)
    y0 = jnp.floor(gy).astype(jnp.int32)
    if hf.corner_tex is not None:
        W = hf.corner_tex.shape[1]
        t = jnp.take(hf.corner_tex.reshape(-1, 4), x0 * W + y0, axis=0)
        return jnp.minimum(t[..., 0], t[..., 3])
    if hf.min2_tex is not None:
        W = hf.min2_tex.shape[1]
        return jnp.take(hf.min2_tex.ravel(), x0 * W + y0)
    return jnp.minimum(hf.heights[x0, y0], hf.heights[x0 + 1, y0 + 1])


def height_at(hf: Heightfield, xy: jnp.ndarray) -> jnp.ndarray:
    """Bilinear height at world xy (...,2) → (...). Smooth, differentiable."""
    x0, y0, fx, fy = _bilinear_parts(hf, xy)
    h00, h10, h01, h11 = _corners(hf, x0, y0)
    return (
        h00 * (1 - fx) * (1 - fy)
        + h10 * fx * (1 - fy)
        + h01 * (1 - fx) * fy
        + h11 * fx * fy
    )


def height_at_min2(hf: Heightfield, xy: jnp.ndarray) -> jnp.ndarray:
    """Conservative 2-point min gather — the reference sensor's lookup
    (humanoid_pedestrain_terrain.py:1282-1297 uses min of [x0,y0],[x0+1,y0+1])."""
    return height_at_min2_xy(hf, xy[..., 0], xy[..., 1])


def _normal_from_corners(hf, h00, h10, h01, h11, fx, fy):
    dhdx = ((h10 - h00) * (1 - fy) + (h11 - h01) * fy) / hf.cell
    dhdy = ((h01 - h00) * (1 - fx) + (h11 - h10) * fx) / hf.cell
    n = jnp.stack([-dhdx, -dhdy, jnp.ones_like(dhdx)], axis=-1)
    return n / jnp.linalg.norm(n, axis=-1, keepdims=True)


def normal_at(hf: Heightfield, xy: jnp.ndarray) -> jnp.ndarray:
    """Outward unit surface normal from central differences of the bilinear
    surface — used as the contact frame."""
    x0, y0, fx, fy = _bilinear_parts(hf, xy)
    h00, h10, h01, h11 = _corners(hf, x0, y0)
    return _normal_from_corners(hf, h00, h10, h01, h11, fx, fy)


def height_and_normal_at(hf: Heightfield, xy: jnp.ndarray):
    """Fused bilinear height + surface normal for the contact path — a single
    corner-texture gather serves both (the gather, not the math, is the TPU
    cost; see Heightfield.corner_tex)."""
    x0, y0, fx, fy = _bilinear_parts(hf, xy)
    h00, h10, h01, h11 = _corners(hf, x0, y0)
    h = (h00 * (1 - fx) * (1 - fy) + h10 * fx * (1 - fy)
         + h01 * (1 - fx) * fy + h11 * fx * fy)
    return h, _normal_from_corners(hf, h00, h10, h01, h11, fx, fy)


def corner_patch(hf: Heightfield, center_xy: jnp.ndarray, size: int):
    """Per-env local window of the packed corner texture, fetched as ONE
    dynamic-slice row per env (a vmapped dynamic_slice lowers to a gather
    whose per-ROW cost is what TPU charges — one row per env instead of one
    per contact point). Returns (patch (N, s, s, 4), xb (N,), yb (N,)) with
    the window clamped inside the grid; s = min(size, H-1, W-1)."""
    gx, gy = _grid_coords_xy(hf, center_xy[..., 0], center_xy[..., 1])
    H, W = hf.heights.shape
    sx = min(size, H - 1)
    sy = min(size, W - 1)
    xb = jnp.clip(jnp.floor(gx).astype(jnp.int32) - sx // 2, 0, H - 1 - sx)
    yb = jnp.clip(jnp.floor(gy).astype(jnp.int32) - sy // 2, 0, W - 1 - sy)
    patch = jax.vmap(lambda a, b: jax.lax.dynamic_slice(
        hf.corner_tex, (a, b, 0), (sx, sy, 4)))(xb, yb)
    return patch, xb, yb


def height_and_normal_at_patch(hf: Heightfield, patch, xb, yb,
                               xy: jnp.ndarray, return_oob: bool = False):
    """height_and_normal_at through a corner_patch window: identical math,
    the per-point corner fetch done by two one-hot contractions inside the
    per-env patch (matmuls instead of gather rows). Exact wherever the
    query's cell lies inside the window; points farther than ~size/2 cells
    from the patch center clamp to the window edge (contact points live
    within the humanoid's ~1.2 m reach of the root, so a 32-cell window at
    0.1 m cells has 1.6 m of margin). With `return_oob` also returns the
    (N, C) bool mask of queries whose cell fell OUTSIDE the window (and
    therefore silently clamped — wrong height/normal): callers with
    longer-reach bodies or ragdoll flights should terminate or flag those
    envs instead of mis-colliding (tests/test_engine.py pins the mask)."""
    x0, y0, fx, fy = _bilinear_parts(hf, xy)             # (N, C)
    sx, sy = patch.shape[1], patch.shape[2]
    rx = x0 - xb[:, None]
    ry = y0 - yb[:, None]
    lx = jnp.clip(rx, 0, sx - 1)
    ly = jnp.clip(ry, 0, sy - 1)
    ohx = (lx[..., None] == jnp.arange(sx)).astype(patch.dtype)
    ohy = (ly[..., None] == jnp.arange(sy)).astype(patch.dtype)
    rows = jnp.einsum("ncs,nstk->nctk", ohx, patch)      # (N, C, sy, 4)
    t = jnp.einsum("nct,nctk->nck", ohy, rows)           # (N, C, 4)
    h00, h10, h01, h11 = t[..., 0], t[..., 1], t[..., 2], t[..., 3]
    h = (h00 * (1 - fx) * (1 - fy) + h10 * fx * (1 - fy)
         + h01 * (1 - fx) * fy + h11 * fx * fy)
    n = _normal_from_corners(hf, h00, h10, h01, h11, fx, fy)
    if return_oob:
        oob = (rx != lx) | (ry != ly)
        return h, n, oob
    return h, n


# ---------------------------------------------------------------------------
# Host-side procedural generators (numpy; semantics follow
# isaacgym/terrain_utils.py:17-360 — new implementations, not ports)
# ---------------------------------------------------------------------------

def gen_random_uniform(shape, cell, min_h=-0.1, max_h=0.1, step=0.025, rng=None):
    rng = rng or np.random.RandomState(0)
    levels = np.arange(min_h, max_h + step, step)
    idx = rng.randint(0, len(levels), size=shape)
    return levels[idx].astype(np.float32)


def gen_sloped(shape, cell, slope=0.2, axis=0):
    H, W = shape
    ramp = np.arange(H if axis == 0 else W, dtype=np.float32) * cell * slope
    return np.broadcast_to(ramp[:, None] if axis == 0 else ramp[None, :], shape).copy()


def gen_pyramid_sloped(shape, cell, slope=0.2):
    H, W = shape
    x = np.minimum(np.arange(H), H - 1 - np.arange(H)).astype(np.float32)
    y = np.minimum(np.arange(W), W - 1 - np.arange(W)).astype(np.float32)
    return (np.minimum(x[:, None], y[None, :]) * cell * slope).astype(np.float32)


def gen_discrete_obstacles(shape, cell, max_h=0.15, min_size=0.8, max_size=1.6,
                           num_rects=24, rng=None):
    rng = rng or np.random.RandomState(0)
    H, W = shape
    out = np.zeros(shape, np.float32)
    for _ in range(num_rects):
        w = int(rng.uniform(min_size, max_size) / cell)
        h = int(rng.uniform(min_size, max_size) / cell)
        x = rng.randint(0, max(1, H - h))
        y = rng.randint(0, max(1, W - w))
        out[x:x + h, y:y + w] = rng.choice([-max_h, -max_h / 2, max_h / 2, max_h])
    return out


def gen_wave(shape, cell, num_waves=2, amplitude=0.15):
    H, W = shape
    x = np.linspace(0, num_waves * 2 * np.pi, H)
    y = np.linspace(0, num_waves * 2 * np.pi, W)
    return (amplitude * (np.sin(x)[:, None] + np.cos(y)[None, :]) / 2).astype(np.float32)


def gen_stairs(shape, cell, step_width=0.75, step_height=0.15):
    H, W = shape
    sw = max(1, int(step_width / cell))
    steps = (np.arange(H) // sw).astype(np.float32) * step_height
    return np.broadcast_to(steps[:, None], shape).copy()


def gen_pyramid_stairs(shape, cell, step_width=0.75, step_height=0.12):
    H, W = shape
    sw = max(1, int(step_width / cell))
    x = np.minimum(np.arange(H), H - 1 - np.arange(H))
    y = np.minimum(np.arange(W), W - 1 - np.arange(W))
    ring = np.minimum(x[:, None], y[None, :]) // sw
    return (ring * step_height).astype(np.float32)


def gen_stepping_stones(shape, cell, stone_size=0.8, spacing=0.4, height=0.1,
                        depth=-0.5, rng=None):
    rng = rng or np.random.RandomState(0)
    H, W = shape
    out = np.full(shape, depth, np.float32)
    pitch = max(1, int((stone_size + spacing) / cell))
    size = max(1, int(stone_size / cell))
    for i in range(0, H, pitch):
        off = rng.randint(0, pitch)
        for j in range(-pitch, W, pitch):
            jj = j + off
            if jj < 0 or jj + size > W:
                continue
            out[i:i + size, jj:jj + size] = rng.uniform(-height, height)
    return out


def gen_poles(shape, cell, num_poles=40, radius=0.15, height=2.0, rng=None):
    """Vertical obstacle poles (reference draw_utils.py shape rasterizers +
    'poles' terrain type, humanoid_pedestrain_terrain.py terrain proportions)."""
    rng = rng or np.random.RandomState(0)
    H, W = shape
    out = np.zeros(shape, np.float32)
    rr = max(1, int(radius / cell))
    for _ in range(num_poles):
        cx, cy = rng.randint(rr, H - rr), rng.randint(rr, W - rr)
        out[cx - rr:cx + rr, cy - rr:cy + rr] = height
    return out


_GENERATORS = {
    "random_uniform": gen_random_uniform,
    "sloped": gen_sloped,
    "pyramid_sloped": gen_pyramid_sloped,
    "discrete_obstacles": gen_discrete_obstacles,
    "wave": gen_wave,
    "stairs": gen_stairs,
    "pyramid_stairs": gen_pyramid_stairs,
    "stepping_stones": gen_stepping_stones,
    "poles": gen_poles,
}


def walkable_mask(heights: np.ndarray, cell: float, max_slope: float = 0.5,
                  margin_cells: int = 3) -> np.ndarray:
    """Cells whose local slope is below max_slope, eroded by a safety margin
    (reference: walkable_field_raw + binary dilation,
    humanoid_pedestrain_terrain.py:1196-1210)."""
    gx, gy = np.gradient(heights, cell)
    bad = (np.abs(gx) >= max_slope) | (np.abs(gy) >= max_slope)
    # separable box dilation of the bad mask by margin (borders count as bad)
    k = margin_cells
    H, W = heights.shape
    padded = np.pad(bad, k, constant_values=True)
    rows = np.zeros((H, W + 2 * k), bool)
    for dx in range(-k, k + 1):
        rows |= padded[k + dx:k + dx + H, :]
    out = np.zeros((H, W), bool)
    for dy in range(-k, k + 1):
        out |= rows[:, k + dy:k + dy + W]
    return ~out


def generate_mixed_terrain(
    map_length: float = 8.0,
    num_tiles: int = 8,
    cell: float = 0.1,
    proportions=(0.2, 0.1, 0.15, 0.15, 0.05, 0.1, 0.15, 0.1),
    types=("random_uniform", "sloped", "pyramid_sloped", "discrete_obstacles",
           "wave", "stairs", "pyramid_stairs", "stepping_stones"),
    difficulty: float = 1.0,
    seed: int = 0,
    border_cells: int = 10,
    curriculum: bool = False,
) -> Heightfield:
    """Tiled multi-type terrain with spawn table — semantic equivalent of the
    reference Terrain class (humanoid_pedestrain_terrain.py:1135-1463): a grid
    of num_tiles × num_tiles sub-terrains, type sampled by proportions,
    difficulty scaling heights/slopes, plus flat border. With
    curriculum=True, difficulty grades with the tile row — easy tiles on one
    edge, hardest on the other (reference cfg["curriculum"] → curiculum(),
    humanoid_pedestrain_terrain.py:1169-1173)."""
    rng = np.random.RandomState(seed)
    tile = int(map_length / cell)
    n = num_tiles * tile + 2 * border_cells
    big = np.zeros((n, n), np.float32)
    cum = np.cumsum(proportions) / np.sum(proportions)
    for i in range(num_tiles):
        for j in range(num_tiles):
            u = rng.rand()
            t = types[int(np.searchsorted(cum, u))]
            if curriculum:
                d = difficulty * (i + 1) / num_tiles
            else:
                d = difficulty * rng.uniform(0.4, 1.0)
            kwargs = {}
            if t == "random_uniform":
                kwargs = dict(min_h=-0.08 * d, max_h=0.08 * d, rng=rng)
            elif t in ("sloped", "pyramid_sloped"):
                kwargs = dict(slope=0.35 * d)
            elif t == "discrete_obstacles":
                kwargs = dict(max_h=0.12 * d, rng=rng)
            elif t == "wave":
                kwargs = dict(amplitude=0.12 * d)
            elif t in ("stairs", "pyramid_stairs"):
                kwargs = dict(step_height=0.10 * d)
            elif t == "stepping_stones":
                kwargs = dict(height=0.05 * d, depth=-0.2 * d, rng=rng)
            patch = _GENERATORS[t]((tile, tile), cell, **kwargs)
            x0 = border_cells + i * tile
            y0 = border_cells + j * tile
            big[x0:x0 + tile, y0:y0 + tile] = patch

    # native C++ path with numpy fallback (single implementation for the
    # mask/spawn-table logic across all terrain builders)
    from ..native.terrain import fast_spawn_table, fast_walkable_mask
    mask = fast_walkable_mask(big, cell)
    extent = n * cell
    origin = (-extent / 2, -extent / 2)
    xy = fast_spawn_table(mask, cell, origin, max_pts=65536, seed=seed)
    return make_heightfield(heights=big, cell=cell, origin=origin,
                            spawnable_xy=xy)
