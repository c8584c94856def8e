"""Branchless, in-graph dynamic constraint reconfiguration.

The reference rebuilds its sparse constraint system every control step with
data-dependent Python branches (`/root/reference/src/simhelpers.py:11-140`):
velocity-funnel signs from the velocity signs, a debris-avoidance half-plane
whose slope is re-derived from the current estimate and a bounding-box vertex
chosen by above/below and inside/outside-x tests, activation gating by a
detection distance, an L1 position-dependent velocity-funnel bound, and the
in-track coordinate swaps. Under jit this must be straight-line arithmetic:
everything becomes ``jnp.where`` selections producing

    (c1, c2, s)           the three dynamic A-matrix coefficients, and
    (lineq, uineq)        the inequality bound vectors

with identical semantics, verified element-by-element against a branchy NumPy
oracle in the test suite. ``inTrack`` is a static (shape-constant) flag; the
reference's in-place estimate swap side effect is reproduced by the rollout
(see ``rollout.discrete``), not here.
"""

from __future__ import annotations

from typing import NamedTuple

import flax.struct
import jax.numpy as jnp
import numpy as np


@flax.struct.dataclass
class ConstraintGeom:
    """Geometry/config pytree consumed by the per-step reconfiguration.

    ``in_track`` is static aux data (it selects code paths); with no debris
    the center defaults replicate the reference's ``(-inf, -inf)`` sentinel so
    every activation test is False (`simhelpers.py:60-64`).
    """

    rp: jnp.ndarray  # platform radius
    rx: jnp.ndarray  # target x (already swapped appropriately — xr[0])
    ry: jnp.ndarray  # target y (xr[1])
    is_reject: jnp.ndarray  # 0./1. offset-free switch
    center: jnp.ndarray  # (2,) debris center (possibly +-inf sentinel)
    side: jnp.ndarray  # debris bounding-box side length
    detect: jnp.ndarray  # detection distance
    verts: jnp.ndarray  # (4,2) bounding-box vertices, pre-rotated for in-track
    in_track: bool = flax.struct.field(pytree_node=False)


def make_geometry(sim, debris, dtype=jnp.float64) -> ConstraintGeom:
    """Build the static geometry pytree from host config objects."""
    if debris is not None:
        verts = debris.constructVertArr()
        if sim.inTrack:
            # rotate vertex labels one step (reference `simhelpers.py:51-54`)
            verts = verts[[1, 2, 3, 0], :]
        center = np.asarray(debris.center, dtype=np.float64)
        side = float(debris.side_length)
        detect = float(debris.detect_distance)
    else:
        verts = np.zeros((4, 2))
        center = np.array([-np.inf, -np.inf])
        side = 0.0
        detect = np.inf
    return ConstraintGeom(
        rp=jnp.asarray(sim.r_p, dtype=dtype),
        rx=jnp.asarray(sim.xr[0], dtype=dtype),
        ry=jnp.asarray(sim.xr[1], dtype=dtype),
        is_reject=jnp.asarray(float(sim.isReject), dtype=dtype),
        center=jnp.asarray(center, dtype=dtype),
        side=jnp.asarray(side, dtype=dtype),
        detect=jnp.asarray(detect, dtype=dtype),
        verts=jnp.asarray(verts, dtype=dtype),
        in_track=bool(sim.inTrack),
    )


class DynamicConstraints(NamedTuple):
    c1: jnp.ndarray  # funnel sign on x-velocity
    c2: jnp.ndarray  # funnel sign on y-velocity
    s: jnp.ndarray  # debris row coefficient (= -slope)
    xmin: jnp.ndarray  # (5,) per-block state lower bounds
    xmax: jnp.ndarray  # (5,) per-block state upper bounds
    xest_stored: jnp.ndarray  # (6,) estimate after the reference's in-place swap


def configure(geom: ConstraintGeom, xest: jnp.ndarray) -> DynamicConstraints:
    """Per-step dynamic constraint values from the current 6-state estimate.

    Straight-line translation of `simhelpers.py:66-138`. ``xest`` is the
    *unswapped* estimate [x, y, vx, vy, dx, dy].
    """
    dtype = xest.dtype
    one = jnp.ones((), dtype=dtype)
    inf = jnp.asarray(jnp.inf, dtype=dtype)

    c1 = jnp.where(xest[2] >= 0, one, -one)
    c2 = jnp.where(xest[3] >= 0, one, -one)

    # Reference swaps (e) and keeps an unswapped copy (xestCalc); `simhelpers.py:70-77`
    if geom.in_track:
        e0, e1 = xest[1], xest[0]
        ctr0 = geom.center[1]
    else:
        e0, e1 = xest[0], xest[1]
        ctr0 = geom.center[0]
    xc0, xc1 = xest[0], xest[1]

    half = geom.side / 2.0
    inside_x = ((e0 - (ctr0 + half)) < 0) & ((e0 - (ctr0 - half)) > 0)
    above = e1 >= 0

    # vertex selection (`simhelpers.py:80-103`): above -> v1 if inside else v0;
    # below -> v2 if inside else v3. Computed in ORIGINAL coordinates.
    v_above = jnp.where(inside_x, geom.verts[1], geom.verts[0])
    v_below = jnp.where(inside_x, geom.verts[2], geom.verts[3])
    v = jnp.where(above, v_above, v_below)
    dx = xc0 - v[0]
    # guard the division; the slope is only *used* when debris is active
    safe_dx = jnp.where(dx == 0, jnp.asarray(1.0, dtype=dtype), dx)
    slope_raw = (xc1 - v[1]) / safe_dx
    has_debris = jnp.isfinite(ctr0)
    slope = jnp.where(has_debris, slope_raw, jnp.zeros((), dtype=dtype))
    inter = -slope * xc0 + xc1

    # debris half-plane activation (`simhelpers.py:118-133`): inside the box's
    # x-extent, or within detect distance ahead of its +x face
    approach = e0 - (ctr0 + half)
    active = inside_x | ((approach < geom.detect) & (approach > 0))

    l1_bound = jnp.abs(xc0 - geom.rx) + jnp.abs(xc1 - geom.ry)

    lo_deb = jnp.where(above & active, inter, -inf)
    hi_deb = jnp.where((~above) & active, inter, inf)

    xmin = jnp.stack([one, one, geom.rp.astype(dtype), jnp.zeros((), dtype=dtype), lo_deb])
    xmax = jnp.stack([inf, inf, inf, l1_bound, hi_deb])

    if geom.in_track:
        xest_stored = xest.at[0].set(xest[1]).at[1].set(xest[0])
    else:
        xest_stored = xest

    return DynamicConstraints(
        c1=c1, c2=c2, s=-slope, xmin=xmin, xmax=xmax, xest_stored=xest_stored
    )


def assemble_bounds(dyn: DynamicConstraints, xest: jnp.ndarray, dims, umin, umax,
                    is_reject) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Stack the full inequality bound vectors (`simhelpers.py:137-138`):
    xmin/xmax over Nb+1 blocks, +-inf over the remaining Nx-Nb blocks,
    the input/slack box over Nc, and the disturbance equality isReject*d_hat.
    """
    dtype = xest.dtype
    ny = dims.ny
    inf_blk = jnp.full(((dims.Nx - dims.Nb) * ny,), jnp.inf, dtype=dtype)
    d_eq = is_reject * xest[4:6]
    lineq = jnp.concatenate(
        [jnp.tile(dyn.xmin, dims.Nb + 1), -inf_blk, jnp.tile(umin, dims.Nc), d_eq]
    )
    uineq = jnp.concatenate(
        [jnp.tile(dyn.xmax, dims.Nb + 1), inf_blk, jnp.tile(umax, dims.Nc), d_eq]
    )
    return lineq, uineq
