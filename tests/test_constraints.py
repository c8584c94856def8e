"""Property test: the branchless in-graph constraint reconfiguration
(`ops.constraints.configure`) must match the branchy NumPy oracle translation
(`tools.ref_sim.configure_dynamic_np`) of `simhelpers.py:11-140` on random
states, for radial and in-track geometry, with and without debris."""

import numpy as np
import jax.numpy as jnp
import pytest

from mpc_arpo_project_tpu.config import SimConditions, Debris
from mpc_arpo_project_tpu.ops import constraints
from tools.ref_sim import configure_dynamic_np


def _sim(in_track):
    if in_track:
        x0 = np.array([-10.0, 100.0, 0.0, 0.0])
        xr = np.array([0.0, 2.5, 0.0, 0.0])
    else:
        x0 = np.array([100.0, 10.0, 0.0, 0.0])
        xr = np.array([2.5, 0.0, 0.0, 0.0])
    return SimConditions(
        x0, xr, 2.5, 10 * np.pi / 180, 1.5, 1.107e-3, 0.5, True, (0.2, 45.0),
        None, in_track, T_final=150.0,
    )


@pytest.mark.parametrize("in_track", [False, True])
@pytest.mark.parametrize("has_debris", [True, False])
def test_branchless_matches_branchy(in_track, has_debris):
    sim = _sim(in_track)
    debris = Debris((0.0, 40.0) if in_track else (40.0, 0.0), 5.0, 20.0) if has_debris else None
    geom = constraints.make_geometry(sim, debris)
    rng = np.random.default_rng(0)
    for _ in range(300):
        # random states spanning inside/outside/approaching the debris box
        xest = np.concatenate(
            [
                rng.uniform(-80, 120, size=1),
                rng.uniform(-80, 120, size=1),
                rng.uniform(-2, 2, size=2),
                rng.uniform(-2, 2, size=2),
            ]
        )
        dyn = constraints.configure(geom, jnp.asarray(xest))
        e_mut = xest.copy()
        C1, C2, slope, xmin, xmax = configure_dynamic_np(sim, debris, e_mut)
        assert float(dyn.c1) == C1
        assert float(dyn.c2) == C2
        np.testing.assert_allclose(float(dyn.s), -slope, rtol=1e-12, atol=1e-12)
        np.testing.assert_allclose(np.asarray(dyn.xmin), xmin, rtol=1e-12)
        np.testing.assert_allclose(np.asarray(dyn.xmax), xmax, rtol=1e-12)
        # the reference's in-place swap side effect
        np.testing.assert_allclose(np.asarray(dyn.xest_stored), e_mut, rtol=0)


def test_no_debris_sentinel_never_activates():
    sim = _sim(False)
    geom = constraints.make_geometry(sim, None)
    dyn = constraints.configure(geom, jnp.asarray([50.0, -3.0, -0.1, 0.2, 0.0, 0.0]))
    assert float(dyn.s) == 0.0
    assert np.isneginf(float(dyn.xmin[4]))
    assert np.isposinf(float(dyn.xmax[4]))
