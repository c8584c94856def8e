"""Viz smoke tests: report figures render and save; animation exports a GIF;
run archives round-trip (the reference's RunObjs pickle workflow)."""

import os

import numpy as np
import jax
import jax.numpy as jnp

from mpc_arpo_project_tpu.config import SimConditions, MPCParams, FailsafeParams, Debris, Noise
from mpc_arpo_project_tpu.rollout import discrete
from mpc_arpo_project_tpu.ops import admm
from mpc_arpo_project_tpu.viz import figurePlotSave, simrun_from_rollout, animate_trajectory
from mpc_arpo_project_tpu.utils.archive import save_run, load_run


def _run(tmp=None):
    v_ecr = 50000.0 * np.ones(5)
    v_ecr[-2] *= -1
    v_ecr[-1] = 0.0
    mpc = MPCParams(
        8e2 * np.diag([0.2**2, 10**2, 3.8**2, 900.0]), 1000**2 * np.eye(2),
        5**2 * np.eye(5), v_ecr, {"Nx": 40, "Nc": 5, "Nb": 5}, (0.2, 0.2),
    )
    fail = FailsafeParams(
        0.005 * np.diag([0.0001, 1, 100000.0, 1.0, 0.01]), 100 * np.eye(2),
        np.eye(1, 4), np.zeros((2, 2)),
    )
    debris = Debris((40.0, 0.0), 5.0, 20.0)
    sim = SimConditions(
        np.array([100.0, 10.0, 0.0, 0.0]), np.array([2.5, 0.0, 0.0, 0.0]), 2.5,
        10 * np.pi / 180, 1.5, 1.107e-3, 0.5, True, (0.2, 45.0),
        Noise((0.4, 0.4), 20), False, T_final=30.0,
    )
    engine = discrete.build_engine(sim, mpc, fail, debris,
                                   settings=admm.ADMMSettings(max_iter=500),
                                   dtype=jnp.float64)
    noise = discrete.make_noise_sequence(engine, jax.random.key(0), 1)
    out = jax.jit(discrete.rollout)(engine, noise)
    return sim, debris, simrun_from_rollout(out, 0)


def test_report_figures_save(tmp_path):
    sim, debris, run = _run()
    figurePlotSave(sim, debris, run, saveCounter=0, out_dir=str(tmp_path))
    for stem in ("combCons0", "trueANDest0", "contrHist0"):
        p = tmp_path / f"{stem}.png"
        assert p.exists() and p.stat().st_size > 10_000


def test_animation_export(tmp_path):
    sim, debris, run = _run()
    out = animate_trajectory(sim, run, debris,
                             out_path=str(tmp_path / "anim.gif"),
                             stride=10, max_frames=6, fps=4)
    assert os.path.exists(out) and os.path.getsize(out) > 20_000


def test_run_archive_roundtrip(tmp_path):
    sim, debris, run = _run()
    p = save_run(str(tmp_path / "Run0.pkl"), sim, run, debris)
    sim2, run2, debris2 = load_run(p)
    assert sim2.T_final == sim.T_final
    assert run2.i_term == run.i_term
    np.testing.assert_allclose(run2.x_true_pcw, run.x_true_pcw)
    assert debris2.center == debris.center


def test_interactive_html_export(tmp_path):
    """The live-animation HTML export (viz.animate_html) embeds the full
    telemetry and the interaction affordances of the reference's VPython
    scene (`animateTrajectory.py:151-235`) in one self-contained file."""
    from mpc_arpo_project_tpu.viz import export_html

    sim, debris, run = _run()
    out = export_html(sim, run, debris, out_path=str(tmp_path / "anim.html"))
    assert os.path.exists(out)
    html = open(out).read()
    # self-contained: no external resources
    assert "http://" not in html and "https://" not in html
    # telemetry embedded and interaction handlers present
    for needle in ('"targ"', '"seq"', "onwheel", "onmousedown", "rotate",
                   "camera", "requestAnimationFrame", "Deadbeat"):
        assert needle in html, needle
    import json as _json

    payload = html.split("const D=", 1)[1].split(";\n", 1)[0]
    data = _json.loads(payload)
    assert len(data["x"]) == len(data["seq"]) == len(data["targ"])
    assert len(data["x"]) > 10
