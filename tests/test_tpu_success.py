"""TPU-gated production-success test (VERDICT r2 weak #2 / task 3).

Asserts the PRODUCTION path (fp32, shared-basis 'eig' Pallas solver, real
TPU) produces a materially nonzero docking success rate at low noise — the
capability the reference demonstrates via its success-rate study
(`/root/reference/src/trajectorySimulate.py:370-376` success scan;
`test/saved_runs/success_rates_test.py:64-75`). Measured round 3 on the
reference study config (Nx=40, T=300 s) at sigma=0.01: production 81/128
(63%) vs CPU fp64 oracle in the same band (BASELINE.md round-3 tables), so
a production regression that never docks is caught here.

The suite's conftest pins the process to CPU, so the TPU run happens in a
subprocess with a clean jax config. Gated behind RUN_TPU_TESTS=1: it needs
the remote TPU attached and ~minutes of compile on a cold cache.
"""

import os
import subprocess
import sys
import textwrap

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = textwrap.dedent(
    """
    import sys
    sys.path.insert(0, {repo!r})
    import os
    import jax

    cache = os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    assert jax.devices()[0].platform != "cpu", jax.devices()

    import numpy as np
    import jax.numpy as jnp
    from tools.status_mix import build_configs
    from mpc_arpo_project_tpu.ops import admm
    from mpc_arpo_project_tpu.rollout import discrete

    sim, mpc, fail, debris = build_configs("ref", sigma=0.01)
    settings = admm.ADMMSettings(
        max_iter=4000, solve_mode="eig", stall_exit_chunks=12,
        stall_tighten_chunks=24)
    engine = discrete.build_engine(sim, mpc, fail, debris,
                                   settings=settings, dtype=jnp.float32)
    B = 32
    noise = discrete.make_noise_sequence(engine, jax.random.key(20260820), B)
    out = discrete.rollout_chunked(engine, noise, seg=10)
    n_succ = int(np.asarray(out.success).sum())
    print(f"production success: {{n_succ}}/{{B}}", flush=True)
    # oracle band is ~63% at this sigma (round-3 measurement); anything
    # materially nonzero distinguishes a works-at-all regression
    assert n_succ >= max(2, int(0.2 * B)), n_succ
    """
)


@pytest.mark.skipif(
    os.environ.get("RUN_TPU_TESTS") != "1",
    reason="needs the real TPU (set RUN_TPU_TESTS=1)",
)
def test_production_success_low_sigma():
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # let sitecustomize pick the TPU backend
    res = subprocess.run(
        [sys.executable, "-c", _WORKER.format(repo=_REPO)],
        capture_output=True, text=True, timeout=3600, env=env,
    )
    sys.stderr.write(res.stdout + res.stderr)
    assert res.returncode == 0
