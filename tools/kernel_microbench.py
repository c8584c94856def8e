"""Microbenchmark for the fused ADMM chunk kernel variants on the live TPU.

Measures ms per 25-iteration chunk at a given batch size for combinations of
(bt tile width, ir_steps). Device time is measured by pulling a scalar to the
host (the only reliable sync on this backend — see CLAUDE.md).

    python tools/kernel_microbench.py [--batch 1024] [--iters 25]
"""
import argparse
import sys, os, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=25)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--done-frac", type=float, default=0.0,
                    help="fraction of problems marked done (tile-skip path)")
    ap.add_argument("--loop", type=int, default=20,
                    help="chunks per jit call (device-side fori_loop) — "
                    "amortizes the remote-dispatch round trip (~25 ms), which "
                    "otherwise floors every single-call measurement")
    ap.add_argument("--precision", default="highest",
                    choices=("highest", "high", "default"),
                    help="MXU pass count for in-kernel fp32 dots")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from mpc_arpo_project_tpu.ops import admm_pallas

    B = args.batch
    nz, m = 256, 512
    seg = 51  # Nx+1 at the metric horizon

    # ---- roofline accounting (VERDICT r1 #3) -------------------------------
    # MXU MACs per ADMM iteration per problem (padded dims; compact-matmul
    # corrections of width 3*gw, structured-stack M v refinement):
    #   A / A' matvec: m*nz base + (nz*3gw + 3gw*m) correction pair
    #   solve_M: apply_minv nz^2 + ir_steps * (7*nz^2 stack + nz^2 minv)
    gwp = 64  # ceil((Nx+1)/64)*64 at the metric horizon
    mv = m * nz + nz * 3 * gwp + 3 * gwp * m

    def macs_per_iter(ir):
        return 2 * mv + nz * nz + ir * 8 * nz * nz

    # HBM bytes per chunk per problem: the per-problem inverse streams once
    # per chunk (VMEM-resident across the fused iterations); vectors are small
    bytes_per_chunk_problem = nz * nz * 4 + (2 * nz + 6 * m) * 4
    dev = jax.devices()[0]
    kind = dev.device_kind.lower()
    # peak numbers: v5e (v5 lite) bf16 197 TF, HBM 819 GB/s. fp32 matmuls at
    # precision=HIGHEST run as 6 bf16 passes -> fp32 ceiling = peak/6.
    peak_bf16 = 197e12 if "v5" in kind else 275e12
    hbm_bw = 819e9 if "v5" in kind else 1200e9
    print(f"device={dev.device_kind}  peak_bf16={peak_bf16/1e12:.0f}TF  "
          f"fp32-highest ceiling={peak_bf16/6/1e12:.1f}TF  HBM={hbm_bw/1e9:.0f}GB/s")
    print(f"per-iter MACs/problem: ir=1 {macs_per_iter(1)/1e6:.2f}M  "
          f"ir=2 {macs_per_iter(2)/1e6:.2f}M; "
          f"HBM bytes/chunk/problem: {bytes_per_chunk_problem/1e3:.0f}KB")
    key = jax.random.key(0)
    ks = jax.random.split(key, 12)
    f32 = jnp.float32
    # well-conditioned synthetic data (spectra irrelevant for timing)
    Mat = jax.random.normal(ks[0], (B, nz, nz), f32) * 0.01
    minv = jnp.eye(nz, dtype=f32)[None] + 0.001 * (Mat + jnp.swapaxes(Mat, 1, 2))
    coef = jnp.concatenate(
        [jnp.ones((B, 1), f32), jax.random.normal(ks[1], (B, 3), f32)], axis=1)
    qbar = jax.random.normal(ks[2], (B, nz), f32)
    lbar = -jnp.abs(jax.random.normal(ks[3], (B, m), f32)) - 1.0
    ubar = jnp.abs(jax.random.normal(ks[4], (B, m), f32)) + 1.0
    rho = jnp.abs(jax.random.normal(ks[5], (B, m), f32)) + 0.1
    x = jax.random.normal(ks[6], (B, nz), f32)
    y = jax.random.normal(ks[7], (B, m), f32)
    z = jax.random.normal(ks[8], (B, m), f32)
    a0 = jax.random.normal(ks[9], (m, nz), f32) * 0.1
    pbar = jax.random.normal(ks[10], (nz, nz), f32) * 0.1
    gw = -(-seg // 64) * 64
    gsel = jax.random.normal(ks[11], (nz, 3 * gw), f32) * 0.1
    scat = jax.random.normal(ks[0], (3 * gw, m), f32) * 0.1
    rsel = jax.random.normal(ks[1], (m, 3 * gw), f32) * 0.1
    gscat = jax.random.normal(ks[2], (3 * gw, nz), f32) * 0.1
    stack7 = jax.random.normal(ks[3], (nz, 7 * nz), f32) * 0.01
    w7 = jnp.ones((B, 8), f32)
    einv = jnp.ones((m,), f32)
    dinv = jnp.ones((nz,), f32)
    n_done = int(B * args.done_frac)
    done = jnp.arange(B) < n_done

    L = args.loop
    for bt in (8, 16, 32):
        if B % bt:
            continue
        for ir in (1, 2):
            def run(minv, coef, qbar, lbar, ubar, rho, x, y, z, w7, a0, pbar,
                    gsel, scat, rsel, gscat, stack7, einv, dinv,
                    _bt=bt, _ir=ir):
                def body(_, carry):
                    x, y, z = carry
                    x, y, z, _ = admm_pallas.admm_chunk(
                        minv, coef, qbar, lbar, ubar, rho, x, y, z, w7, a0,
                        pbar, gsel, scat, rsel, gscat, stack7, einv, dinv,
                        n_iter=args.iters, sigma=1e-6,
                        alpha=1.6, eps_pinf=1e-4, eps_dinf=1e-4,
                        pinf_margin=1.0, bt=_bt, ir_steps=_ir,
                        precision=args.precision,
                        interpret=False, done=done)
                    return x, y, z
                x, y, z = jax.lax.fori_loop(0, L, body, (x, y, z))
                return x[0, 0]
            fn = jax.jit(run)
            try:
                a = (minv, coef, qbar, lbar, ubar, rho, x, y, z, w7, a0,
                     pbar, gsel, scat, rsel, gscat, stack7, einv, dinv)
                float(np.asarray(fn(*a)))  # compile + sync
                ts = []
                for _ in range(args.reps):
                    t0 = time.perf_counter()
                    float(np.asarray(fn(*a)))
                    ts.append(time.perf_counter() - t0)
                best = min(ts) * 1e3 / L
                per_iter = best / args.iters
                n_act = B - n_done
                flops = 2 * macs_per_iter(ir) * n_act / (per_iter * 1e-3)
                bw = bytes_per_chunk_problem * n_act / (best * 1e-3)
                print(f"bt={bt:2d} ir={ir} done={args.done_frac:.2f}: "
                      f"{best:7.2f} ms/chunk  {per_iter:6.3f} ms/iter "
                      f"({per_iter/B*1e6:7.2f} ns/iter/problem)  "
                      f"{flops/1e12:5.1f} TF/s ({flops/peak_bf16*100:4.1f}% bf16 peak, "
                      f"{flops/(peak_bf16/6)*100:5.1f}% fp32 ceiling)  "
                      f"HBM {bw/1e9:5.0f} GB/s ({bw/hbm_bw*100:4.1f}%)")
            except Exception as e:  # noqa: BLE001
                print(f"bt={bt:2d} ir={ir}: FAILED {type(e).__name__}: {str(e)[:120]}")


if __name__ == "__main__":
    main()
