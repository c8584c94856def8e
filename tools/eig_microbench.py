"""Microbenchmark for the shared-basis ('eig') fused ADMM chunk kernel on the
live TPU — the round-3 successor measurement to tools/kernel_microbench.py
(which benches the round-2 Newton-Schulz 'pallas' kernel).

Per-iteration per-problem MACs at the padded flagship dims
(nz=256, m=512, K=128, gw=64):

    matvec_A : m*nz + nz*gw + gw*m            = 180K
    matvec_AT: m*nz + m*gw + gw*nz            = 180K
    solve_M  : 2*nz^2 (W/W') + 2*nz*K (YT)    = 229K
               + K^2 (per-problem tinv) + K^2 (K1)

total ~590K vs 1,146K for the round-2 kernel at ir=1 — and the only
per-problem-weight matmul left is the K x K tinv apply (16K MACs, 2.8% of the
iteration) vs the old nz x nz Minv (65K, plus 8*nz^2 IR refinement).

    python tools/eig_microbench.py [--batch 1024] [--iters 25]
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
                    help="fraction of TILES fully done (tile-skip path)")
    ap.add_argument("--loop", type=int, default=20,
                    help="chunks per jit call (amortizes ~25 ms dispatch)")
    ap.add_argument("--precision", default="highest",
                    choices=("highest", "high", "default"))
    ap.add_argument("--apply", default="loop",
                    choices=("loop", "vpu", "blockdiag"),
                    help="per-problem tinv application strategy")
    ap.add_argument("--plain", action="store_true",
                    help="bench the Woodbury-free kernel (with_s=False)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from mpc_arpo_project_tpu.ops import admm_eig

    B = args.batch
    nz, m, K = 256, 512, 128
    gw = K // 2

    mv_a = m * nz + nz * gw + gw * m
    macs = 2 * mv_a + 2 * nz * nz + 2 * nz * K + 2 * K * K
    # HBM per chunk per problem: tinv (K^2) streams once per chunk; vectors
    bytes_per_chunk_problem = K * K * 4 + (2 * nz + 6 * m) * 4
    dev = jax.devices()[0]
    kind = dev.device_kind.lower()
    peak_bf16 = 197e12 if "v5" in kind else 275e12
    hbm_bw = 819e9 if "v5" in kind else 1200e9
    print(f"device={dev.device_kind}  peak_bf16={peak_bf16/1e12:.0f}TF  "
          f"fp32-highest ceiling={peak_bf16/6/1e12:.1f}TF  HBM={hbm_bw/1e9:.0f}GB/s")
    print(f"per-iter MACs/problem: {macs/1e6:.3f}M  "
          f"HBM bytes/chunk/problem: {bytes_per_chunk_problem/1e3:.0f}KB")

    key = jax.random.key(0)
    ks = jax.random.split(key, 16)
    f32 = jnp.float32
    tinv = jnp.eye(K, dtype=f32)[None] + 0.001 * jax.random.normal(
        ks[0], (B, K, K), f32)
    scal = jnp.concatenate(
        [jnp.abs(jax.random.normal(ks[1], (B, 1), f32)) + 0.5,
         jax.random.normal(ks[2], (B, 1), f32),
         jnp.zeros((B, 6), f32)], axis=1)
    qbar = jax.random.normal(ks[3], (B, nz), f32)
    lbar = -jnp.abs(jax.random.normal(ks[4], (B, m), f32)) - 1.0
    ubar = jnp.abs(jax.random.normal(ks[5], (B, m), f32)) + 1.0
    dg = 1.0 / (1.0 + jnp.abs(jax.random.normal(ks[6], (B, nz), f32)))
    x = jax.random.normal(ks[7], (B, nz), f32)
    y = jax.random.normal(ks[8], (B, m), f32)
    z = jax.random.normal(ks[9], (B, m), f32)
    Ast = jax.random.normal(ks[10], (4, m, nz), f32) * 0.1
    Wst = jax.random.normal(ks[11], (4, nz, nz), f32) * 0.1
    YTst = jax.random.normal(ks[12], (4, K, nz), f32) * 0.1
    pbar = jax.random.normal(ks[13], (nz, nz), f32) * 0.1
    K1 = jnp.zeros((K, K), f32).at[:gw, gw:].set(jnp.eye(gw, dtype=f32)) \
        .at[gw:, :gw].set(jnp.eye(gw, dtype=f32))
    w33row = jnp.abs(jax.random.normal(ks[14], (1, K), f32))
    gsel_s = jax.random.normal(ks[15], (nz, gw), f32) * 0.1
    scat_s = jax.random.normal(ks[0], (gw, m), f32) * 0.1
    rsel_s = jax.random.normal(ks[1], (m, gw), f32) * 0.1
    gscat_s = jax.random.normal(ks[2], (gw, nz), f32) * 0.1
    rho_vec = jnp.abs(jax.random.normal(ks[3], (m,), f32)) + 0.1
    einv = jnp.ones((m,), f32)
    dinv = jnp.ones((nz,), f32)

    L = args.loop
    for bt in (8, 16, 32, 64):
        if B % bt:
            continue
        n_tiles = B // bt
        tile_combo = (jnp.arange(n_tiles, dtype=jnp.int32) * 4) // n_tiles
        n_done_tiles = int(n_tiles * args.done_frac)
        done = (jnp.arange(B) // bt) < n_done_tiles
        n_act = B - n_done_tiles * bt

        def run(tinv, scal, qbar, lbar, ubar, dg, x, y, z, _bt=bt,
                _tc=tile_combo, _done=done):
            def body(_, carry):
                x, y, z = carry
                x, y, z, _ = admm_eig.eig_chunk(
                    _tc, tinv, scal, qbar, lbar, ubar, dg, x, y, z,
                    Ast, Wst, YTst, pbar, K1, w33row,
                    gsel_s, scat_s, rsel_s, gscat_s, rho_vec, einv, dinv,
                    n_iter=args.iters, sigma=1e-6, alpha=1.6,
                    eps_pinf=1e-4, eps_dinf=1e-4, pinf_margin=1.0,
                    bt=_bt, precision=args.precision, interpret=False,
                    done=_done, apply=args.apply,
                    with_s=not args.plain)
                return x, y, z
            x, y, z = jax.lax.fori_loop(0, L, body, (x, y, z))
            return x[0, 0]

        fn = jax.jit(run)
        try:
            a = (tinv, scal, qbar, lbar, ubar, dg, x, y, z)
            float(np.asarray(fn(*a)))  # compile + sync
            ts = []
            for _ in range(args.reps):
                t0 = time.perf_counter()
                float(np.asarray(fn(*a)))
                ts.append(time.perf_counter() - t0)
            best = min(ts) * 1e3 / L
            per_iter = best / args.iters
            flops = 2 * macs * n_act / (per_iter * 1e-3)
            bw = bytes_per_chunk_problem * n_act / (best * 1e-3)
            print(f"bt={bt:2d} done={args.done_frac:.2f}: "
                  f"{best:7.2f} ms/chunk  {per_iter:6.3f} ms/iter "
                  f"({per_iter/B*1e6:7.2f} ns/iter/problem)  "
                  f"{flops/1e12:5.1f} TF/s ({flops/peak_bf16*100:4.1f}% bf16 peak, "
                  f"{flops/(peak_bf16/6)*100:5.1f}% fp32 ceiling)  "
                  f"HBM {bw/1e9:5.0f} GB/s ({bw/hbm_bw*100:4.1f}%)")
        except Exception as e:  # noqa: BLE001
            print(f"bt={bt:2d}: FAILED {type(e).__name__}: {str(e)[:160]}")


if __name__ == "__main__":
    main()
