"""Isolate per-component costs of the fused ADMM chunk kernel on the TPU.

Times three minimal kernels over the same tile structure as admm_chunk:
  matvec  — the shared A/A' matmul pair (bt, nz)@(nz, m) + (bt, m)@(m, nz)
  minv    — bt per-problem (1, nz)@(nz, nz) inverse matvecs
  stack   — the (bt, nz)@(nz, 7nz) structured-M product + combine

    python tools/kernel_probe.py [--batch 1024] [--bt 32] [--iters 25]
"""
import argparse
import functools
import sys, os, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--bt", type=int, default=32)
    ap.add_argument("--iters", type=int, default=25)
    ap.add_argument("--loop", type=int, default=10)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--precision", default="highest",
                    choices=("highest", "high", "default"))
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, bt, n_it = args.batch, args.bt, args.iters
    nz, m = 256, 512
    f32 = jnp.float32
    prec = {"highest": jax.lax.Precision.HIGHEST,
            "high": jax.lax.Precision.HIGH,
            "default": jax.lax.Precision.DEFAULT}[args.precision]

    def matvec_kernel(x_ref, a0_ref, out_ref):
        def body(_, x):
            y = jnp.dot(x, a0_ref[:].T, preferred_element_type=f32,
                        precision=prec)
            return 1e-3 * jnp.dot(y, a0_ref[:], preferred_element_type=f32,
                                  precision=prec)
        out_ref[:, :] = jax.lax.fori_loop(0, n_it, body, x_ref[:, :])

    def minv_kernel(x_ref, minv_ref, out_ref):
        def body(_, x):
            outs = []
            for p in range(bt):
                outs.append(jnp.dot(x[p][None, :], minv_ref[p],
                                    preferred_element_type=f32,
                                    precision=prec))
            return jnp.concatenate(outs, axis=0)
        out_ref[:, :] = jax.lax.fori_loop(0, n_it, body, x_ref[:, :])

    def minv_bd_kernel(x_ref, mf_ref, out_ref):
        # block-diagonal expansion: one (bt, bt*nz) @ (bt*nz, nz) matmul
        row = jax.lax.broadcasted_iota(jnp.int32, (bt, bt * nz), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (bt, bt * nz), 1)
        blk = col // nz
        maskf = 1.0 - jnp.minimum(jnp.abs(row - blk).astype(f32), 1.0)

        def body(_, x):
            xe = jnp.concatenate([x] * bt, axis=1) * maskf
            return jnp.dot(xe, mf_ref[0], preferred_element_type=f32,
                           precision=prec)
        out_ref[:, :] = jax.lax.fori_loop(0, n_it, body, x_ref[:, :])

    def minv_lhs_kernel(x_ref, minv_ref, out_ref):
        # matrix-as-LHS orientation: (nz, nz) @ (nz, 1) per problem
        def body(_, x):
            outs = []
            for p in range(bt):
                outs.append(jnp.dot(minv_ref[p], x[p][:, None],
                                    preferred_element_type=f32,
                                    precision=prec).T)
            return jnp.concatenate(outs, axis=0)
        out_ref[:, :] = jax.lax.fori_loop(0, n_it, body, x_ref[:, :])

    def minv_bf16_kernel(x_ref, minv_ref, out_ref):
        # two-limb bf16 split: hi + lo matvecs at single-pass speed each
        def body(_, x):
            outs = []
            for p in range(bt):
                M = minv_ref[p]
                hi = M.astype(jnp.bfloat16)
                lo = (M - hi.astype(f32)).astype(jnp.bfloat16)
                xb = x[p][None, :].astype(jnp.bfloat16)
                o = (jnp.dot(xb, hi, preferred_element_type=f32)
                     + jnp.dot(xb, lo, preferred_element_type=f32))
                outs.append(o)
            return jnp.concatenate(outs, axis=0)
        out_ref[:, :] = jax.lax.fori_loop(0, n_it, body, x_ref[:, :])

    def stack_kernel(x_ref, s7_ref, out_ref):
        def body(_, x):
            xs = jnp.dot(x, s7_ref[:, :], preferred_element_type=f32,
                         precision=prec)
            acc = None
            for t in range(7):
                term = (0.1 + t) * xs[:, t * nz:(t + 1) * nz]
                acc = term if acc is None else acc + term
            return 1e-3 * acc
        out_ref[:, :] = jax.lax.fori_loop(0, n_it, body, x_ref[:, :])

    key = jax.random.key(0)
    ks = jax.random.split(key, 4)
    x = jax.random.normal(ks[0], (B, nz), f32)
    a0 = jax.random.normal(ks[1], (m, nz), f32) * 0.1
    minv = jax.random.normal(ks[2], (B, nz, nz), f32) * 0.01
    mflat = minv.reshape(B // bt, bt * nz, nz)
    s7 = jax.random.normal(ks[3], (nz, 7 * nz), f32) * 0.01

    tile = lambda *shape: pl.BlockSpec(
        shape, lambda i: (i,) + (0,) * (len(shape) - 1),
        memory_space=pltpu.VMEM)
    shared = lambda *shape: pl.BlockSpec(
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM)
    cp = pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024)

    variants = {
        "matvec pair (2 m*nz)": (matvec_kernel, a0, shared(m, nz)),
        "minv per-problem    ": (minv_kernel, minv, tile(bt, nz, nz)),
        "minv matrix-lhs     ": (minv_lhs_kernel, minv, tile(bt, nz, nz)),
        "minv bf16 two-limb  ": (minv_bf16_kernel, minv, tile(bt, nz, nz)),
        "minv block-diag     ": (minv_bd_kernel, mflat, tile(1, bt * nz, nz)),
        "stack7 + combine    ": (stack_kernel, s7, shared(nz, 7 * nz)),
    }
    macs = {
        "matvec pair (2 m*nz)": 2 * m * nz,
        "minv per-problem    ": nz * nz,
        "minv matrix-lhs     ": nz * nz,
        "minv bf16 two-limb  ": nz * nz,
        "minv block-diag     ": nz * nz,  # useful MACs (bt x redundancy inside)
        "stack7 + combine    ": 7 * nz * nz,
    }
    for name, (kern, arg, spec) in variants.items():
        fn = pl.pallas_call(
            kern, grid=(B // bt,),
            in_specs=[tile(bt, nz), spec],
            out_specs=tile(bt, nz),
            out_shape=jax.ShapeDtypeStruct((B, nz), f32),
            compiler_params=cp, interpret=False)

        @jax.jit
        def run(x, arg, fn=fn):
            def body(_, xx):
                return 0.999 * fn(xx, arg)
            return jax.lax.fori_loop(0, args.loop, body, x)[0, 0]

        try:
            float(np.asarray(run(x, arg)))
            ts = []
            for _ in range(args.reps):
                t0 = time.perf_counter()
                float(np.asarray(run(x, arg)))
                ts.append(time.perf_counter() - t0)
            best = min(ts) * 1e3 / args.loop
            per_iter_us = best / n_it * 1e3
            tf = 2 * macs[name] * B * n_it / (best * 1e-3) / 1e12
            print(f"{name}: {best:7.2f} ms/chunk  {per_iter_us:7.1f} us/iter  "
                  f"useful {tf:5.1f} TF/s")
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:100]}")


if __name__ == "__main__":
    main()
