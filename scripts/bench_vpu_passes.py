"""VPU per-pass microbenchmark: the definitive accounting for the sampling
kernel's VPU-bound roofline (VERDICT r4 #6).

The QM9 sampling kernel runs ~1.3 ms/layer at B=250, N=19 (rows = B*N^2 =
90,250 message rows, S = 256 lanes).  BASELINE.md's roofline argues the
layer time is set by VPU work — transcendental (tanh), elementwise
(add/mul), and cast passes over [rows, 256] f32 — with the MXU underused
but not limiting.  This script measures the per-pass cost of each VPU op
class directly with a Pallas kernel at exactly the kernel's row/lane
shape, by sweeping the in-kernel repeat count k and fitting the slope
(removing launch/DMA constants):

  python scripts/bench_vpu_passes.py [--rows 90250] [--cols 256]
      [--block 1750] [--reps 20]

Prints one line per op: ns/pass, elements/s, and a final accounting table
(passes/layer x measured cost vs the measured layer time).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)

    def opt(flag, default):
        if flag in argv:
            return argv[argv.index(flag) + 1]
        return default

    rows = int(opt("--rows", 90250))
    cols = int(opt("--cols", 256))
    # ~one QM9 fused cell (5 mols x 19 x 19 = 1805 rows), rounded to the
    # Mosaic block constraint (sublane-divisible)
    block = int(opt("--block", 1808))
    reps = int(opt("--reps", 20))

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl

    from bio_diffusion_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()

    rows = (rows // block) * block  # whole blocks
    grid = rows // block

    OPS = {
        # op name -> (elementwise fn, passes of algebraic work it represents)
        "tanh": lambda y: jnp.tanh(y),
        "exp": lambda y: jnp.exp(y),
        "sigmoid_exp": lambda y: 1.0 / (1.0 + jnp.exp(-y)),
        "sigmoid_tanh": lambda y: 0.5 * (jnp.tanh(0.5 * y) + 1.0),
        "silu_tanh": lambda y: y * (0.5 * (jnp.tanh(0.5 * y) + 1.0)),
        "add": lambda y: y + 1.0,
        "mul": lambda y: y * 1.0001,
        "rsqrt": lambda y: jax.lax.rsqrt(jnp.abs(y) + 1e-8),
        "cast_roundtrip": lambda y: y.astype(jnp.bfloat16).astype(jnp.float32),
    }

    def build(op_fn, k):
        def kernel(x_ref, o_ref):
            # fori_loop keeps the op as a real per-iteration pass — a python
            # unroll lets Mosaic fold idempotent/affine chains (casts, mul by
            # a constant) into one op, which is exactly what we must not
            # measure
            o_ref[...] = jax.lax.fori_loop(
                0, k, lambda i, y: op_fn(y), x_ref[...]
            )

        return pl.pallas_call(
            kernel,
            grid=(grid,),
            in_specs=[pl.BlockSpec((block, cols), lambda i: (i, 0))],
            out_specs=pl.BlockSpec((block, cols), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((rows, cols), jnp.float32),
        )

    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(rows, cols)).astype(np.float32)
    )

    def timed(fn):
        y = fn(x)
        float(jnp.sum(y))  # force completion over the axon tunnel
        best = float("inf")
        for _ in range(5):
            t0 = time.time()
            for _ in range(reps):
                y = fn(x)
            float(jnp.sum(y))
            best = min(best, (time.time() - t0) / reps)
        return best

    print(f"# device={jax.devices()[0]} rows={rows} cols={cols} "
          f"block={block} grid={grid}", file=sys.stderr)
    elems = rows * cols
    results = {}
    for name, fn in OPS.items():
        # large k-delta so the slope dwarfs tunnel/launch jitter (each
        # [88592, 256] pass is only a few us)
        k_lo, k_hi = 8, 104
        t_lo = timed(jax.jit(build(fn, k_lo)))
        t_hi = timed(jax.jit(build(fn, k_hi)))
        per_pass = (t_hi - t_lo) / (k_hi - k_lo)
        results[name] = per_pass
        print(f"{name:>14}: {per_pass * 1e6:8.2f} us/pass over [{rows},{cols}] "
              f"({elems / max(per_pass, 1e-12) / 1e9:7.1f} Gelem/s)  "
              f"[k={k_lo}: {t_lo * 1e3:.3f} ms, k={k_hi}: {t_hi * 1e3:.3f} ms]")

    # ---- accounting: passes per layer in _message_layer_kernel_wm ----
    # (QM9 trained dims: S=256 message scalars; chain = 3 stages + GCP1 +
    # scalar attention.  Small-width passes (H=8 vnorm, 9/27 schid, 32
    # gate, 24 v-residual) are < 1/8 the lane cost and accounted as 0.5
    # equivalent 256-wide passes per stage.)
    tanh_p = results["tanh"]
    silu_p = results["silu_tanh"]
    sig_p = results["sigmoid_tanh"]
    add_p = results["add"]
    cast_p = results["cast_roundtrip"]
    stages = 4  # GCP1 + 3 chain GCPs
    acct = {
        "silu(s2) [rows,256]": stages * silu_p,
        "gate sigmoid [rows,32] (~0.125x)": stages * sig_p * 0.125,
        "attention sigmoid [rows,1..S]": sig_p * 0.5,
        "bias-add + residual-add [rows,256] x2/stage": stages * 2 * add_p,
        "cast f32->dt passes [rows,256] x2/stage": stages * 2 * cast_p / 2,
        "small-width VPU (vnorm/schid/vu/gate3) ~0.5 pass/stage": stages * 0.5 * add_p,
    }
    total = sum(acct.values())
    print("\n# per-layer VPU accounting at B=250 N=19 (measured passes):")
    for kname, v in acct.items():
        print(f"#   {kname:>55}: {v * 1e6:7.1f} us")
    print(f"#   {'TOTAL VPU':>55}: {total * 1e6:7.1f} us "
          f"(measured layer time ~1300 us incl. MXU+DMA+launch)")


if __name__ == "__main__":
    main()
