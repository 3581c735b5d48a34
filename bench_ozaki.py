"""Microbench: Ozaki-scheme f64 GEMM vs XLA's emulated f64 on the TPU.

The Newton-Schulz f64 inverse builds and the condensed-block builds route
their batched GEMMs through ops/ozaki.matmul64 on TPU (exact bf16 slice
GEMMs on the MXU).  This prints one JSON line per shape comparing that
path against XLA's software-emulated f64 dot (the ~3 GFLOP/s wall that
bounded round 2's accurate matvecs, BENCH.md section 4).

    python bench_ozaki.py

Shapes mirror the production uses: [E, n, n] element-block products at
Stokes p=4 (n=121) and Navier-Stokes p=8 (n=308) scale, plus one square
single-matrix GEMM for the envelope.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from mfv2d_tpu.ops.ozaki import matmul64

jax.config.update("jax_enable_x64", True)


def _time(fn, *args, reps=3):
    out = fn(*args)
    jax.block_until_ready(out)
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best, out


def main() -> None:
    rng = np.random.default_rng(7)
    emulated = jax.jit(lambda a, b: a @ b)
    cases = [
        ("stokes_p4_blocks", (256, 121, 121)),
        ("ns_p8_blocks", (64, 308, 308)),
        ("square_2048", (2048, 2048)),
    ]
    for name, shape in cases:
        if len(shape) == 3:
            e, n, _ = shape
            a = jnp.asarray(rng.standard_normal((e, n, n)))
            b = jnp.asarray(rng.standard_normal((e, n, n)))
            flops = 2.0 * e * n**3
        else:
            n, _ = shape
            a = jnp.asarray(rng.standard_normal((n, n)))
            b = jnp.asarray(rng.standard_normal((n, n)))
            flops = 2.0 * n**3
        t_oz, out_oz = _time(matmul64, a, b)
        t_em, out_em = _time(emulated, a, b)
        err = float(
            jnp.max(jnp.abs(out_oz - out_em))
            / jnp.max(jnp.abs(out_em))
        )
        print(
            json.dumps(
                {
                    "metric": "ozaki_f64_gemm",
                    "config": name,
                    "ozaki_s": round(t_oz, 5),
                    "emulated_s": round(t_em, 5),
                    "speedup": round(t_em / t_oz, 1),
                    "ozaki_gflops": round(flops / t_oz / 1e9, 1),
                    "emulated_gflops": round(flops / t_em / 1e9, 1),
                    "rel_err_vs_emulated": err,
                    "backend": jax.default_backend(),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
