"""Measured VPU ceiling for the roofline model (r4 verdict item 3b).

utils/roofline.py previously divided by a GUESSED peak (ALU-count
arithmetic: 4 ALUs x 8x128 lanes x 940 MHz = 3.85e12 f32 ops/s). This
module replaces the guess with a measurement: synthetic Pallas kernels
that do nothing but issue independent elementwise FMA chains (resp.
sqrt chains) from VMEM-resident registers, long enough that loop and
launch overhead vanish. The measured FMA ceiling IS the attainable
elementwise-f32 roofline for kernels like the fused tracer (which is
VPU-bound: its math is per-lane adds/muls/rsqrts, no MXU contractions),
and the FMA/sqrt ratio calibrates TRANSCENDENTAL_WEIGHT.

Run on the real chip via `loltrace peak` (cli.py), which writes
artifacts/vpu_peak.json; roofline_estimate picks that artifact up in
preference to the modeled constant.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict

import numpy as np

# FMAs issued per loop iteration; enough to amortize the loop's scalar
# control, few enough that the compiler cannot collapse the chain.
_FMA_PER_ITER = 16


def _build_kernel(kind: str, block, iters: int, interpret: bool):
    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(x_ref, o_ref):
        a = x_ref[...]

        if kind == "fma":
            # c is data-dependent so the chain cannot constant-fold;
            # iterating a*c + d keeps every lane's value bounded
            c = jnp.float32(0.9999999)
            d = a * jnp.float32(1e-7)

            def body(i, a):
                for _ in range(_FMA_PER_ITER):
                    a = a * c + d
                return a

        else:  # sqrt chain, same loop structure

            def body(i, a):
                for _ in range(_FMA_PER_ITER):
                    a = jnp.sqrt(a + jnp.float32(1.0))
                return a

        a = lax.fori_loop(0, iters, body, a)
        o_ref[...] = a

    call = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(block, jnp.float32),
        interpret=interpret,
        name=f"lol_peak_{kind}",
    )
    return jax.jit(lambda x: jnp.sum(call(x)))


def measure_peak(
    kind: str = "fma",
    block=(512, 128),
    iters: int = 131072,
    reps: int = 5,
    interpret: bool = False,
) -> Dict[str, float]:
    """Ops/s of a pure FMA (or sqrt) kernel: lanes * iters * per-iter ops /
    best wall time, fetched as ONE scalar (axon-tunnel protocol, PERF.md).
    FMA counts 2 flops; sqrt counts 1 evaluation. The default iters keep
    the kernel in the hundreds of ms so the per-fetch tunnel latency
    (~20-100 ms, varies by the minute) is noise, not the signal — at the
    old 4096 iters the first committed artifact under-reported the
    ceiling ~4x."""
    import jax.numpy as jnp

    fn = _build_kernel(kind, block, iters, interpret)
    x = jnp.linspace(1.0, 2.0, block[0] * block[1], dtype=jnp.float32)
    x = x.reshape(block)
    float(np.asarray(fn(x)))  # compile + warmup
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(np.asarray(fn(x)))
        times.append(time.perf_counter() - t0)
    best = min(times)
    lanes = block[0] * block[1]
    evals = float(lanes) * iters * _FMA_PER_ITER
    flops = evals * (2.0 if kind == "fma" else 1.0)
    return {
        "kind": kind,
        "block": list(block),
        "iters": iters,
        "best_seconds": best,
        "evals_per_s": evals / best,
        "flops_per_s": flops / best,
    }


def measure_vpu_peak(interpret: bool = False, reps: int = 5) -> Dict:
    """The full ceiling record: FMA flops/s, sqrt evals/s, and the implied
    transcendental weight (FMA slots one sqrt costs)."""
    fma = measure_peak("fma", interpret=interpret, reps=reps)
    sqrt = measure_peak("sqrt", interpret=interpret, reps=reps)
    return {
        "fma_flops_per_s": fma["flops_per_s"],
        "sqrt_evals_per_s": sqrt["evals_per_s"],
        # one sqrt occupies this many add/mul SLOTS (fma = 2 slots)
        "transcendental_weight": (
            (fma["flops_per_s"] / 2.0) / sqrt["evals_per_s"]
        ),
        "detail": {"fma": fma, "sqrt": sqrt},
    }


PEAK_ARTIFACT = os.path.join("artifacts", "vpu_peak.json")


def load_measured_peak(root: str = ".") -> float | None:
    """The measured FMA ceiling in weighted-ops/s (the roofline model's
    unit: one add/mul slot = 1 op), or None without the artifact."""
    path = os.path.join(root, PEAK_ARTIFACT)
    try:
        with open(path) as f:
            rec = json.load(f)
        return float(rec["fma_flops_per_s"])
    except (OSError, KeyError, ValueError):
        return None
