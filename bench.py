"""Benchmark driver — prints ONE JSON line for the round harness.

Benches the hottest primitive of the proving pipeline on the real chip:
the radix-2 NTT over BN254 Fr (the reference's `best_fft` inside external
halo2_proofs is the #1 hot loop of `create_proof`, SURVEY.md §3 "Hot loops
ranked").  Reports Mbutterflies/s (n/2 * k butterflies per transform).

The reference publishes no absolute wall-clock numbers in-tree
(BASELINE.md), so `vs_baseline` is measured against the north-star target
of 100 Mbutterflies/s/chip recorded when this harness was first written —
a stable anchor so the driver's per-round BENCH_r{N}.json series is
comparable across rounds.
"""

from __future__ import annotations

import json
import time

import numpy as np

ANCHOR_MBUTTERFLIES = 100.0  # fixed cross-round anchor (see docstring)
K = 18
BATCH = 4  # columns transformed together (advice columns batch in practice)


def main():
    import jax

    from zkevm_circuits_tpu.utils.cache import setup_compile_cache

    setup_compile_cache()

    from zkevm_circuits_tpu.crypto.field import fr
    from zkevm_circuits_tpu.poly.ntt import ntt

    F = fr()
    rng = np.random.default_rng(1234)
    n = 1 << K
    # random Montgomery-form polys
    x = np.frombuffer(rng.bytes(BATCH * n * 32), np.uint8).reshape(BATCH, n, 32).copy()
    x[..., 31] = 0  # keep < 2^248 < p so values are canonical
    x = jax.device_put(x)

    # compile + warmup; fetch to host — on the axon tunnel backend a bare
    # block_until_ready can return before the first execution finishes
    y = ntt(x, K)
    np.asarray(y[0, 0])

    iters = 8
    t0 = time.perf_counter()
    for _ in range(iters):
        x = ntt(x, K)
    np.asarray(x[0, 0])  # host fetch = hard sync point
    dt = (time.perf_counter() - t0) / iters

    butterflies = BATCH * (n // 2) * K
    mb_per_s = butterflies / dt / 1e6
    print(
        json.dumps(
            {
                "metric": f"ntt_fr_k{K}_b{BATCH}_mbutterflies_per_s",
                "value": round(mb_per_s, 3),
                "unit": "Mbutterflies/s",
                "vs_baseline": round(mb_per_s / ANCHOR_MBUTTERFLIES, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
