"""Benchmark driver — prints ONE JSON line for the round harness.

Benches the hottest primitive of the proving pipeline on the real chip:
the NTT over BN254 Fr (the reference's `best_fft` inside external
halo2_proofs is the #1 hot loop of `create_proof`, SURVEY.md §3 "Hot loops
ranked").  Uses the MXU four-step NTT (poly/ntt_mxu.py: DFT passes as u8
digit-Toeplitz matmuls with wide Montgomery REDC).

Methodology: the transform loop runs INSIDE one jit with a tiny (32-byte)
output.  The axon tunnel ships every dispatch's full output back to the
host at ~300 MB/s, so python-loop timings measure the tunnel, not the
chip — with in-jit iteration the measurement is pure device time.

The reference publishes no absolute wall-clock numbers in-tree
(BASELINE.md), so `vs_baseline` is measured against the north-star target
of 100 Mbutterflies/s/chip recorded when this harness was first written —
a stable anchor so the driver's per-round BENCH_r{N}.json series is
comparable across rounds.  (Butterflies = n/2 * k per transform: the
work a radix-2 FFT would do; the four-step does more MACs but less HBM,
so this is a throughput-equivalent, apples-to-apples series.)
"""

from __future__ import annotations

import json
import time

import numpy as np

ANCHOR_MBUTTERFLIES = 100.0  # fixed cross-round anchor (see docstring)
K = 18
BATCH = 4  # columns transformed together (advice columns batch in practice)
REPEAT = 4  # transforms per jit call (amortizes dispatch)


def main():
    import jax

    from zkevm_circuits_tpu.utils.cache import setup_compile_cache

    setup_compile_cache()

    from zkevm_circuits_tpu.poly.ntt_mxu import (
        _device_consts, _ntt_mxu_jit, _use_pallas,
    )

    pallas = _use_pallas()

    rng = np.random.default_rng(1234)
    n = 1 << K
    # random Montgomery-form polys
    x = np.frombuffer(rng.bytes(BATCH * n * 32), np.uint8).reshape(BATCH, n, 32).copy()
    x[..., 31] = 0  # keep < 2^248 < p so values are canonical
    x = jax.device_put(x)
    w1, tw, w2 = _device_consts(K, False, False)

    @jax.jit
    def run(x, w1, tw, w2):
        def body(_, y):
            return _ntt_mxu_jit(y, w1, tw, w2, K, pallas)

        return jax.lax.fori_loop(0, REPEAT, body, x)[0, 0, :]

    # compile + warmup; fetch to host — on the axon tunnel backend a bare
    # block_until_ready can return before the first execution finishes
    np.asarray(run(x, w1, tw, w2))

    iters = 4
    t0 = time.perf_counter()
    for _ in range(iters):
        y = run(x, w1, tw, w2)
    np.asarray(y)  # host fetch = hard sync point
    dt = (time.perf_counter() - t0) / (iters * REPEAT)

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
