"""Benchmark driver — prints ONE JSON line for the round harness.

Primary metric: NTT throughput over BN254 Fr (the reference's `best_fft`
inside external halo2_proofs is the #1 hot loop of `create_proof`,
SURVEY.md §3 "Hot loops ranked"), via the MXU four-step NTT
(poly/ntt_mxu.py).  Extra metrics in the same JSON object: Pippenger MSM
Mpoints/s and an end-to-end PLONK prove+verify wall-clock (BASELINE.md
measurement plan).

Robustness contract (VERDICT.md Weak §W1): this script must NEVER exit
non-zero and must ALWAYS print exactly one JSON line.  The axon TPU
tunnel is observably flaky (jax.devices() can hang forever), so the
parent process never imports jax at all: every stage runs in a SUBPROCESS
with a hard timeout, first against the default (TPU) backend, then — if
that hangs or dies — re-run forced to CPU with reduced shapes so a number
still lands, tagged with `"backend": "cpu"`.

Methodology (TPU): the transform loop runs INSIDE one jit with a tiny
(32-byte) output.  The axon tunnel ships every dispatch's full output back
to the host at ~300 MB/s, so python-loop timings measure the tunnel, not
the chip — with in-jit iteration the measurement is pure device time.

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
import os
import subprocess
import sys
import time

STAGE_TIMEOUT_TPU_S = 1200  # first compile via remote_compile is slow:
# the k=18 NTT stage was measured at >420s cold / ~240s with a warm
# compile cache through the axon tunnel (r02 timed out at 420s and fell
# back to CPU — the budget, not the chip, was the problem)
STAGE_TIMEOUT_CPU_S = 420
# per-stage overrides: the MSM/prove graphs carry big EC-add inlines whose
# first TPU compile through the axon tunnel can exceed the default budget
STAGE_TIMEOUT_OVERRIDES = {("msm", False): 1500, ("prove", False): 1500}
ANCHOR_MBUTTERFLIES = 100.0  # fixed cross-round anchor (see docstring)


# ---------------------------------------------------------------- stages
# Each stage runs in its own interpreter: `python bench.py --stage X
# [--cpu]` prints one JSON dict on the last stdout line.


def _stage_setup(force_cpu: bool):
    import jax

    if force_cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
        # env alone is NOT enough: the axon plugin pins jax_platforms at
        # interpreter startup, the config must be overridden post-import
        jax.config.update("jax_platforms", "cpu")
    from zkevm_circuits_tpu.utils.cache import setup_compile_cache

    setup_compile_cache()
    return not force_cpu


def stage_ntt(force_cpu: bool) -> dict:
    import numpy as np

    on_tpu = _stage_setup(force_cpu)
    import jax

    from zkevm_circuits_tpu.poly.ntt_mxu import (
        _device_consts, _ntt_mxu_jit, _use_pallas,
    )

    k = 18 if on_tpu else 12
    batch = 4 if on_tpu else 2
    repeat = 4 if on_tpu else 2
    pallas = _use_pallas()

    rng = np.random.default_rng(1234)
    n = 1 << k
    x = np.frombuffer(rng.bytes(batch * n * 32), np.uint8).reshape(batch, n, 32).copy()
    x[..., 31] = 0  # keep < 2^248 < p so values are canonical
    x = jax.device_put(x)
    w1, tw, w2 = _device_consts(k, False, False)

    @jax.jit
    def run(x, w1, tw, w2):
        def body(_, y):
            return _ntt_mxu_jit(y, w1, tw, w2, k, pallas)

        return jax.lax.fori_loop(0, repeat, body, x)[0, 0, :]

    # compile + warmup; fetch to host — on the axon tunnel backend a bare
    # block_until_ready can return before the first execution finishes
    np.asarray(run(x, w1, tw, w2))

    iters = 4 if on_tpu else 2
    t0 = time.perf_counter()
    for _ in range(iters):
        y = run(x, w1, tw, w2)
    np.asarray(y)  # host fetch = hard sync point
    dt = (time.perf_counter() - t0) / (iters * repeat)

    butterflies = batch * (n // 2) * k
    return {
        "name": f"ntt_fr_k{k}_b{batch}_mbutterflies_per_s",
        "value": round(butterflies / dt / 1e6, 3),
        "pallas": pallas,
    }


def stage_msm(force_cpu: bool) -> dict:
    import numpy as np

    on_tpu = _stage_setup(force_cpu)
    import jax
    import jax.numpy as jnp

    from zkevm_circuits_tpu.crypto import curve as cv
    from zkevm_circuits_tpu.poly.msm import msm

    n = (1 << 14) if on_tpu else (1 << 8)
    # measured on-chip (r3): lanes 64 > 8 > 256 > 1024 — the kernel is
    # field-mul bound, not scan-latency bound; a Pallas bucket kernel is
    # the real fix (BASELINE.md north star)
    lanes = 64 if on_tpu else 4
    rng = np.random.default_rng(99)
    pts = cv.g1_generator((n,))  # fixed-point batch: bench measures MSM, not setup
    sc = np.frombuffer(rng.bytes(n * 32), np.uint8).reshape(n, 32).copy()
    sc[:, 31] &= 0x0F  # < 2^252 < r
    sc = jax.device_put(jnp.asarray(sc))

    out = msm(pts, sc, lanes=lanes)
    np.asarray(out.x)  # warmup + compile
    iters = 3 if on_tpu else 2
    t0 = time.perf_counter()
    for _ in range(iters):
        out = msm(pts, sc, lanes=lanes)
    np.asarray(out.x)
    dt = (time.perf_counter() - t0) / iters
    return {
        "name": f"msm_g1_n{n}_mpoints_per_s",
        "value": round(n / dt / 1e6, 6),
    }


def stage_prove(force_cpu: bool) -> dict:
    """End-to-end PLONK prove+verify wall-clock on the k=5 demo circuit
    (tests/test_plonk_prove.py harness)."""
    _stage_setup(force_cpu)
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "tests"))
    from test_plonk_prove import A_IN, DemoCircuit, K

    from zkevm_circuits_tpu.plonk.keygen import keygen
    from zkevm_circuits_tpu.plonk.prover import prove
    from zkevm_circuits_tpu.plonk.verifier import verify
    from zkevm_circuits_tpu.poly.kzg import Srs

    srs = Srs.unsafe_setup(K, tau=987654321)
    pk, vk = keygen(DemoCircuit(), K, srs)
    t0 = time.perf_counter()
    proof = prove(pk, DemoCircuit(), [[A_IN]], srs)
    dt = time.perf_counter() - t0
    assert verify(vk, [[A_IN]], proof)
    return {"name": f"plonk_prove_k{K}_seconds", "value": round(dt, 3)}


STAGES = {"ntt": stage_ntt, "msm": stage_msm, "prove": stage_prove}


# ---------------------------------------------------------------- parent


def _run_stage(stage: str, cpu: bool, extra_env: dict | None = None) -> tuple[dict | None, str | None]:
    """Run one stage in a subprocess; (result, error)."""
    cmd = [sys.executable, os.path.abspath(__file__), "--stage", stage]
    if cpu:
        cmd.append("--cpu")
    timeout = STAGE_TIMEOUT_OVERRIDES.get(
        (stage, cpu), STAGE_TIMEOUT_CPU_S if cpu else STAGE_TIMEOUT_TPU_S
    )
    env = dict(os.environ, **(extra_env or {}))
    try:
        r = subprocess.run(cmd, capture_output=True, text=True, timeout=timeout, env=env)
    except subprocess.TimeoutExpired:
        return None, f"{stage}[{'cpu' if cpu else 'tpu'}]: timeout {timeout}s"
    if r.returncode != 0:
        tail = (r.stderr or r.stdout or "").strip().splitlines()
        return None, f"{stage}[{'cpu' if cpu else 'tpu'}]: rc={r.returncode}: " + (
            tail[-1][:200] if tail else ""
        )
    for line in reversed(r.stdout.strip().splitlines()):
        try:
            return json.loads(line), None
        except json.JSONDecodeError:
            continue
    return None, f"{stage}: no JSON in stage output"


def main():
    errors: dict = {}
    results: dict = {}
    stage_backend: dict = {}
    tunnel_dead = False
    for stage in ("ntt", "msm", "prove"):
        # try TPU first (unless an earlier stage already proved it dead:
        # an NTT-stage timeout means the tunnel hangs; a bigger-graph
        # stage timing out does NOT condemn the tunnel for later stages)
        if not tunnel_dead:
            res, err = _run_stage(stage, cpu=False)
            if res is None and err and "timeout" not in err:
                # stage ran but died — could be a Mosaic/pallas issue
                # through the tunnel; one retry with pallas disabled
                res, err2 = _run_stage(
                    stage, cpu=False, extra_env={"ZKEVM_TPU_PALLAS": "0"}
                )
                err = f"{err}; nopallas-retry: {err2}" if res is None else err
            if res is not None:
                results[stage] = res
                stage_backend[stage] = "tpu"
                continue
            errors[stage + "_tpu"] = err
            if stage == "ntt":
                tunnel_dead = True  # the cheapest graph hung: tunnel is down
        res, err = _run_stage(stage, cpu=True)
        if res is not None:
            results[stage] = res
            stage_backend[stage] = "cpu"
        else:
            errors[stage + "_cpu"] = err

    primary = results.get("ntt") or results.get("msm") or {
        "name": "bench_failed",
        "value": 0.0,
    }
    is_ntt = primary is results.get("ntt")
    # headline backend = the backend the HEADLINE metric ran on (r02 bug:
    # a later stage's fallback overwrote this even when NTT ran on-chip)
    line = {
        "metric": primary["name"],
        "value": primary["value"],
        "unit": "Mbutterflies/s" if is_ntt else "",
        "vs_baseline": round(primary["value"] / ANCHOR_MBUTTERFLIES, 4) if is_ntt else 0.0,
        "backend": stage_backend.get("ntt" if is_ntt else "msm", "none"),
        "backends": stage_backend,
    }
    if "msm" in results:
        line["msm_mpoints_per_s"] = results["msm"]["value"]
        line["msm_metric"] = results["msm"]["name"]
    if "prove" in results:
        line["prove_seconds"] = results["prove"]["value"]
        line["prove_metric"] = results["prove"]["name"]
    if errors:
        line["error"] = errors
    print(json.dumps(line))


if __name__ == "__main__":
    if "--stage" in sys.argv:
        stage = sys.argv[sys.argv.index("--stage") + 1]
        print(json.dumps(STAGES[stage]("--cpu" in sys.argv)))
        sys.exit(0)
    try:
        main()
    except BaseException:  # belt and braces: one JSON line, rc=0, always
        import traceback

        print(json.dumps({
            "metric": "bench_failed", "value": 0.0, "unit": "",
            "vs_baseline": 0.0,
            "error": traceback.format_exc(limit=3).strip().splitlines()[-1][:300],
        }))
    sys.exit(0)
