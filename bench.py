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
import signal
import subprocess
import sys
import time

# r03 lesson (VERDICT W1): per-stage budgets of 1200-1500s summed past the
# DRIVER's outer wall-clock cap and the whole script was killed before
# printing anything.  The budget that matters is the driver's, not ours:
# r02 finished (~2600s worst case) and r03 was killed (~5400s worst case),
# so the parent now enforces ONE global deadline well under the r02-proven
# envelope and sizes every stage budget from the time remaining.  A
# SIGTERM/SIGINT handler prints the best-so-far line and exits 0, so even
# an early outer kill records whatever has landed.
TOTAL_BUDGET_S = float(os.environ.get("ZKEVM_BENCH_BUDGET_S", "1500"))
_T0 = time.monotonic()
ANCHOR_MBUTTERFLIES = 100.0  # fixed cross-round anchor (see docstring)


def _remaining() -> float:
    return TOTAL_BUDGET_S - (time.monotonic() - _T0)


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
    from zkevm_circuits_tpu.poly.msm import _msm_impl

    n = (1 << 14) if on_tpu else (1 << 8)
    # measured on-chip (r3): lanes 64 > 8 > 256 > 1024 — the kernel is
    # field-mul bound (ops/pallas_curve.py module doc has the breakdown)
    lanes = 64 if on_tpu else 4
    rng = np.random.default_rng(99)
    pts = cv.g1_generator((n,))  # fixed-point batch: bench measures MSM, not setup
    sc = np.frombuffer(rng.bytes(n * 32), np.uint8).reshape(n, 32).copy()
    sc[:, 31] &= 0x0F  # < 2^252 < r
    sc = jax.device_put(jnp.asarray(sc))

    # REPS inside ONE jit with a tiny fetched output: eager per-call
    # timing through the axon tunnel measures dispatch latency (~30-100
    # ms/call), not the chip (r04 finding)
    reps = 2 if on_tpu else 1

    @jax.jit
    def run(px, py, pz, s):
        def body(_, c):
            # data dependency on the previous rep's output (flip one scalar
            # bit) so XLA cannot hoist the loop-invariant MSM (ADVICE r4 #2)
            cx, _, _ = c
            s2 = s.at[0, 0].set(s[0, 0] ^ (cx[0].astype(s.dtype) & 1))
            return _msm_impl(px, py, pz, s2, lanes)

        ox, oy, oz = jax.lax.fori_loop(0, reps, body, (px[0], py[0], pz[0]))
        return ox[0], oy[0], oz[0]

    np.asarray(run(pts.x, pts.y, pts.z, sc)[0])  # compile + warmup
    iters = 2
    t0 = time.perf_counter()
    for _ in range(iters):
        out = run(pts.x, pts.y, pts.z, sc)
    np.asarray(out[0])
    dt = (time.perf_counter() - t0) / (iters * reps)
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


_CHILD: subprocess.Popen | None = None
_RESULTS: dict = {}
_BACKENDS: dict = {}
_ERRORS: dict = {}
_EMITTED = False


def _compose_line() -> dict:
    primary = _RESULTS.get("ntt") or _RESULTS.get("msm") or {
        "name": "bench_failed",
        "value": 0.0,
    }
    is_ntt = primary is _RESULTS.get("ntt")
    # headline backend = the backend the HEADLINE metric ran on (r02 bug:
    # a later stage's fallback overwrote this even when NTT ran on-chip)
    line = {
        "metric": primary["name"],
        "value": primary["value"],
        "unit": "Mbutterflies/s" if is_ntt else "",
        "vs_baseline": round(primary["value"] / ANCHOR_MBUTTERFLIES, 4) if is_ntt else 0.0,
        "backend": _BACKENDS.get("ntt" if is_ntt else "msm", "none"),
        "backends": dict(_BACKENDS),
    }
    if "msm" in _RESULTS:
        line["msm_mpoints_per_s"] = _RESULTS["msm"]["value"]
        line["msm_metric"] = _RESULTS["msm"]["name"]
        if "pallas" in _RESULTS["msm"]:
            line["msm_pallas"] = _RESULTS["msm"]["pallas"]
    if "prove" in _RESULTS:
        line["prove_seconds"] = _RESULTS["prove"]["value"]
        line["prove_metric"] = _RESULTS["prove"]["name"]
    # reference-degree prove artifacts recorded earlier in the round
    # (BENCH_STATE16/18.json, the DEGREE=16/18 state_bench analogues)
    for deg in (16, 18):
        path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            f"BENCH_STATE{deg}.json")
        if os.path.exists(path):
            try:
                with open(path) as f:
                    rec = json.load(f)
                if rec.get("ok"):
                    line[f"state_k{deg}_prove_s"] = rec.get("prove_s")
                    line[f"state_k{deg}_keygen_s"] = rec.get("keygen_s")
            except (OSError, ValueError):
                pass
    if _ERRORS:
        line["error"] = dict(_ERRORS)
    return line


def _emit_and_exit(signum=None, frame=None):
    """Print the best-so-far line exactly once and exit 0 — the driver's
    outer `timeout` sends SIGTERM, which must still record a result."""
    global _EMITTED
    if _EMITTED:
        os._exit(0)
    _EMITTED = True
    if _CHILD is not None and _CHILD.poll() is None:
        try:
            _CHILD.kill()
        except OSError:
            pass
    if signum is not None:
        _ERRORS["killed"] = f"signal {signum} at t={time.monotonic() - _T0:.0f}s"
    sys.stdout.write(json.dumps(_compose_line()) + "\n")
    sys.stdout.flush()
    os._exit(0)


def _run_stage(stage: str, cpu: bool, timeout: float,
               extra_env: dict | None = None) -> tuple[dict | None, str | None]:
    """Run one stage in a subprocess; (result, error)."""
    global _CHILD
    cmd = [sys.executable, os.path.abspath(__file__), "--stage", stage]
    if cpu:
        cmd.append("--cpu")
    env = dict(os.environ, **(extra_env or {}))
    try:
        _CHILD = subprocess.Popen(
            cmd, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, env=env
        )
        out, err_out = _CHILD.communicate(timeout=timeout)
    except subprocess.TimeoutExpired:
        _CHILD.kill()
        _CHILD.communicate()
        return None, f"{stage}[{'cpu' if cpu else 'tpu'}]: timeout {timeout:.0f}s"
    finally:
        child, _CHILD = _CHILD, None
    if child.returncode != 0:
        tail = (err_out or out or "").strip().splitlines()
        return None, f"{stage}[{'cpu' if cpu else 'tpu'}]: rc={child.returncode}: " + (
            tail[-1][:200] if tail else ""
        )
    for line in reversed(out.strip().splitlines()):
        try:
            return json.loads(line), None
        except json.JSONDecodeError:
            continue
    return None, f"{stage}: no JSON in stage output"


def _try(stage: str, cpu: bool, budget: float, reserve: float) -> bool:
    """Run a stage if the remaining global budget allows, keeping
    `reserve` seconds for the stages after it.  Records result/error."""
    timeout = min(budget, _remaining() - reserve)
    if timeout < 30:
        _ERRORS[f"{stage}_{'cpu' if cpu else 'tpu'}"] = "skipped: budget exhausted"
        return False
    res, err = _run_stage(stage, cpu, timeout)
    if res is None and err and not cpu and "timeout" not in err:
        # stage ran but died — could be a Mosaic/pallas issue through the
        # tunnel; one retry with pallas disabled if budget allows
        retry_t = min(budget, _remaining() - reserve)
        if retry_t >= 30:
            res, err2 = _run_stage(
                stage, cpu, retry_t, extra_env={"ZKEVM_TPU_PALLAS": "0"}
            )
            err = f"{err}; nopallas-retry: {err2}" if res is None else err
    if res is not None:
        _RESULTS[stage] = res
        _BACKENDS[stage] = "cpu" if cpu else "tpu"
        return True
    _ERRORS[f"{stage}_{'cpu' if cpu else 'tpu'}"] = err
    return False


def main():
    signal.signal(signal.SIGTERM, _emit_and_exit)
    signal.signal(signal.SIGINT, _emit_and_exit)

    # Stage order = value order.  Reserves keep enough budget for a CPU
    # fallback of everything after the current stage.  `prove` runs on
    # CPU only: per-dispatch tunnel latency makes the many small jits of
    # prove() measure the tunnel, not the chip (r03 notes: 1059s TPU vs
    # 37s CPU at k=5) — on-chip it would be compute-bound, but through
    # the tunnel the number is meaningless.
    tunnel_dead = False
    if not _try("ntt", cpu=False, budget=700, reserve=420):
        tunnel_dead = "timeout" in str(_ERRORS.get("ntt_tpu", ""))
        _try("ntt", cpu=True, budget=180, reserve=260)
    if not tunnel_dead:
        _try("msm", cpu=False, budget=600, reserve=160)
    if "msm" not in _RESULTS:
        _try("msm", cpu=True, budget=180, reserve=120)
    _try("prove", cpu=True, budget=420, reserve=10)
    _emit_and_exit()


if __name__ == "__main__":
    if "--stage" in sys.argv:
        stage = sys.argv[sys.argv.index("--stage") + 1]
        print(json.dumps(STAGES[stage]("--cpu" in sys.argv)))
        sys.exit(0)
    try:
        main()
    except BaseException:  # belt and braces: one JSON line, rc=0, always
        import traceback

        if not _EMITTED:
            _ERRORS["driver"] = (
                traceback.format_exc(limit=3).strip().splitlines()[-1][:300]
            )
            _emit_and_exit()
    sys.exit(0)
