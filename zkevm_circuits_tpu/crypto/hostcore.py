"""Host-side BN254 compute core — ctypes binding to native/bn254.cc.

The CPU-backend prover routes its hot polynomial passes here: Pippenger
MSM commitments, radix-2 NTTs, and fixed-base SRS generation run as
single-threaded C++ over the same R = 2^256 Montgomery layout the JAX
digit arrays use, so (n, 32) uint8 arrays cross the boundary as raw bytes
(zero conversion on little-endian hosts).

This is the framework's analogue of the reference's external halo2_proofs
CPU backend (multicore FFT + Pippenger, SURVEY.md §2.3 item 1); on TPU
backends the pallas/MXU device kernels are used instead and this module is
never consulted for transforms.

Env:
  ZKEVM_HOST_CORE=0   disable (falls back to the JAX / Python-int paths)
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

from .params import FR_MODULUS

_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if os.environ.get("ZKEVM_HOST_CORE") == "0":
        return None
    path = os.path.join(
        os.path.dirname(__file__), "..", "..", "native", "libzkevm_native.so"
    )
    try:
        lib = ctypes.CDLL(os.path.abspath(path))
        lib.zkevm_bn254_msm.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int, ctypes.c_int64, ctypes.c_int64, ctypes.c_void_p,
        ]
        lib.zkevm_bn254_srs_gen.argtypes = [
            ctypes.c_int64, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ]
        lib.zkevm_fr_ntt.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ]
        lib.zkevm_fr_batch_inv.argtypes = [ctypes.c_void_p, ctypes.c_int64]
        lib.zkevm_fr_powers.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
        ]
        lib.zkevm_fr_eval_quotient.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_void_p,
        ]
        lib.zkevm_fr_eval_quotient.restype = ctypes.c_int
        lib.zkevm_fr_eval_poly_batch.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_void_p,
        ]
        _lib = lib
    except OSError:
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def _u8(a) -> np.ndarray:
    a = np.ascontiguousarray(np.asarray(a), dtype=np.uint8)
    return a


def _int_bytes(v: int) -> bytes:
    return (v % FR_MODULUS).to_bytes(32, "little")


def msm(px, py, zmask, scalars, scalars_mont: bool):
    """Multi-column MSM.

    px, py: (n, 32) uint8 Montgomery affine coords.
    zmask:  (n,) uint8 (0 = point at infinity) or None.
    scalars: (ncols, n, 32) uint8 LE (plain, or Montgomery if scalars_mont).
    Returns list of affine int pairs (x, y) or None (infinity) per column.
    """
    lib = _load()
    px, py = _u8(px), _u8(py)
    scalars = _u8(scalars)
    if scalars.ndim == 2:
        scalars = scalars[None]
    ncols, n = scalars.shape[0], scalars.shape[1]
    assert px.shape == (n, 32) and py.shape == (n, 32)
    zm = None
    if zmask is not None:
        zm = np.ascontiguousarray(np.asarray(zmask, np.uint8))
        assert zm.shape == (n,)
    out = np.empty(ncols * 65, np.uint8)
    lib.zkevm_bn254_msm(
        px.ctypes.data, py.ctypes.data,
        zm.ctypes.data if zm is not None else None,
        scalars.ctypes.data, int(scalars_mont), n, ncols, out.ctypes.data,
    )
    res = []
    for c in range(ncols):
        blk = out[c * 65 : (c + 1) * 65]
        if blk[64] == 0:
            res.append(None)
        else:
            x = int.from_bytes(bytes(blk[:32]), "little")
            y = int.from_bytes(bytes(blk[32:64]), "little")
            res.append((x, y))
    return res


def srs_gen(n: int, tau: int):
    """[tau^i]G for i < n -> ((n, 32), (n, 32)) Montgomery affine uint8."""
    lib = _load()
    out_x = np.empty((n, 32), np.uint8)
    out_y = np.empty((n, 32), np.uint8)
    lib.zkevm_bn254_srs_gen(
        n, _int_bytes(tau), out_x.ctypes.data, out_y.ctypes.data
    )
    return out_x, out_y


def ntt(data, k: int, *, inverse: bool = False, coset: bool = False) -> np.ndarray:
    """Batched NTT over Fr matching poly/ntt.py semantics exactly.

    data: (..., n, 32) uint8 Montgomery digit array (not modified).
    Forward: coeffs -> evals at H (or the coset g*H when coset=True).
    Inverse: evals -> coeffs (coset=True takes evals on g*H).
    """
    from .params import FR_GENERATOR, FR_ROOT_OF_UNITY, FR_TWO_ADICITY

    lib = _load()
    n = 1 << k
    r = FR_MODULUS
    omega = pow(FR_ROOT_OF_UNITY, 1 << (FR_TWO_ADICITY - k), r)
    one = _int_bytes(1)
    if not inverse:
        om = omega
        pre = _int_bytes(FR_GENERATOR) if coset else one
        postb, postc = one, one
    else:
        om = pow(omega, r - 2, r)
        pre = one
        postb = _int_bytes(pow(FR_GENERATOR, r - 2, r)) if coset else one
        postc = _int_bytes(pow(n, r - 2, r))
    a = _u8(data)
    shape = a.shape
    assert shape[-2] == n and shape[-1] == 32
    buf = a.reshape(-1, n, 32).copy()
    lib.zkevm_fr_ntt(buf.ctypes.data, k, buf.shape[0], om.to_bytes(32, "little"),
                     pre, postb, postc)
    return buf.reshape(shape)


def eval_quotient(cols, consts, prog, ntmps: int, max_stack: int,
                  n: int) -> np.ndarray:
    """Run a serialized quotient program (plonk/quotient_native.py).

    cols: (ncols, n, 32) uint8 Montgomery; consts: (nconsts, 32);
    prog: (nops, 3) int32.  Returns (n, 32) uint8."""
    lib = _load()
    cols = _u8(cols)
    consts = _u8(consts).reshape(-1, 32)
    prog = np.ascontiguousarray(prog, np.int32)
    out = np.empty((n, 32), np.uint8)
    rc = lib.zkevm_fr_eval_quotient(
        cols.ctypes.data, cols.shape[0], n,
        consts.ctypes.data, consts.shape[0],
        prog.ctypes.data, prog.shape[0],
        ntmps, max_stack, out.ctypes.data,
    )
    assert rc == 0, f"native quotient evaluator failed: rc={rc}"
    return out


def eval_poly_batch(coeffs, x: int) -> list[int]:
    """(q, n, 32) Montgomery coefficient stacks -> [p_q(x)] plain ints."""
    lib = _load()
    coeffs = _u8(coeffs)
    if coeffs.ndim == 2:
        coeffs = coeffs[None]
    nq, n = coeffs.shape[0], coeffs.shape[1]
    out = np.empty((nq, 32), np.uint8)
    lib.zkevm_fr_eval_poly_batch(
        coeffs.ctypes.data, nq, n, _int_bytes(x), out.ctypes.data
    )
    return [int.from_bytes(bytes(row), "little") for row in out]


def batch_inv(data) -> np.ndarray:
    """(n, 32) Montgomery -> elementwise inverse (0 -> 0), new array."""
    lib = _load()
    buf = _u8(data).copy()
    flat = buf.reshape(-1, 32)
    lib.zkevm_fr_batch_inv(flat.ctypes.data, flat.shape[0])
    return buf


def powers(base: int, n: int) -> np.ndarray:
    """(n, 32) Montgomery digits of base^i, i < n (base a plain int)."""
    lib = _load()
    out = np.empty((n, 32), np.uint8)
    lib.zkevm_fr_powers(_int_bytes(base), n, out.ctypes.data)
    return out
