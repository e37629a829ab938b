"""Evaluation domains for polynomial arithmetic over BN254 Fr.

TPU-native equivalent of the reference backend's `EvaluationDomain`
(external halo2_proofs; SURVEY.md §2.3 item 1: radix-2 NTT/iNTT and coset
FFT).  Precomputes per-stage twiddle tables (Montgomery form, numpy) on the
host once per (k) and serves them to the jitted NTT kernels.

Conventions (matching halo2's domain structure so circuit layouts carry over):
  * domain size n = 2^k, omega = primitive n-th root of unity,
  * extended domain size 2^(k+j) for quotient evaluation, evaluated on the
    coset g * H_ext with g = FR_GENERATOR (halo2's `g_coset` zeta trick is
    replaced by plain coset powers; documented divergence, same statement).
"""

from __future__ import annotations

import functools

import numpy as np

from ..crypto.field import fr
from ..crypto.params import FR_GENERATOR, FR_MODULUS, FR_ROOT_OF_UNITY, FR_TWO_ADICITY


class Domain:
    def __init__(self, k: int):
        assert 1 <= k <= FR_TWO_ADICITY
        self.k = k
        self.n = 1 << k
        self.F = fr()
        r = FR_MODULUS
        self.omega = pow(FR_ROOT_OF_UNITY, 1 << (FR_TWO_ADICITY - k), r)
        self.omega_inv = pow(self.omega, r - 2, r)
        self.n_inv = pow(self.n, r - 2, r)

        # bit-reversal permutation
        idx = np.arange(self.n)
        rev = np.zeros(self.n, np.int32)
        for b in range(k):
            rev |= ((idx >> b) & 1) << (k - 1 - b)
        self.bitrev = rev

        # per-stage twiddles (Montgomery digits): stage s in [1, k] uses
        # m = 2^s and w_m = omega^(n/m); table [w_m^j for j < m/2].
        R = self.F.R
        self.stage_twiddles = []
        self.stage_twiddles_inv = []
        for s in range(1, k + 1):
            m = 1 << s
            wm = pow(self.omega, self.n // m, r)
            wmi = pow(self.omega_inv, self.n // m, r)
            tw, twi, aw, awi = [], [], 1, 1
            for _ in range(m // 2):
                tw.append(aw * R % r)
                twi.append(awi * R % r)
                aw = aw * wm % r
                awi = awi * wmi % r
            self.stage_twiddles.append(self.F.from_ints(tw))
            self.stage_twiddles_inv.append(self.F.from_ints(twi))
        self.n_inv_mont = self.F.from_int(self.n_inv * R % r)

        # powers of omega (plain ints) for host-side checks
        self._omega_pows = None

    def omega_pow(self, e: int) -> int:
        return pow(self.omega, e % self.n, FR_MODULUS)

    # coset powers g^0..g^{n-1} (Montgomery), g = multiplicative generator
    @functools.cached_property
    def coset_powers(self):
        r, R = FR_MODULUS, self.F.R
        out, acc = [], 1
        for _ in range(self.n):
            out.append(acc * R % r)
            acc = acc * FR_GENERATOR % r
        return self.F.from_ints(out)

    @functools.cached_property
    def coset_powers_inv(self):
        r, R = FR_MODULUS, self.F.R
        ginv = pow(FR_GENERATOR, r - 2, r)
        out, acc = [], 1
        for _ in range(self.n):
            out.append(acc * R % r)
            acc = acc * ginv % r
        return self.F.from_ints(out)


@functools.cache
def domain(k: int) -> Domain:
    return Domain(k)
