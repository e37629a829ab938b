"""Poseidon hash over BN254 Fr — host reference + vectorized JAX batch.

Plays the role of the reference's external `poseidon-circuit` (hash-circuit)
host hashing and the Poseidon scheme the Go zktrie registers via
`init_hash_scheme` (reference zktrie/src/state/builder.rs:16, SURVEY.md
§2.3 items 3 and 6).

Parameters: t = 3 (rate 2, capacity 1), S-box x^5, R_F = 8 full rounds,
R_P = 57 partial rounds — the standard 128-bit-security instantiation for
a 254-bit prime.  Round constants and the Cauchy MDS matrix are generated
in-repo by the Poseidon paper's Grain-LFSR procedure
(`generate_params_poseidon.sage` algorithm).  NOTE: Scroll's production
constant table lives in the external `poseidon-circuit`/`go-iden3-crypto`
deps and is not vendored in the reference repo; the constants here are the
deterministic paper generation.  `PoseidonSpec` takes explicit constants,
so swapping in Scroll's table for bit-parity is a data change only.

Conventions (iden3/circomlib-style, used by zktrie):
  * ``hash2(a, b)``: state (0, a, b) -> permute -> state[0].
  * ``hash_msg(fields, cap)``: variable-length absorption, rate 2, initial
    capacity element = ``cap`` (Scroll's code hash uses length * 2^64 as
    the domain, prover-side convention).
"""

from __future__ import annotations

import dataclasses
import functools

import numpy as np

from .params import FR_MODULUS

T = 3
ALPHA = 5
R_FULL = 8
R_PARTIAL = 57


# ---------------------------------------------------------------------------
# Grain LFSR parameter generation (Poseidon reference algorithm)
# ---------------------------------------------------------------------------
class _Grain:
    """80-bit Grain LFSR from the Poseidon reference implementation:
    state = field(2) ‖ sbox(4) ‖ n(12) ‖ t(12) ‖ R_F(10) ‖ R_P(10) ‖ 1^30,
    feedback taps {62, 51, 38, 23, 13, 0}, 160 warm-up bits, von Neumann
    pair filtering on outputs."""

    def __init__(self, n_bits: int, t: int, r_f: int, r_p: int):
        bits: list[int] = []
        for val, width in ((1, 2), (0, 4), (n_bits, 12), (t, 12),
                           (r_f, 10), (r_p, 10)):
            bits += [(val >> (width - 1 - i)) & 1 for i in range(width)]
        bits += [1] * 30
        assert len(bits) == 80
        self.state = bits
        for _ in range(160):
            self._raw()

    def _raw(self) -> int:
        s = self.state
        new = s[62] ^ s[51] ^ s[38] ^ s[23] ^ s[13] ^ s[0]
        self.state = s[1:] + [new]
        return new

    def bit(self) -> int:
        while True:
            b1 = self._raw()
            b2 = self._raw()
            if b1:
                return b2

    def field_element(self, p: int, n_bits: int) -> int:
        while True:
            v = 0
            for _ in range(n_bits):
                v = (v << 1) | self.bit()
            if v < p:
                return v


@functools.cache
def _grain_params(p: int = FR_MODULUS):
    n_bits = p.bit_length()
    g = _Grain(n_bits, T, R_FULL, R_PARTIAL)
    n_rounds = R_FULL + R_PARTIAL
    rc = [[g.field_element(p, n_bits) for _ in range(T)] for _ in range(n_rounds)]
    # Cauchy MDS from fresh grain samples: mds[i][j] = 1/(x_i + y_j)
    xs = [g.field_element(p, n_bits) for _ in range(T)]
    ys = [g.field_element(p, n_bits) for _ in range(T)]
    mds = [
        [pow((xs[i] + ys[j]) % p, p - 2, p) for j in range(T)] for i in range(T)
    ]
    # sanity: invertible (Cauchy with distinct x_i, x_i + y_j != 0)
    assert len({x % p for x in xs}) == T
    assert all((xs[i] + ys[j]) % p != 0 for i in range(T) for j in range(T))
    return rc, mds


@dataclasses.dataclass(frozen=True)
class PoseidonSpec:
    p: int
    rc: tuple  # (R_FULL + R_PARTIAL, T) ints
    mds: tuple  # (T, T) ints

    @property
    def n_rounds(self) -> int:
        return len(self.rc)

    def is_full_round(self, r: int) -> bool:
        half = R_FULL // 2
        return r < half or r >= self.n_rounds - half


@functools.cache
def spec(p: int = FR_MODULUS) -> PoseidonSpec:
    rc, mds = _grain_params(p)
    return PoseidonSpec(
        p=p,
        rc=tuple(tuple(row) for row in rc),
        mds=tuple(tuple(row) for row in mds),
    )


# ---------------------------------------------------------------------------
# host permutation / hashes (Python ints)
# ---------------------------------------------------------------------------
def permute(state, sp: PoseidonSpec | None = None):
    """One Poseidon permutation on a length-3 int state; returns new list."""
    sp = sp or spec()
    p = sp.p
    s = list(state)
    for r in range(sp.n_rounds):
        s = [(x + c) % p for x, c in zip(s, sp.rc[r])]
        if sp.is_full_round(r):
            s = [pow(x, ALPHA, p) for x in s]
        else:
            s[0] = pow(s[0], ALPHA, p)
        s = [
            sum(sp.mds[i][j] * s[j] for j in range(T)) % p for i in range(T)
        ]
    return s


def round_states(state, sp: PoseidonSpec | None = None):
    """All n_rounds+1 states (inputs of each round + final) — the circuit
    witness for one permutation block."""
    sp = sp or spec()
    out = [list(state)]
    s = list(state)
    for r in range(sp.n_rounds):
        p = sp.p
        s = [(x + c) % p for x, c in zip(s, sp.rc[r])]
        if sp.is_full_round(r):
            s = [pow(x, ALPHA, p) for x in s]
        else:
            s[0] = pow(s[0], ALPHA, p)
        s = [sum(sp.mds[i][j] * s[j] for j in range(T)) % p for i in range(T)]
        out.append(list(s))
    return out


def hash2(a: int, b: int, sp: PoseidonSpec | None = None) -> int:
    """2-to-1 hash: state (0, a, b) -> permute -> state[0]."""
    return permute([0, a, b], sp)[0]


def hash_msg(fields, cap: int | None = None, sp: PoseidonSpec | None = None) -> int:
    """Variable-length sponge: absorb rate-2 chunks (zero-padded), initial
    capacity = ``cap`` (default: len(fields) * 2^64, Scroll's var-len
    domain convention for code hashing)."""
    sp = sp or spec()
    p = sp.p
    if cap is None:
        cap = (len(fields) << 64) % p
    s = [cap % p, 0, 0]
    chunks = list(fields) + [0] * ((-len(fields)) % 2)
    if not chunks:
        chunks = [0, 0]  # empty message still runs one permutation
    for i in range(0, len(chunks), 2):
        s[1] = (s[1] + chunks[i]) % p
        s[2] = (s[2] + chunks[i + 1]) % p
        s = permute(s, sp)
    return s[0]


# ---------------------------------------------------------------------------
# vectorized batch permutation (JAX, Montgomery digit arrays)
# ---------------------------------------------------------------------------
@functools.cache
def _mont_consts():
    from .field import fr

    F = fr()
    sp = spec()
    rc = np.stack([F.from_ints([c * F.R % F.modulus for c in row]) for row in sp.rc])
    mds = np.stack([F.from_ints([m * F.R % F.modulus for m in row]) for row in sp.mds])
    return rc, mds  # (65, 3, 32), (3, 3, 32) uint8 Montgomery


def permute_batch(states):
    """(B, 3, 32) uint8 Montgomery states -> permuted, fully vectorized.
    Used for bulk witness hashing (bytecode Poseidon code-hash, MPT)."""
    import jax.numpy as jnp

    from .field import fr

    F = fr()
    sp = spec()
    rc, mds = _mont_consts()
    rc, mds = jnp.asarray(rc), jnp.asarray(mds)
    s = states
    for r in range(sp.n_rounds):
        s = F._add(s, rc[r][None, :, :])
        sq = F._mul(s, s)
        s5 = F._mul(F._mul(sq, sq), s)
        if sp.is_full_round(r):
            s = s5
        else:
            s = jnp.concatenate([s5[:, :1], s[:, 1:]], axis=1)
        # MDS: out_i = sum_j mds[i][j] * s_j
        outs = []
        for i in range(T):
            acc = None
            for j in range(T):
                term = F._mul(s[:, j], jnp.broadcast_to(mds[i, j], s[:, j].shape))
                acc = term if acc is None else F._add(acc, term)
            outs.append(acc)
        s = jnp.stack(outs, axis=1)
    return s
