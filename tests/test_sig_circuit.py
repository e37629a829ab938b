"""Sig circuit: ECDSA verification over MulMod-table rows."""

import numpy as np
import pytest

from zkevm_circuits_tpu.circuits.sig import (
    D_PT, E_PT, EV_ROWS, NEG_E_PT, SigCircuit, SigEvent, T1_PT,
)
from zkevm_circuits_tpu.crypto import secp256k1 as secp
from zkevm_circuits_tpu.crypto.field import fr
from zkevm_circuits_tpu.plonk.mock import MockProver

K = 13
SK = 0xB0B5_5EED_1DEA_F00D


def _event(sk=SK, z=0xDEADBEEF_12345678):
    r, s, _v = secp.sign(sk, z.to_bytes(32, "big"))
    return SigEvent(msg_hash=z, r=r, s=s, pubkey=secp.pubkey(sk))


def test_constants_consistent():
    assert secp._add(E_PT, NEG_E_PT) is None  # E + (-E) = infinity
    assert T1_PT == secp._add(secp.G, D_PT)


def test_trace_simulates_and_verifies():
    ev = _event()
    setup, walk, final, events = ev.trace()
    assert len(walk) == 256
    assert ev.address == secp.eth_address(SK)
    # every emitted mulmod row is a true modular identity
    for e in events[:50]:
        if e.n:
            expect = (e.a % e.n + e.b) % e.n if e.is_add \
                else (e.a % e.n) * e.b % e.n
            assert expect == e.r


def test_trace_rejects_invalid_signature():
    ev = _event()
    bad = SigEvent(msg_hash=ev.msg_hash, r=ev.r, s=ev.s + 1,
                   pubkey=ev.pubkey)
    with pytest.raises(AssertionError):
        bad.trace()


def test_sig_circuit_satisfied():
    circ = SigCircuit([_event()])
    MockProver(K, circ).assert_satisfied()


def test_sig_circuit_catches_tampered_scalar_bit():
    circ = SigCircuit([_event()])

    class Corrupt(SigCircuit):
        def synthesize(self, phase, n, challenges, instances):
            cols = super().synthesize(phase, n, challenges, instances)
            if phase == 0:
                F = fr()
                # flip a u1 bit on a mid-walk row: the scalar-accumulator
                # binding or the EC chain must break
                arr = np.array(cols[self.c_b1])
                row = 1 + 100
                cur = F.to_int(np.asarray(F.from_mont(arr[row])))
                arr[row] = F.from_int((1 - cur) * F.R % F.modulus)
                cols[self.c_b1] = arr
            return cols

    failures = MockProver(K, Corrupt(circ.events)).verify()
    assert failures


def test_sig_circuit_catches_wrong_address_byte():
    circ = SigCircuit([_event()])

    class Corrupt(SigCircuit):
        def synthesize(self, phase, n, challenges, instances):
            cols = super().synthesize(phase, n, challenges, instances)
            if phase == 0:
                F = fr()
                frow = 1 + 256
                arr = np.array(cols[self.c_db[20]])
                cur = F.to_int(np.asarray(F.from_mont(arr[frow])))
                arr[frow] = F.from_int((cur ^ 1) * F.R % F.modulus)
                cols[self.c_db[20]] = arr
            return cols

    failures = MockProver(K, Corrupt(circ.events)).verify()
    assert any("keccak" in f for f in failures), failures
