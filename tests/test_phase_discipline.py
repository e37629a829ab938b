"""Mechanical audit of the single-challenge phase discipline.

docs/SOUNDNESS_single_challenge.md states the invariant: every RLC under
the shared phase-0 challenge folds only phase-0 data; phase-1 columns are
determined accumulators/helpers.  This test enforces the mechanizable
half: (a) all challenges live in phase 0 (squeezed right after the
phase-0 commitments), and (b) no phase-1 advice column is FREE — each one
is referenced by at least one gate or lookup, so the constraint system
has a handle on it (free witnesses would be the unsound case).
"""

import pytest

from zkevm_circuits_tpu.plonk.circuit import ConstraintSystem

pytestmark = pytest.mark.fast


def _configured(circuit):
    cs = ConstraintSystem()
    circuit.configure(cs)
    return cs


def _referenced_advice(cs) -> set:
    out: set = set()
    for kind, col, _rot in cs.all_queries():
        if kind == "advice":
            out.add(col)
    return out


def _audit(cs: ConstraintSystem):
    assert all(p == 0 for p in cs.challenge_phases), (
        "all challenges must be phase 0 (see SOUNDNESS_single_challenge.md)"
    )
    referenced = _referenced_advice(cs)
    free = [
        ci for ci, ph in enumerate(cs.advice_phases)
        if ph >= 1 and ci not in referenced
    ]
    assert not free, f"unconstrained phase-1 advice columns: {free}"


def test_state_circuit_phases():
    from zkevm_circuits_tpu.circuits.state import StateCircuit, StateParams

    # production geometry (limb_bits <= 8): the key-RLC binding gate is
    # active.  limb_bits > 8 standalone test geometries leave col_key_rlc
    # deliberately unbound (documented, state.py "key rlc binding").
    _audit(_configured(StateCircuit(
        [], StateParams(limb_bits=4, id_bits=8, addr_bits=160, key_bits=16,
                        rwc_bits=16),
    )))


def test_rlp_circuit_phases():
    from zkevm_circuits_tpu.circuits.rlp import RlpCircuit
    from zkevm_circuits_tpu.plonk.expression import Fixed

    # with the keccak binding wired (the composed configuration): c_hash
    # is bound through the KeccakTable lookup; standalone-without-keccak
    # leaves it deliberately free (documented).
    circuit = RlpCircuit([])
    cs = ConstraintSystem()
    kt = [Fixed(cs.fixed_column()) for _ in range(3)]
    circuit.configure(cs, keccak_table=kt)
    _audit(cs)


def test_keccak_circuit_phases():
    from zkevm_circuits_tpu.circuits.keccak import KeccakCircuit

    _audit(_configured(KeccakCircuit([b"x"])))


def test_bytecode_circuit_phases():
    from zkevm_circuits_tpu.circuits.bytecode import BytecodeCircuit
    from zkevm_circuits_tpu.types.bytecode import Bytecode

    _audit(_configured(BytecodeCircuit([Bytecode(bytes([0x60, 1, 0x00]))])))


def test_super_circuit_phases():
    # full composition (keccak on): the RLP/Tx hash columns are bound via
    # the KeccakTable; the keccak-less configuration leaves them free by
    # design (documented in SOUNDNESS_single_challenge.md).
    from test_super_circuit import _witness
    from zkevm_circuits_tpu.circuits.pi import PublicData
    from zkevm_circuits_tpu.circuits.super_circuit import SuperCircuit
    from zkevm_circuits_tpu.crypto.keccak import keccak256

    b, codes, txs = _witness()
    pd = PublicData(
        chain_id=1337,
        prev_state_root=keccak256(b"prev"),
        post_state_root=keccak256(b"post"),
        withdraw_root=keccak256(b"w"),
        data_hash=keccak256(b"d"),
    )
    # with_sig binds tx.c_sign_hash through the RLP sign-hash + SigTable
    # lookups (configure-only here — no proving, so the sig row cost is
    # irrelevant)
    _audit(_configured(
        SuperCircuit(b, codes, txs, public_data=pd, with_sig=True)
    ))
