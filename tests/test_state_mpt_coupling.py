"""State <-> MPT coupling: storage groups bind to proven trie updates.

Covers VERDICT.md round-1 Missing §4 (reference state_circuit.rs:66-72:
Account/Storage rows look up MptTable).  Every (addr, key) storage group's
(committed -> final) transition must appear as a trie update whose key is
re-derived in-circuit from (addr, slot) and whose leaf values re-pack the
raw words — so storage semantics chain to the old/new state roots.
"""

import dataclasses

import numpy as np
import pytest

from zkevm_circuits_tpu.circuits.mpt import MptCircuit
from zkevm_circuits_tpu.circuits.state import StateCircuit, StateParams
from zkevm_circuits_tpu.plonk.circuit import Circuit, ConstraintSystem
from zkevm_circuits_tpu.plonk.mock import MockProver
from zkevm_circuits_tpu.tracer import Account, Interpreter, StateDB, Tx
from zkevm_circuits_tpu.types import Bytecode
from zkevm_circuits_tpu.witness.builder import AccountState, CircuitInputBuilder
from zkevm_circuits_tpu.witness.mpt import storage_updates_from_rws
from zkevm_circuits_tpu.witness.rw import RwTag

K = 9
SENDER, CONTRACT = 0xCAFE, 0xC0DE
SPARAMS = StateParams(limb_bits=8, id_bits=16, addr_bits=160, key_bits=32,
                      rwc_bits=16, target_rows=120)


class StateMpt(Circuit):
    """State + MPT (storage mode) sharing the word-RLC challenge; the
    SuperCircuit wiring pattern at sub-scale."""

    def __init__(self, rws, storage):
        self.state = StateCircuit(rws, SPARAMS)
        self.mpt = MptCircuit(storage=storage)
        self.subs = [self.state, self.mpt]

    def configure(self, cs: ConstraintSystem):
        r = cs.challenge(phase=0)
        self.mpt.configure(cs, challenge=r)
        self.state.configure(
            cs, challenge=r, mpt_storage_table=self.mpt.storage_table
        )

    def fixed_columns(self, n):
        out = {}
        for s in self.subs:
            out.update(s.fixed_columns(n))
        return out

    def copy_constraints(self, n):
        return []

    def synthesize(self, phase, n, challenges, instances):
        out = {}
        for s in self.subs:
            out.update(s.synthesize(phase, n, challenges, instances))
        return out


def _witness():
    code = (
        Bytecode()
        .push(2, 0xBEEF).push(1, 7).op("SSTORE")     # slot 7 = 0xBEEF
        .push(1, 7).op("SLOAD").op("POP")
        .push(2, 0xD00D).push(1, 7).op("SSTORE")     # slot 7 = 0xD00D
        .push(1, 9).op("SLOAD").op("POP")            # empty slot read
        .op("STOP")
    )
    st = StateDB({SENDER: Account(balance=10**15),
                  CONTRACT: Account(code=code.to_bytes())})
    tr = Interpreter(st).run_tx(Tx(from_addr=SENDER, to=CONTRACT))
    b = CircuitInputBuilder(
        accounts={SENDER: AccountState(balance=10**15),
                  CONTRACT: AccountState()}
    )
    b.handle_tx(dict(from_addr=SENDER, to_addr=CONTRACT, value=0,
                     calldata=b""), tr)
    return b


def test_storage_groups_bind_to_trie():
    b = _witness()
    storage, ups = storage_updates_from_rws(b.rws.rws)
    # two touched slots: 7 (0 -> 0xD00D) and 9 (0 -> 0, read-only)
    assert len(storage) == 2
    assert storage[0].old_word == 0 and storage[0].new_word == 0xD00D
    assert storage[1].new_word == 0
    # roots chain across updates and end at the trie's final root
    assert storage[0].mpt.new_root == storage[1].mpt.old_root
    assert storage[-1].mpt.new_root == ups.trie.root()
    MockProver(K, StateMpt(b.rws, storage)).assert_satisfied()


def test_missing_trie_update_rejected():
    b = _witness()
    storage, _ = storage_updates_from_rws(b.rws.rws)
    # drop the slot-7 update: the state circuit's storage group has no
    # matching trie row
    failures = MockProver(K, StateMpt(b.rws, storage[1:])).verify()
    assert failures, "storage group without a trie update must fail"


def test_wrong_final_value_rejected():
    b = _witness()
    storage, _ = storage_updates_from_rws(b.rws.rws)
    bad = dataclasses.replace(storage[0], new_word=0x1234)
    failures = MockProver(K, StateMpt(b.rws, [bad, storage[1]])).verify()
    assert failures, "trie update with a different final value must fail"
