"""State circuit tests: tracer -> builder -> RW table -> MockProver.

Mirrors the reference's state_circuit test strategy (SURVEY.md §4.3:
satisfying witness + targeted corruptions must fail).
Small field widths keep the column count CPU-testable.
"""

import dataclasses

import pytest

from zkevm_circuits_tpu.circuits.state import StateCircuit, StateParams
from zkevm_circuits_tpu.plonk.mock import MockProver
from zkevm_circuits_tpu.tracer import Account, Interpreter, StateDB, Tx
from zkevm_circuits_tpu.types import Bytecode
from zkevm_circuits_tpu.witness.builder import CircuitInputBuilder
from zkevm_circuits_tpu.witness.rw import RwTag

K = 7
PARAMS = StateParams(
    limb_bits=4, id_bits=8, addr_bits=16, key_bits=16, rwc_bits=8,
    target_rows=100,
)

SENDER = 0xCAFE
CONTRACT = 0xC0DE


def _rws():
    code = (
        Bytecode().push(1, 5).push(1, 7).op("ADD")
        .push(1, 0).op("MSTORE")
        .push(1, 9).push(1, 5).op("SSTORE")
        .push(1, 5).op("SLOAD").op("POP").op("STOP")
    )
    state = StateDB(
        {SENDER: Account(balance=10**18), CONTRACT: Account(code=code.to_bytes())}
    )
    tr = Interpreter(state).run_tx(Tx(from_addr=SENDER, to=CONTRACT))
    b = CircuitInputBuilder()
    b.handle_tx(
        dict(from_addr=SENDER, to_addr=CONTRACT, value=0, calldata=b""), tr
    )
    assert not b.rws.check_consistency()
    return b.rws


@pytest.fixture(scope="module")
def rws():
    return _rws()


def test_state_circuit_satisfied(rws):
    MockProver(K, StateCircuit(rws, PARAMS)).assert_satisfied()


def test_state_circuit_catches_bad_read(rws):
    rows = rws.sorted_rws()
    bad = [dataclasses.replace(r) for r in rows]
    # find a read and corrupt its value
    idx = next(
        i for i, r in enumerate(bad)
        if not r.is_write and r.tag == RwTag.Stack and i > 0
        and bad[i - 1].tag == RwTag.Stack
    )
    bad[idx].value = (bad[idx].value + 1) % (1 << 16)
    failures = MockProver(K, StateCircuit(bad, PARAMS)).verify()
    assert any("read consistency" in f for f in failures), failures


def test_state_circuit_catches_unsorted(rws):
    rows = rws.sorted_rws()
    bad = [dataclasses.replace(r) for r in rows]
    bad[3], bad[4] = bad[4], bad[3]
    failures = MockProver(K, StateCircuit(bad, PARAMS)).verify()
    assert failures


def test_state_circuit_catches_memory_first_read(rws):
    rows = rws.sorted_rws()
    bad = [dataclasses.replace(r) for r in rows]
    mem_rows = [i for i, r in enumerate(bad) if r.tag == RwTag.Memory]
    first_mem = min(mem_rows)
    # make the first access of the lowest memory address a read of nonzero
    bad[first_mem].is_write = False
    bad[first_mem].value = 0xAB
    failures = MockProver(K, StateCircuit(bad, PARAMS)).verify()
    assert failures
