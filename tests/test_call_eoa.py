"""No-descend CALL: codeless callee (the plain value-transfer shape).

VERDICT r3 item 6 / builder.py:334: calls that do not descend.  The
codeless-callee case (reference execution/callop.rs is_empty_code_hash
branch): value transfers, 1 pushes, no frame enters.  The callee's
emptiness is proven by an Account.CodeHash = 0 bus read.
"""

import numpy as np
import pytest

from zkevm_circuits_tpu.circuits.evm import EvmCircuit, EvmParams
from zkevm_circuits_tpu.circuits.state import StateCircuit, StateParams
from zkevm_circuits_tpu.crypto.field import fr
from zkevm_circuits_tpu.crypto.params import FR_MODULUS as R
from zkevm_circuits_tpu.plonk.mock import MockProver
from zkevm_circuits_tpu.tracer import Account, Interpreter, StateDB, Tx
from zkevm_circuits_tpu.types import Bytecode
from zkevm_circuits_tpu.witness.builder import CircuitInputBuilder
from zkevm_circuits_tpu.witness.rw import AccountField, RwTag

F = fr()
K = 10
SENDER, CONTRACT, EOA = 0xCAFE, 0xC0DE, 0xE0A
PARAMS = EvmParams(target_steps=48, rw_target=256)


def _run(code: Bytecode, accounts=None):
    state = StateDB({
        SENDER: Account(balance=10**18),
        CONTRACT: Account(balance=500, code=code.to_bytes()),
        EOA: Account(balance=7),
    })
    tr = Interpreter(state).run_tx(Tx(from_addr=SENDER, to=CONTRACT))
    assert not tr.failed
    b = CircuitInputBuilder(accounts=accounts or {})
    b.handle_tx(
        dict(from_addr=SENDER, to_addr=CONTRACT, value=0, calldata=b""),
        tr, code_db={CONTRACT: code.to_bytes()},
    )
    return b, tr, state


def _call_eoa_code(value: int, op: str = "CALL") -> Bytecode:
    code = Bytecode().push(1, 0).push(1, 0).push(1, 0).push(1, 0)
    if op in ("CALL", "CALLCODE"):
        code.push(4, value)
    code.push(2, EOA).push(2, 0xFFFF).op(op)
    return code.op("POP").op("STOP")


def test_call_eoa_transfer():
    b, tr, state = _run(_call_eoa_code(123))
    assert state.account(EOA).balance == 7 + 123
    call = next(s for s in b.steps if s.exec_state == "CALL")
    by_ctr = {r.rw_counter: r for r in b.rws.rws}
    rws = [by_ctr[i] for i in call.rw_indices]
    # [7 pops, AL warm, CodeHash read, balance pair, success push]
    assert rws[7].tag == RwTag.TxAccessListAccount
    assert rws[8].tag == RwTag.Account \
        and rws[8].field_tag == AccountField.CodeHash and rws[8].value == 0
    M256 = 1 << 256
    assert (rws[9].value_prev - rws[9].value) % M256 == 123   # caller -123
    assert (rws[10].value - rws[10].value_prev) % M256 == 123  # EOA +123
    assert rws[11].is_write and rws[11].value == 1
    assert not b.rws.check_consistency()
    MockProver(K, EvmCircuit(b.steps, b.rws.rws, PARAMS)).assert_satisfied()
    sp = StateParams(limb_bits=4, id_bits=8, addr_bits=16, key_bits=16,
                     rwc_bits=8, target_rows=160)
    MockProver(11, StateCircuit(b.rws, sp)).assert_satisfied()


def test_staticcall_eoa():
    b, tr, _ = _run(_call_eoa_code(0, op="STATICCALL"))
    call = next(s for s in b.steps if s.exec_state == "CALL")
    assert len(call.rw_indices) == 6 + 3  # pops + AL + CodeHash + push
    MockProver(K, EvmCircuit(b.steps, b.rws.rws, PARAMS)).assert_satisfied()


def test_call_eoa_forged_codehash_rejected():
    """Claiming no-descend against a callee WITH code must miss the
    Account.CodeHash = 0 bus read."""
    b, _, _ = _run(_call_eoa_code(5))

    class Corrupt(EvmCircuit):
        def synthesize(self, phase, n, challenges, instances):
            cols = super().synthesize(phase, n, challenges, instances)
            return cols

    # corrupt the rw side instead: give the EOA a code hash
    bad = [r for r in b.rws.rws]
    for i, r in enumerate(bad):
        if r.tag == RwTag.Account and r.field_tag == AccountField.CodeHash \
                and r.address == EOA:
            import dataclasses as dc

            bad[i] = dc.replace(r, value=0x1234, value_prev=0x1234)
    failures = MockProver(K, EvmCircuit(b.steps, bad, PARAMS)).verify()
    assert failures, "codeful callee must not take the no-descend path"


def test_callcode_eoa_self_transfer():
    """CALLCODE to a codeless account: value self-transfers (balance
    no-op), 1 pushes, no frame enters (reference callop.rs empty-code
    path for the CALLCODE variant)."""
    b, tr, state = _run(_call_eoa_code(50, op="CALLCODE"))
    assert state.account(CONTRACT).balance == 500  # self-transfer no-op
    call = next(s for s in b.steps if s.exec_state == "CALL")
    by_ctr = {r.rw_counter: r for r in b.rws.rws}
    rws = [by_ctr[i] for i in call.rw_indices]
    # [7 pops, AL warm, CodeHash read, self balance pair, success push]
    assert rws[8].field_tag == AccountField.CodeHash and rws[8].value == 0
    assert rws[9].address == CONTRACT and rws[10].address == CONTRACT
    # self-transfer: debit then credit restore the original balance
    assert rws[10].value == rws[9].value_prev
    M256 = 1 << 256
    assert (rws[9].value_prev - rws[9].value) % M256 == 50
    assert rws[11].is_write and rws[11].value == 1
    assert not b.rws.check_consistency()
    MockProver(K, EvmCircuit(b.steps, b.rws.rws, PARAMS)).assert_satisfied()


def test_delegatecall_eoa():
    """DELEGATECALL to an EOA: no value, warm write + CodeHash-0 read +
    success push only."""
    b, tr, state = _run(_call_eoa_code(0, op="DELEGATECALL"))
    call = next(s for s in b.steps if s.exec_state == "CALL")
    by_ctr = {r.rw_counter: r for r in b.rws.rws}
    rws = [by_ctr[i] for i in call.rw_indices]
    # [6 pops, AL warm, CodeHash read, success push]
    assert len(rws) == 9
    assert rws[7].field_tag == AccountField.CodeHash and rws[7].value == 0
    assert rws[8].is_write and rws[8].value == 1
    assert not b.rws.check_consistency()
    MockProver(K, EvmCircuit(b.steps, b.rws.rws, PARAMS)).assert_satisfied()


def test_call_insufficient_balance_abort():
    """CALL with value > caller balance: the call never starts, 0 pushes
    (reference callop.rs insufficient_balance branch)."""
    code = _call_eoa_code(10**9)  # CONTRACT only has 500
    b, tr, state = _run(code, accounts={CONTRACT: {"balance": 500}})
    assert state.account(EOA).balance == 7  # no transfer happened
    call = next(s for s in b.steps if s.exec_state == "CALL")
    by_ctr = {r.rw_counter: r for r in b.rws.rws}
    rws = [by_ctr[i] for i in call.rw_indices]
    # [7 pops, AL warm, caller Balance read, failure-0 push]
    assert len(rws) == 10
    assert rws[7].tag == RwTag.TxAccessListAccount
    assert rws[8].tag == RwTag.Account \
        and rws[8].field_tag == AccountField.Balance \
        and not rws[8].is_write
    assert rws[9].is_write and rws[9].value == 0
    assert not b.rws.check_consistency()
    MockProver(K, EvmCircuit(b.steps, b.rws.rws, PARAMS)).assert_satisfied()


def test_forged_abort_flag_rejected():
    """Claiming the abort shape for a successful transfer must break the
    rw accounting / bus lookups."""
    b, tr, state = _run(_call_eoa_code(123))

    class Forge(EvmCircuit):
        def synthesize(self, phase, n, challenges, instances):
            cols = super().synthesize(phase, n, challenges, instances)
            if phase == 0:
                row = next(i for i, s in enumerate(self.steps)
                           if s.exec_state == "CALL")
                a25 = np.array(cols[self.c_carry[25]])
                a26 = np.array(cols[self.c_carry[26]])
                a25[row] = F.from_int(0)
                a26[row] = F.from_int(F.R)  # claim: aborted
                cols[self.c_carry[25]] = a25
                cols[self.c_carry[26]] = a26
            return cols

    failures = MockProver(K, Forge(b.steps, b.rws.rws, PARAMS)).verify()
    assert failures
