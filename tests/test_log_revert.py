"""Logs inside reverting frames (VERDICT r4 missing #3 item).

Reference: bus-mapping gates TxLog ops on `call.is_persistent`
(src/evm/opcodes/logs.rs) — a LOG executed in a frame that later reverts
(or under a doomed ancestor, or in a failing tx) pops its operands and
charges gas but writes nothing to the TxLog table, and the tx's receipt
log count excludes it.  The builder's persistence pre-scan + the EVM
circuit's LOG persistence flag implement the same behavior."""

import pytest

from zkevm_circuits_tpu.circuits.evm import EvmCircuit, EvmParams
from zkevm_circuits_tpu.plonk.mock import MockProver
from zkevm_circuits_tpu.tracer import Account, Interpreter, StateDB, Tx
from zkevm_circuits_tpu.types import Bytecode
from zkevm_circuits_tpu.witness.builder import CircuitInputBuilder
from zkevm_circuits_tpu.witness.rw import RwTag

pytestmark = pytest.mark.fast

K = 9
SENDER, CONTRACT, CALLEE = 0xCAFE, 0xC0DE, 0xCA11EE
PARAMS = EvmParams(target_steps=48, rw_target=256)


def _witness(callee_code: Bytecode, caller_logs: bool = False,
             expect_fail: bool = False):
    caller = Bytecode()
    if caller_logs:
        caller.push(1, 0).push(1, 0).op("LOG0")  # persistent caller log
    caller.push(1, 0).push(1, 0)                 # retLen, retOff
    caller.push(1, 0).push(1, 0)                 # argsLen, argsOff
    caller.push(1, 0)                            # value
    caller.push(3, CALLEE).push(2, 0xFFFF).op("CALL")
    caller.op("POP").op("STOP")
    state = StateDB({
        SENDER: Account(balance=10**18),
        CONTRACT: Account(code=caller.to_bytes()),
        CALLEE: Account(code=callee_code.to_bytes()),
    })
    tr = Interpreter(state).run_tx(Tx(from_addr=SENDER, to=CONTRACT))
    assert tr.failed == expect_fail
    b = CircuitInputBuilder()
    b.handle_tx(
        dict(from_addr=SENDER, to_addr=CONTRACT, value=0, calldata=b""),
        tr,
        code_db={CONTRACT: caller.to_bytes(), CALLEE: callee_code.to_bytes()},
    )
    return b


def _txlog_rows(b):
    return [r for r in b.rws.rws if r.tag == RwTag.TxLog]


def test_log_in_reverting_frame_dropped():
    # callee: LOG1 then REVERT — its log must NOT reach the TxLog table
    callee = (
        Bytecode().push(1, 0xAB)                  # topic
        .push(1, 0).push(1, 0).op("LOG1")
        .push(1, 0).push(1, 0).op("REVERT")
    )
    b = _witness(callee, caller_logs=True)
    rows = _txlog_rows(b)
    # only the caller's LOG0 address row lands (no topics, no data)
    assert len(rows) == 1
    log_steps = [s for s in b.steps if s.exec_state.startswith("LOG")]
    assert [s.persistent for s in log_steps] == [True, False]
    MockProver(K, EvmCircuit(b.steps, b.rws.rws, PARAMS)).assert_satisfied()
    assert not b.rws.check_consistency()


def test_log_in_failed_tx_dropped():
    # root frame reverts: even the caller's own log is non-persistent
    callee = Bytecode().op("STOP")
    caller = (
        Bytecode().push(1, 0).push(1, 0).op("LOG0")
        .push(1, 0).push(1, 0).op("REVERT")
    )
    state = StateDB({
        SENDER: Account(balance=10**18),
        CONTRACT: Account(code=caller.to_bytes()),
    })
    tr = Interpreter(state).run_tx(Tx(from_addr=SENDER, to=CONTRACT))
    assert tr.failed
    b = CircuitInputBuilder()
    b.handle_tx(
        dict(from_addr=SENDER, to_addr=CONTRACT, value=0, calldata=b""),
        tr, code_db={CONTRACT: caller.to_bytes()},
    )
    assert not _txlog_rows(b)
    log_steps = [s for s in b.steps if s.exec_state.startswith("LOG")]
    assert log_steps and not any(s.persistent for s in log_steps)
    MockProver(K, EvmCircuit(b.steps, b.rws.rws, PARAMS)).assert_satisfied()


def test_forged_persistence_flag_rejected():
    # flipping the persistence flag on a doomed LOG row must break the
    # proof (the rw-counter accounting and TxLog bus lookups disagree)
    callee = (
        Bytecode().push(1, 0).push(1, 0).op("LOG0")
        .push(1, 0).push(1, 0).op("REVERT")
    )
    b = _witness(callee)

    class Forge(EvmCircuit):
        def synthesize(self, phase, n, challenges, instances):
            cols = super().synthesize(phase, n, challenges, instances)
            if phase == 0:
                import numpy as np
                from zkevm_circuits_tpu.crypto.field import fr
                F = fr()
                row = next(
                    i for i, s in enumerate(self.steps)
                    if s.exec_state.startswith("LOG") and not s.persistent
                )
                arr = np.array(cols[self.c_carry[29]])
                arr[row] = F.from_int(F.R)  # claim persistent
                cols[self.c_carry[29]] = arr
            return cols

    failures = MockProver(K, Forge(b.steps, b.rws.rws, PARAMS)).verify()
    assert failures
