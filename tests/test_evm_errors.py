"""Nested-frame error unwinding + the write-protection / invalid-opcode
error states.

Reference: the CommonErrorGadget's restore_context branch shared by every
error gadget (zkevm-circuits/src/evm_circuit/util/common_gadget.rs), plus
execution/error_write_protection.rs and error_invalid_opcode.rs.  An
errored nested frame ends on its ERR_* row, then an error-RET row (the
RET gadget's ferr modifier) restores the caller, pushes 0, exposes no
return data, and undoes the frame's reversible writes.
"""

import numpy as np
import pytest

from zkevm_circuits_tpu.circuits.evm import EvmCircuit, EvmParams
from zkevm_circuits_tpu.crypto.field import fr
from zkevm_circuits_tpu.crypto.params import FR_MODULUS as R
from zkevm_circuits_tpu.plonk.mock import MockProver
from zkevm_circuits_tpu.tracer import Account, Interpreter, StateDB, Tx
from zkevm_circuits_tpu.types import Bytecode
from zkevm_circuits_tpu.witness.builder import CircuitInputBuilder

F = fr()
K = 9
SENDER, CONTRACT, CALLEE = 0xCAFE, 0xC0DE, 0xCA11EE
PARAMS = EvmParams(target_steps=48, rw_target=256)


def _mont(v: int):
    return F.from_int(v % R * F.R % R)


def _nested_witness(callee_code: Bytecode, call_op: str = "CALL",
                    expect_fail: bool = False):
    """Caller invokes the callee, POPs the success flag, STOPs."""
    caller = Bytecode().push(1, 0).push(1, 0)    # retLen, retOff
    caller.push(1, 0).push(1, 0)                 # argsLen, argsOff
    if call_op in ("CALL", "CALLCODE"):
        caller.push(1, 0)                        # value
    caller.push(3, CALLEE).push(2, 0xFFFF).op(call_op)
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


def _states(b):
    return [s.exec_state for s in b.steps]


def test_nested_stack_error_unwinds():
    # callee underflows: the error frame unwinds, caller sees 0 and goes on
    b = _nested_witness(Bytecode().op("ADD"))
    states = _states(b)
    i = states.index("ERR_STACK")
    assert states[i + 1] == "RET" and b.steps[i + 1].is_err_ret
    # caller continues (POP of the pushed 0) and the tx succeeds
    assert "POP" in states[i + 2:] and states[-1] == "EndTx"
    pop = next(s for s in b.steps[i + 2:] if s.exec_state == "POP")
    popped = b.rws.rws[pop.rw_indices[0] - 1]
    assert popped.value == 0  # failure flag
    MockProver(K, EvmCircuit(b.steps, b.rws.rws, PARAMS)).assert_satisfied()


def test_write_protection_sstore():
    callee = Bytecode().push(1, 1).push(1, 0).op("SSTORE")
    b = _nested_witness(callee, call_op="STATICCALL")
    states = _states(b)
    i = states.index("ERR_WRITE_PROT")
    assert b.steps[i + 1].is_err_ret
    MockProver(K, EvmCircuit(b.steps, b.rws.rws, PARAMS)).assert_satisfied()


def test_write_protection_log_and_create():
    for callee in (
        Bytecode().push(1, 0).push(1, 0).op("LOG0"),
        Bytecode().push(1, 0).push(1, 0).push(1, 0).op("CREATE"),
    ):
        b = _nested_witness(callee, call_op="STATICCALL")
        assert "ERR_WRITE_PROT" in _states(b)
        MockProver(
            K, EvmCircuit(b.steps, b.rws.rws, PARAMS)
        ).assert_satisfied()


def test_write_protection_call_with_value():
    # inside a static frame, CALL forwarding value != 0 is write-protected
    callee = Bytecode().push(1, 0).push(1, 0).push(1, 0).push(1, 0)
    callee.push(1, 7).push(3, 0xD00D).push(2, 0xFFFF).op("CALL")
    b = _nested_witness(callee, call_op="STATICCALL")
    states = _states(b)
    i = states.index("ERR_WRITE_PROT")
    err = b.steps[i]
    assert len(err.rw_indices) == 2  # IsStatic read + value stack read
    MockProver(K, EvmCircuit(b.steps, b.rws.rws, PARAMS)).assert_satisfied()


def test_invalid_opcode_root_and_nested():
    # 0x0C is undefined in Shanghai
    code = Bytecode()
    code.append(bytes([0x0C]))
    state = StateDB({
        SENDER: Account(balance=10**18),
        CONTRACT: Account(code=code.to_bytes()),
    })
    tr = Interpreter(state).run_tx(Tx(from_addr=SENDER, to=CONTRACT))
    assert tr.failed
    b = CircuitInputBuilder()
    b.handle_tx(
        dict(from_addr=SENDER, to_addr=CONTRACT, value=0, calldata=b""),
        tr, code_db={CONTRACT: code.to_bytes()},
    )
    assert _states(b) == ["BeginTx", "ERR_INVALID_OP", "EndTx"]
    assert b.steps[1].err_aux == 0x0C
    MockProver(K, EvmCircuit(b.steps, b.rws.rws, PARAMS)).assert_satisfied()

    b2 = _nested_witness(code)
    states = _states(b2)
    i = states.index("ERR_INVALID_OP")
    assert b2.steps[i + 1].is_err_ret
    MockProver(K, EvmCircuit(b2.steps, b2.rws.rws, PARAMS)).assert_satisfied()


def test_nested_error_reverts_storage_writes():
    # callee writes storage, then dies on an undefined byte: the write
    # must be undone by the error-RET's reversion rows
    callee = Bytecode().push(1, 5).push(1, 9).op("SSTORE")
    callee.append(bytes([0x0C]))
    b = _nested_witness(callee)
    ret = next(s for s in b.steps if s.exec_state == "RET")
    assert ret.is_err_ret and ret.rev_count >= 1
    # reversion row restores the slot to 0
    undo = b.rws.rws[ret.rw_indices[-1] - 1]
    assert undo.value == 0
    MockProver(K, EvmCircuit(b.steps, b.rws.rws, PARAMS)).assert_satisfied()


def test_err_ret_success_forgery_rejected():
    # flipping the ferr modifier off must break the error-terminal gate
    b = _nested_witness(Bytecode().op("ADD"))
    ret_row = next(i for i, s in enumerate(b.steps) if s.exec_state == "RET")

    class C(EvmCircuit):
        def synthesize(self, phase, n, challenges, instances):
            cols = super().synthesize(phase, n, challenges, instances)
            if phase == 0:
                arr = np.asarray(cols[self.c_carry[25]]).copy()
                arr[ret_row] = _mont(0)
                cols[self.c_carry[25]] = arr
            return cols

    failures = MockProver(K, C(b.steps, b.rws.rws, PARAMS)).verify()
    assert failures, "dropping ferr must violate the error terminal gate"


def test_write_protection_forged_static_flag_rejected():
    # claiming ERR_WRITE_PROT in a NON-static frame: the IsStatic read
    # (value 1) has no matching context write, so the witness forgery
    # must fail the bus/state coupling — emulate by corrupting a healthy
    # SSTORE row into an ERR_WRITE_PROT claim
    callee = Bytecode().push(1, 1).push(1, 0).op("SSTORE")
    b = _nested_witness(callee, call_op="CALL")
    row = next(i for i, s in enumerate(b.steps) if s.exec_state == "SSTORE")

    class C(EvmCircuit):
        def synthesize(self, phase, n, challenges, instances):
            cols = super().synthesize(phase, n, challenges, instances)
            if phase == 0:
                on = np.asarray(cols[self.c_ind["ERR_WRITE_PROT"]]).copy()
                off = np.asarray(cols[self.c_ind["SSTORE"]]).copy()
                on[row] = _mont(1)
                off[row] = _mont(0)
                cols[self.c_ind["ERR_WRITE_PROT"]] = on
                cols[self.c_ind["SSTORE"]] = off
            return cols

    failures = MockProver(K, C(b.steps, b.rws.rws, PARAMS)).verify()
    assert failures, "WP claim on a non-static frame must be rejected"
