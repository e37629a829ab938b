"""EVM interpreter/tracer tests (host-only, no device work).

Pins interpreter behavior the way the reference pins its geth tracer
(`bus-mapping/src/circuit_input_builder/tracer_tests.rs`, SURVEY.md §4.5).
"""

import pytest

from zkevm_circuits_tpu.tracer import Account, BlockEnv, Interpreter, StateDB, Tx
from zkevm_circuits_tpu.tracer.evm import _create_address
from zkevm_circuits_tpu.types import Bytecode, OpcodeId
from zkevm_circuits_tpu.types.evm import GasCost
from zkevm_circuits_tpu.witness.trace import GethExecTrace

SENDER = 0x000000000000000000000000000000000000CAFE
CONTRACT = 0x00000000000000000000000000000000000C0DE0
OTHER = 0x000000000000000000000000000000000000BEEF


def _run(code: Bytecode, value=0, data=b"", state_extra=None, gas=1_000_000):
    state = StateDB(
        {
            SENDER: Account(balance=10**18),
            CONTRACT: Account(code=code.to_bytes()),
            **(state_extra or {}),
        }
    )
    it = Interpreter(state)
    trace = it.run_tx(Tx(from_addr=SENDER, to=CONTRACT, value=value, data=data, gas=gas))
    return state, it, trace


def test_add_mstore_return():
    code = (
        Bytecode().push(1, 5).push(1, 7).op("ADD")
        .push(1, 0).op("MSTORE")
        .push(1, 32).push(1, 0).op("RETURN")
    )
    _, _, tr = _run(code)
    assert not tr.failed
    assert int(tr.return_value, 16) == 12
    ops = [s.op for s in tr.struct_logs]
    assert ops[:3] == [OpcodeId.PUSH1, OpcodeId.PUSH1, OpcodeId.ADD]
    # geth semantics: stack snapshot BEFORE the op
    assert tr.struct_logs[2].stack == [5, 7]


def test_gas_accounting_simple():
    code = Bytecode().push(1, 1).push(1, 2).op("ADD").op("STOP")
    _, _, tr = _run(code)
    assert tr.gas == GasCost.TX + 3 + 3 + 3  # intrinsic + 2 pushes + add


def test_storage_warm_cold_and_refund():
    # store 1 at key 0, then clear it -> cold SSTORE_SET then warm clear+refund
    code = (
        Bytecode().push(1, 1).push(1, 0).op("SSTORE")
        .push(1, 0).push(1, 0).op("SSTORE").op("STOP")
    )
    state, it, tr = _run(code)
    s1 = next(s for s in tr.struct_logs if s.op == OpcodeId.SSTORE)
    assert s1.gas_cost == GasCost.COLD_SLOAD + GasCost.SSTORE_SET
    assert state.account(CONTRACT).storage == {}
    # refund for clearing a slot set in the SAME tx: net zero -> refund
    # equals SSTORE_SET - WARM_ACCESS (EIP-3529 dirty-clear bookkeeping)
    assert it.refund == GasCost.SSTORE_SET - GasCost.WARM_ACCESS


def test_sload_warm_after_sstore():
    code = (
        Bytecode().push(1, 9).push(1, 5).op("SSTORE")
        .push(1, 5).op("SLOAD").op("STOP")
    )
    _, _, tr = _run(code)
    sl = next(s for s in tr.struct_logs if s.op == OpcodeId.SLOAD)
    assert sl.gas_cost == GasCost.WARM_ACCESS
    assert tr.struct_logs[-1].stack == [9]


def test_call_and_returndata():
    callee_code = (
        Bytecode().push(1, 42).push(1, 0).op("MSTORE")
        .push(1, 32).push(1, 0).op("RETURN")
    )
    caller_code = (
        Bytecode()
        .push(1, 32).push(1, 0)   # out_len, out_off
        .push(1, 0).push(1, 0)    # in_len, in_off
        .push(1, 0)               # value
        .push(20, OTHER)          # address
        .push(3, 0xFFFF)          # gas
        .op("CALL")
        .push(1, 32).push(1, 0).op("RETURN")
    )
    _, _, tr = _run(
        caller_code, state_extra={OTHER: Account(code=callee_code.to_bytes())}
    )
    assert not tr.failed
    assert int(tr.return_value, 16) == 42
    # callee steps run at depth 2
    assert any(s.depth == 2 for s in tr.struct_logs)


def test_value_transfer_via_call():
    caller_code = (
        Bytecode()
        .push(1, 0).push(1, 0).push(1, 0).push(1, 0)
        .push(1, 55)              # value
        .push(20, OTHER)
        .push(2, 0xFFFF)
        .op("CALL").op("STOP")
    )
    state, _, tr = _run(caller_code, value=100)
    assert not tr.failed
    assert state.account(OTHER).balance == 55
    assert state.account(CONTRACT).balance == 45


def test_revert_rolls_back_state():
    code = (
        Bytecode().push(1, 7).push(1, 1).op("SSTORE")
        .push(1, 0).push(1, 0).op("REVERT")
    )
    state, _, tr = _run(code)
    assert tr.failed
    assert state.account(CONTRACT).storage == {}


def test_jump_and_invalid_jump():
    # jump over an INVALID to a JUMPDEST
    code = Bytecode().push(1, 4).op("JUMP").op("INVALID").op("JUMPDEST").op("STOP")
    _, _, tr = _run(code)
    assert not tr.failed
    bad = Bytecode().push(1, 3).op("JUMP").op("STOP")  # 3 is not a JUMPDEST
    _, _, tr2 = _run(bad)
    assert tr2.failed
    assert tr2.struct_logs[-1].error == "invalid jump destination"


def test_create_address_vector():
    # well-known vector: sender 0x6ac7ea33f8831ea9dcc53393aaa88b25a785dbf0, nonce 0
    assert _create_address(
        0x6AC7EA33F8831EA9DCC53393AAA88B25A785DBF0, 0
    ) == 0xCD234A471B72BA2F1CCF0A70FCABA648A5EECD8D


def test_create_deploys_code():
    # initcode returns a 1-byte runtime code 0x00 (STOP)
    initcode = (
        Bytecode().push(1, 0x00).push(1, 0).op("MSTORE8")
        .push(1, 1).push(1, 0).op("RETURN")
    )
    ib = initcode.to_bytes()
    creator = Bytecode()
    for i, b in enumerate(ib):  # write initcode into memory
        creator.push(1, b).push(1, i).op("MSTORE8")
    creator.push(1, len(ib)).push(1, 0).push(1, 0).op("CREATE").op("STOP")
    state, _, tr = _run(creator)
    assert not tr.failed
    new_addr = _create_address(CONTRACT, 0)
    assert state.account(new_addr).code == b"\x00"


def test_trace_json_roundtrip():
    code = Bytecode().push(1, 3).push(1, 4).op("MUL").op("STOP")
    _, _, tr = _run(code)
    j = tr.to_json()
    tr2 = GethExecTrace.from_json(j)
    assert tr2.struct_logs[2].stack == [3, 4]
    assert tr2.gas == tr.gas


def test_static_call_write_protection():
    callee = Bytecode().push(1, 1).push(1, 0).op("SSTORE").op("STOP")
    caller = (
        Bytecode()
        .push(1, 0).push(1, 0).push(1, 0).push(1, 0)
        .push(20, OTHER).push(2, 0xFFFF)
        .op("STATICCALL")
        .op("STOP")
    )
    state, _, tr = _run(
        caller, state_extra={OTHER: Account(code=callee.to_bytes())}
    )
    assert not tr.failed  # outer tx ok, inner call failed
    assert tr.struct_logs[-1].stack == [0]  # STATICCALL pushed 0
    assert state.account(OTHER).storage == {}
