"""bus-mapping replay tests: tracer -> CircuitInputBuilder -> RW consistency."""

from zkevm_circuits_tpu.tracer import Account, Interpreter, StateDB, Tx
from zkevm_circuits_tpu.types import Bytecode, OpcodeId
from zkevm_circuits_tpu.witness.builder import STACK_BASE, CircuitInputBuilder
from zkevm_circuits_tpu.witness.rw import RwTag

SENDER = 0xCAFE
CONTRACT = 0xC0DE


def _trace(code: Bytecode, data=b""):
    state = StateDB(
        {SENDER: Account(balance=10**18), CONTRACT: Account(code=code.to_bytes())}
    )
    it = Interpreter(state)
    return it.run_tx(Tx(from_addr=SENDER, to=CONTRACT, data=data))


def _build(code: Bytecode):
    tr = _trace(code)
    b = CircuitInputBuilder()
    b.handle_tx(
        dict(from_addr=SENDER, to_addr=CONTRACT, value=0, calldata=b""), tr
    )
    return b, tr


def test_stack_rws_add():
    code = Bytecode().push(1, 5).push(1, 7).op("ADD").op("STOP")
    b, _ = _build(code)
    add_step = next(s for s in b.steps if s.exec_state == "ADD")
    add_rws = [r for r in b.rws.rws if r.rw_counter in add_step.rw_indices]
    # 2 reads + 1 write
    assert [(r.is_write, r.value) for r in add_rws] == [
        (False, 7), (False, 5), (True, 12),
    ]
    # addresses: reads at sp, sp+1; write lands at new top
    assert add_rws[0].address == STACK_BASE - 2
    assert add_rws[1].address == STACK_BASE - 1
    assert add_rws[2].address == STACK_BASE - 1
    assert not b.rws.check_consistency()


def test_memory_rws():
    code = (
        Bytecode().push(1, 0xAB).push(1, 3).op("MSTORE")
        .push(1, 3).op("MLOAD").op("STOP")
    )
    b, _ = _build(code)
    mem_rws = [r for r in b.rws.rws if r.tag == RwTag.Memory]
    assert len(mem_rws) == 64  # 32 writes + 32 reads
    writes = [r for r in mem_rws if r.is_write]
    assert writes[-1].value == 0xAB and writes[-1].address == 3 + 31
    assert not b.rws.check_consistency()


def test_storage_rws():
    code = (
        Bytecode().push(1, 9).push(1, 5).op("SSTORE")
        .push(1, 5).op("SLOAD").op("STOP")
    )
    b, _ = _build(code)
    st = [r for r in b.rws.rws if r.tag == RwTag.Storage]
    assert len(st) == 2
    assert st[0].is_write and st[0].value == 9 and st[0].value_prev == 0
    assert not st[1].is_write and st[1].value == 9
    assert not b.rws.check_consistency()


def test_dup_swap_rws():
    code = Bytecode().push(1, 1).push(1, 2).op("DUP2").op("SWAP1").op("STOP")
    b, _ = _build(code)
    dup = next(s for s in b.steps if s.exec_state == "DUP2")
    dup_rws = [r for r in b.rws.rws if r.rw_counter in dup.rw_indices]
    assert len(dup_rws) == 2 and dup_rws[0].value == dup_rws[1].value == 1
    swap = next(s for s in b.steps if s.exec_state == "SWAP1")
    swap_rws = [r for r in b.rws.rws if r.rw_counter in swap.rw_indices]
    assert len(swap_rws) == 4
    assert not b.rws.check_consistency()


def test_columns_sorted():
    code = Bytecode().push(1, 1).push(1, 2).op("ADD").op("POP").op("STOP")
    b, _ = _build(code)
    cols = b.rws.columns()
    keys = list(
        zip(cols["tag"], cols["id"], cols["address"], cols["field_tag"],
            cols["storage_key"], cols["rw_counter"])
    )
    assert keys == sorted(keys)
    assert cols["tag"][0] == RwTag.Start
