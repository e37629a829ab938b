"""Nested-frame calldata reads (caller-memory source).

VERDICT r3 item 6 / builder.py:1258: CALLDATALOAD and CALLDATACOPY in
nested frames read the CALLER's memory at cd_offset+offset (reference
bus-mapping calldataload.rs / calldatacopy.rs internal-call paths).
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

F = fr()
K = 10
SENDER, CONTRACT, CALLEE = 0xCAFE, 0xC0DE, 0xCA11EE
PARAMS = EvmParams(target_steps=64, rw_target=512)


def _witness(callee_code: Bytecode, args_bytes: bytes):
    """Caller MSTOREs `args_bytes` (one word) at 0x20 and calls the
    callee with calldata = memory[0x20 .. 0x20+len)."""
    caller = Bytecode()
    word = int.from_bytes(args_bytes[:32].ljust(32, b"\x00"), "big")
    caller.push(32, word).push(1, 0x20).op("MSTORE")
    caller.push(1, 0).push(1, 0)                   # retLen retOff
    caller.push(1, len(args_bytes)).push(1, 0x20)  # argsLen argsOff
    caller.push(1, 0)                              # value
    caller.push(3, CALLEE).push(2, 0xFFFF).op("CALL")
    caller.op("POP").op("STOP")
    state = StateDB({
        SENDER: Account(balance=10**18),
        CONTRACT: Account(code=caller.to_bytes()),
        CALLEE: Account(code=callee_code.to_bytes()),
    })
    tr = Interpreter(state).run_tx(Tx(from_addr=SENDER, to=CONTRACT))
    assert not tr.failed
    b = CircuitInputBuilder()
    b.handle_tx(
        dict(from_addr=SENDER, to_addr=CONTRACT, value=0, calldata=b""),
        tr, code_db={CONTRACT: caller.to_bytes(),
                     CALLEE: callee_code.to_bytes()},
    )
    return b, tr


def test_nested_calldataload():
    """Callee CALLDATALOADs its args (in-range + past-the-end pad)."""
    args = bytes(range(1, 33))
    callee = (
        Bytecode()
        .push(1, 0).op("CALLDATALOAD").op("POP")    # full word
        .push(1, 16).op("CALLDATALOAD").op("POP")   # half in-range
        .push(1, 64).op("CALLDATALOAD").op("POP")   # fully past the end
        .op("STOP")
    )
    b, tr = _witness(callee, args)
    cdl = [s for s in tr.struct_logs if s.op.name == "CALLDATALOAD"]
    nxt0 = tr.struct_logs[tr.struct_logs.index(cdl[0]) + 1]
    assert nxt0.stack[-1] == int.from_bytes(args, "big")
    assert not b.rws.check_consistency()
    MockProver(K, EvmCircuit(b.steps, b.rws.rws, PARAMS)).assert_satisfied()
    sp = StateParams(limb_bits=4, id_bits=8, addr_bits=16, key_bits=16,
                     rwc_bits=8, target_rows=220)
    MockProver(11, StateCircuit(b.rws, sp)).assert_satisfied()


def test_nested_calldataload_forged_byte_rejected():
    """A loaded word disagreeing with the caller's memory bytes must
    miss the Memory bus lookups."""
    args = bytes(range(1, 33))
    callee = Bytecode().push(1, 0).op("CALLDATALOAD").op("POP").op("STOP")
    b, _ = _witness(callee, args)

    class Corrupt(EvmCircuit):
        def synthesize(self, phase, n, challenges, instances):
            cols = super().synthesize(phase, n, challenges, instances)
            si = next(i for i, s in enumerate(b.steps)
                      if s.exec_state == "CALLDATALOAD")
            if phase == 0:
                arr = np.asarray(cols[self.c_bytes_b[0]]).copy()
                arr[si] = F.from_int(0x99 * F.R % R)  # forge byte 0
                cols[self.c_bytes_b[0]] = arr
            return cols

    failures = MockProver(K, Corrupt(b.steps, b.rws.rws, PARAMS)).verify()
    assert failures, "forged loaded byte must break the memory binding"


def test_nested_calldatacopy():
    """Callee CALLDATACOPYs its args into memory and SHA3s them."""
    args = bytes(range(1, 25))  # 24 bytes, fully in-range copy
    callee = (
        Bytecode()
        .push(1, 24).push(1, 0).push(1, 0).op("CALLDATACOPY")
        .push(1, 24).push(1, 0).op("SHA3").op("POP").op("STOP")
    )
    b, tr = _witness(callee, args)
    from zkevm_circuits_tpu.crypto.keccak import keccak256

    sha = [s for s in tr.struct_logs if s.op.name == "SHA3"]
    nxt = tr.struct_logs[tr.struct_logs.index(sha[0]) + 1]
    assert nxt.stack[-1] == int.from_bytes(keccak256(args), "big")
    assert not b.rws.check_consistency()
    assert any(ev.src_type == "memory" and ev.dst_type == "memory"
               for ev in b.copy_events)


def test_nested_calldatacopy_padded_tail_staged():
    """Copies past the calldata end are the documented staged gap."""
    args = bytes(8)
    callee = (
        Bytecode()
        .push(1, 32).push(1, 0).push(1, 0).op("CALLDATACOPY").op("STOP")
    )
    with pytest.raises(NotImplementedError, match="padded"):
        _witness(callee, args)
