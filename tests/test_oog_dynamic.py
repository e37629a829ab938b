"""Dynamic-cost out-of-gas (ERR_OOG_DYN) — memory / hash / copy / log /
return family (VERDICT r4 missing #3's largest remaining witness gap).

Reference: error_oog_static_memory_expansion.rs, error_oog_sha3.rs,
error_oog_memory_copy.rs, error_oog_log.rs, error_oog_dynamic_memory
_expansion.rs.  The circuit RECOMPUTES the required gas from the
bus-read operands (constant + per-word/byte + memory expansion vs the
carried mem-words column) and proves gas_left < required through a u64
slack."""

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
SENDER, CONTRACT = 0xCAFE, 0xC0DE
PARAMS = EvmParams(target_steps=48, rw_target=256)


def _witness(code: Bytecode, gas: int):
    state = StateDB({
        SENDER: Account(balance=10**18),
        CONTRACT: Account(code=code.to_bytes()),
    })
    tr = Interpreter(state).run_tx(
        Tx(from_addr=SENDER, to=CONTRACT, gas=gas)
    )
    assert tr.failed
    assert any(s.error in ("out of gas", "gas uint64 overflow")
               for s in tr.struct_logs)
    b = CircuitInputBuilder()
    b.handle_tx(
        dict(from_addr=SENDER, to_addr=CONTRACT, value=0, calldata=b""),
        tr, code_db={CONTRACT: code.to_bytes()},
    )
    return b


def _assert_proves(b, fam):
    step = next(s for s in b.steps if s.exec_state == "ERR_OOG_DYN")
    assert step.err_aux[0] == fam
    MockProver(K, EvmCircuit(b.steps, b.rws.rws, PARAMS)).assert_satisfied()
    return step


def test_oog_mload_expansion():
    # MLOAD at 0x40000: expansion cost ~ quadratic term >> gas left
    code = Bytecode().push(3, 0x40000).op("MLOAD").op("STOP")
    b = _witness(code, gas=22_000)
    _assert_proves(b, "mem32")


def test_oog_mstore8():
    code = Bytecode().push(1, 1).push(3, 0x80000).op("MSTORE8").op("STOP")
    b = _witness(code, gas=22_000)
    _assert_proves(b, "mem1")


def test_oog_sha3_words():
    # SHA3 over 0x10000 bytes: 30 + 6*4096 words + expansion
    code = Bytecode().push(3, 0x10000).push(1, 0).op("SHA3").op("STOP")
    b = _witness(code, gas=25_000)
    _assert_proves(b, "sha")


def test_oog_calldatacopy():
    code = (Bytecode().push(3, 0x20000).push(1, 0).push(1, 0)
            .op("CALLDATACOPY").op("STOP"))
    b = _witness(code, gas=22_000)
    _assert_proves(b, "copy")


def test_oog_log_data():
    # LOG2: 375 + 2*375 topics + 8*size + expansion
    code = (Bytecode().push(1, 7).push(1, 8)        # topics
            .push(2, 0x4000).push(1, 0).op("LOG2").op("STOP"))
    b = _witness(code, gas=22_500)
    _assert_proves(b, "log")


def test_oog_revert_expansion():
    code = (Bytecode().push(3, 0x40000).push(1, 0).op("REVERT"))
    b = _witness(code, gas=22_000)
    _assert_proves(b, "span")


def test_oog_dyn_forged_slack_rejected():
    """Claiming OOG with a forged slack (pretending required > gas when
    the recomputed cost says otherwise) must fail the slack gate."""
    code = Bytecode().push(3, 0x40000).op("MLOAD").op("STOP")
    b = _witness(code, gas=22_000)

    class Forge(EvmCircuit):
        def synthesize(self, phase, n, challenges, instances):
            cols = super().synthesize(phase, n, challenges, instances)
            if phase == 0:
                row = next(i for i, s in enumerate(self.steps)
                           if s.exec_state == "ERR_OOG_DYN")
                # claim a tiny memory extent (m = mem_words): kills the
                # expansion cost, so required < gas and no valid slack
                # exists — the witness slack now fails "EOD insufficient"
                arr = np.array(cols[self.c_gx[0]])
                arr[row] = F.from_int(0)
                cols[self.c_gx[0]] = arr
            return cols

    failures = MockProver(K, Forge(b.steps, b.rws.rws, PARAMS)).verify()
    assert failures


# ---------------------------------------------------------------------------
# u64-overflow sub-shape (reference error_gas_uint_overflow / geth
# ErrGasUintOverflow): operands >= 2^32 prove via the fov branch — the
# offending word's high part is nonzero and gas_left < 2^40.
# ---------------------------------------------------------------------------
def _assert_ovf(b, fam):
    step = next(s for s in b.steps if s.exec_state == "ERR_OOG_DYN")
    assert step.err_aux[0] == fam and step.err_aux[3] == "ovf"
    MockProver(K, EvmCircuit(b.steps, b.rws.rws, PARAMS)).assert_satisfied()


def test_oog_overflow_mload_2_33():
    # extent 2^33: below geth's uint64 cap, expansion cost astronomic
    code = Bytecode().push(5, 1 << 33).op("MLOAD").op("STOP")
    b = _witness(code, gas=100_000)
    _assert_ovf(b, "mem32")


def test_oog_overflow_mload_2_40():
    # extent 2^40: geth raises ErrGasUintOverflow before charging
    code = Bytecode().push(6, 1 << 40).op("MLOAD").op("STOP")
    b = _witness(code, gas=100_000)
    _assert_ovf(b, "mem32")


@pytest.mark.slow
def test_oog_overflow_calldatacopy_len():
    code = (Bytecode().push(5, 1 << 34).push(1, 0).push(1, 0)
            .op("CALLDATACOPY").op("STOP"))
    b = _witness(code, gas=100_000)
    _assert_ovf(b, "copy")


@pytest.mark.slow
def test_oog_overflow_log_size():
    code = (Bytecode().push(8, (1 << 63) + 5).push(1, 0)
            .op("LOG0").op("STOP"))
    b = _witness(code, gas=100_000)
    _assert_ovf(b, "log")


@pytest.mark.slow
def test_oog_overflow_forged_flag_rejected():
    """Claiming fov on an in-range operand must fail (high sum zero has
    no inverse) — and clearing fov on an overflow operand breaks the
    4-byte addr binding."""
    import numpy as np

    code = Bytecode().push(6, 1 << 40).op("MLOAD").op("STOP")
    b = _witness(code, gas=100_000)

    class NoFov(EvmCircuit):
        def synthesize(self, phase, n, challenges, instances):
            cols = super().synthesize(phase, n, challenges, instances)
            if phase == 0:
                si = next(i for i, s in enumerate(self.steps)
                          if s.exec_state == "ERR_OOG_DYN")
                arr = np.asarray(cols[self.c_carry[8]]).copy()
                arr[si] = 0
                cols[self.c_carry[8]] = arr
            return cols

    failures = MockProver(K, NoFov(b.steps, b.rws.rws, PARAMS)).verify()
    assert failures, "clearing fov on an overflow operand must fail"
