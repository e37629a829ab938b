"""EVM circuit skeleton tests: trace -> builder -> EvmCircuit MockProver."""

import pytest

from zkevm_circuits_tpu.circuits.evm import EvmCircuit, EvmParams
from zkevm_circuits_tpu.plonk.mock import MockProver
from zkevm_circuits_tpu.tracer import Account, Interpreter, StateDB, Tx
from zkevm_circuits_tpu.types import Bytecode
from zkevm_circuits_tpu.witness.builder import CircuitInputBuilder

K = 9  # byte range table needs 256 rows
SENDER, CONTRACT = 0xCAFE, 0xC0DE


def _witness(code: Bytecode):
    state = StateDB(
        {SENDER: Account(balance=10**18), CONTRACT: Account(code=code.to_bytes())}
    )
    tr = Interpreter(state).run_tx(Tx(from_addr=SENDER, to=CONTRACT))
    assert not tr.failed
    b = CircuitInputBuilder()
    b.handle_tx(
        dict(from_addr=SENDER, to_addr=CONTRACT, value=0, calldata=b""), tr
    )
    return b


PARAMS = EvmParams(target_steps=40, rw_target=256)


def test_evm_circuit_push_add_pop():
    b = _witness(
        Bytecode().push(1, 5).push(2, 0x1234).op("ADD").op("POP").op("STOP")
    )
    MockProver(K, EvmCircuit(b.steps, b.rws.rws, PARAMS)).assert_satisfied()


def test_evm_circuit_sub_dup_swap_pc():
    b = _witness(
        Bytecode()
        .push(1, 100).push(1, 30).op("JUMPDEST")
        .op("DUP2").op("SUB")        # 100 - 30 = 70? stack: [100,30,100] -> sub -> [100, 30-100 wrap]
        .op("SWAP1").op("PC")
        .op("POP").op("POP").op("POP").op("STOP")
    )
    MockProver(K, EvmCircuit(b.steps, b.rws.rws, PARAMS)).assert_satisfied()


def test_evm_circuit_mstore_mload():
    b = _witness(
        Bytecode()
        .push(2, 0xBEEF).push(1, 7).op("MSTORE")   # mem[7..38] = word
        .push(1, 7).op("MLOAD")                    # load it back
        .op("POP").op("STOP")
    )
    MockProver(K, EvmCircuit(b.steps, b.rws.rws, PARAMS)).assert_satisfied()


def test_evm_circuit_catches_wrong_mem_byte():
    b = _witness(
        Bytecode().push(1, 0xAB).push(1, 0).op("MSTORE").op("STOP")
    )

    class Corrupt(EvmCircuit):
        def synthesize(self, phase, n, challenges, instances):
            cols = super().synthesize(phase, n, challenges, instances)
            if phase == 0:
                import numpy as np
                from zkevm_circuits_tpu.crypto.field import fr
                F = fr()
                row = next(
                    i for i, s in enumerate(self.steps)
                    if s.exec_state == "MSTORE"
                )
                arr = np.array(cols[self.c_mem[31]])
                arr[row] = F.from_int(0x99 * F.R % F.modulus)
                cols[self.c_mem[31]] = arr
            return cols

    failures = MockProver(K, Corrupt(b.steps, b.rws.rws, PARAMS)).verify()
    assert failures


def test_evm_circuit_sub_underflow_wraps():
    # 5 - 9 wraps mod 2^256: exercises the final carry bit
    b = _witness(Bytecode().push(1, 9).push(1, 5).op("SUB").op("POP").op("STOP"))
    MockProver(K, EvmCircuit(b.steps, b.rws.rws, PARAMS)).assert_satisfied()


def test_evm_circuit_catches_bad_stack_value():
    b = _witness(Bytecode().push(1, 5).push(1, 7).op("ADD").op("POP").op("STOP"))

    class Corrupt(EvmCircuit):
        """EVM side claims a different ADD result than the rw table holds:
        the bus lookup must miss."""

        def synthesize(self, phase, n, challenges, instances):
            cols = super().synthesize(phase, n, challenges, instances)
            if phase == 1:
                import numpy as np
                from zkevm_circuits_tpu.crypto.field import fr
                F = fr()
                arr = np.array(cols[self.c_val_c])
                add_row = next(
                    i for i, s in enumerate(self.steps)
                    if s.exec_state == "ADD"
                )
                arr[add_row] = F.from_int(0xBAD * F.R % F.modulus)
                cols[self.c_val_c] = arr
            return cols

    failures = MockProver(K, Corrupt(b.steps, b.rws.rws, PARAMS)).verify()
    assert any("rw bus" in f for f in failures), failures


def test_evm_circuit_catches_wrong_sum():
    """A fully-consistent bus with a wrong a+b=c relation must fail the
    AddWords byte constraints."""
    b = _witness(Bytecode().push(1, 200).push(1, 100).op("ADD").op("POP").op("STOP"))

    class Corrupt(EvmCircuit):
        def synthesize(self, phase, n, challenges, instances):
            cols = super().synthesize(phase, n, challenges, instances)
            if phase == 0:
                import numpy as np
                from zkevm_circuits_tpu.crypto.field import fr
                F = fr()
                add_row = next(
                    i for i, s in enumerate(self.steps)
                    if s.exec_state == "ADD"
                )
                arr = np.array(cols[self.c_carry[0]])
                cur = int(arr[add_row][0] != 0 or arr[add_row].any())
                arr[add_row] = F.from_int((1 - cur) * F.R % F.modulus)
                cols[self.c_carry[0]] = arr
            return cols

    failures = MockProver(K, Corrupt(b.steps, b.rws.rws, PARAMS)).verify()
    assert any("ADD byte" in f or "ADD carry" in f for f in failures), failures


def test_evm_circuit_mul_div_mod():
    big = (1 << 255) + 12345
    b = _witness(
        Bytecode()
        .push(32, big).push(32, big).op("MUL").op("POP")  # 256-bit wrap
        .push(1, 7).push(1, 100).op("DIV").op("POP")      # 100 // 7
        .push(1, 0).push(1, 5).op("DIV").op("POP")        # x / 0 == 0
        .push(1, 7).push(1, 100).op("MOD").op("POP")      # 100 % 7
        .push(1, 0).push(1, 9).op("MOD").op("POP")        # x % 0 == 0
        .op("STOP")
    )
    MockProver(K, EvmCircuit(b.steps, b.rws.rws, PARAMS)).assert_satisfied()


def test_evm_circuit_comparators():
    b = _witness(
        Bytecode()
        .push(1, 5).push(2, 0x100).op("LT").op("POP")     # 0x100 < 5 = 0
        .push(2, 0x100).push(1, 5).op("LT").op("POP")     # 5 < 0x100 = 1
        .push(1, 9).push(1, 9).op("GT").op("POP")         # 9 > 9 = 0
        .push(1, 3).push(1, 8).op("GT").op("POP")         # 8 > 3 = 1
        .push(1, 7).push(1, 7).op("EQ").op("POP")
        .push(1, 7).push(1, 8).op("EQ").op("POP")
        .push(1, 0).op("ISZERO").op("POP")
        .push(1, 42).op("ISZERO").op("POP")
        .push(32, (1 << 256) - 1 - 0xFF00).op("NOT").op("POP")
        .op("STOP")
    )
    MockProver(K, EvmCircuit(b.steps, b.rws.rws, PARAMS)).assert_satisfied()


def test_evm_circuit_catches_wrong_quotient():
    b = _witness(
        Bytecode().push(1, 7).push(1, 100).op("DIV").op("POP").op("STOP")
    )

    class Corrupt(EvmCircuit):
        def synthesize(self, phase, n, challenges, instances):
            cols = super().synthesize(phase, n, challenges, instances)
            if phase == 0:
                import numpy as np
                from zkevm_circuits_tpu.crypto.field import fr
                F = fr()
                row = next(
                    i for i, s in enumerate(self.steps)
                    if s.exec_state == "DIV"
                )
                arr = np.array(cols[self.c_bytes_c[0]])
                arr[row] = F.from_int(15 * F.R % F.modulus)  # 100//7 is 14
                cols[self.c_bytes_c[0]] = arr
            return cols

    failures = MockProver(K, Corrupt(b.steps, b.rws.rws, PARAMS)).verify()
    assert any("DIV" in f for f in failures), failures


def test_evm_circuit_catches_bad_iszero_inverse():
    b = _witness(Bytecode().push(1, 42).op("ISZERO").op("POP").op("STOP"))

    class Corrupt(EvmCircuit):
        def synthesize(self, phase, n, challenges, instances):
            cols = super().synthesize(phase, n, challenges, instances)
            if phase == 1:
                import numpy as np
                from zkevm_circuits_tpu.crypto.field import fr
                F = fr()
                row = next(
                    i for i, s in enumerate(self.steps)
                    if s.exec_state == "ISZERO"
                )
                arr = np.array(cols[self.c_inv])
                arr[row] = F.from_int(1 * F.R % F.modulus)  # wrong inverse
                cols[self.c_inv] = arr
            return cols

    failures = MockProver(K, Corrupt(b.steps, b.rws.rws, PARAMS)).verify()
    assert any("ISZERO" in f for f in failures), failures


def test_evm_circuit_catches_bad_pc():
    b = _witness(Bytecode().push(1, 5).op("POP").op("STOP"))

    class Corrupt(EvmCircuit):
        def synthesize(self, phase, n, challenges, instances):
            cols = super().synthesize(phase, n, challenges, instances)
            if phase == 0:
                import numpy as np
                from zkevm_circuits_tpu.crypto.field import fr
                F = fr()
                arr = np.array(cols[self.c_pc])
                arr[1] = F.from_int(99 * F.R % F.modulus)  # wrong pc
                cols[self.c_pc] = arr
            return cols

    failures = MockProver(K, Corrupt(b.steps, b.rws.rws, PARAMS)).verify()
    assert any("pc" in f for f in failures), failures
