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
        dict(from_addr=SENDER, to_addr=CONTRACT, value=0, calldata=b""), tr,
        code_db={CONTRACT: code.to_bytes()},
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


def test_evm_circuit_storage_ops():
    b = _witness(
        Bytecode()
        .push(1, 0x42).push(1, 0x01).op("SSTORE")   # storage[1] = 0x42
        .push(1, 0x01).op("SLOAD").op("POP")        # read it back
        .push(1, 0x07).op("SLOAD").op("POP")        # fresh slot reads 0
        .op("STOP")
    )
    MockProver(K, EvmCircuit(b.steps, b.rws.rws, PARAMS)).assert_satisfied()


def test_evm_circuit_context_ops():
    state_tx = Tx(from_addr=SENDER, to=CONTRACT, value=5,
                  data=bytes([0xAA, 0xBB, 0xCC]))
    code = (
        Bytecode()
        .op("CALLER").op("POP").op("ADDRESS").op("POP")
        .op("CALLVALUE").op("POP").op("CALLDATASIZE").op("POP")
        .op("STOP")
    )
    state = StateDB(
        {SENDER: Account(balance=10**18), CONTRACT: Account(code=code.to_bytes())}
    )
    tr = Interpreter(state).run_tx(state_tx)
    assert not tr.failed
    b = CircuitInputBuilder()
    b.handle_tx(
        dict(from_addr=SENDER, to_addr=CONTRACT, value=5,
             calldata=state_tx.data), tr
    )
    MockProver(K, EvmCircuit(b.steps, b.rws.rws, PARAMS)).assert_satisfied()


def test_evm_circuit_catches_wrong_sload_value():
    b = _witness(
        Bytecode()
        .push(1, 0x42).push(1, 0x01).op("SSTORE")
        .push(1, 0x01).op("SLOAD").op("POP").op("STOP")
    )

    class Corrupt(EvmCircuit):
        def synthesize(self, phase, n, challenges, instances):
            cols = super().synthesize(phase, n, challenges, instances)
            if phase == 1:
                import numpy as np
                from zkevm_circuits_tpu.crypto.field import fr
                F = fr()
                row = next(
                    i for i, s in enumerate(self.steps)
                    if s.exec_state == "SLOAD"
                )
                arr = np.array(cols[self.c_val_b])
                arr[row] = F.from_int(0x43 * F.R % F.modulus)
                cols[self.c_val_b] = arr
            return cols

    failures = MockProver(K, Corrupt(b.steps, b.rws.rws, PARAMS)).verify()
    assert any("rw bus" in f for f in failures), failures


def test_evm_circuit_catches_wrong_caller_bytes():
    b = _witness(Bytecode().op("CALLER").op("POP").op("STOP"))

    class Corrupt(EvmCircuit):
        """Claim a different caller address byte than the call context."""

        def synthesize(self, phase, n, challenges, instances):
            cols = super().synthesize(phase, n, challenges, instances)
            if phase == 0:
                import numpy as np
                from zkevm_circuits_tpu.crypto.field import fr
                F = fr()
                row = next(
                    i for i, s in enumerate(self.steps)
                    if s.exec_state == "CALLER"
                )
                arr = np.array(cols[self.c_bytes_a[0]])
                arr[row] = F.from_int(0x13 * F.R % F.modulus)
                cols[self.c_bytes_a[0]] = arr
            return cols

    failures = MockProver(K, Corrupt(b.steps, b.rws.rws, PARAMS)).verify()
    assert failures  # either the ctx-read lookup or the RLC binding trips


def test_evm_circuit_bitwise_ops():
    x = 0x00FF00FF_F0F0F0F0_12345678_9ABCDEF0 << 128 | 0xDEADBEEF
    y = 0x0F0F0F0F_FF00FF00_87654321_0FEDCBA9 << 128 | 0x12345678
    b = _witness(
        Bytecode()
        .push(32, y).push(32, x).op("AND").op("POP")
        .push(32, y).push(32, x).op("OR").op("POP")
        .push(32, y).push(32, x).op("XOR").op("POP")
        .op("STOP")
    )
    MockProver(K, EvmCircuit(b.steps, b.rws.rws, PARAMS)).assert_satisfied()


def test_evm_circuit_byte_and_shl():
    x = int.from_bytes(bytes(range(32)), "big")
    b = _witness(
        Bytecode()
        .push(32, x).push(1, 3).op("BYTE").op("POP")     # in range -> 3
        .push(32, x).push(2, 300).op("BYTE").op("POP")   # i >= 32 -> 0
        .push(32, x).push(32, 1 << 200).op("BYTE").op("POP")  # huge i -> 0
        .push(1, 1).push(1, 4).op("SHL").op("POP")       # 1 << 4
        .push(32, x).push(1, 200).op("SHL").op("POP")    # overflow wrap
        .push(1, 1).push(2, 300).op("SHL").op("POP")     # shift >= 256 -> 0
        .op("STOP")
    )
    MockProver(K, EvmCircuit(b.steps, b.rws.rws, PARAMS)).assert_satisfied()


def test_evm_circuit_catches_wrong_and_nibble():
    b = _witness(
        Bytecode().push(1, 0xF0).push(1, 0xFF).op("AND").op("POP").op("STOP")
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
                    if s.exec_state == "AND"
                )
                # claim a wrong low nibble for the result byte 0
                arr = np.array(cols[self.c_bytes_d[0]])
                arr[row] = F.from_int(0x1 * F.R % F.modulus)
                cols[self.c_bytes_d[0]] = arr
            return cols

    failures = MockProver(K, Corrupt(b.steps, b.rws.rws, PARAMS)).verify()
    assert any("AND" in f for f in failures), failures


def test_evm_circuit_shr():
    x = int.from_bytes(bytes(range(32)), "big")
    b = _witness(
        Bytecode()
        .push(1, 0x55).push(1, 4).op("SHR").op("POP")    # small shift
        .push(32, x).push(1, 100).op("SHR").op("POP")    # cross-limb shift
        .push(32, x).push(1, 0).op("SHR").op("POP")      # zero shift
        .push(32, x).push(2, 300).op("SHR").op("POP")    # shift >= 256 -> 0
        .push(32, x).push(32, 1 << 200).op("SHR").op("POP")  # huge shift
        .op("STOP")
    )
    MockProver(K, EvmCircuit(b.steps, b.rws.rws, PARAMS)).assert_satisfied()


def test_evm_circuit_catches_wrong_shr_result():
    b = _witness(
        Bytecode().push(1, 0xF0).push(1, 4).op("SHR").op("POP").op("STOP")
    )

    class Corrupt(EvmCircuit):
        """Claim quotient 0x0E instead of 0x0F (remainder adjusted so the
        stack push matches the claimed quotient — the q*2^s+r=v identity
        must catch it because r would need to be >= 2^s)."""

        def synthesize(self, phase, n, challenges, instances):
            cols = super().synthesize(phase, n, challenges, instances)
            import numpy as np
            from zkevm_circuits_tpu.crypto.field import fr
            F = fr()
            row = next(
                i for i, s in enumerate(self.steps)
                if s.exec_state == "SHR"
            )
            if phase == 0:
                for arr_cols, val in ((self.c_bytes_c, 0x0E),):
                    arr = np.array(cols[arr_cols[0]])
                    arr[row] = F.from_int(val * F.R % F.modulus)
                    cols[arr_cols[0]] = arr
            return cols

    failures = MockProver(K, Corrupt(b.steps, b.rws.rws, PARAMS)).verify()
    assert failures, "corrupted SHR quotient must fail"


def test_evm_circuit_jump_jumpi():
    # 0: PUSH1 4; 2: JUMP; 3: (dead) STOP; 4: JUMPDEST;
    # 5: PUSH1 1; 7: PUSH1 11; 9: JUMPI (taken); 10: (dead) STOP
    # 11: JUMPDEST; 12: PUSH1 0; 14: PUSH1 3; 16: JUMPI (not taken); 17: STOP
    b = _witness(
        Bytecode()
        .push(1, 4).op("JUMP")
        .op("STOP")
        .op("JUMPDEST")
        .push(1, 1).push(1, 11).op("JUMPI")
        .op("STOP")
        .op("JUMPDEST")
        .push(1, 0).push(1, 3).op("JUMPI")
        .op("STOP")
    )
    kinds = [s.exec_state for s in b.steps]
    assert "JUMP" in kinds and kinds.count("JUMPI") == 2
    MockProver(K, EvmCircuit(b.steps, b.rws.rws, PARAMS)).assert_satisfied()


def test_evm_circuit_catches_wrong_jump_target():
    b = _witness(
        Bytecode().push(1, 3).op("JUMP").op("JUMPDEST").op("STOP")
    )

    class Corrupt(EvmCircuit):
        """Claim the pc landed at 5 instead of the popped dest 3."""

        def synthesize(self, phase, n, challenges, instances):
            cols = super().synthesize(phase, n, challenges, instances)
            if phase == 0:
                import numpy as np
                from zkevm_circuits_tpu.crypto.field import fr
                F = fr()
                row = next(
                    i for i, s in enumerate(self.steps)
                    if s.exec_state == "JUMP"
                )
                arr = np.array(cols[self.c_pc])
                arr[row + 1] = F.from_int(5 * F.R % F.modulus)
                cols[self.c_pc] = arr
            return cols

    failures = MockProver(K, Corrupt(b.steps, b.rws.rws, PARAMS)).verify()
    assert failures, "corrupted JUMP target must fail"


def test_evm_circuit_mstore8():
    b = _witness(
        Bytecode()
        .push(2, 0xBBAA).push(1, 5).op("MSTORE8")  # mem[5] = 0xAA (low byte)
        .push(1, 0).op("MLOAD").op("POP")
        .op("STOP")
    )
    MockProver(K, EvmCircuit(b.steps, b.rws.rws, PARAMS)).assert_satisfied()


def _calldata_witness(code: Bytecode, data: bytes):
    state = StateDB(
        {SENDER: Account(balance=10**18), CONTRACT: Account(code=code.to_bytes())}
    )
    tx = Tx(from_addr=SENDER, to=CONTRACT, data=data)
    tr = Interpreter(state).run_tx(tx)
    assert not tr.failed
    b = CircuitInputBuilder()
    b.handle_tx(
        dict(from_addr=SENDER, to_addr=CONTRACT, value=0, calldata=data), tr
    )
    return b


def test_evm_circuit_calldataload():
    data = bytes(range(1, 41))  # 40 bytes
    b = _calldata_witness(
        Bytecode()
        .push(1, 0).op("CALLDATALOAD").op("POP")    # fully inside
        .push(1, 20).op("CALLDATALOAD").op("POP")   # crosses the end
        .push(1, 40).op("CALLDATALOAD").op("POP")   # exactly at the end
        .push(1, 200).op("CALLDATALOAD").op("POP")  # past the end
        .push(32, 1 << 128).op("CALLDATALOAD").op("POP")  # offset >= 2^32
        .op("STOP"),
        data,
    )
    MockProver(K, EvmCircuit(b.steps, b.rws.rws, PARAMS)).assert_satisfied()


def test_evm_circuit_catches_wrong_calldataload_pad():
    data = bytes([0x11] * 4)
    b = _calldata_witness(
        Bytecode().push(1, 2).op("CALLDATALOAD").op("POP").op("STOP"), data
    )

    class Corrupt(EvmCircuit):
        """Claim 3 in-range bytes when only 2 exist (sel bit flipped on)."""

        def synthesize(self, phase, n, challenges, instances):
            cols = super().synthesize(phase, n, challenges, instances)
            if phase == 0:
                import numpy as np
                from zkevm_circuits_tpu.crypto.field import fr
                F = fr()
                row = next(
                    i for i, s in enumerate(self.steps)
                    if s.exec_state == "CALLDATALOAD"
                )
                arr = np.array(cols[self.c_carry[2]])
                arr[row] = F.from_int(1 * F.R % F.modulus)
                cols[self.c_carry[2]] = arr
            return cols

    failures = MockProver(K, Corrupt(b.steps, b.rws.rws, PARAMS)).verify()
    assert failures, "sel bit past the calldata end must fail"


def test_evm_circuit_signed_ops():
    m = (1 << 256) - 1  # -1
    b = _witness(
        Bytecode()
        .push(1, 3).push(32, m - 13).op("SDIV").op("POP")   # -14 / 3 = -4
        .push(1, 3).push(32, m - 13).op("SMOD").op("POP")   # -14 % 3 = -2
        .push(32, m - 4).push(1, 20).op("SDIV").op("POP")   # 20 / -5 = -4
        .push(1, 0).push(32, m).op("SDIV").op("POP")        # div by zero
        .push(1, 5).push(1, 100).op("SDIV").op("POP")       # 100/5 positive
        .push(32, 1 << 255).push(32, m).op("SDIV").op("POP")  # MIN / -1
        .op("STOP")
    )
    MockProver(K, EvmCircuit(b.steps, b.rws.rws, PARAMS)).assert_satisfied()


def test_evm_circuit_signextend():
    b = _witness(
        Bytecode()
        .push(1, 0x80).push(1, 0).op("SIGNEXTEND").op("POP")  # -> -128
        .push(1, 0x7F).push(1, 0).op("SIGNEXTEND").op("POP")  # -> 0x7F
        .push(2, 0x80FF).push(1, 1).op("SIGNEXTEND").op("POP")
        .push(2, 0x1234).push(1, 31).op("SIGNEXTEND").op("POP")  # identity
        .push(2, 0x1234).push(32, 1 << 200).op("SIGNEXTEND").op("POP")
        .op("STOP")
    )
    MockProver(K, EvmCircuit(b.steps, b.rws.rws, PARAMS)).assert_satisfied()


def test_evm_circuit_catches_wrong_sdiv_sign():
    m = (1 << 256) - 1
    b = _witness(
        Bytecode().push(1, 3).push(32, m - 13).op("SDIV").op("POP").op("STOP")
    )

    class Corrupt(EvmCircuit):
        """Claim the positive quotient 4 instead of -4."""

        def synthesize(self, phase, n, challenges, instances):
            cols = super().synthesize(phase, n, challenges, instances)
            if phase == 0:
                import numpy as np
                from zkevm_circuits_tpu.crypto.field import fr
                F = fr()
                row = next(
                    i for i, s in enumerate(self.steps)
                    if s.exec_state == "SDIV"
                )
                good = 4 .to_bytes(32, "little")
                for j in (0, 31):
                    arr = np.array(cols[self.c_bytes_c[j]])
                    arr[row] = F.from_int(good[j] * F.R % F.modulus)
                    cols[self.c_bytes_c[j]] = arr
            return cols

    failures = MockProver(K, Corrupt(b.steps, b.rws.rws, PARAMS)).verify()
    assert failures, "flipped SDIV sign must fail"


def test_evm_circuit_sar():
    m = (1 << 256) - 1
    b = _witness(
        Bytecode()
        .push(1, 0xF0).push(1, 4).op("SAR").op("POP")        # positive
        .push(32, m - 0xEF).push(1, 4).op("SAR").op("POP")   # negative
        .push(32, m).push(2, 300).op("SAR").op("POP")        # s >= 256, neg
        .push(1, 7).push(2, 300).op("SAR").op("POP")         # s >= 256, pos
        .push(32, m - 4).push(1, 0).op("SAR").op("POP")      # s = 0
        .push(32, 1 << 255).push(1, 255).op("SAR").op("POP")  # MIN >> 255
        .op("STOP")
    )
    # oracle check against the tracer's own semantics
    MockProver(K, EvmCircuit(b.steps, b.rws.rws, PARAMS)).assert_satisfied()


def test_evm_circuit_catches_wrong_sar_fill():
    m = (1 << 256) - 1
    b = _witness(
        Bytecode().push(32, m - 0xEF).push(1, 4).op("SAR").op("POP")
        .op("STOP")
    )

    class Corrupt(EvmCircuit):
        """Claim the logical (zero-filled) shift instead of arithmetic."""

        def synthesize(self, phase, n, challenges, instances):
            cols = super().synthesize(phase, n, challenges, instances)
            if phase == 0:
                import numpy as np
                from zkevm_circuits_tpu.crypto.field import fr
                F = fr()
                row = next(
                    i for i, s in enumerate(self.steps)
                    if s.exec_state == "SAR"
                )
                # zero the top result byte (should be 0xFF) and the fill
                # flag
                for col, v in ((self.c_bytes_c[31], 0),
                               (self.c_carry[22], 0)):
                    arr = np.array(cols[col])
                    arr[row] = F.from_int(v * F.R % F.modulus)
                    cols[col] = arr
            return cols

    failures = MockProver(K, Corrupt(b.steps, b.rws.rws, PARAMS)).verify()
    assert failures, "zero-filled SAR must fail"


def test_evm_circuit_slt_sgt():
    m = (1 << 256) - 1  # -1
    b = _witness(
        Bytecode()
        .push(1, 3).push(32, m - 13).op("SLT").op("POP")    # -14 < 3 -> 1
        .push(32, m - 13).push(1, 3).op("SLT").op("POP")    # 3 < -14 -> 0
        .push(1, 3).push(32, m - 13).op("SGT").op("POP")    # -14 > 3 -> 0
        .push(32, m - 5).push(32, m - 13).op("SLT").op("POP")  # -14 < -6 -> 1
        .push(1, 7).push(1, 7).op("SLT").op("POP")          # equal -> 0
        .push(1, 7).push(1, 7).op("SGT").op("POP")          # equal -> 0
        .push(32, 1 << 255).push(1, 0).op("SGT").op("POP")  # 0 > MIN -> 1
        .op("STOP")
    )
    MockProver(K, EvmCircuit(b.steps, b.rws.rws, PARAMS)).assert_satisfied()


def test_evm_circuit_catches_wrong_slt_result():
    m = (1 << 256) - 1
    b = _witness(
        Bytecode().push(1, 3).push(32, m - 13).op("SLT").op("POP").op("STOP")
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
                    if s.exec_state == "SLT"
                )
                # flip the claimed sign of x: -14 would read as positive
                arr = np.array(cols[self.c_gx[0]])
                arr[row] = F.from_int(0)
                cols[self.c_gx[0]] = arr
            return cols

    failures = MockProver(K, Corrupt(b.steps, b.rws.rws, PARAMS)).verify()
    assert failures, "flipped SLT sign bit must fail"


def test_evm_circuit_gas_msize_codesize():
    b = _witness(
        Bytecode()
        .op("GAS").op("POP")
        .op("MSIZE").op("POP")                      # 0 before any touch
        .push(1, 0xAB).push(1, 64).op("MSTORE")     # expand to 96 bytes
        .op("MSIZE").op("POP")                      # 96
        .op("CODESIZE").op("POP")
        .op("GAS").op("POP")
        .op("STOP")
    )
    MockProver(K, EvmCircuit(b.steps, b.rws.rws, PARAMS)).assert_satisfied()


def test_evm_circuit_catches_wrong_gas_push():
    b = _witness(Bytecode().op("GAS").op("POP").op("STOP"))

    class Corrupt(EvmCircuit):
        def synthesize(self, phase, n, challenges, instances):
            cols = super().synthesize(phase, n, challenges, instances)
            if phase == 0:
                import numpy as np
                from zkevm_circuits_tpu.crypto.field import fr
                F = fr()
                row = next(
                    i for i, s in enumerate(self.steps)
                    if s.exec_state == "GAS"
                )
                # claim one extra unit of remaining gas
                cur = (self.steps[row].gas - 2) & 0xFF
                arr = np.array(cols[self.c_bytes_a[0]])
                arr[row] = F.from_int((cur + 1) * F.R % F.modulus)
                cols[self.c_bytes_a[0]] = arr
            return cols

    failures = MockProver(K, Corrupt(b.steps, b.rws.rws, PARAMS)).verify()
    assert failures, "inflated GAS push must fail"


def test_evm_circuit_blockhash_validity_paths():
    # default block number is 1: query 0 is in-window (hash 0 — no
    # ancestors recorded), query 7 is >= cur (w=1 path), a 200-bit query
    # exercises the high-bytes-nonzero path (h=0)
    b = _witness(
        Bytecode()
        .push(1, 0).op("BLOCKHASH").op("POP")
        .push(1, 7).op("BLOCKHASH").op("POP")
        .push(32, 1 << 200).op("BLOCKHASH").op("POP")
        .op("STOP")
    )
    MockProver(K, EvmCircuit(b.steps, b.rws.rws, PARAMS)).assert_satisfied()


def test_evm_circuit_catches_wrong_blockhash_validity():
    # claiming the in-window query is out-of-window must fail
    b = _witness(
        Bytecode().push(1, 0).op("BLOCKHASH").op("POP").op("STOP")
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
                    if s.exec_state == "BLOCKHASH"
                )
                arr = np.array(cols[self.c_ez])
                arr[row] = F.from_int(0)  # claim invalid
                cols[self.c_ez] = arr
            return cols

    failures = MockProver(K, Corrupt(b.steps, b.rws.rws, PARAMS)).verify()
    assert failures, "in-window BLOCKHASH claimed invalid must fail"
