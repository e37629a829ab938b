"""Gas accounting + error-state tests for the EVM circuit.

Covers VERDICT.md round-1 Missing §2: the gas_left chain gate, per-gadget
constant gas_cost constraints (reference execution/*.rs GasCost
constants), and the ERR_STACK / ERR_OOG error states
(error_stack.rs / error_oog_constant.rs).
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
SENDER, CONTRACT = 0xCAFE, 0xC0DE
PARAMS = EvmParams(target_steps=40, rw_target=256)


def _witness(code: Bytecode, gas: int = 1_000_000, expect_fail: bool = False):
    state = StateDB(
        {SENDER: Account(balance=10**18),
         CONTRACT: Account(code=code.to_bytes())}
    )
    tr = Interpreter(state).run_tx(
        Tx(from_addr=SENDER, to=CONTRACT, gas=gas)
    )
    assert tr.failed == expect_fail
    b = CircuitInputBuilder()
    b.handle_tx(
        dict(from_addr=SENDER, to_addr=CONTRACT, value=0, calldata=b""), tr,
        code_db={CONTRACT: code.to_bytes()},
    )
    return b


def _mont(v: int):
    return F.from_int(v % R * F.R % R)


def test_gas_chain_and_costs_satisfied():
    b = _witness(
        Bytecode().push(1, 5).push(2, 0x1234).op("ADD").op("POP").op("STOP")
    )
    # sanity on the witness itself: BEGIN_TX anchors the chain
    begin = b.steps[0]
    assert begin.gas_cost == 21000
    assert begin.gas - begin.gas_cost == b.steps[1].gas
    MockProver(K, EvmCircuit(b.steps, b.rws.rws, PARAMS)).assert_satisfied()


def test_wrong_gas_cost_rejected():
    b = _witness(Bytecode().push(1, 5).push(1, 2).op("ADD").op("POP").op("STOP"))
    # claim the ADD step cost 0 gas
    add_row = next(i for i, s in enumerate(b.steps) if s.exec_state == "ADD")

    class C(EvmCircuit):
        def synthesize(self, phase, n, challenges, instances):
            cols = super().synthesize(phase, n, challenges, instances)
            if phase == 0:
                arr = np.asarray(cols[self.c_gas_cost]).copy()
                arr[add_row] = _mont(0)
                cols[self.c_gas_cost] = arr
            return cols

    failures = MockProver(K, C(b.steps, b.rws.rws, PARAMS)).verify()
    assert failures, "zero-cost ADD must violate the ADD gas gate"


def test_broken_gas_chain_rejected():
    b = _witness(Bytecode().push(1, 5).push(1, 2).op("ADD").op("POP").op("STOP"))

    class C(EvmCircuit):
        def synthesize(self, phase, n, challenges, instances):
            cols = super().synthesize(phase, n, challenges, instances)
            if phase == 0:
                arr = np.asarray(cols[self.c_gas_left]).copy()
                arr[2] = _mont(12345678)  # free gas mid-chain
                cols[self.c_gas_left] = arr
            return cols

    failures = MockProver(K, C(b.steps, b.rws.rws, PARAMS)).verify()
    assert failures, "gas_left jump must violate the chain gate"


def test_error_stack_underflow_proves():
    # ADD on an empty stack: tx fails with ERR_STACK (underflow)
    b = _witness(Bytecode().op("ADD"), expect_fail=True)
    states = [s.exec_state for s in b.steps]
    assert states == ["BeginTx", "ERR_STACK", "EndTx"]
    MockProver(K, EvmCircuit(b.steps, b.rws.rws, PARAMS)).assert_satisfied()


def test_error_oog_constant_proves():
    # gas limit = intrinsic + 3: the first PUSH eats 3, the second is OOG
    b = _witness(
        Bytecode().push(1, 1).push(1, 2).op("ADD").op("STOP"),
        gas=21_003, expect_fail=True,
    )
    states = [s.exec_state for s in b.steps]
    assert states == ["BeginTx", "PUSH1", "ERR_OOG", "EndTx"]
    MockProver(K, EvmCircuit(b.steps, b.rws.rws, PARAMS)).assert_satisfied()


def test_error_state_must_match_witness():
    # an ERR_STACK claim on a healthy step must fail the prover
    b = _witness(Bytecode().op("ADD"), expect_fail=True)

    class C(EvmCircuit):
        def synthesize(self, phase, n, challenges, instances):
            cols = super().synthesize(phase, n, challenges, instances)
            if phase == 0:
                # flip the underflow flag to overflow: sp != 0 kills it
                arr = np.asarray(cols[self.c_carry[0]]).copy()
                arr2 = np.asarray(cols[self.c_carry[1]]).copy()
                arr[1], arr2[1] = _mont(0), _mont(1)
                cols[self.c_carry[0]] = arr
                cols[self.c_carry[1]] = arr2
            return cols

    failures = MockProver(K, C(b.steps, b.rws.rws, PARAMS)).verify()
    assert failures, "mislabelled error kind must be rejected"


def test_memory_expansion_gas():
    # MSTORE at a high address: cost = 3 + 3*d_words + quadratic term
    # (reference memory_gadget.rs MemoryExpansionGadget)
    b = _witness(
        Bytecode()
        .push(2, 0xAAAA).push(2, 0x1000).op("MSTORE")   # expand to 0x1020
        .push(2, 0x20).op("MLOAD").op("POP")            # no expansion
        .op("STOP")
    )
    ms = next(s for s in b.steps if s.exec_state == "MSTORE")
    new_words = (0x1000 + 32 + 31) // 32
    assert ms.gas_cost == 3 + 3 * new_words + new_words * new_words // 512
    MockProver(K, EvmCircuit(b.steps, b.rws.rws, PARAMS)).assert_satisfied()


def test_memory_expansion_wrong_cost_rejected():
    b = _witness(
        Bytecode().push(2, 0xAAAA).push(2, 0x1000).op("MSTORE").op("STOP")
    )
    row = next(i for i, s in enumerate(b.steps)
               if s.exec_state == "MSTORE")

    class C(EvmCircuit):
        def synthesize(self, phase, n, challenges, instances):
            cols = super().synthesize(phase, n, challenges, instances)
            if phase == 0:
                arr = np.asarray(cols[self.c_gas_cost]).copy()
                arr[row] = _mont(3)  # claim no expansion charge
                cols[self.c_gas_cost] = arr
            return cols

    failures = MockProver(K, C(b.steps, b.rws.rws, PARAMS)).verify()
    assert failures, "underpaying memory expansion must fail"


def test_dynamic_gas_copies_log_composed():
    # copy-family: 3 + 3*words + memexp; LOG: 375 + 375*n + 8*len +
    # memexp (reference memory_gadget.rs MemoryCopierGasGadget +
    # execution/logs.rs).  Composed (SuperCircuit) so the Copy circuit
    # backs the nonzero-length events.
    from zkevm_circuits_tpu.circuits.super_circuit import SuperCircuit
    from zkevm_circuits_tpu.crypto.keccak import keccak256
    from zkevm_circuits_tpu.types.transaction import Transaction

    code = (
        Bytecode()
        .push(1, 64).push(1, 0).push(2, 0x200).op("CALLDATACOPY")
        .push(1, 33).push(1, 0).push(1, 0).op("CODECOPY")   # no expansion
        .push(1, 7).push(2, 0x123).push(1, 8).push(1, 32).op("LOG2")
        .op("STOP")
    )
    sk = 0x4444444444444444444444444444444444444444444444444444444444444444
    txs = [Transaction(nonce=0, to=CONTRACT, chain_id=1337).sign(sk)]
    sender = txs[0].recover_sender()
    state = StateDB(
        {sender: Account(balance=10**18),
         CONTRACT: Account(code=code.to_bytes())}
    )
    tr = Interpreter(state).run_tx(Tx(from_addr=sender, to=CONTRACT))
    assert not tr.failed
    b = CircuitInputBuilder()
    b.handle_tx(
        dict(from_addr=sender, to_addr=CONTRACT, value=0, calldata=b"",
             code_hash=int.from_bytes(keccak256(code.to_bytes()), "big")),
        tr,
    )
    cdc = next(s for s in b.steps if s.exec_state == "CALLDATACOPY")
    w = (0x200 + 64 + 31) // 32
    assert cdc.gas_cost == 3 + 3 * 2 + 3 * w + w * w // 512
    cc = next(s for s in b.steps if s.exec_state == "CODECOPY")
    assert cc.gas_cost == 3 + 3 * 2  # dst 0: already expanded
    log = next(s for s in b.steps if s.op is not None and s.op.is_log)
    assert log.gas_cost == 375 + 375 * 2 + 8 * 8
    MockProver(K, SuperCircuit(b, [code], txs)).assert_satisfied()


def test_dynamic_gas_sha3_witness_math():
    # SHA3: 30 + 6*words + memexp — pinned at the witness level (the
    # composed MockProver path rides test_super_circuit's SHA3 tests)
    b = _witness(
        Bytecode()
        .push(1, 40).push(2, 0x300).op("SHA3").op("POP").op("STOP")
    )
    sha = next(s for s in b.steps if s.exec_state == "SHA3")
    mw0 = sha.mem_words
    w2 = (0x300 + 40 + 31) // 32
    assert sha.gas_cost == 30 + 6 * 2 + 3 * (w2 - mw0) + (
        w2 * w2 // 512 - mw0 * mw0 // 512
    )


def test_dynamic_gas_zero_size_and_return():
    # zero-size copies charge base only (no expansion even at huge dst);
    # root RETURN charges pure memory expansion
    b = _witness(
        Bytecode()
        .push(1, 0).push(1, 0).push(2, 0xFF00).op("CALLDATACOPY")
        .push(1, 64).push(2, 0x100).op("RETURN")
    )
    cdc = next(s for s in b.steps if s.exec_state == "CALLDATACOPY")
    assert cdc.gas_cost == 3
    ret = next(s for s in b.steps if s.exec_state == "RETURN")
    w = (0x100 + 64 + 31) // 32
    assert ret.gas_cost == 3 * w + w * w // 512
    MockProver(K, EvmCircuit(b.steps, b.rws.rws, PARAMS)).assert_satisfied()


def test_dynamic_gas_undercharge_rejected():
    b = _witness(
        Bytecode().push(1, 64).push(2, 0x100).op("RETURN")
    )
    row = next(i for i, s in enumerate(b.steps)
               if s.exec_state == "RETURN")

    class C(EvmCircuit):
        def synthesize(self, phase, n, challenges, instances):
            cols = super().synthesize(phase, n, challenges, instances)
            if phase == 0:
                arr = np.asarray(cols[self.c_gas_cost]).copy()
                arr[row] = _mont(0)  # drop the expansion charge
                cols[self.c_gas_cost] = arr
            return cols

    failures = MockProver(K, C(b.steps, b.rws.rws, PARAMS)).verify()
    assert failures, "underpaying copy memory expansion must fail"


def test_error_invalid_jump_proves():
    # dest 2 is in-range but not a JUMPDEST (it's the JUMP itself)
    b = _witness(Bytecode().push(1, 2).op("JUMP"), expect_fail=True)
    states = [s.exec_state for s in b.steps]
    assert states == ["BeginTx", "PUSH1", "ERR_JUMP", "EndTx"], states
    MockProver(K, EvmCircuit(b.steps, b.rws.rws, PARAMS)).assert_satisfied()


def test_error_invalid_jump_oor_and_jumpi():
    # out-of-range dest via a taken JUMPI; also a way-out 33-byte dest
    b = _witness(
        Bytecode().push(1, 1).push(1, 200).op("JUMPI"), expect_fail=True
    )
    assert any(s.exec_state == "ERR_JUMP" for s in b.steps)
    MockProver(K, EvmCircuit(b.steps, b.rws.rws, PARAMS)).assert_satisfied()
    b2 = _witness(
        Bytecode().push(32, 1 << 200).op("JUMP"), expect_fail=True
    )
    MockProver(K, EvmCircuit(b2.steps, b2.rws.rws, PARAMS)).assert_satisfied()


def test_error_invalid_jump_into_push_data():
    # dest 1 is push-data (is_code = 0) even though byte 1 could be 0x5B
    b = _witness(
        Bytecode().push(1, 0x5B).push(1, 1).op("JUMP"), expect_fail=True
    )
    assert any(s.exec_state == "ERR_JUMP" for s in b.steps)
    MockProver(K, EvmCircuit(b.steps, b.rws.rws, PARAMS)).assert_satisfied()


def test_error_invalid_jump_wrong_oor_claim_rejected():
    # dest 0 is the PUSH1 byte: in-range, is_code, not a JUMPDEST
    b = _witness(Bytecode().push(1, 0).op("JUMP"), expect_fail=True)

    class C(EvmCircuit):
        def synthesize(self, phase, n, challenges, instances):
            cols = super().synthesize(phase, n, challenges, instances)
            if phase == 0:
                row = next(i for i, s in enumerate(self.steps)
                           if s.exec_state == "ERR_JUMP")
                # claim the in-range dest is out of range
                arr = np.asarray(cols[self.c_carry[2]]).copy()
                arr[row] = _mont(1)
                cols[self.c_carry[2]] = arr
            return cols

    failures = MockProver(K, C(b.steps, b.rws.rws, PARAMS)).verify()
    assert failures, "false out-of-range claim must fail"


def test_error_returndata_oob_proves():
    # RETURNDATACOPY with no prior call: any nonzero span is OOB
    b = _witness(
        Bytecode().push(1, 4).push(1, 0).push(1, 0).op("RETURNDATACOPY"),
        expect_fail=True,
    )
    states = [s.exec_state for s in b.steps]
    assert "ERR_RDOOB" in states, states
    MockProver(K, EvmCircuit(b.steps, b.rws.rws, PARAMS)).assert_satisfied()


def test_error_returndata_oob_false_claim_rejected():
    b = _witness(
        Bytecode().push(1, 4).push(1, 0).push(1, 0).op("RETURNDATACOPY"),
        expect_fail=True,
    )

    class C(EvmCircuit):
        def synthesize(self, phase, n, challenges, instances):
            cols = super().synthesize(phase, n, challenges, instances)
            if phase == 0:
                row = next(i for i, s in enumerate(self.steps)
                           if s.exec_state == "ERR_RDOOB")
                # shrink the claimed copy length to 0: 0 + 0 <= rdlen,
                # the overshoot identity can't hold
                arr = np.asarray(cols[self.c_bytes_b[0]]).copy()
                arr[row] = _mont(0)
                cols[self.c_bytes_b[0]] = arr
            return cols

    failures = MockProver(K, C(b.steps, b.rws.rws, PARAMS)).verify()
    assert failures, "shrunk OOB length must fail"


def test_tx_receipt_rows():
    """EndTx emits TxReceipt rows (status, cumulative gas, log count) and
    the END_TX gadget binds them to the gas-limit/cumulative chain
    (reference operation.rs:113 TxReceiptOp, table.rs:503)."""
    from zkevm_circuits_tpu.witness.rw import RwTag, TxReceiptField

    b = _witness(
        Bytecode().push(1, 0).push(1, 0).op("LOG0")
        .push(1, 5).push(1, 3).op("ADD").op("POP").op("STOP")
    )
    rcpts = [r for r in b.rws.rws if r.tag == RwTag.TxReceipt]
    assert [int(r.field_tag) for r in rcpts] == [1, 2, 3]
    status, cum, loglen = (r.value for r in rcpts)
    assert status == 1 and loglen == 1
    end = next(s for s in b.steps if s.exec_state == "EndTx")
    begin = next(s for s in b.steps if s.exec_state == "BeginTx")
    refund = b.rws.rws[end.rw_indices[1] - 1].value if False else None
    assert cum == begin.gas - end.gas  # no refunds in this tx
    MockProver(K, EvmCircuit(b.steps, b.rws.rws, PARAMS)).assert_satisfied()


def test_tx_receipt_wrong_cumulative_rejected():
    from zkevm_circuits_tpu.witness.rw import RwTag

    b = _witness(Bytecode().push(1, 1).op("POP").op("STOP"))

    class C(EvmCircuit):
        def synthesize(self, phase, n, challenges, instances):
            cols = super().synthesize(phase, n, challenges, instances)
            if phase == 0:
                # claim a smaller cumulative on the END_TX row
                row = next(i for i, s in enumerate(self.steps)
                           if s.exec_state == "EndTx")
                arr = np.asarray(cols[self.c_cum_gas]).copy()
                arr[row] = _mont(1)
                cols[self.c_cum_gas] = arr
            return cols

    failures = MockProver(K, C(b.steps, b.rws.rws, PARAMS)).verify()
    assert failures, "bent cumulative gas must fail"


def test_extcodecopy_composed():
    """EXTCODECOPY: EIP-2929 base + copy-words + memexp gas, external
    code-hash-keyed copy event (reference execution/extcodecopy.rs)."""
    from zkevm_circuits_tpu.circuits.super_circuit import SuperCircuit
    from zkevm_circuits_tpu.crypto.keccak import keccak256
    from zkevm_circuits_tpu.types.transaction import Transaction

    ext_code = Bytecode().push(1, 1).op("POP").op("STOP")
    EXT = 0xE87
    code = (
        Bytecode()
        .push(1, 8).push(1, 0).push(2, 0x140).push(2, EXT)
        .op("EXTCODECOPY")                                  # cold
        .push(1, 4).push(1, 1).push(1, 0).push(2, EXT)
        .op("EXTCODECOPY")                                  # warm
        .op("STOP")
    )
    sk = 0x6666666666666666666666666666666666666666666666666666666666666666
    txs = [Transaction(nonce=0, to=CONTRACT, chain_id=1337).sign(sk)]
    sender = txs[0].recover_sender()
    state = StateDB(
        {sender: Account(balance=10**18),
         CONTRACT: Account(code=code.to_bytes()),
         EXT: Account(code=ext_code.to_bytes())}
    )
    tr = Interpreter(state).run_tx(Tx(from_addr=sender, to=CONTRACT))
    assert not tr.failed
    xh = int.from_bytes(keccak256(ext_code.to_bytes()), "big")
    b = CircuitInputBuilder(accounts={EXT: (0, 0, xh)})
    b.handle_tx(
        dict(from_addr=sender, to_addr=CONTRACT, value=0, calldata=b"",
             code_hash=int.from_bytes(keccak256(code.to_bytes()), "big")),
        tr,
        code_db={CONTRACT: code.to_bytes(), EXT: ext_code.to_bytes()},
    )
    xccs = [s for s in b.steps if s.exec_state == "EXTCODECOPY"]
    w1 = (0x140 + 8 + 31) // 32
    assert xccs[0].gas_cost == 2600 + 3 * 1 + 3 * w1 + w1 * w1 // 512
    assert xccs[1].gas_cost == 100 + 3 * 1  # warm, no expansion
    MockProver(
        K, SuperCircuit(b, [code, ext_code], txs)
    ).assert_satisfied()
