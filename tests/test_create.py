"""CREATE / CREATE2 opcodes: builder frame replay, account machine rows,
in-circuit keccak address derivation, code deposit, init-frame reverts.

Covers VERDICT.md round-1 Missing §3's CREATE remainder (reference
bus-mapping src/evm/opcodes/create.rs, zkevm-circuits
execution/create.rs + return_revert.rs create path).
"""

import pytest

from zkevm_circuits_tpu.circuits.evm import EvmCircuit, EvmParams
from zkevm_circuits_tpu.circuits.state import StateCircuit, StateParams
from zkevm_circuits_tpu.crypto.keccak import keccak256
from zkevm_circuits_tpu.plonk.mock import MockProver
from zkevm_circuits_tpu.tracer import Account, Interpreter, StateDB, Tx
from zkevm_circuits_tpu.types import Bytecode
from zkevm_circuits_tpu.witness.builder import (
    AccountState,
    CircuitInputBuilder,
)
from zkevm_circuits_tpu.witness.rw import AccountField, RwTag

K = 9
SENDER, CONTRACT = 0xCAFE, 0xC0DE
PARAMS = EvmParams(target_steps=60, rw_target=256)
SPARAMS = StateParams(limb_bits=8, id_bits=16, addr_bits=160, key_bits=32,
                      rwc_bits=16, target_rows=200)

# deployed runtime: PUSH1 1; POP; STOP
DEPLOYED = bytes([0x60, 0x01, 0x50, 0x00])


def _init_code(deployed=DEPLOYED, revert=False):
    """Init code that MSTOREs `deployed` and RETURNs (or REVERTs) it."""
    b = Bytecode()
    b.push(32, int.from_bytes(deployed.ljust(32, b"\x00"), "big"))
    b.push(1, 0).op("MSTORE")
    b.push(1, len(deployed)).push(1, 0)
    b.op("REVERT" if revert else "RETURN")
    return b


def _creator_code(initb: bytes, op="CREATE", value=0, salt=0):
    """Store `initb` into memory, then CREATE/CREATE2 + POP."""
    c = Bytecode()
    for i in range(0, len(initb), 32):
        chunk = initb[i : i + 32].ljust(32, b"\x00")
        c.push(32, int.from_bytes(chunk, "big")).push(1, i).op("MSTORE")
    if op == "CREATE2":
        c.push(32, salt)
    c.push(1, len(initb)).push(1, 0).push(1, value).op(op)
    c.op("POP").op("STOP")
    return c


def _run(creator: Bytecode, contract_balance=777):
    code_bytes = creator.to_bytes()
    state = StateDB({
        SENDER: Account(balance=10**15),
        CONTRACT: Account(code=code_bytes, balance=contract_balance),
    })
    tr = Interpreter(state).run_tx(
        Tx(from_addr=SENDER, to=CONTRACT, gas_price=10)
    )
    ch = int.from_bytes(keccak256(code_bytes), "big")
    b = CircuitInputBuilder(accounts={
        SENDER: AccountState(balance=10**15),
        CONTRACT: AccountState(balance=contract_balance, code_hash=ch),
    })
    b.handle_tx(
        dict(from_addr=SENDER, to_addr=CONTRACT, value=0, calldata=b"",
             gas_price=10, code_hash=ch),
        tr, code_db={CONTRACT: code_bytes},
    )
    return b, state, tr


def test_create_builder_rows():
    initb = _init_code().to_bytes()
    b, state, tr = _run(_creator_code(initb))
    assert not tr.failed
    kinds = [s.exec_state for s in b.steps]
    assert "CREATE" in kinds
    # code deposit row carries keccak(deployed)
    dep = [r for r in b.rws.rws if r.tag == RwTag.Account
           and r.field_tag == AccountField.CodeHash and r.is_write]
    assert dep and dep[-1].value == int.from_bytes(
        keccak256(DEPLOYED), "big"
    )
    created = dep[-1].address
    # created account state matches the tracer
    assert b.accounts[created].nonce == state.account(created).nonce == 1
    assert b.accounts[CONTRACT].nonce == state.account(CONTRACT).nonce
    # the keccak address-derivation preimage was registered
    assert any(len(p) == 23 for p in b.sha3_inputs)


def test_create_proves():
    initb = _init_code().to_bytes()
    b, _, tr = _run(_creator_code(initb))
    assert not tr.failed
    MockProver(K, EvmCircuit(b.steps, b.rws.rws, PARAMS)).assert_satisfied()
    MockProver(K, StateCircuit(b.rws, SPARAMS)).assert_satisfied()


def test_create_with_value_proves():
    initb = _init_code().to_bytes()
    b, state, tr = _run(_creator_code(initb, value=55))
    assert not tr.failed
    dep = [r for r in b.rws.rws if r.tag == RwTag.Account
           and r.field_tag == AccountField.CodeHash and r.is_write]
    created = dep[-1].address
    assert b.accounts[created].balance == 55
    assert b.accounts[CONTRACT].balance \
        == state.account(CONTRACT).balance
    MockProver(K, EvmCircuit(b.steps, b.rws.rws, PARAMS)).assert_satisfied()


def test_create2_proves():
    initb = _init_code().to_bytes()
    b, state, tr = _run(_creator_code(initb, op="CREATE2", salt=0xABCD))
    assert not tr.failed
    kinds = [s.exec_state for s in b.steps]
    assert "CREATE" in kinds
    dep = [r for r in b.rws.rws if r.tag == RwTag.Account
           and r.field_tag == AccountField.CodeHash and r.is_write]
    # CREATE2 address: keccak(0xff ++ sender ++ salt ++ keccak(init))[12:]
    buf = (b"\xff" + CONTRACT.to_bytes(20, "big")
           + (0xABCD).to_bytes(32, "big") + keccak256(initb))
    assert dep[-1].address == int.from_bytes(keccak256(buf)[12:], "big")
    MockProver(K, EvmCircuit(b.steps, b.rws.rws, PARAMS)).assert_satisfied()
    MockProver(K, StateCircuit(b.rws, SPARAMS)).assert_satisfied()


def test_create_revert_restores_state():
    """Init code that REVERTs: the endowment and the created account's
    nonce are restored; the creator's nonce bump PERSISTS."""
    initb = _init_code(revert=True).to_bytes()
    b, state, tr = _run(_creator_code(initb, value=55))
    assert not tr.failed  # outer tx succeeds; inner create fails
    # no code deposit
    dep = [r for r in b.rws.rws if r.tag == RwTag.Account
           and r.field_tag == AccountField.CodeHash and r.is_write]
    assert not dep
    # creator nonce bump persisted, endowment restored
    assert b.accounts[CONTRACT].nonce == 1
    assert b.accounts[CONTRACT].balance == 777
    # the failed-create push is 0
    ret = [s for s in b.steps if s.is_create_ret]
    assert len(ret) == 1
    MockProver(K, EvmCircuit(b.steps, b.rws.rws, PARAMS)).assert_satisfied()
    MockProver(K, StateCircuit(b.rws, SPARAMS)).assert_satisfied()


def test_create_wrong_address_rejected():
    """Corrupting the derived-address digest bytes must trip the
    address-binding gates (callee continuity into the init frame)."""
    initb = _init_code().to_bytes()
    b, _, _ = _run(_creator_code(initb))

    class Corrupt(EvmCircuit):
        def synthesize(self, phase, n, challenges, instances):
            cols = super().synthesize(phase, n, challenges, instances)
            if phase == 0:
                import numpy as np

                from zkevm_circuits_tpu.crypto.field import fr
                F = fr()
                row = next(i for i, s in enumerate(self.steps)
                           if s.exec_state == "CREATE")
                arr = np.array(cols[self.c_bytes_c[31]])
                arr[row] = F.from_int(0x13 * F.R % F.modulus)
                cols[self.c_bytes_c[31]] = arr
            return cols

    failures = MockProver(
        K, Corrupt(b.steps, b.rws.rws, PARAMS)
    ).verify()
    assert failures, "tampered created address must fail"


def test_create_wrong_deposit_hash_rejected():
    """A deposit-hash claim that disagrees with the Account rw row must
    trip the bus lookup (the c_acc_m cell carries the claimed hash)."""
    initb = _init_code().to_bytes()
    b, _, _ = _run(_creator_code(initb))

    class Corrupt(EvmCircuit):
        def synthesize(self, phase, n, challenges, instances):
            cols = super().synthesize(phase, n, challenges, instances)
            if phase == 1:
                import numpy as np

                from zkevm_circuits_tpu.crypto.field import fr
                F = fr()
                row = next(i for i, s in enumerate(self.steps)
                           if s.is_create_ret)
                arr = np.array(cols[self.c_acc_m])
                arr[row] = F.from_int(0x1337 * F.R % F.modulus)
                cols[self.c_acc_m] = arr
            return cols

    failures = MockProver(K, Corrupt(b.steps, b.rws.rws, PARAMS)).verify()
    assert failures, "claimed deposit hash must match the Account row"


# ---------------------------------------------------------------------------
# multi-byte RLP nonce (VERDICT r4 #5: CREATE with creator nonce > 0x7F;
# reference bus-mapping create.rs uses geth's full rlp-encoded preimage)
# ---------------------------------------------------------------------------
def _run_with_nonce(creator: Bytecode, nonce: int):
    code_bytes = creator.to_bytes()
    state = StateDB({
        SENDER: Account(balance=10**15),
        CONTRACT: Account(code=code_bytes, balance=777, nonce=nonce),
    })
    tr = Interpreter(state).run_tx(
        Tx(from_addr=SENDER, to=CONTRACT, gas_price=10)
    )
    ch = int.from_bytes(keccak256(code_bytes), "big")
    b = CircuitInputBuilder(accounts={
        SENDER: AccountState(balance=10**15),
        CONTRACT: AccountState(balance=777, code_hash=ch, nonce=nonce),
    })
    b.handle_tx(
        dict(from_addr=SENDER, to_addr=CONTRACT, value=0, calldata=b"",
             gas_price=10, code_hash=ch),
        tr, code_db={CONTRACT: code_bytes},
    )
    return b, state, tr


@pytest.mark.parametrize("nonce", [0x80, 0x1234, 0xDEADBEEF])
def test_create_multibyte_nonce_proves(nonce):
    from zkevm_circuits_tpu.types import rlp as _rlp

    initb = _init_code().to_bytes()
    b, state, tr = _run_with_nonce(_creator_code(initb), nonce)
    assert not tr.failed
    # geth address derivation: keccak(rlp([sender, nonce]))[12:]
    pre = _rlp.encode([CONTRACT.to_bytes(20, "big"), nonce])
    nl = len(pre) - 23
    assert nl >= 1
    want = int.from_bytes(keccak256(pre)[12:], "big")
    dep = [r for r in b.rws.rws if r.tag == RwTag.Account
           and r.field_tag == AccountField.CodeHash and r.is_write]
    assert dep[-1].address == want
    assert any(len(p) == 23 + nl for p in b.sha3_inputs)
    MockProver(K, EvmCircuit(b.steps, b.rws.rws, PARAMS)).assert_satisfied()


def test_create_multibyte_nonce_forged_onehot_rejected():
    """Flipping the nl one-hot (claiming a different RLP branch) must
    break the keccak-address lookup."""
    initb = _init_code().to_bytes()
    b, _, tr = _run_with_nonce(_creator_code(initb), 0x1234)

    class Forged(EvmCircuit):
        def synthesize(self, phase, n, challenges, instances):
            cols = super().synthesize(phase, n, challenges, instances)
            if phase == 0:
                import numpy as np

                from zkevm_circuits_tpu.crypto.field import fr
                F = fr()
                si = next(i for i, s in enumerate(self.steps)
                          if s.exec_state == "CREATE")
                # o_2 -> o_3 (claim a 3-byte nonce encoding)
                c20 = np.asarray(cols[self.c_mem[21]]).copy()
                c21 = np.asarray(cols[self.c_mem[22]]).copy()
                c20[si] = F.mont_from_ints([0])[0]
                c21[si] = F.mont_from_ints([1])[0]
                cols[self.c_mem[21]] = c20
                cols[self.c_mem[22]] = c21
            return cols

    failures = MockProver(K, Forged(b.steps, b.rws.rws, PARAMS)).verify()
    assert failures, "forged nl one-hot must not verify"
