"""SuperCircuit composition test — shared RW table + challenge.

Mirrors the reference's super_circuit tests (SURVEY.md §4.4) at mock
scale: one block with a PUSH/ADD/POP program through every composed
sub-circuit, plus a cross-circuit corruption (EVM claims a value the
State circuit's table doesn't hold).
"""

import numpy as np
import pytest

from zkevm_circuits_tpu.circuits.super_circuit import SuperCircuit, SuperParams
from zkevm_circuits_tpu.plonk.mock import MockProver
from zkevm_circuits_tpu.tracer import Account, Interpreter, StateDB, Tx
from zkevm_circuits_tpu.types import Bytecode
from zkevm_circuits_tpu.types.transaction import Transaction
from zkevm_circuits_tpu.witness.builder import CircuitInputBuilder

K = 9
SENDER, CONTRACT = 0xCAFE, 0xC0DE
SK = 0x3333333333333333333333333333333333333333333333333333333333333333


def _witness(code=None):
    from zkevm_circuits_tpu.crypto.keccak import keccak256

    if code is None:
        code = (
            Bytecode().push(1, 5).push(2, 0x1234).op("ADD").op("POP")
            .op("STOP")
        )
    txs = [Transaction(nonce=0, to=CONTRACT, chain_id=1337).sign(SK)]
    sender = txs[0].recover_sender()  # context must match the signer
    state = StateDB(
        {sender: Account(balance=10**18), CONTRACT: Account(code=code.to_bytes())}
    )
    tr = Interpreter(state).run_tx(Tx(from_addr=sender, to=CONTRACT))
    assert not tr.failed
    b = CircuitInputBuilder()
    b.handle_tx(
        dict(from_addr=sender, to_addr=CONTRACT, value=0, calldata=b"",
             code_hash=int.from_bytes(keccak256(code.to_bytes()), "big")),
        tr,
    )
    return b, [code], txs


def test_super_circuit_satisfied():
    b, codes, txs = _witness()
    circ = SuperCircuit(b, codes, txs)
    assert circ.bind_bytecode  # opcode binding live (code hashes carried)
    MockProver(K, circ).assert_satisfied()


def test_super_circuit_mulmod_composed():
    """MULMOD/ADDMOD steps ride the MulMod sub-circuit's table."""
    code = (
        Bytecode()
        .push(1, 100).push(1, 23).push(1, 17).op("MULMOD").op("POP")
        .push(1, 99).push(2, 0x1234).push(1, 250).op("ADDMOD").op("POP")
        .op("STOP")
    )
    b, codes, txs = _witness(code)
    circ = SuperCircuit(b, codes, txs)
    assert circ.mulmod is not None and len(circ.mulmod.events) == 2
    MockProver(K, circ).assert_satisfied()


def test_super_circuit_catches_wrong_opcode_binding():
    """A step claiming a pc whose code byte is a different opcode must
    miss the bytecode-table binding lookup."""
    b, codes, txs = _witness()

    class Corrupt(SuperCircuit):
        def synthesize(self, phase, n, challenges, instances):
            cols = super().synthesize(phase, n, challenges, instances)
            if phase == 0:
                from zkevm_circuits_tpu.crypto.field import fr
                F = fr()
                row = next(
                    i for i, s in enumerate(self.evm.steps)
                    if s.exec_state == "ADD"
                )
                # shift the ADD step's pc onto the POP byte
                arr = np.array(cols[self.evm.c_pc])
                good = F.to_int(np.asarray(F.from_mont(arr[row])))
                arr[row] = F.from_int((good + 1) * F.R % F.modulus)
                cols[self.evm.c_pc] = arr
            return cols

    failures = MockProver(K, Corrupt(b, codes, txs)).verify()
    assert any("bytecode binding" in f or "pc step" in f for f in failures), (
        failures
    )


def test_super_circuit_cross_corruption():
    b, codes, txs = _witness()

    class Corrupt(SuperCircuit):
        def synthesize(self, phase, n, challenges, instances):
            cols = super().synthesize(phase, n, challenges, instances)
            if phase == 1:
                from zkevm_circuits_tpu.crypto.field import fr
                F = fr()
                arr = np.array(cols[self.evm.c_val_a])
                row = next(
                    i for i, s in enumerate(self.evm.steps)
                    if s.exec_state == "POP"
                )
                arr[row] = F.from_int(0xBAD * F.R % F.modulus)
                cols[self.evm.c_val_a] = arr
            return cols

    failures = MockProver(K, Corrupt(b, codes, txs)).verify()
    assert any("rw bus" in f for f in failures), failures


def test_super_circuit_full_composition():
    """All witness-gated subsystems at once: Copy (CALLDATACOPY), Exp,
    Keccak (code hash + PI statement), PI instance, Poseidon — one CS,
    shared challenge, cross-circuit lookups live.  K=13 fits the keccak
    permutations (1 code block + 2 PI blocks)."""
    from zkevm_circuits_tpu.circuits.pi import PublicData
    from zkevm_circuits_tpu.circuits.poseidon import PoseidonEvent
    from zkevm_circuits_tpu.crypto.keccak import keccak256

    code = (
        Bytecode()
        .push(1, 4).push(1, 0).push(1, 0).op("CALLDATACOPY")  # copy 4 bytes
        .push(1, 4).push(1, 0).op("SHA3").op("POP")   # keccak(mem[0:4])
        .push(1, 3).push(1, 2).op("EXP").op("POP")            # 2^3
        .push(1, 5).push(2, 0x1234).op("ADD").op("POP").op("STOP")
    )
    calldata = bytes([0xAA, 0xBB, 0xCC, 0xDD])
    txs = [Transaction(nonce=0, to=CONTRACT, data=calldata, chain_id=1337).sign(SK)]
    sender = txs[0].recover_sender()
    state = StateDB(
        {sender: Account(balance=10**18), CONTRACT: Account(code=code.to_bytes())}
    )
    tr = Interpreter(state).run_tx(Tx(from_addr=sender, to=CONTRACT, data=calldata))
    assert not tr.failed
    b = CircuitInputBuilder()
    b.handle_tx(
        dict(from_addr=sender, to_addr=CONTRACT, value=0, calldata=calldata), tr
    )
    assert b.copy_events and b.exp_events
    pd = PublicData(
        chain_id=1337,
        prev_state_root=keccak256(b"prev"),
        post_state_root=keccak256(b"post"),
        withdraw_root=keccak256(b"w"),
        data_hash=keccak256(b"d"),
    )
    pos = [PoseidonEvent(domain=0, in0=1, in1=2)]
    circ = SuperCircuit(b, [code], txs, public_data=pd, poseidon_events=pos)
    MockProver(13, circ, [pd.instance()]).assert_satisfied()


CALLEE = 0xBEEF


def _nested_call_witness(callee_code=None, call_op="CALL"):
    from zkevm_circuits_tpu.crypto.keccak import keccak256

    if callee_code is None:
        # callee returns 32 bytes = 0x2A
        callee_code = (
            Bytecode().push(1, 42).push(1, 0).op("MSTORE")
            .push(1, 32).push(1, 0).op("RETURN")
        )
    caller = Bytecode().push(1, 32).push(1, 0)   # retLen, retOff
    caller.push(1, 0).push(1, 0)                 # argsLen, argsOff
    if call_op == "CALL":
        caller.push(1, 0)                        # value
    caller.push(2, CALLEE).push(2, 0xFFFF).op(call_op)
    caller.op("POP").push(1, 0).op("MLOAD").op("POP").op("STOP")
    txs = [Transaction(nonce=0, to=CONTRACT, chain_id=1337).sign(SK)]
    sender = txs[0].recover_sender()
    state = StateDB({
        sender: Account(balance=10**18),
        CONTRACT: Account(code=caller.to_bytes()),
        CALLEE: Account(code=callee_code.to_bytes()),
    })
    tr = Interpreter(state).run_tx(Tx(from_addr=sender, to=CONTRACT))
    assert not tr.failed
    hashes = {
        CONTRACT: int.from_bytes(keccak256(caller.to_bytes()), "big"),
        CALLEE: int.from_bytes(keccak256(callee_code.to_bytes()), "big"),
    }
    b = CircuitInputBuilder()
    b.handle_tx(
        dict(from_addr=sender, to_addr=CONTRACT, value=0, calldata=b"",
             code_hash=hashes[CONTRACT]),
        tr, code_hashes=hashes,
    )
    return b, [caller, callee_code], txs


def test_super_circuit_nested_call():
    """CALL into a contract that returns data; the caller MLOADs the
    returned word — exercises frame switch, restoration, the memory->
    memory return-data copy, and cross-frame code-hash binding."""
    b, codes, txs = _nested_call_witness()
    kinds = [s.exec_state for s in b.steps]
    assert "CALL" in kinds and "RET" in kinds
    circ = SuperCircuit(b, codes, txs)
    assert circ.bind_bytecode and circ.copy is not None
    MockProver(K, circ).assert_satisfied()


def test_super_circuit_staticcall_stop():
    """STATICCALL into a callee that just STOPs (no return data)."""
    callee = Bytecode().op("STOP")
    b, codes, txs = _nested_call_witness(callee, call_op="STATICCALL")
    kinds = [s.exec_state for s in b.steps]
    assert "CALL" in kinds and "RET" in kinds
    MockProver(K, SuperCircuit(b, codes, txs)).assert_satisfied()


def test_super_circuit_codecopy():
    """CODECOPY binds copied bytes to the Bytecode circuit's table
    (including zero padding past the code end)."""
    from zkevm_circuits_tpu.crypto.keccak import keccak256

    code = (
        Bytecode()
        .push(1, 8).push(1, 2).push(1, 0).op("CODECOPY")  # 8 bytes from 2
        .push(1, 0).op("MLOAD").op("POP").op("STOP")
    )
    txs = [Transaction(nonce=0, to=CONTRACT, chain_id=1337).sign(SK)]
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
        tr, code_db={CONTRACT: code.to_bytes()},
    )
    assert any(ev.src_type == "bytecode" for ev in b.copy_events)
    MockProver(K, SuperCircuit(b, [code], txs)).assert_satisfied()


def test_super_circuit_codecopy_with_padding():
    """CODECOPY reaching past the code end writes zero bytes (pad rows)."""
    from zkevm_circuits_tpu.crypto.keccak import keccak256

    code = (
        Bytecode()
        .push(1, 32).push(1, 4).push(1, 0).op("CODECOPY").op("STOP")
    )
    txs = [Transaction(nonce=0, to=CONTRACT, chain_id=1337).sign(SK)]
    sender = txs[0].recover_sender()
    state = StateDB(
        {sender: Account(balance=10**18),
         CONTRACT: Account(code=code.to_bytes())}
    )
    tr = Interpreter(state).run_tx(Tx(from_addr=sender, to=CONTRACT))
    b = CircuitInputBuilder()
    b.handle_tx(
        dict(from_addr=sender, to_addr=CONTRACT, value=0, calldata=b"",
             code_hash=int.from_bytes(keccak256(code.to_bytes()), "big")),
        tr, code_db={CONTRACT: code.to_bytes()},
    )
    MockProver(K, SuperCircuit(b, [code], txs)).assert_satisfied()


def test_super_circuit_returndata_ops():
    """RETURNDATASIZE + RETURNDATACOPY read the last callee's output."""
    from zkevm_circuits_tpu.crypto.keccak import keccak256

    callee = (
        Bytecode().push(1, 42).push(1, 0).op("MSTORE")
        .push(1, 32).push(1, 0).op("RETURN")
    )
    caller = Bytecode().push(1, 0).push(1, 0)    # retLen=0: force RDC use
    caller.push(1, 0).push(1, 0).push(1, 0)
    caller.push(2, CALLEE).push(2, 0xFFFF).op("CALL").op("POP")
    caller.op("RETURNDATASIZE").op("POP")
    caller.push(1, 32).push(1, 0).push(1, 64).op("RETURNDATACOPY")
    caller.push(1, 64).op("MLOAD").op("POP").op("STOP")
    txs = [Transaction(nonce=0, to=CONTRACT, chain_id=1337).sign(SK)]
    sender = txs[0].recover_sender()
    state = StateDB({
        sender: Account(balance=10**18),
        CONTRACT: Account(code=caller.to_bytes()),
        CALLEE: Account(code=callee.to_bytes()),
    })
    tr = Interpreter(state).run_tx(Tx(from_addr=sender, to=CONTRACT))
    assert not tr.failed
    hashes = {
        CONTRACT: int.from_bytes(keccak256(caller.to_bytes()), "big"),
        CALLEE: int.from_bytes(keccak256(callee.to_bytes()), "big"),
    }
    b = CircuitInputBuilder()
    b.handle_tx(
        dict(from_addr=sender, to_addr=CONTRACT, value=0, calldata=b"",
             code_hash=hashes[CONTRACT]),
        tr, code_hashes=hashes,
    )
    kinds = [s.exec_state for s in b.steps]
    assert "RETURNDATASIZE" in kinds and "RETURNDATACOPY" in kinds
    # the MLOAD result is the callee's word, delivered via RDC
    mload = b.steps[kinds.index("MLOAD")]
    assert b.rws.rws[mload.rw_indices[-1] ].value == 42
    MockProver(K, SuperCircuit(b, [caller, callee], txs)).assert_satisfied()


def test_super_circuit_catches_wrong_return_data():
    """A tampered byte in the caller's received return data must break
    the copy<->rw-bus binding."""
    b, codes, txs = _nested_call_witness()

    class Corrupt(SuperCircuit):
        def synthesize(self, phase, n, challenges, instances):
            cols = super().synthesize(phase, n, challenges, instances)
            if phase == 0:
                from zkevm_circuits_tpu.crypto.field import fr
                F = fr()
                arr = np.array(cols[self.copy.c_byte])
                good = F.to_int(np.asarray(F.from_mont(arr[31])))
                arr[31] = F.from_int((good ^ 0xFF) * F.R % F.modulus)
                cols[self.copy.c_byte] = arr
            return cols

    failures = MockProver(K, Corrupt(b, codes, txs)).verify()
    assert failures


def test_super_circuit_log_opcodes():
    """LOG0..LOG2: TxLog address/topic rows + memory->TxLog data copy."""
    code = (
        Bytecode()
        .push(1, 0xAB).push(1, 0).op("MSTORE8")
        .push(1, 0xCD).push(1, 1).op("MSTORE8")
        .push(1, 2).push(1, 0).op("LOG0")                 # 2 data bytes
        .push(2, 0x1234).push(1, 0).push(1, 0).op("LOG1")  # topic, no data
        .push(2, 0xBEEF).push(2, 0xF00D)
        .push(1, 2).push(1, 0).op("LOG2")                 # 2 topics + data
        .op("STOP")
    )
    b, codes, txs = _witness(code)
    from zkevm_circuits_tpu.witness.rw import RwTag
    log_rows = [r for r in b.rws.rws if r.tag == RwTag.TxLog]
    assert len(log_rows) == (1 + 0 + 2) + (1 + 1 + 0) + (1 + 2 + 2)
    circ = SuperCircuit(b, codes, txs)
    MockProver(K, circ).assert_satisfied()


def test_super_circuit_catches_wrong_log_topic():
    code = (
        Bytecode()
        .push(2, 0x1234).push(1, 0).push(1, 0).op("LOG1").op("STOP")
    )
    b, codes, txs = _witness(code)

    class Corrupt(SuperCircuit):
        def synthesize(self, phase, n, challenges, instances):
            cols = super().synthesize(phase, n, challenges, instances)
            if phase == 1:
                from zkevm_circuits_tpu.crypto.field import fr
                F = fr()
                row = next(
                    i for i, s in enumerate(self.evm.steps)
                    if s.op is not None and s.op.is_log
                )
                # claim a different topic value on the LOG row
                arr = np.array(cols[self.evm.c_val_c])
                arr[row] = F.from_int(0x9999 * F.R % F.modulus)
                cols[self.evm.c_val_c] = arr
            return cols

    failures = MockProver(K, Corrupt(b, codes, txs)).verify()
    assert failures


def _mstore_word(code, offset, value):
    code.push(32, value).push(2, offset).op("MSTORE")
    return code


def test_super_circuit_identity_and_ecadd_precompiles():
    """CALL 0x04 (identity) and 0x06 (BN254 add) inline, results MLOADed."""
    from zkevm_circuits_tpu.crypto.curve import G1_GEN, host_g1_add

    G2 = host_g1_add(G1_GEN, G1_GEN)
    code = Bytecode()
    _mstore_word(code, 0, 0x1234)                      # identity input
    code.push(1, 32).push(1, 0x40)                     # retLen=32 retOff=64
    code.push(1, 32).push(1, 0)                        # argsLen=32 argsOff=0
    code.push(1, 0).push(1, 4).push(2, 0xFFFF).op("CALL").op("POP")
    code.push(1, 0x40).op("MLOAD").op("POP")
    _mstore_word(code, 0, G1_GEN[0])
    _mstore_word(code, 32, G1_GEN[1])
    _mstore_word(code, 64, G2[0])
    _mstore_word(code, 96, G2[1])
    code.push(1, 64).push(2, 0x100)                    # retLen=64 retOff
    code.push(1, 128).push(1, 0)                       # argsLen=128 argsOff
    code.push(2, 6).push(2, 0xFFFF).op("STATICCALL").op("POP")
    code.push(2, 0x100).op("MLOAD").op("POP").op("STOP")
    b, codes, txs = _witness(code)
    kinds = [s.exec_state for s in b.steps]
    assert "IDENTITY" in kinds and "ECADD" in kinds
    G3 = host_g1_add(G1_GEN, G2)
    assert b.ecadd_events[0].r == G3
    circ = SuperCircuit(b, codes, txs)
    assert circ.ecc is not None and circ.mulmod is not None
    MockProver(10, circ).assert_satisfied()


def test_super_circuit_ecmul_precompile():
    from zkevm_circuits_tpu.crypto.curve import G1_GEN, host_g1_mul

    k = 0xABCDEF123456789
    code = Bytecode()
    _mstore_word(code, 0, G1_GEN[0])
    _mstore_word(code, 32, G1_GEN[1])
    _mstore_word(code, 64, k)
    code.push(1, 64).push(2, 0x100)
    code.push(1, 96).push(1, 0)
    code.push(2, 7).push(2, 0xFFFF).op("STATICCALL").op("POP").op("STOP")
    b, codes, txs = _witness(code)
    assert b.ecmul_events and b.ecmul_events[0].r == host_g1_mul(G1_GEN, k)
    MockProver(13, SuperCircuit(b, codes, txs)).assert_satisfied()


def test_super_circuit_ecrecover_precompile():
    from zkevm_circuits_tpu.crypto import secp256k1 as secp

    sk = 0x5EED_BEEF_F00D
    z = 0x1122334455667788
    r, s, rec = secp.sign(sk, z.to_bytes(32, "big"))
    expect_addr = secp.eth_address(sk)
    code = Bytecode()
    _mstore_word(code, 0, z)
    _mstore_word(code, 32, 27 + rec)
    _mstore_word(code, 64, r)
    _mstore_word(code, 96, s)
    code.push(1, 32).push(2, 0x100)
    code.push(1, 128).push(1, 0)
    code.push(2, 1).push(2, 0xFFFF).op("STATICCALL").op("POP")
    code.push(2, 0x100).op("MLOAD").op("POP").op("STOP")
    b, codes, txs = _witness(code)
    assert "ECRECOVER" in [st.exec_state for st in b.steps]
    assert b.sig_events and b.sig_events[0].address == expect_addr
    circ = SuperCircuit(b, codes, txs)
    assert circ.sig is not None  # auto-enabled by the precompile
    MockProver(13, circ).assert_satisfied()


def test_super_circuit_catches_wrong_sha3_digest():
    """A SHA3 step claiming a wrong digest byte must miss the KeccakTable
    lookup (the padded-RLC bridge pins the message)."""
    code = (
        Bytecode()
        .push(1, 0xAB).push(1, 0).op("MSTORE8")
        .push(1, 1).push(1, 0).op("SHA3").op("POP").op("STOP")
    )
    b, codes, txs = _witness(code)
    assert b.sha3_inputs == [bytes([0xAB])]

    class Corrupt(SuperCircuit):
        def synthesize(self, phase, n, challenges, instances):
            cols = super().synthesize(phase, n, challenges, instances)
            if phase == 0:
                from zkevm_circuits_tpu.crypto.field import fr
                F = fr()
                row = next(
                    i for i, s in enumerate(self.evm.steps)
                    if s.exec_state == "SHA3"
                )
                # flip digest byte 0 (and va/vc stay the honest values,
                # so the digest-word gate or keccak lookup must break)
                arr = np.array(cols[self.evm.c_bytes_c[0]])
                good = F.to_int(np.asarray(F.from_mont(arr[row])))
                arr[row] = F.from_int((good ^ 1) * F.R % F.modulus)
                cols[self.evm.c_bytes_c[0]] = arr
            return cols

    failures = MockProver(13, Corrupt(b, codes, txs)).verify()
    assert failures


def test_super_circuit_block_context_ops():
    """Block/tx context opcodes bound to the BlockTable / TxTable."""
    from zkevm_circuits_tpu.tracer import BlockEnv

    code = (
        Bytecode()
        .op("TIMESTAMP").op("POP").op("NUMBER").op("POP")
        .op("COINBASE").op("POP").op("GASLIMIT").op("POP")
        .op("CHAINID").op("POP").op("BASEFEE").op("POP")
        .op("DIFFICULTY").op("POP").op("GASPRICE").op("POP")
        .op("ORIGIN").op("POP").op("STOP")
    )
    from zkevm_circuits_tpu.crypto.keccak import keccak256

    env = BlockEnv(number=42, timestamp=1234567, chain_id=1337,
                   difficulty=(1 << 200) + 99)
    txs = [Transaction(nonce=0, to=CONTRACT, chain_id=1337).sign(SK)]
    sender = txs[0].recover_sender()
    state = StateDB(
        {sender: Account(balance=10**18),
         CONTRACT: Account(code=code.to_bytes())}
    )
    tr = Interpreter(state, env).run_tx(
        Tx(from_addr=sender, to=CONTRACT, gas_price=txs[0].gas_price)
    )
    assert not tr.failed
    b = CircuitInputBuilder()
    b.handle_tx(
        dict(from_addr=sender, to_addr=CONTRACT, value=0, calldata=b"",
             code_hash=int.from_bytes(keccak256(code.to_bytes()), "big")),
        tr,
    )
    circ = SuperCircuit(b, [code], txs, block=env)
    assert circ.block is not None
    MockProver(K, circ).assert_satisfied()


def test_super_circuit_with_sig_binding():
    """Full tx-validity chain: RLP sign-hash -> Keccak -> Sig circuit
    ECDSA verification -> recovered sender == TxTable CallerAddress."""
    b, codes, txs = _witness()
    circ = SuperCircuit(b, codes, txs, with_sig=True)
    assert circ.sig is not None and circ.mulmod is not None
    MockProver(13, circ).assert_satisfied()


def test_super_circuit_sig_catches_wrong_sender():
    b, codes, txs = _witness()

    class Corrupt(SuperCircuit):
        def synthesize(self, phase, n, challenges, instances):
            cols = super().synthesize(phase, n, challenges, instances)
            if phase == 1:
                from zkevm_circuits_tpu.crypto.field import fr
                F = fr()
                # CallerAddress row of tx 1 (fixed layout index 4)
                arr = np.array(cols[self.tx.c_value])
                good = F.to_int(np.asarray(F.from_mont(arr[4])))
                arr[4] = F.from_int((good + 1) * F.R % F.modulus)
                cols[self.tx.c_value] = arr
            return cols

    failures = MockProver(13, Corrupt(b, codes, txs, with_sig=True)).verify()
    assert any("sig binding" in f or "rw bus" in f or "begin tx" in f
               for f in failures), failures


def test_super_circuit_full_catches_copy_corruption():
    """Cross-circuit: a copied byte that disagrees with the Tx table's
    calldata must miss the copy->tx lookup."""
    code = (
        Bytecode()
        .push(1, 4).push(1, 0).push(1, 0).op("CALLDATACOPY").op("STOP")
    )
    calldata = bytes([0xAA, 0xBB, 0xCC, 0xDD])
    txs = [Transaction(nonce=0, to=CONTRACT, data=calldata, chain_id=1337).sign(SK)]
    sender = txs[0].recover_sender()
    state = StateDB(
        {sender: Account(balance=10**18), CONTRACT: Account(code=code.to_bytes())}
    )
    tr = Interpreter(state).run_tx(Tx(from_addr=sender, to=CONTRACT, data=calldata))
    b = CircuitInputBuilder()
    b.handle_tx(
        dict(from_addr=sender, to_addr=CONTRACT, value=0, calldata=calldata), tr
    )

    class Corrupt(SuperCircuit):
        def synthesize(self, phase, n, challenges, instances):
            cols = super().synthesize(phase, n, challenges, instances)
            if phase == 1:
                from zkevm_circuits_tpu.crypto.field import fr
                F = fr()
                # tx table claims a different calldata byte than the copy
                arr = np.array(cols[self.tx.c_value])
                # calldata rows start after the fixed-field region
                from zkevm_circuits_tpu.circuits.tx import FIXED_TAGS

                row = self.tx.params.max_txs * len(FIXED_TAGS)
                arr[row] = F.from_int(0x99 * F.R % F.modulus)
                cols[self.tx.c_value] = arr
            return cols

    failures = MockProver(K, Corrupt(b, [code], txs)).verify()
    assert failures


def test_super_circuit_sha256_precompile():
    import hashlib

    msg = bytes(range(40))  # 40-byte message crosses no block boundary
    code = Bytecode()
    for i in range(0, 40, 32):
        chunk = int.from_bytes(msg[i:i + 32].ljust(32, b"\x00"), "big")
        _mstore_word(code, i, chunk)
    code.push(1, 32).push(2, 0x100)
    code.push(1, 40).push(1, 0)
    code.push(2, 2).push(2, 0xFFFF).op("STATICCALL").op("POP")
    code.push(2, 0x100).op("MLOAD").op("POP").op("STOP")
    b, codes, txs = _witness(code)
    assert b.sha256_inputs == [msg]
    circ = SuperCircuit(b, codes, txs)
    assert circ.sha256 is not None
    MockProver(10, circ).assert_satisfied()


def test_super_circuit_sha256_empty_input():
    import hashlib

    code = Bytecode()
    code.push(1, 32).push(2, 0x100)
    code.push(1, 0).push(1, 0)
    code.push(2, 2).push(2, 0xFFFF).op("STATICCALL").op("POP").op("STOP")
    b, codes, txs = _witness(code)
    assert b.sha256_inputs == [b""]
    MockProver(10, SuperCircuit(b, codes, txs)).assert_satisfied()


def test_super_circuit_modexp_precompile():
    b_v, e_v, m_v = 0x1234, 0x1001, (1 << 200) + 7
    code = Bytecode()
    _mstore_word(code, 0, 32)
    _mstore_word(code, 32, 32)
    _mstore_word(code, 64, 32)
    _mstore_word(code, 96, b_v)
    _mstore_word(code, 128, e_v)
    _mstore_word(code, 160, m_v)
    code.push(1, 32).push(2, 0x200)
    code.push(1, 192).push(1, 0)
    code.push(2, 5).push(2, 0xFFFF).op("STATICCALL").op("POP")
    code.push(2, 0x200).op("MLOAD").op("POP").op("STOP")
    b, codes, txs = _witness(code)
    assert b.modexp_events and b.modexp_events[0].result == pow(b_v, e_v, m_v)
    circ = SuperCircuit(b, codes, txs)
    assert circ.modexp is not None
    MockProver(13, circ).assert_satisfied()


def test_super_circuit_create_keccak_bound():
    """CREATE at super-circuit level: the derived address's keccak
    preimage (rlp([sender, nonce])) is looked up LIVE in the composed
    KeccakTable, the init frame executes against the Bytecode table,
    and the code deposit lands (reference execution/create.rs)."""
    from zkevm_circuits_tpu.crypto.keccak import keccak256

    deployed = bytes([0x60, 0x01, 0x50, 0x00])  # PUSH1 1; POP; STOP
    init = Bytecode()
    init.push(32, int.from_bytes(deployed.ljust(32, b"\x00"), "big"))
    init.push(1, 0).op("MSTORE")
    init.push(1, len(deployed)).push(1, 0).op("RETURN")
    initb = init.to_bytes()
    creator = Bytecode()
    for i in range(0, len(initb), 32):
        chunk = initb[i : i + 32].ljust(32, b"\x00")
        creator.push(32, int.from_bytes(chunk, "big")).push(1, i)
        creator.op("MSTORE")
    creator.push(1, len(initb)).push(1, 0).push(1, 0).op("CREATE")
    creator.op("POP").op("STOP")
    b, codes, txs = _witness(creator)
    assert any(len(p) == 23 for p in b.sha3_inputs)
    # the init code must be registered so the frame's opcode binding holds
    circ = SuperCircuit(b, codes + [init], txs)
    assert circ.keccak is not None  # auto-enabled by sha3_inputs
    MockProver(13, circ).assert_satisfied()


def test_super_circuit_blockhash_bound():
    """BLOCKHASH pushes ride the BlockTable's 256-row BlockHash region
    (reference execution/blockhash.rs); a wrong claimed hash must miss."""
    from zkevm_circuits_tpu.tracer.evm import BlockEnv

    H299 = int.from_bytes(b"\x11" * 32, "big")
    env = BlockEnv(number=300, prev_hashes={299: H299})
    code = (
        Bytecode()
        .push(2, 299).op("BLOCKHASH").op("POP")   # in-window, known hash
        .push(2, 298).op("BLOCKHASH").op("POP")   # in-window, unknown -> 0
        .push(1, 3).op("BLOCKHASH").op("POP")     # below window -> 0
        .push(2, 500).op("BLOCKHASH").op("POP")   # future -> 0
        .op("STOP")
    )
    txs = [Transaction(nonce=0, to=CONTRACT, chain_id=1337).sign(SK)]
    sender = txs[0].recover_sender()
    state = StateDB(
        {sender: Account(balance=10**18),
         CONTRACT: Account(code=code.to_bytes())}
    )
    tr = Interpreter(state, block=env).run_tx(Tx(from_addr=sender, to=CONTRACT))
    assert not tr.failed
    from zkevm_circuits_tpu.crypto.keccak import keccak256

    b = CircuitInputBuilder()
    b.handle_tx(
        dict(from_addr=sender, to_addr=CONTRACT, value=0, calldata=b"",
             code_hash=int.from_bytes(keccak256(code.to_bytes()), "big")),
        tr,
    )
    by_ctr = {r.rw_counter: r for r in b.rws.rws}
    bh_vals = [
        by_ctr[s.rw_indices[1]].value
        for s in b.steps if s.exec_state == "BLOCKHASH"
    ]
    assert bh_vals[0] == H299 and bh_vals[1:] == [0, 0, 0]
    circ = SuperCircuit(b, [code], txs, block=env)
    MockProver(K, circ).assert_satisfied()

    class Corrupt(SuperCircuit):
        def synthesize(self, phase, n, challenges, instances):
            cols = super().synthesize(phase, n, challenges, instances)
            if phase == 0:
                from zkevm_circuits_tpu.crypto.field import fr
                F = fr()
                # move the claimed ancestor number to a different row of
                # the window: the (number, hash) pair no longer matches
                row = next(
                    i for i, s in enumerate(self.evm.steps)
                    if s.exec_state == "BLOCKHASH"
                )
                arr = np.array(cols[self.evm.c_bytes_a[0]])
                arr[row] = F.from_int((298 & 0xFF) * F.R % F.modulus)
                cols[self.evm.c_bytes_a[0]] = arr
            return cols

    failures = MockProver(
        K, Corrupt(b, [code], txs, block=env)
    ).verify()
    assert failures, "wrong BLOCKHASH number/hash pair must fail"
