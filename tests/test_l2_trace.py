"""L2 block-trace ingestion: a self-contained BlockTrace JSON builds the
full block witness without a live tracer (reference
bus-mapping/src/circuit_input_builder/l2.rs:345 `new_from_l2_trace`).
"""

import json

import pytest

from zkevm_circuits_tpu.circuits.evm import EvmCircuit, EvmParams
from zkevm_circuits_tpu.crypto.keccak import keccak256
from zkevm_circuits_tpu.plonk.mock import MockProver
from zkevm_circuits_tpu.tracer import Account, Interpreter, StateDB, Tx
from zkevm_circuits_tpu.tracer.evm import BlockEnv
from zkevm_circuits_tpu.types import Bytecode
from zkevm_circuits_tpu.witness.builder import CircuitInputBuilder
from zkevm_circuits_tpu.witness.l2 import (
    BlockTrace, accounts_before_fields, builder_from_l2_trace,
)

K = 10
SENDER, CONTRACT = 0xA11CE, 0xB0B


def _fixture():
    """Produce a BlockTrace JSON the way a sequencer would (here: via the
    in-repo tracer), then FORGET the tracer."""
    code = (
        Bytecode()
        .push(1, 0x2A).push(1, 5).op("SSTORE")
        .push(1, 5).op("SLOAD").op("POP")
        .op("STOP")
    )
    ch = int.from_bytes(keccak256(code.to_bytes()), "big")
    env = BlockEnv(number=42, coinbase=0xC01, base_fee=7)
    state = StateDB(
        {SENDER: Account(balance=10**18),
         CONTRACT: Account(code=code.to_bytes(), storage={5: 7})}
    )
    interp = Interpreter(state, block=env)
    traces = [
        interp.run_tx(Tx(from_addr=SENDER, to=CONTRACT)).to_json()
        for _ in range(2)
    ]
    return json.dumps({
        "chain_id": 1337, "coinbase": hex(0xC01), "number": 42,
        "timestamp": 1000, "gas_limit": 30_000_000, "base_fee": 7,
        "accounts_before": {
            hex(SENDER): {"nonce": 0, "balance": hex(10**18),
                          "code_hash": "0x0"},
            hex(CONTRACT): {"nonce": 0, "balance": 0,
                            "code_hash": hex(ch)},
        },
        "storage_before": {hex(CONTRACT): {"0x5": "0x7"}},
        "codes": {hex(ch): "0x" + code.to_bytes().hex()},
        "transactions": [
            {"from": hex(SENDER), "to": hex(CONTRACT), "value": 0,
             "gas": 1_000_000, "gas_price": 10, "calldata": "0x"}
            for _ in range(2)
        ],
        "execution_results": traces,
    }), code


def test_l2_trace_builds_witness():
    js, code = _fixture()
    bt = BlockTrace.from_json(js)
    b = builder_from_l2_trace(bt)
    assert len(b.txs) == 2
    states = [s.exec_state for s in b.steps]
    assert states.count("BeginTx") == 2 and states.count("EndTx") == 2
    # committed storage of tx2's SSTORE group reflects tx1's write
    from zkevm_circuits_tpu.witness.rw import RwTag

    stor = [r for r in b.rws.rws if r.tag == RwTag.Storage and r.is_write]
    assert stor[0].value_prev == 7      # pre-block committed value
    MockProver(
        K, EvmCircuit(b.steps, b.rws.rws,
                      EvmParams(target_steps=60, rw_target=512))
    ).assert_satisfied()


def test_l2_trace_two_level_state():
    """The ingested block feeds the two-level trie witness directly."""
    from zkevm_circuits_tpu.witness.mpt import two_level_updates_from_rws

    js, code = _fixture()
    bt = BlockTrace.from_json(js)
    b = builder_from_l2_trace(bt)
    before = accounts_before_fields(bt)
    storage, groups, accounts, (atrie, subs) = \
        two_level_updates_from_rws(b.rws.rws, before)
    snd = next(au for au in accounts if au.addr == SENDER)
    assert snd.new.nonce == 2  # both txs bump
    con = next(au for au in accounts if au.addr == CONTRACT)
    assert con.new.storage_root != 0


def test_l2_trace_matches_direct_path():
    """Ingestion reproduces the direct (in-process tracer) witness."""
    js, code = _fixture()
    bt = BlockTrace.from_json(js)
    b2 = builder_from_l2_trace(bt)
    # direct path
    ch = int.from_bytes(keccak256(code.to_bytes()), "big")
    env = BlockEnv(number=42, coinbase=0xC01, base_fee=7)
    state = StateDB(
        {SENDER: Account(balance=10**18),
         CONTRACT: Account(code=code.to_bytes(), storage={5: 7})}
    )
    interp = Interpreter(state, block=env)
    b1 = CircuitInputBuilder(
        accounts={SENDER: (0, 10**18, 0), CONTRACT: (0, 0, ch)},
        coinbase=0xC01, base_fee=7,
    )
    committed = {(CONTRACT, 5): 7}
    for _ in range(2):
        tr = interp.run_tx(Tx(from_addr=SENDER, to=CONTRACT))
        b1.handle_tx(
            dict(from_addr=SENDER, to_addr=CONTRACT, value=0,
                 calldata=b"", code_hash=ch),
            tr, committed_storage=dict(committed),
            code_db={CONTRACT: code.to_bytes()},
        )
        committed.update(b1._storage)
    assert len(b1.rws.rws) == len(b2.rws.rws)
    for r1, r2 in zip(b1.rws.rws, b2.rws.rws):
        assert (r1.tag, r1.address, r1.value, r1.value_prev) == \
            (r2.tag, r2.address, r2.value, r2.value_prev)
