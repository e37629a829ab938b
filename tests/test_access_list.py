"""EIP-2930 access-list prewarm + EIP-1559 effective gas price.

Reference: begin_tx.rs access-list warming, bus-mapping
begin_tx prewarm rows, core/state_transition.go effective-price rule.
"""

import numpy as np

from zkevm_circuits_tpu.circuits.evm import EvmCircuit, EvmParams
from zkevm_circuits_tpu.crypto.field import fr
from zkevm_circuits_tpu.crypto.params import FR_MODULUS as R
from zkevm_circuits_tpu.plonk.mock import MockProver
from zkevm_circuits_tpu.tracer import Account, Interpreter, StateDB, Tx
from zkevm_circuits_tpu.types import Bytecode
from zkevm_circuits_tpu.witness.builder import CircuitInputBuilder
from zkevm_circuits_tpu.witness.rw import RwTag

F = fr()
K = 9
SENDER, CONTRACT, OTHER = 0xCAFE, 0xC0DE, 0xFEED
PARAMS = EvmParams(target_steps=40, rw_target=256)


def _mont(v: int):
    return F.from_int(v % R * F.R % R)


def _run(code: Bytecode, access_list=None, **tx_kw):
    state = StateDB(
        {SENDER: Account(balance=10**18),
         CONTRACT: Account(code=code.to_bytes()),
         OTHER: Account(balance=5)}
    )
    tx = Tx(from_addr=SENDER, to=CONTRACT,
            access_list=access_list or [], **tx_kw)
    it = Interpreter(state)
    tr = it.run_tx(tx)
    assert not tr.failed
    b = CircuitInputBuilder()
    b.handle_tx(
        dict(from_addr=SENDER, to_addr=CONTRACT, value=0, calldata=b"",
             access_list=access_list or [],
             gas_price=tx.effective_gas_price(it.block.base_fee)),
        tr, code_db={CONTRACT: code.to_bytes()},
    )
    return b, tr, state


def test_prewarm_rows_and_intrinsic_gas():
    code = Bytecode().push(1, 0).op("SLOAD").op("POP").op("STOP")
    al = [(CONTRACT, [0, 7]), (OTHER, [])]
    b, tr, _ = _run(code, access_list=al)
    begin = b.steps[0]
    # 21000 + 2400*2 + 1900*2 intrinsic
    assert begin.gas_cost == 21000 + 2 * 2400 + 2 * 1900
    assert begin.al_count == 4 and begin.al_gas == 2 * 2400 + 2 * 1900
    by_ctr = {r.rw_counter: r for r in b.rws.rws}
    al_rows = [by_ctr[i] for i in begin.rw_indices[-begin.al_count:]]
    assert [r.tag for r in al_rows] == [
        RwTag.TxAccessListAccount, RwTag.TxAccessListAccountStorage,
        RwTag.TxAccessListAccountStorage, RwTag.TxAccessListAccount,
    ]
    # CONTRACT was already warm (it is the callee); OTHER was cold
    assert al_rows[0].value_prev == 1 and al_rows[3].value_prev == 0
    MockProver(K, EvmCircuit(b.steps, b.rws.rws, PARAMS)).assert_satisfied()


def test_prewarmed_slot_charges_warm_gas():
    code = Bytecode().push(1, 7).op("SLOAD").op("POP").op("STOP")
    b_cold, _, _ = _run(code)
    b_warm, _, _ = _run(code, access_list=[(CONTRACT, [7])])
    sload_cold = next(s for s in b_cold.steps if s.exec_state == "SLOAD")
    sload_warm = next(s for s in b_warm.steps if s.exec_state == "SLOAD")
    assert sload_cold.gas_cost == 2100 and sload_warm.gas_cost == 100
    MockProver(
        K, EvmCircuit(b_warm.steps, b_warm.rws.rws, PARAMS)
    ).assert_satisfied()


def test_al_count_forgery_rejected():
    code = Bytecode().op("STOP")
    b, _, _ = _run(code, access_list=[(OTHER, [1])])

    class C(EvmCircuit):
        def synthesize(self, phase, n, challenges, instances):
            cols = super().synthesize(phase, n, challenges, instances)
            if phase == 0:
                arr = np.asarray(cols[self.c_gas_aux]).copy()
                arr[0] = _mont(0)  # claim zero prewarm rows on BeginTx
                cols[self.c_gas_aux] = arr
            return cols

    failures = MockProver(K, C(b.steps, b.rws.rws, PARAMS)).verify()
    assert failures, "al_count forgery must break the BEGIN_TX rwc step"


def test_effective_gas_price_1559():
    code = Bytecode().op("GASPRICE").op("POP").op("STOP")
    state = StateDB(
        {SENDER: Account(balance=10**18),
         CONTRACT: Account(code=code.to_bytes())}
    )
    it = Interpreter(state)
    base = it.block.base_fee
    tx = Tx(from_addr=SENDER, to=CONTRACT, max_fee_per_gas=base + 100,
            max_priority_fee_per_gas=3)
    cb_before = state.account(it.block.coinbase).balance
    tr = it.run_tx(tx)
    assert not tr.failed
    # effective price = min(max_fee, base + priority) = base + 3;
    # the caller's Tx is never mutated (stale-price hazard)
    assert tx.gas_price == Tx(from_addr=0, to=0).gas_price
    assert tx.effective_gas_price(base) == base + 3
    gp = next(s for s in tr.struct_logs if s.op.name == "GASPRICE")
    nxt = tr.struct_logs[tr.struct_logs.index(gp) + 1]
    assert nxt.stack[-1] == base + 3
    # coinbase earns only the priority fee
    assert state.account(it.block.coinbase).balance - cb_before \
        == 3 * tr.gas


def test_effective_price_capped_by_max_fee():
    code = Bytecode().op("STOP")
    state = StateDB(
        {SENDER: Account(balance=10**18),
         CONTRACT: Account(code=code.to_bytes())}
    )
    it = Interpreter(state)
    base = it.block.base_fee
    # tip <= cap (valid) but base + tip > cap: price caps at max_fee
    tx = Tx(from_addr=SENDER, to=CONTRACT, max_fee_per_gas=base + 2,
            max_priority_fee_per_gas=base + 2)
    tr = it.run_tx(tx)
    assert not tr.failed
    assert tx.effective_gas_price(base) == base + 2
    gas_cost = (10**18 - state.account(SENDER).balance)
    assert gas_cost == tr.gas * (base + 2)


def test_tip_above_fee_cap_rejected():
    """geth preCheck ErrTipAboveFeeCap: consensus-invalid on mainnet —
    the tracer must reject, not silently execute at the fee cap."""
    import pytest

    code = Bytecode().op("STOP")
    state = StateDB(
        {SENDER: Account(balance=10**18),
         CONTRACT: Account(code=code.to_bytes())}
    )
    it = Interpreter(state)
    base = it.block.base_fee
    tx = Tx(from_addr=SENDER, to=CONTRACT, max_fee_per_gas=base + 2,
            max_priority_fee_per_gas=50)
    with pytest.raises(ValueError, match="priority fee"):
        it.run_tx(tx)
    # fee cap below base fee also rejected (ErrFeeCapTooLow)
    tx = Tx(from_addr=SENDER, to=CONTRACT, max_fee_per_gas=base - 1)
    with pytest.raises(ValueError, match="base fee"):
        it.run_tx(tx)
    # balance check is against cap * gas + value, not effective price
    poor = 0xB0B
    state.account(poor).balance = 21000 * (base + 1)
    tx = Tx(from_addr=poor, to=CONTRACT, gas=21000,
            max_fee_per_gas=base + 100, max_priority_fee_per_gas=1)
    with pytest.raises(ValueError, match="insufficient funds"):
        it.run_tx(tx)


def test_access_list_and_error_rows_through_state_circuit():
    """ADVICE r3: the TxAccessListAccountStorage rows and the err-RET rw
    sequences were only ever proven through EvmCircuit — run both row
    kinds through the StateCircuit's ordering/value_prev rules too."""
    from zkevm_circuits_tpu.circuits.state import StateCircuit, StateParams

    sp = StateParams(limb_bits=4, id_bits=8, addr_bits=16, key_bits=16,
                     rwc_bits=8, target_rows=160)

    # access-list tx: prewarm account + storage-key rows
    code = Bytecode().push(1, 0).op("SLOAD").op("POP").op("STOP")
    b, _, _ = _run(code, access_list=[(CONTRACT, [0, 7]), (OTHER, [])])
    tags = {r.tag for r in b.rws.rws}
    assert RwTag.TxAccessListAccountStorage in tags
    MockProver(11, StateCircuit(b.rws, sp)).assert_satisfied()

    # nested errored frame: err-RET unwinding rws
    callee = Bytecode().op("ADD")  # stack underflow in the callee
    caller = Bytecode().push(1, 0).push(1, 0).push(1, 0).push(1, 0)
    caller.push(1, 0).push(3, OTHER).push(2, 0xFFFF).op("CALL")
    caller.op("POP").op("STOP")
    state = StateDB({
        SENDER: Account(balance=10**18),
        CONTRACT: Account(code=caller.to_bytes()),
        OTHER: Account(code=callee.to_bytes()),
    })
    tr = Interpreter(state).run_tx(Tx(from_addr=SENDER, to=CONTRACT))
    assert not tr.failed  # error is swallowed by the caller
    b2 = CircuitInputBuilder()
    b2.handle_tx(
        dict(from_addr=SENDER, to_addr=CONTRACT, value=0, calldata=b""),
        tr, code_db={CONTRACT: caller.to_bytes(), OTHER: callee.to_bytes()},
    )
    assert any("ERR" in s.exec_state for s in b2.steps)
    MockProver(11, StateCircuit(b2.rws, sp)).assert_satisfied()
