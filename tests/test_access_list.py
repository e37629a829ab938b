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
    tr = Interpreter(state).run_tx(tx)
    assert not tr.failed
    b = CircuitInputBuilder()
    b.handle_tx(
        dict(from_addr=SENDER, to_addr=CONTRACT, value=0, calldata=b"",
             access_list=access_list or [], gas_price=tx.gas_price),
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
    # effective price = min(max_fee, base + priority) = base + 3
    assert tx.gas_price == base + 3
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
    tx = Tx(from_addr=SENDER, to=CONTRACT, max_fee_per_gas=base + 2,
            max_priority_fee_per_gas=50)
    tr = it.run_tx(tx)
    assert not tr.failed and tx.gas_price == base + 2
