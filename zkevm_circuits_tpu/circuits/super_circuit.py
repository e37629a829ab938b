"""SuperCircuit — composition of the sub-circuits over shared tables.

Equivalent of the reference's `zkevm-circuits/src/super_circuit.rs`
(SURVEY.md §2.2 "SuperCircuit"): one constraint system containing every
sub-circuit, communicating through shared lookup tables instead of
duplicated witness.

Composition mechanics (TPU-native):
  * Every sub-circuit allocates columns from ONE ConstraintSystem, so
    indices are globally disjoint; fixed/advice witness is merged by
    column index (dict-based `fixed_columns`/`synthesize`).
  * The EVM circuit's bus lookups target the State circuit's RW table via
    recomposition EXPRESSIONS over the State limb columns — no duplicated
    rw columns at all (the reference shares the RwTable struct,
    zkevm-circuits/src/table.rs:577).
  * One shared word-RLC challenge is allocated by the SuperCircuit and
    passed to every sub-circuit (the reference's evm_word challenge,
    zkevm-circuits/src/util.rs:93-106).

Round-1 composition: State + EVM (shared RW table + challenge), Bytecode
and Tx side by side.  The Bytecode<->EVM code lookups and Tx<->EVM
context lookups land as those gadget families grow.
"""

from __future__ import annotations

import dataclasses

from ..plonk.circuit import Circuit, ConstraintSystem
from ..types.bytecode import Bytecode
from ..types.transaction import Transaction
from ..witness.builder import CircuitInputBuilder
from .bytecode import BytecodeCircuit, BytecodeParams
from .evm import EvmCircuit, EvmParams
from .state import StateCircuit, StateParams
from .tx import TxCircuit, TxParams


@dataclasses.dataclass
class SuperParams:
    state: StateParams = dataclasses.field(
        default_factory=lambda: StateParams(
            limb_bits=4, id_bits=8, addr_bits=32, key_bits=16, rwc_bits=12,
            target_rows=200,
        )
    )
    evm: EvmParams = dataclasses.field(
        default_factory=lambda: EvmParams(target_steps=64)
    )
    bytecode: BytecodeParams = dataclasses.field(default_factory=BytecodeParams)
    tx: TxParams = dataclasses.field(default_factory=TxParams)


class SuperCircuit(Circuit):
    def __init__(self, builder: CircuitInputBuilder,
                 bytecodes: list[Bytecode], txs: list[Transaction],
                 params: SuperParams | None = None):
        p = params or SuperParams()
        self.params = p
        self.state = StateCircuit(builder.rws, p.state)
        self.evm = EvmCircuit(builder.steps, builder.rws.rws, p.evm)
        self.bytecode = BytecodeCircuit(bytecodes, p.bytecode)
        self.tx = TxCircuit(txs, p.tx)
        self.subs = [self.state, self.evm, self.bytecode, self.tx]

    def configure(self, cs: ConstraintSystem):
        r_word = cs.challenge(phase=0)
        self.state.configure(cs, challenge=r_word)
        self.evm.configure(
            cs, rw_table=self.state.rw_table_exprs(), challenge=r_word
        )
        self.bytecode.configure(cs)
        self.tx.configure(cs)

    def fixed_columns(self, n: int):
        out = {}
        for sub in self.subs:
            out.update(sub.fixed_columns(n))
        return out

    def copy_constraints(self, n: int):
        out = []
        for sub in self.subs:
            out.extend(sub.copy_constraints(n))
        return out

    def synthesize(self, phase: int, n: int, challenges: dict, instances):
        out = {}
        for sub in self.subs:
            out.update(sub.synthesize(phase, n, challenges, instances))
        return out
