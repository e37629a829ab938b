"""Cross-circuit code-hash binding: Bytecode value_rlc/hash looked up in
the KeccakTable (k=12: keccak permutations need 1600 rows each)."""

import numpy as np
import pytest

from zkevm_circuits_tpu.circuits.bytecode import BytecodeCircuit
from zkevm_circuits_tpu.circuits.keccak import KeccakCircuit
from zkevm_circuits_tpu.plonk.circuit import Circuit, ConstraintSystem
from zkevm_circuits_tpu.plonk.mock import MockProver
from zkevm_circuits_tpu.types import Bytecode

K = 12


class BytecodeKeccak(Circuit):
    """Composite: Keccak sponge + Bytecode with hash binding (the
    SuperCircuit wiring pattern at sub-scale)."""

    def __init__(self, bytecodes, keccak_cls=KeccakCircuit):
        self.bytecodes = bytecodes
        self.keccak = keccak_cls([bc.to_bytes() for bc in bytecodes])
        self.bytecode = BytecodeCircuit(bytecodes)
        self.subs = [self.keccak, self.bytecode]

    def configure(self, cs: ConstraintSystem):
        r = cs.challenge(phase=0)
        self.keccak.configure(cs, challenge=r)
        self.bytecode.configure(
            cs, challenge=r, keccak_table=self.keccak.keccak_table_exprs()
        )

    def fixed_columns(self, n):
        out = {}
        for s in self.subs:
            out.update(s.fixed_columns(n))
        return out

    def synthesize(self, phase, n, challenges, instances):
        out = {}
        for s in self.subs:
            out.update(s.synthesize(phase, n, challenges, instances))
        return out


def test_code_hash_binding_satisfied():
    codes = [Bytecode().push(1, 5).push(1, 7).op("ADD").op("STOP")]
    MockProver(K, BytecodeKeccak(codes)).assert_satisfied()


def test_code_hash_binding_catches_wrong_hash():
    codes = [Bytecode().push(1, 5).op("POP").op("STOP")]

    class Corrupt(BytecodeKeccak):
        def synthesize(self, phase, n, challenges, instances):
            cols = super().synthesize(phase, n, challenges, instances)
            if phase == 1:
                from zkevm_circuits_tpu.crypto.field import fr
                F = fr()
                arr = np.array(cols[self.bytecode.c_hash])
                # claim a wrong code hash on the LAST PAD row (where the
                # keccak binding lookup reads it): header + code + pad - 1
                row = 1 + len(codes[0]) + (136 - len(codes[0])) - 1
                arr[row] = F.from_int(0xDEAD * F.R % F.modulus)
                cols[self.bytecode.c_hash] = arr
            return cols

    failures = MockProver(K, Corrupt(codes)).verify()
    assert any("code hash keccak" in f for f in failures), failures
