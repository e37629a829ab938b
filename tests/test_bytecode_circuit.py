"""Bytecode circuit tests (mock prover; k=9 to fit the 256-row push table)."""

import numpy as np
import pytest

from zkevm_circuits_tpu.circuits.bytecode import BytecodeCircuit, BytecodeParams
from zkevm_circuits_tpu.plonk.mock import MockProver
from zkevm_circuits_tpu.types import Bytecode

K = 9


def _codes():
    a = Bytecode().push(1, 5).push(2, 0x1234).op("ADD").op("STOP")
    b = Bytecode().push(1, 7).op("DUP1").op("MUL").op("POP").op("STOP")
    # truncated push data at the end of code (valid EVM)
    c = Bytecode(bytes([0x61, 0xAB]))  # PUSH2 with 1 data byte
    return [a, b, c]


def test_bytecode_circuit_satisfied():
    MockProver(K, BytecodeCircuit(_codes())).assert_satisfied()


def test_bytecode_circuit_empty_code():
    MockProver(K, BytecodeCircuit([Bytecode()])).assert_satisfied()


def test_bytecode_circuit_catches_bad_is_code():
    class Corrupt(BytecodeCircuit):
        def _rows(self, n):
            rows = super()._rows(n)
            # flip an is_code mark on a push-data byte (row after PUSH1 05's
            # header: header, PUSH1(code), 05(data) -> index 2 of rows)
            bad = list(rows)
            r = list(bad[2])
            assert r[0] == 1 and r[4] == 0  # byte row, is_data
            r[4] = 1  # claim push data is code
            bad[2] = tuple(r)
            return bad

    failures = MockProver(K, Corrupt(_codes())).verify()
    assert failures


def test_bytecode_circuit_catches_bad_length():
    class Corrupt(BytecodeCircuit):
        def _rows(self, n):
            rows = super()._rows(n)
            bad = list(rows)
            r = list(bad[0])
            r[2] = r[3] = 99  # header claims wrong length
            bad[0] = tuple(r)
            return bad

    failures = MockProver(K, Corrupt(_codes())).verify()
    # header length diverges from the byte rows' carried length
    assert failures


def test_bytecode_circuit_catches_bad_byte_range():
    class Corrupt(BytecodeCircuit):
        def _rows(self, n):
            rows = super()._rows(n)
            bad = list(rows)
            r = list(bad[1])
            r[3] = 300  # byte value out of range
            bad[1] = tuple(r)
            return bad

    failures = MockProver(K, Corrupt(_codes())).verify()
    assert any("push table" in f for f in failures), failures
