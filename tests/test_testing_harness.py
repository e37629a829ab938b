"""End-to-end harness test: TestContext -> tracer -> builder -> circuits.

The analogue of the reference's per-opcode CircuitTestBuilder tests
(SURVEY.md §4.2) for the currently-implemented circuit set.
"""

from zkevm_circuits_tpu.testing import CircuitTestBuilder
from zkevm_circuits_tpu.types import Bytecode
from zkevm_circuits_tpu.witness.test_ctx import MOCK_ACCOUNTS, TestContext

CONTRACT = MOCK_ACCOUNTS[1]


def test_harness_arith_memory_storage():
    code = (
        Bytecode()
        .push(1, 5).push(1, 7).op("ADD")
        .push(1, 0).op("MSTORE")
        .push(1, 3).push(1, 1).op("SSTORE")
        .push(1, 1).op("SLOAD").op("POP")
        .push(1, 0).op("MLOAD").op("POP")
        .op("STOP")
    )
    ctx = TestContext().account(CONTRACT, code=code).tx(to=CONTRACT)
    CircuitTestBuilder(ctx).run()


def test_harness_existing_storage():
    code = Bytecode().push(1, 1).op("SLOAD").op("POP").op("STOP")
    ctx = (
        TestContext()
        .account(CONTRACT, code=code, storage={1: 42})
        .tx(to=CONTRACT)
    )
    CircuitTestBuilder(ctx).run()


def test_harness_negative_corrupt_rw():
    from zkevm_circuits_tpu.witness.rw import RwTag

    def corrupt(builder):
        for r in builder.rws.rws:
            if r.tag == RwTag.Stack and not r.is_write:
                r.value = (r.value + 1) % (1 << 16)
                break

    code = Bytecode().push(1, 5).push(1, 7).op("ADD").op("POP").op("STOP")
    ctx = TestContext().account(CONTRACT, code=code).tx(to=CONTRACT)
    b = CircuitTestBuilder(ctx).block_modifier(corrupt)
    import pytest

    with pytest.raises(AssertionError):
        b.run()
