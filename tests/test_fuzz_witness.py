"""Randomized bytecode fuzz: tracer -> builder -> EVM-circuit mock.

VERDICT r4 next-step #5's done-criterion: demonstrate that no
`NotImplementedError` is reachable from a tracer-producible trace over
the supported opcode family, by pushing N random programs through the
whole witness pipeline and MockProver-verifying each one (reference
analogue: testool's randomized statetests + bus-mapping's
`test_gen_*` trace fixtures, testool/src/statetest/executor.rs:543).

The generator emits *snippets* (not byte soup) so programs are mostly
valid: memory/copy/log offsets are always explicitly pushed small
(the u64-overflow OOG shape is a documented raise, builder.py:558),
jumps are either provably valid (dest = the JUMPDEST emitted right
after) or intentionally invalid (ERR_JUMP), and a weighted terminal
chooses success / revert / run-off-end / invalid-op / underflow.
Coverage asserts that the seed set exercises both happy and error
endings.
"""

import random

import pytest

from zkevm_circuits_tpu.circuits.copy import CopyCircuit
from zkevm_circuits_tpu.circuits.evm import EvmCircuit, EvmParams
from zkevm_circuits_tpu.plonk.mock import MockProver
from zkevm_circuits_tpu.tracer import Account, Interpreter, StateDB, Tx
from zkevm_circuits_tpu.types import Bytecode
from zkevm_circuits_tpu.witness.builder import CircuitInputBuilder


SENDER, CONTRACT, OTHER = 0xCAFE, 0xC0DE, 0xBEEF

# plain ops safe to emit whenever the virtual stack depth allows: every
# operand is value-typed (never a memory offset), so huge intermediate
# words cannot reach an offset position.
PLAIN = [
    "ADD", "SUB", "MUL", "DIV", "SDIV", "MOD", "SMOD",
    # ADDMOD/MULMOD delegate to the composed MulMod table (SuperCircuit)
    "SIGNEXTEND", "LT", "GT", "SLT", "SGT", "EQ", "ISZERO",
    "AND", "OR", "XOR", "NOT", "BYTE", "SHL", "SHR", "SAR", "POP",
    "ADDRESS", "ORIGIN", "CALLER", "CALLVALUE", "CALLDATASIZE",
    "CODESIZE", "RETURNDATASIZE", "SELFBALANCE",
    "PC", "MSIZE", "GAS", "JUMPDEST",
    # block-env ops (TIMESTAMP/NUMBER/...) need the composed BlockTable
    # and are exercised by the SuperCircuit tests instead
]
ARITY = {  # pops, pushes (subset needed by the generator)
    "ADD": (2, 1), "SUB": (2, 1), "MUL": (2, 1), "DIV": (2, 1),
    "SDIV": (2, 1), "MOD": (2, 1), "SMOD": (2, 1), "ADDMOD": (3, 1),
    "MULMOD": (3, 1), "SIGNEXTEND": (2, 1), "LT": (2, 1), "GT": (2, 1),
    "SLT": (2, 1), "SGT": (2, 1), "EQ": (2, 1), "ISZERO": (1, 1),
    "AND": (2, 1), "OR": (2, 1), "XOR": (2, 1), "NOT": (1, 1),
    "BYTE": (2, 1), "SHL": (2, 1), "SHR": (2, 1), "SAR": (2, 1),
    "POP": (1, 0),
}


def _gen_program(rng: random.Random, n_snippets: int,
                 with_copies: bool = False):
    bc = Bytecode()
    depth = 0

    def push_small(hi=256):
        nonlocal depth
        v = rng.randrange(hi)
        bc.push(2 if v > 0xFF else 1, v)
        depth += 1

    def push_word():
        nonlocal depth
        n = rng.choice([1, 1, 2, 4, 8, 16, 32])
        bc.push(n, rng.getrandbits(8 * n))
        depth += 1

    def ensure(n):
        while depth < n:
            push_word()

    def snippet_plain():
        nonlocal depth
        name = rng.choice(PLAIN)
        pops, pushes = ARITY.get(name, (0, 1))
        ensure(pops)
        bc.op(name)
        depth += pushes - pops

    def snippet_dup_swap():
        nonlocal depth
        if depth == 0:
            push_word()
        n = rng.randrange(1, min(depth, 8) + 1)
        if rng.random() < 0.5:
            bc.op(f"DUP{n}")
            depth += 1
        elif depth >= n + 1:
            bc.op(f"SWAP{n}")

    def snippet_mem():
        nonlocal depth
        kind = rng.choice(["MSTORE", "MSTORE", "MSTORE8", "MLOAD"])
        if kind != "MLOAD":
            ensure(1)
        push_small(512)  # offset on top
        bc.op(kind)
        depth += {"MLOAD": 0, "MSTORE": -2, "MSTORE8": -2}[kind]

    def snippet_storage():
        nonlocal depth
        if rng.random() < 0.5:
            push_small(8)
            bc.op("SLOAD")
        else:
            ensure(1)
            push_small(8)
            bc.op("SSTORE")
            depth -= 2

    def snippet_calldata():
        nonlocal depth
        if not with_copies or rng.random() < 0.5:
            push_small(64)
            bc.op("CALLDATALOAD")
        else:
            push_small(48)   # length
            push_small(64)   # src offset
            push_small(512)  # dst offset (top)
            bc.op("CALLDATACOPY")
            depth -= 3

    def snippet_codecopy():
        nonlocal depth
        push_small(32)
        push_small(64)
        push_small(512)
        bc.op("CODECOPY")
        depth -= 3

    def snippet_log():
        nonlocal depth
        n = rng.randrange(0, 3)
        ensure(n)  # topics
        if with_copies:
            push_small(32)  # length
        else:
            # LOG data needs the Copy table in the standalone EVM mock
            bc.push(1, 0)
            depth += 1
        push_small(128)  # offset (top)
        bc.op(f"LOG{n}")
        depth -= 2 + n

    def snippet_ext():
        nonlocal depth
        bc.push(2, rng.choice([CONTRACT, OTHER, 0x1234]))
        depth += 1
        bc.op(rng.choice(["BALANCE", "EXTCODESIZE", "EXTCODEHASH"]))

    def snippet_jumpi_not_taken():
        nonlocal depth
        bc.push(1, 0)                       # condition = 0
        bc.push(2, rng.randrange(1 << 16))  # dest (never taken)
        bc.op("JUMPI")

    def snippet_jump_valid():
        # dest == pc right after JUMP, where we place a JUMPDEST
        dest = len(bc.code) + 4
        bc.push(2, dest).op("JUMP").op("JUMPDEST")

    table = [
        (snippet_plain, 30), (snippet_dup_swap, 8), (snippet_mem, 10),
        (snippet_storage, 6), (snippet_calldata, 6),
        (snippet_codecopy, 3 if with_copies else 0),
        (snippet_log, 4), (snippet_ext, 3),
        (snippet_jumpi_not_taken, 3), (snippet_jump_valid, 3),
    ]
    fns = [f for f, w in table for _ in range(w)]
    for _ in range(n_snippets):
        rng.choice(fns)()

    # terminal
    t = rng.random()
    if t < 0.35:
        bc.op("STOP")
        ending = "stop"
    elif t < 0.55:
        push_small(64)
        push_small(128)
        bc.op("RETURN")
        ending = "return"
    elif t < 0.70:
        push_small(64)
        push_small(128)
        bc.op("REVERT")
        ending = "revert"
    elif t < 0.80:
        ending = "runoff"  # implicit stop past code end
    elif t < 0.90:
        bc.push(2, 0xFFF0).op("JUMP")  # no JUMPDEST there
        ending = "badjump"
    else:
        bc.append(b"\xfe")  # designated invalid opcode
        ending = "invalid"
    return bc, ending


def _run_seed(seed: int, n_snippets=24, with_copies=False):
    rng = random.Random(seed)
    code, ending = _gen_program(rng, n_snippets, with_copies)
    calldata = bytes(rng.randrange(256) for _ in range(rng.randrange(96)))
    state = StateDB({
        SENDER: Account(balance=10**18),
        CONTRACT: Account(code=code.to_bytes(), balance=777),
        OTHER: Account(balance=5, code=b"\x00"),
    })
    value = rng.randrange(100)
    tr = Interpreter(state).run_tx(Tx(
        from_addr=SENDER, to=CONTRACT, gas=2_000_000,
        value=value, data=calldata,
    ))
    from zkevm_circuits_tpu.crypto.keccak import keccak256
    from zkevm_circuits_tpu.witness.builder import AccountState

    b = CircuitInputBuilder(accounts={
        SENDER: AccountState(balance=10**18),
        CONTRACT: AccountState(
            balance=777,
            code_hash=int.from_bytes(keccak256(code.to_bytes()), "big"),
        ),
        OTHER: AccountState(
            balance=5, code_hash=int.from_bytes(keccak256(b"\x00"), "big"),
        ),
    })
    b.handle_tx(
        dict(from_addr=SENDER, to_addr=CONTRACT, value=value,
             calldata=calldata,
             code_hash=int.from_bytes(keccak256(code.to_bytes()), "big")),
        tr, code_db={CONTRACT: code.to_bytes(), OTHER: b"\x00"},
    )
    assert not b.rws.check_consistency()
    if with_copies:
        # copy-family programs: the standalone EVM mock has no Copy
        # table, so the copy semantics are proven by the Copy circuit
        # over the same rw rows (composition itself is covered by the
        # SuperCircuit tests)
        tx_rows = [(1, i, byte) for i, byte in enumerate(calldata)]
        circ = CopyCircuit(b.copy_events, rw_rows=b.rws.rws,
                           tx_rows=tx_rows)
        kc = max(9, (sum(ev.length for ev in b.copy_events) * 2 + 64)
                 .bit_length())
        MockProver(kc, circ).assert_satisfied()
        return ending, tr.failed
    n_steps = len(b.steps) + 8
    n_rws = len(b.rws.rws) + 8
    k = max(9, (n_steps - 1).bit_length() + 1, (n_rws - 1).bit_length() + 1)
    params = EvmParams(target_steps=1 << (k - 1), rw_target=1 << (k - 1))
    MockProver(k, EvmCircuit(b.steps, b.rws.rws, params)).assert_satisfied()
    return ending, tr.failed


@pytest.mark.fast
def test_fuzz_pipeline_fast():
    """8 random programs, every one must mock-prove; endings must cover
    at least one success and one failure shape."""
    endings, fails = [], []
    for seed in range(8):
        ending, failed = _run_seed(seed)
        endings.append(ending)
        fails.append(failed)
    assert any(fails) and not all(fails), (endings, fails)


@pytest.mark.fast
def test_fuzz_copy_family_fast():
    """4 seeds with the copy family (CALLDATACOPY/CODECOPY/LOG data):
    builder consistency + Copy-circuit mock over the same rw rows."""
    for seed in range(50, 54):
        _run_seed(seed, with_copies=True)


@pytest.mark.slow
def test_fuzz_pipeline_wide():
    """40 more seeds with longer programs."""
    for seed in range(100, 140):
        _run_seed(seed, n_snippets=40, with_copies=bool(seed % 3 == 0))
