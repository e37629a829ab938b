"""Two-level state trie: account leaves pack nonce/code_size/balance/
code_hash/storage_root; Account RW groups bind to proven account-trie
updates and storage subtrie roots bind into the account leaf.

Covers VERDICT.md round-2 Missing §5 (reference
zktrie/src/state/builder.rs:80,167 two-level layout +
zkevm-circuits/src/witness/mpt.rs:93 + state_circuit.rs:66-72 coupling).
"""

import numpy as np
import pytest

from zkevm_circuits_tpu.circuits.mpt import MptCircuit, MptParams
from zkevm_circuits_tpu.circuits.state import StateCircuit, StateParams
from zkevm_circuits_tpu.crypto.field import fr
from zkevm_circuits_tpu.crypto.keccak import keccak256
from zkevm_circuits_tpu.crypto.params import FR_MODULUS as R
from zkevm_circuits_tpu.plonk.circuit import Circuit, ConstraintSystem
from zkevm_circuits_tpu.plonk.mock import MockProver
from zkevm_circuits_tpu.tracer import Account, Interpreter, StateDB, Tx
from zkevm_circuits_tpu.types import Bytecode
from zkevm_circuits_tpu.witness.builder import CircuitInputBuilder
from zkevm_circuits_tpu.witness.mpt import (
    AccountFields, account_leaf_value, two_level_updates_from_rws,
)
from zkevm_circuits_tpu.witness.rw import RwTag

F = fr()
K = 10
SENDER, CONTRACT = 0xCAFE, 0xC0DE
SPARAMS = StateParams(limb_bits=8, id_bits=16, addr_bits=160, key_bits=32,
                      rwc_bits=16, target_rows=160)


def _witness():
    code = (
        Bytecode()
        .push(1, 0x2A).push(1, 5).op("SSTORE")     # slot 5 = 42
        .push(2, 0x1234).push(1, 7).op("SSTORE")   # slot 7 = 0x1234
        .op("STOP")
    )
    state = StateDB(
        {SENDER: Account(balance=10**18),
         CONTRACT: Account(code=code.to_bytes())}
    )
    tr = Interpreter(state).run_tx(Tx(from_addr=SENDER, to=CONTRACT))
    assert not tr.failed
    ch = int.from_bytes(keccak256(code.to_bytes()), "big")
    b = CircuitInputBuilder(
        accounts={SENDER: (0, 10**18, 0), CONTRACT: (0, 0, ch)}
    )
    b.handle_tx(
        dict(from_addr=SENDER, to_addr=CONTRACT, value=0, calldata=b"",
             code_hash=ch),
        tr, code_db={CONTRACT: code.to_bytes()},
    )
    before = {
        SENDER: AccountFields(balance=10**18),
        CONTRACT: AccountFields(code_hash=ch, code_size=len(code)),
    }
    return b, before


class TwoLevel(Circuit):
    """State + storage-subtrie MPT + account-trie MPT, with the subtrie
    roots copied into the account leaves — the full two-level coupling."""

    def __init__(self, rws, storage, groups, accounts):
        self.state = StateCircuit(rws, SPARAMS)
        self.stor = MptCircuit(
            storage=storage, two_level=True,
            chain_groups=[g[1] for g in groups],
        )
        self.acct = MptCircuit(accounts=accounts)
        self.groups = groups
        self.accounts = accounts
        self.subs = [self.state, self.stor, self.acct]

    def configure(self, cs: ConstraintSystem):
        r = cs.challenge(phase=0)
        self.stor.configure(cs, challenge=r)
        self.acct.configure(cs, challenge=r)
        self.state.configure(
            cs, challenge=r,
            mpt_storage_table=self.stor.storage_table,
            mpt_account_table=self.acct.account_table,
        )

    def fixed_columns(self, n):
        out = {}
        for s in self.subs:
            out.update(s.fixed_columns(n))
        return out

    def copy_constraints(self, n):
        out = []
        for s in self.subs:
            out.extend(s.copy_constraints(n))
        # subtrie roots <-> account leaf sroot cells; addresses carried
        stor_addr = {g[0]: None for g in self.groups}
        j = 0
        group_span = {}
        for addr, cnt, _, _ in self.groups:
            group_span[addr] = (j, j + cnt - 1)
            j += cnt
        for i, au in enumerate(self.accounts):
            cells = self.acct.account_cells(i)
            if au.addr in group_span:
                j0, j1 = group_span[au.addr]
                out.append((cells["sroot_old"],
                            self.stor.update_root_cells(j0)[0]))
                out.append((cells["sroot_new"],
                            self.stor.update_root_cells(j1)[1]))
                for jj in range(j0, j1 + 1):
                    out.append((self.stor.storage_addr_cell(jj),
                                cells["addr"]))
            else:
                out.append((cells["sroot_old"], cells["sroot_new"]))
        return out

    def synthesize(self, phase, n, challenges, instances):
        out = {}
        for s in self.subs:
            out.update(s.synthesize(phase, n, challenges, instances))
        return out


@pytest.fixture(scope="module")
def witness():
    b, before = _witness()
    storage, groups, accounts, (atrie, subtries) = \
        two_level_updates_from_rws(b.rws.rws, before)
    return b, before, storage, groups, accounts, atrie


def test_two_level_witness_shape(witness):
    b, before, storage, groups, accounts, atrie = witness
    assert len(storage) == 2 and len(groups) == 1
    addrs = {au.addr for au in accounts}
    assert {SENDER, CONTRACT}.issubset(addrs)
    snd = next(au for au in accounts if au.addr == SENDER)
    assert snd.new.nonce == snd.old.nonce + 1
    con = next(au for au in accounts if au.addr == CONTRACT)
    assert con.old.storage_root == 0 and con.new.storage_root != 0
    # the account trie's final root commits to every leaf
    assert atrie.root() == accounts[-1].mpt.new_root


def test_two_level_satisfied(witness):
    b, before, storage, groups, accounts, _ = witness
    circ = TwoLevel(b.rws, storage, groups, accounts)
    MockProver(K, circ).assert_satisfied()


def test_two_level_catches_tampered_nonce(witness):
    """A consistent in-trie nonce forgery (exposure + leaf cell) must
    miss the leaf-hash poseidon lookup — the trie pins the nonce."""
    b, before, storage, groups, accounts, _ = witness

    class Corrupt(TwoLevel):
        def synthesize(self, phase, n, challenges, instances):
            cols = super().synthesize(phase, n, challenges, instances)
            acct = self.acct
            i = next(ix for ix, au in enumerate(self.accounts)
                     if au.addr == SENDER)
            pos = acct._leaf_row_positions()[i]
            base = acct._expo_base()
            if phase == 0:
                arr = np.asarray(cols[acct.a_non[1]]).copy()
                arr[pos] = F.from_int(99 * F.R % R)
                cols[acct.a_non[1]] = arr
            if phase == 1:
                arr = np.asarray(cols[acct.x_new]).copy()
                arr[base + 4 * i] = F.from_int(99 * F.R % R)
                cols[acct.x_new] = arr
            return cols

    failures = MockProver(K, Corrupt(b.rws, storage, groups,
                                     accounts)).verify()
    assert failures, "forged nonce must fail the account-trie binding"


def test_two_level_catches_detached_storage_root(witness):
    """Swapping the account leaf's storage root for the OLD root (i.e.
    hiding the block's storage writes) must break the subtrie coupling."""
    b, before, storage, groups, accounts, _ = witness
    bad = []
    for au in accounts:
        if au.addr == CONTRACT:
            import dataclasses as dc

            newf = dc.replace(au.new, storage_root=au.old.storage_root)
            # rebuild the mpt update for the altered leaf value the way a
            # cheating prover would: keep the path, change the leaf
            au = dc.replace(au, new=newf)
        bad.append(au)

    class Corrupt(TwoLevel):
        pass

    failures = MockProver(K, Corrupt(b.rws, storage, groups, bad)).verify()
    assert failures, "stale storage root must fail"


def test_account_leaf_value_conventions():
    assert account_leaf_value(0, 0, 0, 0, 0) == 0
    a = account_leaf_value(1, 0, 10, 0, 0)
    b2 = account_leaf_value(2, 0, 10, 0, 0)
    assert a != b2 != 0
