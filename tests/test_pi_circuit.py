"""PI circuit tests: chunk-statement keccak binding + instance exposure."""

import numpy as np

from zkevm_circuits_tpu.circuits.pi import PiCircuit, PublicData
from zkevm_circuits_tpu.crypto.field import fr
from zkevm_circuits_tpu.crypto.keccak import keccak256
from zkevm_circuits_tpu.plonk.mock import MockProver

F = fr()
K = 9


def _pd():
    return PublicData(
        chain_id=534352,
        prev_state_root=bytes(range(32)),
        post_state_root=keccak256(b"post"),
        withdraw_root=keccak256(b"withdraw"),
        data_hash=keccak256(b"data"),
    )


def test_pi_bytes_layout():
    pd = _pd()
    pi = pd.pi_bytes()
    assert len(pi) == 136
    assert pi[:8] == (534352).to_bytes(8, "big")
    assert pi[8:40] == bytes(range(32))
    hi, lo = pd.instance()
    assert (hi << 128) | lo == int.from_bytes(keccak256(pi), "big")


def test_pi_circuit_satisfied():
    pd = _pd()
    MockProver(K, PiCircuit(pd), [pd.instance()]).assert_satisfied()


def test_pi_circuit_rejects_wrong_instance():
    pd = _pd()
    hi, lo = pd.instance()
    failures = MockProver(K, PiCircuit(pd), [[hi, (lo + 1) % (1 << 128)]]).verify()
    assert failures


def test_pi_circuit_rejects_wrong_digest():
    pd = _pd()

    class Corrupt(PiCircuit):
        """Claim a digest that doesn't match keccak(pi_bytes): the keccak
        table lookup must miss."""

        def synthesize(self, phase, n, challenges, instances):
            cols = super().synthesize(phase, n, challenges, instances)
            if phase == 0:
                arr = np.array(cols[self.c_dig[5]])
                cur = F.to_int(np.asarray(F.from_mont(arr[0])))
                arr[0] = F.from_int((cur + 1) % 256 * F.R % F.modulus)
                cols[self.c_dig[5]] = arr
            return cols

    inst = pd.instance()
    failures = MockProver(K, Corrupt(pd), [inst]).verify()
    assert failures


def test_pi_circuit_rejects_tampered_statement_byte():
    pd = _pd()

    class Corrupt(PiCircuit):
        def synthesize(self, phase, n, challenges, instances):
            cols = super().synthesize(phase, n, challenges, instances)
            if phase == 0:
                arr = np.array(cols[self.c_byte])
                arr[10] = F.from_int(0x77 * F.R % F.modulus)
                cols[self.c_byte] = arr
            return cols

    failures = MockProver(K, Corrupt(pd), [pd.instance()]).verify()
    assert failures
