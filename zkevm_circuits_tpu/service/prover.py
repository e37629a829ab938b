"""Production proving API — chunk prover with file-memoized artifacts.

Equivalent of the reference's `prover` crate (SURVEY.md §2.1 item 11):
  * `Proof` — JSON+base64 proof/vk serialization (prover/src/proof.rs:34)
  * `ChunkProver.gen_chunk_proof` — trace -> witness -> SuperCircuit ->
    proof (prover/src/zkevm/prover.rs:42), with every artifact
    load-or-gen cached to `output_dir` the way each reference layer does
    (prover/src/common/prover/{inner,compression,...}.rs:31-38)
  * SRS cached per degree in `params_dir` (utils.rs:27)
  * `CircuitCapacityChecker` — row-usage estimation for block packing
    (prover/src/zkevm/capacity_checker.rs:116)
The recursion layers (compression/aggregation) stack on this API next.
"""

from __future__ import annotations

import base64
import dataclasses
import hashlib
import json
import os
import pickle

from ..circuits.super_circuit import SuperCircuit, SuperParams
from ..plonk.circuit import ConstraintSystem, usable_rows
from ..plonk.keygen import keygen
from ..plonk.prover import prove
from ..plonk.verifier import verify
from ..poly.kzg import Srs
from ..types.bytecode import Bytecode
from ..utils.stats import timer
from ..witness.builder import CircuitInputBuilder


@dataclasses.dataclass
class Proof:
    proof: bytes
    instances: list[list[int]]
    k: int

    def to_json(self) -> str:
        return json.dumps({
            "proof": base64.b64encode(self.proof).decode(),
            "instances": [[hex(v) for v in col] for col in self.instances],
            "k": self.k,
        })

    @classmethod
    def from_json(cls, s: str) -> "Proof":
        d = json.loads(s)
        return cls(
            proof=base64.b64decode(d["proof"]),
            instances=[[int(v, 16) for v in col] for col in d["instances"]],
            k=d["k"],
        )


class ChunkProver:
    def __init__(self, params_dir: str, output_dir: str | None = None,
                 params: SuperParams | None = None, k: int = 9):
        self.params_dir = params_dir
        self.output_dir = output_dir
        self.k = k
        self.super_params = params or SuperParams()
        os.makedirs(params_dir, exist_ok=True)
        if output_dir:
            os.makedirs(output_dir, exist_ok=True)
        self._srs: Srs | None = None
        self._keys = None

    # ---- cached SRS per degree (reference params_dir behavior) -----------
    def srs(self) -> Srs:
        if self._srs is None:
            path = os.path.join(self.params_dir, f"srs_k{self.k}.pkl")
            if os.path.exists(path):
                with open(path, "rb") as f:
                    self._srs = pickle.load(f)
            else:
                with timer(f"SRS setup k={self.k}"):
                    self._srs = Srs.unsafe_setup(self.k)
                import jax
                g1 = jax.tree.map(
                    lambda a: __import__("numpy").asarray(a),
                    self._srs.g1_powers,
                )
                self._srs.g1_powers = type(self._srs.g1_powers)(*g1)
                with open(path, "wb") as f:
                    pickle.dump(self._srs, f)
        return self._srs

    def keys(self, circuit: SuperCircuit):
        if self._keys is None:
            with timer("keygen"):
                self._keys = keygen(circuit, self.k, self.srs())
        return self._keys

    # ---- chunk proving ------------------------------------------------------
    def gen_chunk_proof(self, builder: CircuitInputBuilder,
                        bytecodes: list[Bytecode], txs,
                        name: str = "chunk") -> Proof:
        """load_or_gen: the reference memoizes every layer's snark to
        output_dir; identical behavior keyed by a witness digest."""
        digest = hashlib.sha256(
            repr([
                [(r.rw_counter, int(r.tag), r.value) for r in builder.rws.rws],
                [bc.to_bytes() for bc in bytecodes],
            ]).encode()
        ).hexdigest()[:16]
        cache = (
            os.path.join(self.output_dir, f"proof_{name}_{digest}.json")
            if self.output_dir else None
        )
        if cache and os.path.exists(cache):
            return Proof.from_json(open(cache).read())
        circuit = SuperCircuit(builder, bytecodes, txs, self.super_params)
        pk, vk = self.keys(circuit)
        with timer("prove chunk"):
            # Poseidon transcript: chunk proofs feed the recursion layers
            # (reference inner proofs hash with Poseidon via
            # snark-verifier-sdk, prover/src/common/prover/utils.rs:24)
            from ..poly.transcript import PoseidonTranscript

            proof = prove(pk, circuit, [], self.srs(),
                          transcript=PoseidonTranscript())
        out = Proof(proof=proof, instances=[], k=self.k)
        if cache:
            with open(cache, "w") as f:
                f.write(out.to_json())
        return out

    def verify_chunk_proof(self, proof: Proof) -> bool:
        assert self._keys is not None, "keys not generated yet"
        _, vk = self._keys
        from ..poly.transcript import PoseidonReader

        return verify(vk, proof.instances, proof.proof,
                      transcript=PoseidonReader(proof.proof))


class CircuitCapacityChecker:
    """Estimates per-circuit row usage for a block, to pack chunks below
    circuit capacity (reference capacity_checker.rs:116,159)."""

    def __init__(self, params: SuperParams, k: int):
        self.params = params
        self.k = k

    def estimate(self, builder: CircuitInputBuilder,
                 bytecodes: list[Bytecode],
                 n_pi_messages: int = 1) -> dict:
        """Per-sub-circuit row estimates (reference per-tx row-usage
        accounting, capacity_checker.rs:159).  Keccak counts one padded
        permutation per 136-byte block of every hashed message (bytecodes
        + the PI statement)."""
        from ..circuits.keccak import ROWS_PER_PERM

        keccak_msgs = [len(bc.to_bytes()) for bc in bytecodes]
        keccak_msgs += [136] * n_pi_messages
        keccak_rows = sum(
            (ln // 136 + 1) * ROWS_PER_PERM for ln in keccak_msgs
        )
        n_sigs = len(builder.sig_events)
        sig_rows = n_sigs * 258
        ecc_rows = (len(builder.ecadd_events)
                    + len(builder.ecmul_events) * 258)
        mulmod_rows = len(builder.mulmod_events)
        for ev in (builder.sig_events + builder.ecadd_events
                   + builder.ecmul_events + builder.modexp_events):
            mulmod_rows += len(ev.mulmod_events())
        modexp_rows = sum(
            len(ev.steps()) for ev in builder.modexp_events
        )
        sha256_blocks = sum(
            (ln + 8) // 64 + 1
            for ln in map(len, builder.sha256_inputs)
        )
        keccak_rows += sum(
            (len(m) // 136 + 1) * ROWS_PER_PERM
            for m in builder.sha3_inputs
        ) + n_sigs * ROWS_PER_PERM  # pubkey hashes
        rows = {
            "state": len(builder.rws.rws),
            "evm": len(builder.steps),
            "bytecode": sum(1 + len(bc) for bc in bytecodes),
            "copy": sum(ev.length for ev in builder.copy_events),
            "exp": sum(len(ev.steps) for ev in builder.exp_events),
            "keccak": keccak_rows,
            "tx": (self.params.tx.max_txs * 12 + self.params.tx.max_calldata),
            "pi": max(136, 256),
            "sig": sig_rows,
            "ecc": ecc_rows,
            "mulmod": mulmod_rows,
            "modexp": modexp_rows,
            "sha256": sha256_blocks * 72,
        }
        cap = usable_rows(1 << self.k)
        rows["fits"] = all(
            v <= cap for key, v in rows.items() if key != "fits"
        )
        return rows


class LayerProver:
    """Recursion layers over inner proofs (reference 5-layer pipeline
    Inner -> Layer1/2 (compression) -> Layer3 (aggregation) -> Layer4,
    prover/src/config.rs:36-48; common/prover/compression.rs).

    Layer1 here: CompressionCircuit — the inner proof's scalar
    verification proven in-circuit, elliptic claim deferred
    (recursion/compression.py).  Artifacts are load-or-gen cached like
    every reference layer."""

    def __init__(self, params_dir: str, output_dir: str | None = None):
        self.params_dir = params_dir
        self.output_dir = output_dir
        os.makedirs(params_dir, exist_ok=True)
        if output_dir:
            os.makedirs(output_dir, exist_ok=True)
        self._srs: dict[int, Srs] = {}
        self._keys: dict[str, tuple] = {}

    def srs(self, k: int) -> Srs:
        if k not in self._srs:
            path = os.path.join(self.params_dir, f"srs_k{k}.pkl")
            if os.path.exists(path):
                with open(path, "rb") as f:
                    self._srs[k] = pickle.load(f)
            else:
                with timer(f"SRS setup k={k}"):
                    self._srs[k] = Srs.unsafe_setup(k)
                with open(path, "wb") as f:
                    pickle.dump(self._srs[k], f)
        return self._srs[k]

    def gen_compression_proof(self, vk_inner, inner: Proof,
                              name: str = "layer1"):
        """Inner proof (PoseidonTranscript) -> compression proof +
        (claim, instances) for the aggregation layer.  Returns
        (Proof, CompressionCircuit)."""
        from ..recursion.compression import CompressionCircuit

        comp = CompressionCircuit(vk_inner, inner.proof, inner.instances)
        kc = comp.min_k()
        insts = comp.instances()
        digest = hashlib.sha256(inner.proof).hexdigest()[:16]
        cache = (
            os.path.join(self.output_dir, f"proof_{name}_{digest}.json")
            if self.output_dir else None
        )
        if cache and os.path.exists(cache):
            return Proof.from_json(open(cache).read()), comp
        srs = self.srs(kc)
        key = f"{name}_k{kc}"
        if key not in self._keys:
            with timer(f"keygen {key}"):
                self._keys[key] = keygen(comp, kc, srs)
        pk, vk_c = self._keys[key]
        with timer(f"prove {name}"):
            proof = prove(pk, comp, insts, srs)
        out = Proof(proof=proof, instances=insts, k=kc)
        if cache:
            with open(cache, "w") as f:
                f.write(out.to_json())
        return out, comp

    def verify_compression_proof(self, name_k: str, proof: Proof) -> bool:
        _, vk_c = self._keys[name_k]
        return verify(vk_c, proof.instances, proof.proof)


class BatchProver:
    """Layer3 batching (reference aggregator::Prover::gen_agg_evm_proof,
    prover/src/aggregator/prover.rs:69): check the chunks' deferred
    claims with ONE folded pairing and commit the batch statement
    (BatchHash over the chunk pi hashes).  The in-circuit aggregation
    (verifying the compression proofs inside one circuit) stacks on the
    same tape machinery next."""

    def gen_batch(self, items, chunk_hashes) -> dict:
        """items: [(vk_inner, DeferredClaim, instance_values)];
        chunk_hashes: [recursion.aggregation.ChunkHash]."""
        from ..recursion.aggregation import (
            BatchHash, fold_and_verify_claims,
        )

        assert fold_and_verify_claims(items), "deferred claim fold failed"
        batch = BatchHash(chunk_hashes)
        return {
            "batch_pi_hash": hex(batch.pi_hash()),
            "n_chunks": len(chunk_hashes),
            "chunk_pi_hashes": [hex(c.pi_hash()) for c in chunk_hashes],
        }

    def gen_batch_in_circuit(self, layers: LayerProver, layer_items,
                             chunk_hashes, srs_vk) -> dict:
        """In-circuit aggregation fold (reference
        aggregator/src/aggregation/circuit.rs:40 accumulation step):
        `layer_items` = [(claim, instance_values)] from
        CompressionLayerCircuit proofs; the fold circuit computes the
        accumulation challenge and both folded points in-circuit
        (recursion/fold.py), is PROVEN, and the returned record carries
        the folded accumulator — valid iff verify_fold's ONE pairing
        accepts (checked here)."""
        from ..plonk.verifier import verify as plonk_verify
        from ..recursion.aggregation import BatchHash
        from ..recursion.fold import AggregationFoldCircuit, verify_fold
        from ..recursion.layer import layer1_accumulator

        accs = [layer1_accumulator(c, v) for c, v in layer_items]
        circ = AggregationFoldCircuit(accs)
        kk = circ.min_k()
        srs = layers.srs(kk)
        key = f"fold_k{kk}_m{len(accs)}"
        if key not in layers._keys:
            with timer(f"keygen {key}"):
                layers._keys[key] = keygen(circ, kk, srs)
        pk, vk_f = layers._keys[key]
        insts = circ.instances()
        with timer("prove fold"):
            fproof = prove(pk, circ, insts, srs)
        assert plonk_verify(vk_f, insts, fproof)
        assert verify_fold(srs_vk, insts[0], len(accs)), (
            "folded accumulator pairing rejected"
        )
        batch = BatchHash(chunk_hashes)
        return {
            "batch_pi_hash": hex(batch.pi_hash()),
            "n_chunks": len(chunk_hashes),
            "chunk_pi_hashes": [hex(c.pi_hash()) for c in chunk_hashes],
            "fold_proof": Proof(proof=fproof, instances=insts, k=kk),
            "folded_acc": insts[0][-8:],
        }
