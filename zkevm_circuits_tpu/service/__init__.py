"""Proving service layer — the reference `prover` crate equivalent."""

from .prover import ChunkProver, Proof  # noqa: F401
