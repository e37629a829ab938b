"""Ethereum transaction types: RLP payloads, signing, sender recovery.

Equivalent of the reference's `eth-types/src/geth_types.rs::Transaction`
+ ethers-core signing (SURVEY.md §2.1 item 1).  Legacy/EIP-155 txs for
round 1; typed txs (2930/1559) extend `sign_payload`.
"""

from __future__ import annotations

import dataclasses

from ..crypto import secp256k1
from ..crypto.keccak import keccak256
from . import rlp


@dataclasses.dataclass
class Transaction:
    nonce: int = 0
    gas_price: int = 10
    gas: int = 1_000_000
    to: int | None = None  # None => create
    value: int = 0
    data: bytes = b""
    chain_id: int = 1
    v: int = 0
    r: int = 0
    s: int = 0

    # -- signing ------------------------------------------------------------
    def _to_field(self):
        return b"" if self.to is None else self.to.to_bytes(20, "big")

    def sign_payload(self) -> bytes:
        """EIP-155 signing payload."""
        return rlp.encode([
            self.nonce, self.gas_price, self.gas, self._to_field(),
            self.value, self.data, self.chain_id, 0, 0,
        ])

    def sign_hash(self) -> bytes:
        return keccak256(self.sign_payload())

    def sign(self, sk: int) -> "Transaction":
        r, s, rec = secp256k1.sign(sk, self.sign_hash())
        self.r, self.s = r, s
        self.v = 35 + 2 * self.chain_id + rec
        return self

    def rlp_signed(self) -> bytes:
        return rlp.encode([
            self.nonce, self.gas_price, self.gas, self._to_field(),
            self.value, self.data, self.v, self.r, self.s,
        ])

    def tx_hash(self) -> bytes:
        return keccak256(self.rlp_signed())

    def recover_sender(self) -> int | None:
        rec = (self.v - 35 - 2 * self.chain_id) & 1 if self.v >= 35 else (
            (self.v - 27) & 1
        )
        pub = secp256k1.recover(self.sign_hash(), self.r, self.s, rec)
        if pub is None:
            return None
        raw = pub[0].to_bytes(32, "big") + pub[1].to_bytes(32, "big")
        return int.from_bytes(keccak256(raw)[12:], "big")
