"""EIP-2930 / EIP-1559 typed transactions (types level).

Covers the reference's four-tx-type surface at eth-types level
(geth_types.rs Transaction, TxType); circuit-side RLP-FSM states for
typed payloads are the documented next step (rlp_circuit_fsm.rs).
"""

import pytest

from zkevm_circuits_tpu.types.transaction import Transaction, TxType

SK = 0xA1B2C3D4E5F60718293A4B5C6D7E8F90A1B2C3D4E5F60718293A4B5C6D7E8F9


def test_legacy_roundtrip_unchanged():
    tx = Transaction(nonce=1, to=0xBEEF, value=5).sign(SK)
    assert tx.tx_type == TxType.Legacy
    assert tx.recover_sender() is not None
    assert tx.rlp_signed()[0] >= 0xC0  # legacy = plain RLP list


def test_eip2930_sign_and_recover():
    tx = Transaction(
        nonce=2, to=0xBEEF, value=7, tx_type=TxType.Eip2930,
        access_list=[(0xCAFE, [1, 2]), (0xD00D, [])],
    ).sign(SK)
    assert tx.sign_payload()[0] == 0x01
    assert tx.rlp_signed()[0] == 0x01
    assert tx.v in (0, 1)
    sender = tx.recover_sender()
    assert sender is not None
    # same key signs a legacy tx to the same sender address
    leg = Transaction(nonce=2, to=0xBEEF, value=7).sign(SK)
    assert leg.recover_sender() == sender
    assert tx.intrinsic_access_list_gas() == 2400 + 1900 * 2 + 2400


def test_eip1559_sign_fee_and_recover():
    tx = Transaction(
        nonce=3, to=0xBEEF, tx_type=TxType.Eip1559,
        max_fee_per_gas=100, max_priority_fee_per_gas=2,
    ).sign(SK)
    assert tx.sign_payload()[0] == 0x02
    assert tx.recover_sender() is not None
    assert tx.effective_gas_price(base_fee=7) == 9
    assert tx.effective_gas_price(base_fee=99) == 100
    # tampering the access list / fee fields changes the sign hash
    tx2 = Transaction(
        nonce=3, to=0xBEEF, tx_type=TxType.Eip1559,
        max_fee_per_gas=101, max_priority_fee_per_gas=2,
    )
    assert tx2.sign_hash() != tx.sign_hash()


def test_typed_hashes_distinct():
    kw = dict(nonce=4, to=0xBEEF, value=1)
    hs = {
        Transaction(**kw).sign(SK).tx_hash(),
        Transaction(**kw, tx_type=TxType.Eip2930).sign(SK).tx_hash(),
        Transaction(**kw, tx_type=TxType.Eip1559,
                    max_fee_per_gas=10).sign(SK).tx_hash(),
    }
    assert len(hs) == 3
