"""Tracer precompile fidelity (VERDICT r3 Missing #9): EIP-2565 modexp
gas + arbitrary operand lengths, ripemd160 (0x03), blake2f (0x09,
EIP-152), ecPairing (0x08, EIP-197) — all previously stubbed."""

import hashlib

from zkevm_circuits_tpu.crypto.pairing import G2_GENERATOR, g2_scalar_mul
from zkevm_circuits_tpu.crypto.params import FQ_MODULUS, G1_GEN
from zkevm_circuits_tpu.tracer.evm import (
    Interpreter, StateDB, _blake2f_compress,
)

IT = Interpreter(StateDB({}))


def test_blake2f_matches_blake2b():
    IV = [0x6A09E667F3BCC908, 0xBB67AE8584CAA73B, 0x3C6EF372FE94F82B,
          0xA54FF53A5F1D36F1, 0x510E527FADE682D1, 0x9B05688C2B3E6C1F,
          0x1F83D9ABFB41BD6B, 0x5BE0CD19137E2179]
    h = IV[:]
    h[0] ^= 0x01010040
    msg = b"abc".ljust(128, b"\x00")
    m = [int.from_bytes(msg[8 * i : 8 * i + 8], "little") for i in range(16)]
    out = _blake2f_compress(12, h, m, [3, 0], True)
    got = b"".join(v.to_bytes(8, "little") for v in out)
    assert got == hashlib.blake2b(b"abc").digest()
    # precompile wrapper: gas == rounds; malformed length errors
    data = (12).to_bytes(4, "big") \
        + b"".join(v.to_bytes(8, "little") for v in h) + msg \
        + (3).to_bytes(8, "little") + bytes(8) + b"\x01"
    ok, res, left = IT._precompile(9, data, 100)
    assert ok and res == got and left == 88
    ok, _, _ = IT._precompile(9, data[:-1], 100)
    assert not ok


def test_modexp_eip2565_gas():
    data = (32).to_bytes(32, "big") * 3 + (3).to_bytes(32, "big") \
        + bytes.fromhex("ff" * 32) + bytes.fromhex("ff" * 31 + "fd")
    ok, out, left = IT._precompile(5, data, 10**6)
    e = int.from_bytes(bytes.fromhex("ff" * 32), "big")
    m = int.from_bytes(bytes.fromhex("ff" * 31 + "fd"), "big")
    assert ok and int.from_bytes(out, "big") == pow(3, e, m)
    assert 10**6 - left == 1360  # the EIP-2565 canonical example
    # operands over 32 bytes now compute too
    d2 = (64).to_bytes(32, "big") * 3 + (7).to_bytes(64, "big") \
        + (5).to_bytes(64, "big") + (0xFEED).to_bytes(64, "big")
    ok, out, _ = IT._precompile(5, d2, 10**6)
    assert ok and int.from_bytes(out, "big") == pow(7, 5, 0xFEED)


def test_ripemd160():
    ok, out, left = IT._precompile(3, b"abc", 10**5)
    assert ok and out[:12] == bytes(12)
    assert out[12:].hex() == hashlib.new("ripemd160", b"abc").hexdigest()
    assert 10**5 - left == 600 + 120  # one word


def _enc_pair(g1, g2):
    (x, y) = g1
    ((xr, xi), (yr, yi)) = g2
    return (x.to_bytes(32, "big") + y.to_bytes(32, "big")
            + xi.to_bytes(32, "big") + xr.to_bytes(32, "big")
            + yi.to_bytes(32, "big") + yr.to_bytes(32, "big"))


def test_ec_pairing():
    neg = (G1_GEN[0], FQ_MODULUS - G1_GEN[1])
    data = _enc_pair(G1_GEN, G2_GENERATOR) + _enc_pair(neg, G2_GENERATOR)
    ok, out, left = IT._precompile(8, data, 10**6)
    assert ok and int.from_bytes(out, "big") == 1
    assert 10**6 - left == 45000 + 2 * 34000
    ok, out, _ = IT._precompile(8, _enc_pair(G1_GEN, G2_GENERATOR), 10**6)
    assert ok and int.from_bytes(out, "big") == 0
    ok, out, _ = IT._precompile(8, b"", 10**6)
    assert ok and int.from_bytes(out, "big") == 1  # empty product
    # malformed: off-curve G2 errors out
    bad = bytearray(_enc_pair(G1_GEN, G2_GENERATOR))
    bad[70] ^= 1
    ok, _, _ = IT._precompile(8, bytes(bad), 10**6)
    assert not ok
    # non-multiple-of-192 input errors
    ok, _, _ = IT._precompile(8, b"\x00" * 191, 10**6)
    assert not ok
