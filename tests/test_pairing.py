"""BN254 pairing: bilinearity, non-degeneracy, G2 arithmetic sanity."""

from zkevm_circuits_tpu.crypto import pairing as pr
from zkevm_circuits_tpu.crypto.curve import host_g1_mul
from zkevm_circuits_tpu.crypto.params import FQ_MODULUS as Q, FR_MODULUS as R, G1_GEN


def test_g2_on_curve():
    # y^2 = x^3 + 3/(9+u) over Fq2, checked in the Fq12 embedding
    x = pr.fq2_to_fq12(*pr.G2_GENERATOR[0]) * pr._W2
    y = pr.fq2_to_fq12(*pr.G2_GENERATOR[1]) * pr._W3
    b = pr.Fq12.scalar(3)
    assert y * y == x * x * x + b


def test_g2_scalar_mul_roundtrip():
    q2 = pr.g2_scalar_mul(pr.G2_GENERATOR, 5)
    q2b = pr.g2_scalar_mul(pr.G2_GENERATOR, 5)
    assert q2 == q2b and q2 is not None
    # order: [r]Q = infinity
    assert pr.g2_scalar_mul(pr.G2_GENERATOR, R) is None


def test_pairing_bilinearity():
    a, b = 7, 11
    g1 = G1_GEN
    g2 = pr.G2_GENERATOR
    e_ab = pr.pairing(host_g1_mul(g1, a), pr.g2_scalar_mul(g2, b))
    e_base = pr.pairing(g1, g2)
    assert not e_base.is_one()  # non-degenerate
    assert e_ab == e_base ** (a * b)
    # product check predicate: e(aG, bG2) * e(-abG, G2) == 1
    neg_ab = host_g1_mul(g1, R - a * b)
    assert pr.pairing_product_is_one(
        [(host_g1_mul(g1, a), pr.g2_scalar_mul(g2, b)), (neg_ab, g2)]
    )
