"""Signed (value, sign) pair arithmetic: JAX vs python-int oracle vs floats.

Replicates the reference's signed-arithmetic tests (`src/helper.rs:425-467,
556-578`) with exact-integer oracles on top.
"""

import numpy as np
import pytest

from zk_stark_project_tpu.ops import f128, f128_ref as ref, signed

P = ref.P


def _rand_pairs(rng, n):
    """Random signed fixed-point encodings (mix of signs and magnitudes)."""
    vals, sgns = [], []
    for _ in range(n):
        mag = rng.randrange(0, 10**13)  # up to ~1e7 in real units at 1e6 scale
        s = rng.randrange(2)
        v, sg = signed.encode_signed(-mag if s else mag)
        vals.append(v)
        sgns.append(sg)
    return vals, sgns


@pytest.mark.parametrize("op", ["add", "sub", "mul", "div"])
def test_ops_match_oracle(rng, op):
    av, asgn = _rand_pairs(rng, 64)
    bv, bsgn = _rand_pairs(rng, 64)
    if op == "div":
        bv = [v if v != 0 else 1 for v in bv]
    jop = getattr(signed, op)
    rop = getattr(signed, f"ref_{op}")
    got_v, got_s = jop(f128.from_ints(av), f128.from_ints(asgn),
                       f128.from_ints(bv), f128.from_ints(bsgn))
    want = [rop(a, sa, b, sb) for a, sa, b, sb in zip(av, asgn, bv, bsgn)]
    assert [int(x) for x in f128.to_ints(got_v)] == [w[0] for w in want]
    assert [int(x) for x in f128.to_ints(got_s)] == [w[1] for w in want]


def test_float_semantics_add_mul():
    """The reference float-oracle pattern (`src/helper.rs:556-578`)."""
    a_v, a_s = signed.f64_to_signed_felt(3.5)
    b_v, b_s = signed.f64_to_signed_felt(2.1)
    la, lsa = f128.from_ints([a_v]), f128.from_ints([a_s])
    lb, lsb = f128.from_ints([b_v]), f128.from_ints([b_s])

    v, s = signed.add(la, lsa, lb, lsb)
    assert abs(signed.decode_signed(f128.to_int(v[:, 0]), f128.to_int(s[:, 0])) - 5.6) < 1e-6

    # Reference quirk (`src/signed.rs:28-31`): sub flips only the sign *tag*
    # of b, not its value, and the ind=0 branch of add then computes raw
    # a + b.  So sub(+3.5, +2.1) = 5.6, NOT 1.4 — the reference's own float
    # unit test (`src/helper.rs` test_subtract_zero_sign) cannot pass against
    # its implementation.  We replicate the implementation, not the intent
    # (SURVEY.md pin #2).
    v, s = signed.sub(la, lsa, lb, lsb)
    assert abs(signed.decode_signed(f128.to_int(v[:, 0]), f128.to_int(s[:, 0])) - 5.6) < 1e-6

    # mul of two 1e6-scaled numbers is scaled by 1e12 (reference semantics:
    # plain field mul, no rescale — `src/signed.rs:33-39`)
    v, s = signed.mul(la, lsa, lb, lsb)
    assert f128.to_int(v[:, 0]) == 3_500_000 * 2_100_000


def test_negative_encoding_quirk():
    """-1 encodes to u128::MAX mod p = 45*2^40 - 2 (SURVEY.md pin #1)."""
    v, s = signed.encode_signed(-1)
    assert v == 45 * 2**40 - 2
    assert s == 1
    # decode round-trips through the wrapped representation
    assert signed.decode_signed(v, s) == pytest.approx(-1e-6)


def test_add_negative_pair():
    """(-2) + (-3) via the wrapped branch."""
    av, asn = signed.encode_signed(-2_000_000)
    bv, bsn = signed.encode_signed(-3_000_000)
    got_v, got_s = signed.ref_add(av, asn, bv, bsn)
    assert signed.decode_signed(got_v, got_s) == pytest.approx(-5.0)
    # JAX matches
    jv, js = signed.add(f128.from_ints([av]), f128.from_ints([asn]),
                        f128.from_ints([bv]), f128.from_ints([bsn]))
    assert f128.to_int(jv[:, 0]) == got_v
    assert f128.to_int(js[:, 0]) == got_s


def test_mixed_sign_add_uses_raw_branch():
    """Reference quirk: (+a) + (-b) takes the `a + b` branch with b still in
    wrapped encoding — the field wraparound makes it come out right."""
    av, asn = signed.encode_signed(5_000_000)
    bv, bsn = signed.encode_signed(-2_000_000)
    got_v, got_s = signed.ref_add(av, asn, bv, bsn)
    # sign = s_a * s_b = 0; value = a + wrapped(b) mod p
    assert got_s == 0
    assert got_v == (5_000_000 + bv) % P


def test_div_exact():
    """12/4 = 3 in field division (`src/helper.rs` test_divide_zero_sign)."""
    a = signed.f64_to_felt(12.0)
    b = signed.f64_to_felt(4.0)
    v, s = signed.ref_div(a, 0, b, 0)
    assert v == (a * ref.inv(b)) % P
    assert s == 0
