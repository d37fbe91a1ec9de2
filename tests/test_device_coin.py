"""Device-side Fiat–Shamir coin (prover/device_coin.py) must be bit-exact
against the host RandomCoin (prover/channel.py) — same seeds, draws,
coefficient powers, query positions, across a batch of lanes."""

import jax.numpy as jnp
import numpy as np

from zk_stark_project_tpu.ops import f128, f128_ref as ref
from zk_stark_project_tpu.prover import device_coin as dc
from zk_stark_project_tpu.prover.channel import RandomCoin


def _host_coins(c):
    return [RandomCoin(f"ctx-{i}".encode()) for i in range(c)]


def _device_state(coins):
    seed0 = jnp.asarray(np.stack(
        [np.frombuffer(co.seed, dtype="<u4") for co in coins]))
    return dc.coin_init(seed0)


def _digest(i):
    return bytes(range(i, i + 32))


def test_reseed_and_draw_match_host():
    coins = _host_coins(3)
    state = _device_state(coins)
    dig = np.stack([np.frombuffer(_digest(i), dtype="<u4")
                    for i in range(3)])
    state = dc.reseed(state, jnp.asarray(dig))
    for i, co in enumerate(coins):
        co.reseed(_digest(i))
    got, state = dc.draw(state)
    want = [co.draw() for co in coins]
    assert [int(x) for x in f128.to_ints(np.asarray(got))] == want
    # second draw continues the same counter stream
    got2, state = dc.draw(state)
    want2 = [co.draw() for co in coins]
    assert [int(x) for x in f128.to_ints(np.asarray(got2))] == want2


def test_draw_powers_match_algebraic_coefficients():
    coins = _host_coins(2)
    state = _device_state(coins)
    got, state = dc.draw_powers(state, 7)
    want = [co.draw_coefficients(7, "algebraic") for co in coins]
    got_ints = f128.to_ints(np.asarray(got))
    for i in range(2):
        assert [int(x) for x in got_ints[i]] == want[i]


def test_draw_integers_match_host():
    coins = _host_coins(4)
    state = _device_state(coins)
    got, state = dc.draw_integers(state, 9, 1 << 11)
    want = [co.draw_integers(9, 1 << 11) for co in coins]
    assert np.asarray(got).tolist() == want
    # distinctness per lane
    for row in np.asarray(got).tolist():
        assert len(set(row)) == len(row)


def test_reseed_with_u64_and_elements_match_host():
    coins = _host_coins(2)
    state = _device_state(coins)
    nonces = [12345, (1 << 40) + 7]
    arr = np.array([[v & 0xFFFFFFFF, v >> 32] for v in nonces],
                   dtype=np.uint32)
    state = dc.reseed_with_u64(state, jnp.asarray(arr))
    for co, v in zip(coins, nonces):
        co.reseed_with_int(v)
    got, state = dc.draw(state)
    want = [co.draw() for co in coins]
    assert [int(x) for x in f128.to_ints(np.asarray(got))] == want

    elems = [[3, ref.P - 1, 10 ** 30 % ref.P], [7, 8, 9]]
    limbs = f128.from_ints(np.asarray(elems, dtype=object))
    state = dc.reseed_elements(state, limbs)
    for co, xs in zip(coins, elems):
        co.reseed_with_elements(xs)
    got2, _ = dc.draw(state)
    want2 = [co.draw() for co in coins]
    assert [int(x) for x in f128.to_ints(np.asarray(got2))] == want2
