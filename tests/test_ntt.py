"""NTT kernel vs host reference + polynomial-identity properties."""
import random

import numpy as np
import pytest

from crypto3_fil_proofs_tpu.ops import ntt as ntt_mod
from crypto3_fil_proofs_tpu.ops.bls12_381 import R
from crypto3_fil_proofs_tpu.ops.fr_limbs import fr_ops


def _rand_poly(n, seed):
    rng = random.Random(seed)
    return [rng.randrange(R) for _ in range(n)]


@pytest.mark.parametrize("log_n", [0, 1, 4, 6])
def test_ntt_matches_host(log_n, rng_seed):
    vals = _rand_poly(1 << log_n, rng_seed + log_n)
    got = fr_ops.decode(ntt_mod.ntt(fr_ops.encode(vals), log_n))
    assert got == ntt_mod.ntt_host(vals)


def test_intt_roundtrip(rng_seed):
    log_n = 5
    vals = _rand_poly(1 << log_n, rng_seed + 20)
    enc = fr_ops.encode(vals)
    back = fr_ops.decode(ntt_mod.intt(ntt_mod.ntt(enc, log_n), log_n))
    assert back == vals


def test_ntt_is_evaluation(rng_seed):
    """NTT output k = poly evaluated at omega^k."""
    log_n = 3
    n = 1 << log_n
    vals = _rand_poly(n, rng_seed + 30)
    omega = ntt_mod._root_of_unity(log_n)
    got = fr_ops.decode(ntt_mod.ntt(fr_ops.encode(vals), log_n))
    for k in range(n):
        x = pow(omega, k, R)
        want = sum(c * pow(x, i, R) for i, c in enumerate(vals)) % R
        assert got[k] == want


def test_coset_roundtrip_and_evaluation(rng_seed):
    log_n = 4
    n = 1 << log_n
    vals = _rand_poly(n, rng_seed + 40)
    enc = fr_ops.encode(vals)
    ev = ntt_mod.coset_ntt(enc, log_n)
    back = fr_ops.decode(ntt_mod.coset_intt(ev, log_n))
    assert back == vals
    # coset NTT output k = poly evaluated at g * omega^k
    omega = ntt_mod._root_of_unity(log_n)
    g = ntt_mod.FR_MULT_GEN
    got = fr_ops.decode(ev)
    for k in (0, 1, n - 1):
        x = (g * pow(omega, k, R)) % R
        want = sum(c * pow(x, i, R) for i, c in enumerate(vals)) % R
        assert got[k] == want


def test_batched_ntt(rng_seed):
    log_n = 4
    a = _rand_poly(1 << log_n, rng_seed + 50)
    b = _rand_poly(1 << log_n, rng_seed + 51)
    enc = np.stack([fr_ops.encode(a), fr_ops.encode(b)])
    import jax.numpy as jnp

    got = ntt_mod.ntt(jnp.asarray(enc), log_n)
    assert fr_ops.decode(got[0]) == ntt_mod.ntt_host(a)
    assert fr_ops.decode(got[1]) == ntt_mod.ntt_host(b)
