"""Challenge derivation: determinism, domain, distribution statistics.

Reference test analog: libs/storage/test/porep/stacked/vanilla/
challenges.cpp (102 LoC — challenge distribution statistics) and the
fallback PoSt challenge derivations (post/fallback/vanilla.hpp:380-411).
"""
import numpy as np

from crypto3_fil_proofs_tpu.models.porep.stacked.vanilla.params import (
    LayerChallenges,
)
from crypto3_fil_proofs_tpu.models.post.fallback import vanilla as fallback


def test_stacked_challenge_domain_and_determinism(rng_seed):
    lc = LayerChallenges(layers=2, max_count=333)
    leaves = 1 << 10
    rid = bytes([7] * 32)
    seed = bytes([9] * 32)
    a = lc.derive(leaves, rid, seed, 0)
    b = lc.derive(leaves, rid, seed, 0)
    assert a == b  # deterministic
    assert all(1 <= c < leaves for c in a)  # never node 0, in range
    # different partition -> different challenges
    c = lc.derive(leaves, rid, seed, 1)
    assert a != c
    # different seed -> different challenges
    d = lc.derive(leaves, rid, bytes([10] * 32), 0)
    assert a != d


def test_stacked_challenge_distribution():
    """Challenges should cover the node space roughly uniformly
    (reference challenges.cpp statistics test)."""
    lc = LayerChallenges(layers=2, max_count=5000)
    leaves = 256
    ch = lc.derive(leaves, bytes([1] * 32), bytes([2] * 32), 0)
    counts = np.bincount(ch, minlength=leaves)
    assert counts[0] == 0  # node 0 excluded
    active = counts[1:]
    mean = active.mean()
    # chi-square-ish sanity: no bucket wildly off uniform
    assert active.min() > mean * 0.3
    assert active.max() < mean * 2.0


def test_fallback_sector_and_leaf_challenges():
    pp = fallback.PublicParams(sector_size=2048, challenge_count=10, sector_count=2)
    rand = bytes([5] * 32)
    prover = bytes([6] * 32)
    sectors = fallback.generate_sector_challenges(rand, 100, 7, prover)
    assert len(sectors) == 100
    assert all(0 <= s < 7 for s in sectors)
    assert len(set(sectors)) > 1  # spread over the set
    leaves = [
        fallback.generate_leaf_challenge(pp, rand, 42, i) for i in range(100)
    ]
    assert all(0 <= l < 64 for l in leaves)
    # deterministic per index, varying across indices
    assert leaves == [
        fallback.generate_leaf_challenge(pp, rand, 42, i) for i in range(100)
    ]
    assert len(set(leaves)) > 10
