"""Core PoR scheme, streaming fr32 reader, incremental commitment reader,
DRG circuit (reference tests: core/por.cpp, fr32_reader.cpp,
commitment_reader.cpp, porep/drg/circuit ladder)."""
import numpy as np
import pytest

from crypto3_fil_proofs_tpu.api.commitment_reader import CommitmentReader
from crypto3_fil_proofs_tpu.api.fr32_reader import Fr32Reader
from crypto3_fil_proofs_tpu.api.pieces import generate_piece_commitment
from crypto3_fil_proofs_tpu.core.fr32 import write_padded
from crypto3_fil_proofs_tpu.core.merkle.tree import MerkleTree
from crypto3_fil_proofs_tpu.core.por import (
    PoR,
    PoRPrivateInputs,
    PoRPublicInputs,
    PoRPublicParams,
    PoRSetupParams,
)


@pytest.mark.parametrize(
    "backend,arity",
    # hasher x arity matrix, reference test/core/por.cpp:30-96 (its
    # PedersenHasher leg consumed the stubbed pedersen.hpp; ours is real)
    [("poseidon", 8), ("sha256", 2), ("pedersen", 2), ("pedersen", 4)],
)
def test_por_roundtrip(backend, arity, rng_seed):
    rng = np.random.default_rng(rng_seed)
    leaves = rng.integers(0, 64, size=(arity**2, 32), dtype=np.uint8)
    tree = MerkleTree.build(leaves, arity, backend)
    pp = PoR.setup(PoRSetupParams(leaves=arity**2))
    pub = PoRPublicInputs(challenge=5, commitment=tree.root())
    priv = PoRPrivateInputs(leaf=tree.leaf(5), tree=tree)
    proof = PoR.prove(pp, pub, priv)
    assert PoR.verify(pp, pub, proof)
    # wrong commitment
    bad = PoRPublicInputs(challenge=5, commitment=bytes(32))
    assert not PoR.verify(pp, bad, proof)
    # wrong challenge
    assert not PoR.verify(pp, PoRPublicInputs(challenge=6, commitment=tree.root()), proof)


def test_fr32_reader_matches_batch(rng_seed):
    rng = np.random.default_rng(rng_seed)
    for size in (0, 1, 126, 127, 128, 1000, 2032):
        data = bytes(rng.integers(0, 256, size=size, dtype=np.uint8))
        want = write_padded(data)
        # whole-stream read
        assert Fr32Reader(data).read() == want
        # chunked reads
        r = Fr32Reader(data)
        got = b""
        while True:
            chunk = r.read(100)
            if not chunk:
                break
            got += chunk
        assert got == want, f"chunked mismatch at size {size}"


def test_commitment_reader_matches_piece_commitment(rng_seed):
    rng = np.random.default_rng(rng_seed)
    raw = bytes(rng.integers(0, 256, size=127 * 4, dtype=np.uint8))
    want = generate_piece_commitment(raw).commitment

    cr = CommitmentReader()
    padded = write_padded(raw)
    # feed in uneven chunks
    for i in range(0, len(padded), 100):
        cr.consume(padded[i : i + 100])
    assert cr.finish() == want


def test_drg_circuit_satisfied_and_tamper(rng_seed):
    from crypto3_fil_proofs_tpu.models.porep.drg import circuit as drg_circ
    from crypto3_fil_proofs_tpu.models.porep.drg.vanilla import (
        DrgParams,
        DrgPoRep,
        PrivateInputs,
        PublicInputs,
        SetupParams,
    )

    sp = SetupParams(
        drg=DrgParams(nodes=16, degree=4, expansion_degree=0, seed=bytes([9] * 32)),
        challenges_count=1,
    )
    pp = DrgPoRep.setup(sp)
    rng = np.random.default_rng(rng_seed)
    data = rng.integers(0, 64, size=(16, 32), dtype=np.uint8)
    replica_id = bytes(rng.integers(0, 64, size=32, dtype=np.uint8))
    tau, aux, replica = DrgPoRep.replicate(pp, replica_id, data)
    pub = PublicInputs(replica_id=replica_id, challenges=[7], tau=tau)
    priv = PrivateInputs(tree_d=aux.tree_d, tree_r=aux.tree_r)
    proof = DrgPoRep.prove(pp, pub, priv)
    assert DrgPoRep.verify(pp, pub, proof)

    cs = drg_circ.circuit_from_vanilla(pp, pub, proof)
    assert cs.which_unsatisfied() is None
    want_inputs = drg_circ.generate_public_inputs(pp, pub)
    got_inputs = [v for v, i in zip(cs.values, cs.is_input) if i][1:]
    assert got_inputs == want_inputs

    # tampered replica node breaks the circuit
    import copy

    bad = copy.deepcopy(proof)
    flip = bytearray(bad.replica_nodes[0].data)
    flip[0] ^= 1
    bad.replica_nodes[0].data = bytes(flip)
    cs2 = drg_circ.circuit_from_vanilla(pp, pub, bad)
    assert cs2.which_unsatisfied() is not None
