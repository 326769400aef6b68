"""Witness-bearing window-PoSt partition at production tree depth
(VERDICT r4 missing #1 / r5 item 1).

Builds ONE real 32GiB-shape tree_r_last on the TPU (2^30 leaves,
(8,8,0): 9 oct base levels + 1 oct sub level), shared by all sectors
of the partition, records exactly the sibling groups the
challenge-derived paths need (sparse recording — the full tree is
never materialized off-device), then runs the REAL pipeline:

    vanilla partition proof -> witness-bearing tiled synthesis ->
    TPU CRS (groth16.setup on the blank circuit) -> prove -> verify

and reports per-stage wall clock + the witness-bearing constraints/s.
Reference semantics: post/fallback/vanilla.hpp challenge derivation,
circuit.hpp Sector subcircuit, compound_proof.hpp:85-137 prove/verify;
paramcache main.cpp:27-113 parameter generation.

Usage:
  python scripts/window_post_scale.py [--sectors 256] [--leaves-log 30]
      [--out scale_runs/window_post.json] [--verify-vanilla]

The sector count scales the circuit (45.4k constraints/sector at
production depth: 256 -> 11.6M, 512 -> 23.2M); --leaves-log shrinks
the tree for smoke tests (27 -> one base tree of 8^9).
"""
from __future__ import annotations

import argparse
import hashlib
import json
import os
import resource
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

TIMES: dict[str, float] = {}


def timed(name):
    class _T:
        def __enter__(self):
            self.t0 = time.perf_counter()
            print(f"[{time.strftime('%H:%M:%S')}] {name}...", flush=True)
            return self

        def __exit__(self, *a):
            TIMES[name] = round(time.perf_counter() - self.t0, 1)
            print(
                f"[{time.strftime('%H:%M:%S')}] {name}: {TIMES[name]}s",
                flush=True,
            )

    return _T()


def build_shared_tree(log_leaves: int, needed_leaves: list[int]):
    """Device-streamed oct-tree build with sparse path recording.

    Returns (comm_r_last bytes, paths: dict leaf -> list[(siblings, idx)])
    covering every leaf in needed_leaves, hashing in the Montgomery
    domain end-to-end (node bytes = from_mont(limbs) LE — exactly the
    PoseidonBackend convention, so MerkleProof.validate() agrees).
    """
    import jax
    import jax.numpy as jnp

    from crypto3_fil_proofs_tpu.ops.fr_limbs import FR, fr_ops
    from crypto3_fil_proofs_tpu.ops.poseidon_jax import hash_level_mont

    A = 8
    CHUNK_LVLS = min(7, log_leaves // 3)
    chunk_leaves = A**CHUNK_LVLS
    n_leaves = 1 << log_leaves
    assert n_leaves % chunk_leaves == 0
    n_chunks = n_leaves // chunk_leaves
    total_lvls = log_leaves // 3  # oct levels to a single root
    assert A**total_lvls == n_leaves, "leaves must be a power of 8"

    MAXG = 32  # padded needed-group slots per level per chunk

    # per-level needed group starts (global node indices / 8)
    need: list[set] = [set() for _ in range(total_lvls)]
    for leaf in needed_leaves:
        idx = leaf
        for lvl in range(total_lvls):
            need[lvl].add(idx // A)
            idx //= A

    @jax.jit
    def hash_chunk(key, idx_pad):
        # leaves: canonical Montgomery-domain nodes from the on-device
        # PRNG (top limb masked so the value is < r)
        raw = jax.random.bits(
            key, (chunk_leaves, FR.n), jnp.uint32
        ) & jnp.uint32(0xFFFF)
        leaves = raw.at[:, FR.n - 1].set(raw[:, FR.n - 1] & 0x1FFF)
        pulled = []
        level = leaves
        for lvl in range(CHUNK_LVLS):
            # idx_pad[lvl] holds LOCAL group starts (node index / 8
            # relative to this chunk) padded with 0s
            g = level.reshape(-1, A, FR.n)[idx_pad[lvl]]
            pulled.append(g)
            level = hash_level_mont(level, A)
        return level[0], jnp.stack(pulled)  # root16, [L, MAXG, 8, 16]

    t_hash = 0.0
    base_key = jax.random.PRNGKey(0x5EED)
    # recorded groups: (lvl, global_group_start) -> [8, 16] u32 mont
    rec: dict[tuple[int, int], np.ndarray] = {}
    chunk_roots = np.empty((n_chunks, FR.n), np.uint32)
    for c in range(n_chunks):
        idx_pad = np.zeros((CHUNK_LVLS, MAXG), np.int32)
        locals_per_lvl: list[list[int]] = []
        for lvl in range(CHUNK_LVLS):
            lo = (c * chunk_leaves) // (A ** (lvl + 1))
            hi = ((c + 1) * chunk_leaves) // (A ** (lvl + 1))
            wanted = sorted(g for g in need[lvl] if lo <= g < hi)
            assert len(wanted) <= MAXG, (c, lvl, len(wanted))
            locals_per_lvl.append(wanted)
            for j, g in enumerate(wanted):
                idx_pad[lvl, j] = g - lo
        t0 = time.perf_counter()
        root, pulled = hash_chunk(
            jax.random.fold_in(base_key, c), jnp.asarray(idx_pad)
        )
        pulled_np = np.asarray(pulled)
        chunk_roots[c] = np.asarray(root)
        t_hash += time.perf_counter() - t0
        for lvl, wanted in enumerate(locals_per_lvl):
            for j, g in enumerate(wanted):
                rec[(lvl, g)] = pulled_np[lvl, j]
        if c % 64 == 0:
            print(
                f"  chunk {c}/{n_chunks} ({t_hash:.0f}s device)",
                flush=True,
            )

    # upper levels: chunk roots -> root, all nodes kept (tiny)
    import jax.numpy as jnp2

    level = jnp2.asarray(chunk_roots)
    lvl = CHUNK_LVLS
    while level.shape[0] > 1:
        nodes = np.asarray(level).reshape(-1, A, FR.n)
        for g in range(nodes.shape[0]):
            rec[(lvl, g)] = nodes[g]
        level = hash_level_mont(level, A)
        lvl += 1
    assert lvl == total_lvls
    root_mont = np.asarray(level[0])

    def to_bytes(mont_row: np.ndarray) -> bytes:
        import jax.numpy as j

        plain = np.asarray(
            fr_ops.from_mont(j.asarray(mont_row[None]))
        )[0].astype(np.uint16)
        return plain.tobytes()

    # decode every recorded group once (vectorized from_mont)
    keys = list(rec.keys())
    stack = jnp2.asarray(np.stack([rec[k] for k in keys]))  # [G, 8, 16]
    plain = np.asarray(fr_ops.from_mont(stack)).astype(np.uint16)
    group_bytes = {
        k: [plain[i, j].tobytes() for j in range(A)]
        for i, k in enumerate(keys)
    }

    from crypto3_fil_proofs_tpu.core.merkle.tree import (
        MerkleProof,
        ProofLevel,
    )

    root_bytes = to_bytes(root_mont)
    paths: dict[int, MerkleProof] = {}
    for leaf in needed_leaves:
        path = []
        idx = leaf
        leaf_bytes = None
        for lvl2 in range(total_lvls):
            group = idx // A
            pos = idx % A
            nodes_b = group_bytes[(lvl2, group)]
            if lvl2 == 0:
                leaf_bytes = nodes_b[pos]
            path.append(
                ProofLevel(
                    [nodes_b[j] for j in range(A) if j != pos], pos
                )
            )
            idx = group
        paths[leaf] = MerkleProof(
            leaf=leaf_bytes, root=root_bytes, path=path, backend="poseidon"
        )
    return root_bytes, paths


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sectors", type=int, default=256)
    ap.add_argument("--challenges", type=int, default=10)
    ap.add_argument("--leaves-log", type=int, default=30)
    ap.add_argument("--out", default="scale_runs/window_post.json")
    ap.add_argument("--verify-vanilla", action="store_true")
    ap.add_argument("--skip-prove", action="store_true")
    args = ap.parse_args()

    os.environ.setdefault("FIL_PROOFS_SETUP_PROGRESS", "1")

    from crypto3_fil_proofs_tpu.models.post.fallback import (
        circuit as fcircuit,
        vanilla as fv,
    )
    from crypto3_fil_proofs_tpu.ops.poseidon import hash2
    from crypto3_fil_proofs_tpu.zk import groth16

    S, C = args.sectors, args.challenges
    sector_size = (1 << args.leaves_log) * fv.NODE_SIZE
    pp = fv.PublicParams(sector_size, C, S)
    randomness = hashlib.sha256(b"wps-randomness").digest()[:32]
    prover_id = hashlib.sha256(b"wps-prover").digest()[:32]

    # challenge positions for every (sector, challenge)
    chall: dict[tuple[int, int], int] = {}
    for i in range(S):
        for n in range(C):
            chall[(i, n)] = fv.generate_leaf_challenge(
                pp, randomness, i, i * C + n
            )
    needed = sorted(set(chall.values()))
    print(f"{S} sectors x {C} challenges -> {len(needed)} distinct leaves")

    with timed("tree_build"):
        comm_r_last, paths = build_shared_tree(args.leaves_log, needed)

    comm_c = hashlib.sha256(b"wps-comm-c").digest()[:31] + b"\x00"
    comm_r = hash2(
        int.from_bytes(comm_c, "little"),
        int.from_bytes(comm_r_last, "little"),
    ).to_bytes(32, "little")

    # spot-check the recorded paths against the byte-level backend
    for leaf in needed[:3]:
        assert paths[leaf].validate(), "path validation failed"
        assert paths[leaf].proves_challenge(leaf)
    print("path spot-checks OK")

    pub_inputs = fv.PublicInputs(
        randomness=randomness,
        prover_id=prover_id,
        sectors=[fv.PublicSector(id=i, comm_r=comm_r) for i in range(S)],
        k=0,
    )
    partition_proof = fv.Proof(
        sectors=[
            fv.SectorProof(
                inclusion_proofs=[paths[chall[(i, n)]] for n in range(C)],
                comm_c=comm_c,
                comm_r_last=comm_r_last,
            )
            for i in range(S)
        ]
    )
    if args.verify_vanilla:
        with timed("vanilla_verify"):
            ok = fv.FallbackPoSt.verify_all_partitions(
                pp, pub_inputs, [partition_proof]
            )
            assert ok, "vanilla verification failed"

    with timed("witness_synthesis"):
        cs = fcircuit.circuit_from_vanilla(
            pp, pub_inputs, partition_proof, 0, blank=False
        )
    n_constraints = cs.num_constraints
    print(f"constraints: {n_constraints} "
          f"({n_constraints / TIMES['witness_synthesis'] / 1e6:.2f}M c/s)")

    with timed("satisfaction_check"):
        bad = cs.which_unsatisfied()
        assert bad is None, f"unsatisfied: {bad}"

    result = {
        "sectors": S,
        "challenges": C,
        "leaves_log": args.leaves_log,
        "constraints": n_constraints,
        "witness_synth_cps": round(
            n_constraints / TIMES["witness_synthesis"]
        ),
    }

    if not args.skip_prove:
        with timed("blank_synthesis"):
            blank_cs = fcircuit.circuit_from_vanilla(
                pp, pub_inputs, partition_proof, 0, blank=True
            )
        with timed("crs_setup"):
            pk = groth16.setup(blank_cs, seed=b"wps-crs")
        del blank_cs
        with timed("prove"):
            proof = groth16.prove(pk, cs, randomness=b"wps-prove")
        with timed("verify"):
            inputs = fcircuit.generate_public_inputs(pp, pub_inputs, 0)
            ok = groth16.verify(pk.vk, proof, inputs)
        assert ok, "Groth16 verification FAILED"
        print("Groth16 proof VERIFIES")
        result["proof_hex"] = proof.to_bytes().hex()
        import hashlib as _h

        result["vk_digest"] = _h.sha256(
            b"".join(
                np.asarray(v).tobytes()
                for v in pk.vk.to_npz_dict().values()
            )
        ).hexdigest()

    result["times_s"] = TIMES
    result["peak_rss_gb"] = round(
        resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6, 2
    )
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result)[:600])
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
