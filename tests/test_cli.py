"""CLI tools: fakeipfsadd, parampublish/paramfetch manifest flow, phase2
ceremony on a small circuit (reference bin/ tests + fakeipfsadd stub)."""
import json
import os
import subprocess
import sys

import pytest

from crypto3_fil_proofs_tpu.cli import fakeipfsadd, paramfetch, parampublish
from crypto3_fil_proofs_tpu import param as param_mod


def test_fakeipfsadd_deterministic(tmp_path, capsys):
    p = tmp_path / "f.bin"
    p.write_bytes(b"hello parameters")
    assert fakeipfsadd.main(["add", "-Q", str(p)]) == 0
    cid1 = capsys.readouterr().out.strip()
    assert fakeipfsadd.main(["add", "-Q", str(p)]) == 0
    cid2 = capsys.readouterr().out.strip()
    assert cid1 == cid2 and cid1.startswith("Qmfake")


def test_parampublish_and_fetch_roundtrip(tmp_path, monkeypatch, capsys):
    # point the parameter cache at a temp dir with fake param files
    cache = tmp_path / "cache"
    cache.mkdir()
    monkeypatch.setenv("FIL_PROOFS_PARAMETER_CACHE", str(cache))
    from crypto3_fil_proofs_tpu.core.settings import reset_settings

    reset_settings()
    (cache / "v28-aaaa.params").write_bytes(b"params-bytes")
    (cache / "v28-aaaa.vk").write_bytes(b"vk-bytes")

    # publish via the python fakeipfsadd as the ipfs binary
    fake_bin = tmp_path / "ipfs"
    fake_bin.write_text(
        f"#!/bin/sh\nexec {sys.executable} -m "
        "crypto3_fil_proofs_tpu.cli.fakeipfsadd \"$@\"\n"
    )
    fake_bin.chmod(0o755)
    manifest_path = str(tmp_path / "parameters.json")
    assert parampublish.main(
        ["--json", manifest_path, "--ipfs-bin", str(fake_bin), "--all"]
    ) == 0
    manifest = json.load(open(manifest_path))
    assert set(manifest) == {"v28-aaaa.params", "v28-aaaa.vk"}
    assert all(v["cid"].startswith("Qmfake") for v in manifest.values())

    # fetch: all files already cached with matching digests -> success
    assert paramfetch.main(["--json", manifest_path, "--all"]) == 0

    # corrupt one file: fetch should fail (no real ipget available)
    (cache / "v28-aaaa.params").write_bytes(b"corrupted")
    assert paramfetch.main(["--json", manifest_path, "--all"]) == 1
    reset_settings()


def test_phase2_contribute_verify(tmp_path, monkeypatch, capsys):
    """Ceremony on a tiny circuit: new -> contribute -> verify, and the
    contributed key still proves/verifies."""
    monkeypatch.setenv("FIL_PROOFS_PARAMETER_CACHE", str(tmp_path / "pc"))
    from crypto3_fil_proofs_tpu.core.settings import reset_settings

    reset_settings()
    from crypto3_fil_proofs_tpu.core.parameter_cache import _load_pk, _save_pk
    from crypto3_fil_proofs_tpu.cli import phase2
    from crypto3_fil_proofs_tpu.zk import groth16
    from crypto3_fil_proofs_tpu.zk.r1cs import ConstraintSystem, LinearCombination, lc_one
    from crypto3_fil_proofs_tpu.zk.gadgets.num import AllocatedNum
    from crypto3_fil_proofs_tpu.ops.bls12_381 import R

    def cubic(x):
        cs = ConstraintSystem()
        xn = AllocatedNum.alloc(cs, x)
        x2 = xn.square(cs)
        x3 = x2.mul(cs, xn)
        out = AllocatedNum.alloc_input(cs, (x3.value + xn.value + 5) % R)
        cs.enforce(
            x3.lc() + xn.lc() + LinearCombination.constant(5), lc_one(), out.lc(),
        )
        return cs

    pk = groth16.setup(cubic(3), seed=b"phase2-test")
    p0 = str(tmp_path / "ceremony_0")
    _save_pk(p0, pk)

    ns = phase2.main(["contribute", p0, "--seed", "alice"])
    assert ns == 0
    p1 = str(tmp_path / "ceremony_1")
    assert os.path.exists(p1)
    assert phase2.main(["verify", p0, p1]) == 0
    assert phase2.main(["small", p1]) == 0

    # verifyd: the daemon walks the chain _0 -> _1 -> _2 as files appear
    # (reference main.cpp verify_param_transistions_daemon :416-560;
    # bounded via --rounds so the test terminates)
    assert phase2.main(["contribute", p1, "--seed", "carol"]) == 0
    assert os.path.exists(str(tmp_path / "ceremony_2"))
    assert phase2.main(["verifyd", p0, "--sleep", "0.01", "--rounds", "2"]) == 0

    # proofs under the contributed key verify with the contributed vk
    new_pk = _load_pk(p1)
    cs = cubic(3)
    proof = groth16.prove(new_pk, cs)
    out_public = (3**3 + 3 + 5) % R
    assert groth16.verify(new_pk.vk, proof, [out_public])
    # ...and NOT with the original vk (delta changed)
    assert not groth16.verify(pk.vk, proof, [out_public])
    reset_settings()


def test_phase2_convert_merge_split_keys(tmp_path, monkeypatch):
    """New subcommands (reference bin/phase2/src/main.cpp:604-):
    convert (raw<->compressed container), small --out + merge
    (contribution-chain grafting), split-keys (publish triple)."""
    monkeypatch.setenv("FIL_PROOFS_PARAMETER_CACHE", str(tmp_path / "pc"))
    from crypto3_fil_proofs_tpu.core.settings import reset_settings

    reset_settings()
    from crypto3_fil_proofs_tpu.cli import phase2
    from crypto3_fil_proofs_tpu.core.parameter_cache import (
        _load_pk,
        _save_pk,
        params_path,
        vk_path,
        meta_path,
    )
    from crypto3_fil_proofs_tpu.zk import groth16
    from crypto3_fil_proofs_tpu.zk.r1cs import ConstraintSystem, LinearCombination, lc_one
    from crypto3_fil_proofs_tpu.zk.gadgets.num import AllocatedNum
    from crypto3_fil_proofs_tpu.ops.bls12_381 import R

    cs = ConstraintSystem()
    xn = AllocatedNum.alloc(cs, 3)
    x2 = xn.square(cs)
    out = AllocatedNum.alloc_input(cs, (x2.value + 1) % R)
    cs.enforce(x2.lc() + LinearCombination.constant(1), lc_one(), out.lc())
    pk = groth16.setup(cs, seed=b"phase2-mcs")
    p0 = str(tmp_path / "ceremony_0")
    _save_pk(p0, pk)
    assert phase2.main(["contribute", p0, "--seed", "bob"]) == 0
    p1 = str(tmp_path / "ceremony_1")

    # convert: raw roundtrip preserves the key bit-exactly
    praw = str(tmp_path / "ceremony_raw")
    assert phase2.main(["convert", p1, "--to", "raw", "--out", praw]) == 0
    import numpy as np

    a, b = _load_pk(p1), _load_pk(praw)
    assert np.array_equal(a.a_query[0], b.a_query[0])
    assert a.vk.to_npz_dict()["vk_delta"].tobytes() == b.vk.to_npz_dict()["vk_delta"].tobytes()

    # small --out + merge against the original
    small = str(tmp_path / "small.json")
    assert phase2.main(["small", p1, "--out", small]) == 0
    assert phase2.main(["merge", small, p1, "--original", p0]) == 0
    assert os.path.exists(p1 + ".meta")
    # tampered small file must fail the merge
    import json

    with open(small) as f:
        data = json.load(f)
    data["delta_g1"] = "00" + data["delta_g1"][2:]
    bad = str(tmp_path / "bad.json")
    with open(bad, "w") as f:
        json.dump(data, f)
    assert phase2.main(["merge", bad, p1]) == 1

    # split-keys writes the v28 triple
    assert phase2.main(["split-keys", p1, "--prefix", "test-circuit-mcs"]) == 0
    assert os.path.exists(params_path("test-circuit-mcs"))
    assert os.path.exists(vk_path("test-circuit-mcs"))
    assert os.path.exists(meta_path("test-circuit-mcs"))
    reset_settings()
