"""Numpy prototype: four-step NTT with DIF/DIT kernels and no bitrev
passes. Locks the permutation algebra before the pallas port.

Forward (difp): natural coeffs -> P-order evals.
Inverse (ditp): P-order evals -> natural coeffs.
Identity + cross-check vs ntt_host at 2^6 and 2^10 (R=C and R!=C).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from crypto3_fil_proofs_tpu.ops.ntt import _root_of_unity, ntt_host
from crypto3_fil_proofs_tpu.ops.bls12_381 import R as MOD


def dif(a, omega):
    """In-place DIF stages: natural in -> bitrev out. a: python-int list."""
    n = len(a)
    m = n
    while m >= 2:
        wm = pow(omega, n // m, MOD)
        for k in range(0, n, m):
            w = 1
            for j in range(m // 2):
                u, v = a[k + j], a[k + j + m // 2]
                a[k + j] = (u + v) % MOD
                a[k + j + m // 2] = ((u - v) * w) % MOD
                w = (w * wm) % MOD
        m //= 2
    return a


def dit(a, omega):
    """DIT stages: bitrev in -> natural out."""
    n = len(a)
    m = 2
    while m <= n:
        wm = pow(omega, n // m, MOD)
        for k in range(0, n, m):
            w = 1
            for j in range(m // 2):
                t = (w * a[k + j + m // 2]) % MOD
                u = a[k + j]
                a[k + j] = (u + t) % MOD
                a[k + j + m // 2] = (u - t) % MOD
                w = (w * wm) % MOD
        m *= 2
    return a


def bitrev_perm(n):
    l = n.bit_length() - 1
    idx = np.arange(n)
    rev = np.zeros(n, np.int64)
    for b in range(l):
        rev |= ((idx >> b) & 1) << (l - 1 - b)
    return rev


def fwd_difp(x, logR, logC):
    """Four-step DIF: natural input x[i], i = c + C*r (r slow).
    Column transforms along r, twiddle, transpose, row transforms.
    Output in P order (determined here; the inverse consumes it)."""
    R_, C_ = 1 << logR, 1 << logC
    n = R_ * C_
    wN = _root_of_unity(n.bit_length() - 1)
    wR = pow(wN, C_, MOD)  # length-R root
    wC = pow(wN, R_, MOD)  # length-C root
    M = np.array(x, dtype=object).reshape(R_, C_)  # M[r, c] = x[c + C*r]?
    # careful: reshape row-major gives M[r, c] = x[r*C + c]
    # step 1: length-R DIF along r for each c
    for c in range(C_):
        col = dif(list(M[:, c]), wR)
        M[:, c] = col  # bitrev-R order index kr'
    # step 2: twiddle: entry (kr', c) *= wN^(bitrevR(kr') * c)
    brR = bitrev_perm(R_)
    for kr in range(R_):
        for c in range(C_):
            M[kr, c] = (M[kr, c] * pow(wN, int(brR[kr]) * c, MOD)) % MOD
    # step 3: length-C DIF along c for each kr'
    for kr in range(R_):
        M[kr, :] = dif(list(M[kr, :]), wC)
    # output order: entry (kr', kc') holds X[bitrevR(kr') + R*bitrevC(kc')]
    return M.reshape(-1)  # P-order flat: index kr'*C + kc'


def inv_ditp(y, logR, logC):
    """Inverse of fwd_difp: P-order in -> natural out (with 1/n)."""
    R_, C_ = 1 << logR, 1 << logC
    n = R_ * C_
    wN = _root_of_unity(n.bit_length() - 1)
    wNi = pow(wN, MOD - 2, MOD)
    wRi = pow(pow(wN, C_, MOD), MOD - 2, MOD)
    wCi = pow(pow(wN, R_, MOD), MOD - 2, MOD)
    M = np.array(y, dtype=object).reshape(R_, C_)
    brR = bitrev_perm(R_)
    # undo step 3: DIT along c (bitrev in, natural out), inverse root
    for kr in range(R_):
        M[kr, :] = dit(list(M[kr, :]), wCi)
    # undo step 2
    for kr in range(R_):
        for c in range(C_):
            M[kr, c] = (M[kr, c] * pow(wNi, int(brR[kr]) * c, MOD)) % MOD
    # undo step 1: DIT along r
    for c in range(C_):
        M[:, c] = dit(list(M[:, c]), wRi)
    ninv = pow(n, MOD - 2, MOD)
    return [(int(v) * ninv) % MOD for v in M.reshape(-1)]


def perm_P(logR, logC):
    """P with y = fwd_difp(x): y[j] == NTT(x)[P[j]]."""
    R_, C_ = 1 << logR, 1 << logC
    brR, brC = bitrev_perm(R_), bitrev_perm(C_)
    P = np.zeros(R_ * C_, np.int64)
    for kr in range(R_):
        for kc in range(C_):
            P[kr * C_ + kc] = brR[kr] + R_ * brC[kc]
    return P


def main():
    rng = np.random.default_rng(0)
    for logR, logC in [(3, 3), (3, 4), (5, 5)]:
        n = 1 << (logR + logC)
        x = [int(rng.integers(0, 1 << 62)) % MOD for _ in range(n)]
        y = fwd_difp(x, logR, logC)
        want = ntt_host(x)
        P = perm_P(logR, logC)
        ok_fwd = all(int(y[j]) == want[P[j]] for j in range(n))
        back = inv_ditp(y, logR, logC)
        ok_inv = back == [v % MOD for v in x]
        print(f"R=2^{logR} C=2^{logC}: fwd-P={ok_fwd} roundtrip={ok_inv}")
        assert ok_fwd and ok_inv


if __name__ == "__main__":
    main()
