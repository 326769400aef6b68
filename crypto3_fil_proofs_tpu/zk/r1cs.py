"""R1CS constraint system (bellperson-style) for the proof circuits.

Replaces the reference's consumed `crypto3-zk` blueprint /
`components::component` circuit framework (reference: SURVEY.md L0;
core/components/por.hpp:33-36 consumes blueprint<FieldType>,
blueprint_variable; the checked-in circuits are bellperson `synthesize`
ports — e.g. porep/stacked/circuit/proof.hpp:41-75).

Host-side object model: synthesis builds sparse linear combinations
over python-int Fr coefficients; witness values are computed eagerly
(every allocation carries its value, as in bellperson's proving-mode
synthesis). The Groth16 prover (zk/groth16.py) consumes the matrices;
its heavy math (QAP NTTs, MSMs) runs on TPU via ops/.
"""
from __future__ import annotations

from dataclasses import dataclass, field

from ..ops.bls12_381 import R

ONE = 0  # variable index of the constant 1


class LinearCombination:
    """Sparse sum of (variable, coefficient) terms over Fr."""

    __slots__ = ("terms",)

    def __init__(self, terms: dict[int, int] | None = None):
        self.terms = dict(terms) if terms else {}

    @classmethod
    def from_var(cls, var: int, coeff: int = 1) -> "LinearCombination":
        return cls({var: coeff % R})

    @classmethod
    def constant(cls, value: int) -> "LinearCombination":
        return cls({ONE: value % R}) if value % R else cls()

    @classmethod
    def from_terms(cls, terms: dict[int, int]) -> "LinearCombination":
        """Wrap a prebuilt {var: coeff} dict (hot-path constructor —
        avoids the O(n^2) copying of incremental `lc + lc` chains)."""
        out = cls()
        out.terms = {v: c for v, c in terms.items() if c % R}
        return out

    def accumulate(self, var: int, coeff: int) -> None:
        """In-place add of one term (hot-path; use on fresh LCs only)."""
        c = (self.terms.get(var, 0) + coeff) % R
        if c:
            self.terms[var] = c
        elif var in self.terms:
            del self.terms[var]

    def add_term(self, var: int, coeff: int) -> "LinearCombination":
        out = LinearCombination(self.terms)
        out.terms[var] = (out.terms.get(var, 0) + coeff) % R
        if out.terms[var] == 0:
            del out.terms[var]
        return out

    def __add__(self, other):
        if isinstance(other, int):
            return self.add_term(ONE, other)
        out = LinearCombination(self.terms)
        for v, c in other.terms.items():
            out.terms[v] = (out.terms.get(v, 0) + c) % R
            if out.terms[v] == 0:
                del out.terms[v]
        return out

    def __sub__(self, other):
        if isinstance(other, int):
            return self.add_term(ONE, -other)
        return self + other.scale(R - 1)

    def scale(self, k: int) -> "LinearCombination":
        k %= R
        if k == 0:
            return LinearCombination()
        return LinearCombination({v: (c * k) % R for v, c in self.terms.items()})

    def evaluate(self, assignment: list[int]) -> int:
        return sum(c * assignment[v] for v, c in self.terms.items()) % R


def lc_zero() -> LinearCombination:
    return LinearCombination()


def lc_one() -> LinearCombination:
    return LinearCombination.from_var(ONE)


@dataclass
class ConstraintSystem:
    """Proving-mode constraint system: matrices + full witness.

    Variable order matches Groth16 conventions: [one, public inputs...,
    auxiliary...]. Internally public inputs are allocated eagerly;
    auxiliary variables are appended after. `finalize()` produces the
    (num_inputs, num_aux, a/b/c) view used by the prover.
    """

    values: list[int] = field(default_factory=lambda: [1])
    is_input: list[bool] = field(default_factory=lambda: [True])
    constraints: list[tuple] = field(default_factory=list)
    names: list[str] = field(default_factory=list)
    _path: list[str] = field(default_factory=list)
    _prefix: str = ""

    # -- namespaces (debugging parity with bellperson paths) ---------------

    def push_namespace(self, name: str) -> None:
        self._path.append(name)
        self._prefix = "/".join(self._path)

    def pop_namespace(self) -> None:
        self._path.pop()
        self._prefix = "/".join(self._path)

    def namespace(self, name: str):
        cs = self

        class _Ns:
            def __enter__(self):
                cs.push_namespace(name)
                return cs

            def __exit__(self, *exc):
                cs.pop_namespace()
                return False

        return _Ns()

    # -- allocation --------------------------------------------------------

    def alloc(self, value: int, name: str = "aux") -> int:
        """Allocate an auxiliary (private) variable with a known value."""
        self.values.append(value % R)
        self.is_input.append(False)
        return len(self.values) - 1

    def alloc_input(self, value: int, name: str = "input") -> int:
        """Allocate a public-input variable."""
        self.values.append(value % R)
        self.is_input.append(True)
        return len(self.values) - 1

    # -- constraints -------------------------------------------------------

    def enforce(self, a: LinearCombination, b: LinearCombination,
                c: LinearCombination, name: str = "") -> None:
        # constraints store plain {var: coeff} dicts (no LC wrappers) —
        # the storage format the QAP consumers iterate directly
        self.constraints.append((a.terms, b.terms, c.terms))
        if name:
            self.names.append(
                self._prefix + "/" + name if self._prefix else name
            )
        else:
            self.names.append(self._prefix)

    def enforce_raw(self, a_terms: dict, b_terms: dict, c_terms: dict) -> None:
        """Hot-path enforce: prebuilt {var: coeff} dicts are appended
        as-is (coeffs must already be reduced mod R, zeros dropped) —
        the bit-gadget emission path (SHA-256 dominates SDR synthesis)
        goes through here."""
        self.constraints.append((a_terms, b_terms, c_terms))
        self.names.append(self._prefix)

    @property
    def num_constraints(self) -> int:
        return len(self.constraints)

    @property
    def num_inputs(self) -> int:
        return sum(self.is_input)

    @property
    def num_aux(self) -> int:
        return len(self.values) - self.num_inputs

    def is_satisfied(self) -> bool:
        return self.which_unsatisfied() is None

    def which_unsatisfied(self) -> str | None:
        assignment = self.values
        for i, (a, b, c) in enumerate(self.constraints):
            av = sum(co * assignment[v] for v, co in a.items())
            bv = sum(co * assignment[v] for v, co in b.items())
            cv = sum(co * assignment[v] for v, co in c.items())
            if (av * bv - cv) % R != 0:
                return self.names[i] or f"constraint {i}"
        return None

    # -- Groth16 view ------------------------------------------------------

    def finalize(self):
        """Reindex variables to [one, inputs..., aux...] order.

        Returns (num_inputs, num_aux, constraints', input_values,
        aux_values) where constraints' use the reindexed variables.
        """
        n = len(self.values)
        new_index = [0] * n
        inputs, aux = [], []
        for i in range(n):
            if self.is_input[i]:
                new_index[i] = len(inputs)
                inputs.append(self.values[i])
            else:
                aux.append(self.values[i])
        n_in = len(inputs)
        k = 0
        for i in range(n):
            if not self.is_input[i]:
                new_index[i] = n_in + k
                k += 1
        remapped = []
        for a, b, c in self.constraints:
            remapped.append(
                tuple(
                    {new_index[v]: co for v, co in terms.items()}
                    for terms in (a, b, c)
                )
            )
        return n_in, len(aux), remapped, inputs, aux
