"""Sparse multi-affine arrays (reference lib/arrays/sparse.h:37-194).

A testing/reference representation of multilinear functions as a list of
(p0, p1, p2, v) corners on a 3-index hypercube, with binding, reshape,
canonicalization, and coalescing — the semantic oracle against which the
dense/quad device kernels are checked (the reference uses it the same
way; sumcheck itself uses the specialized quad representation).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List


@dataclass
class Corner:
    p0: int
    p1: int
    p2: int
    v: object

    def key(self):
        return (self.p2, self.p1, self.p0)


class Sparse:
    def __init__(self, corners: List[Corner] = None):
        self.c: List[Corner] = list(corners or [])

    def clone_testing_only(self) -> "Sparse":
        return Sparse([Corner(x.p0, x.p1, x.p2, x.v) for x in self.c])

    def scalar(self):
        """Value after full binding (sparse.h:155-163)."""
        assert len(self.c) <= 1
        if not self.c:
            return 0
        x = self.c[0]
        assert (x.p0, x.p1, x.p2) == (0, 0, 0)
        return x.v

    def bind(self, F, r) -> None:
        """Bind the low-order bit of p0:
        out[p] = (1-r)*in[2p] + r*in[2p+1] (sparse.h:116-134)."""
        for x in self.c:
            if x.p0 & 1:
                x.v = F.mul_i(r, x.v)
            else:
                x.v = F.mul_i(F.sub_i(F.of_scalar(1), r), x.v)
            x.p0 >>= 1
        self.coalesce(F)

    def bind_all(self, F, logv: int, rs) -> None:
        for v in range(logv):
            self.bind(F, rs[v])

    def reshape(self) -> None:
        """(p0, p1, p2) -> (p1, p2, 0) after p0 is fully bound
        (sparse.h:143-152)."""
        for x in self.c:
            assert x.p0 == 0
            x.p0, x.p1, x.p2 = x.p1, x.p2, 0

    def canonicalize(self, F) -> None:
        """Sort by index (ties by value) and merge duplicates
        (sparse.h:165-171)."""
        self.c.sort(key=lambda x: x.key())
        self.coalesce(F)

    def coalesce(self, F) -> None:
        """Merge adjacent corners with equal indices (sparse.h:174-194)."""
        out: List[Corner] = []
        for x in self.c:
            if out and out[-1].key() == x.key():
                out[-1].v = F.add_i(out[-1].v, x.v)
            else:
                out.append(x)
        self.c = [x for x in out if x.v != F.of_scalar(0)]
