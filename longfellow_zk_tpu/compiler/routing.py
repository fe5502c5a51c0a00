"""Variable shift/rotate routing networks
(reference lib/circuits/logic/routing.h:205-445).

shift: B[i] = A[i + amount]; unshift: A[i + amount] = B[i] — log-depth
barrel shifters with an `unroll` parameter trading muxer radix for
depth; used to select attribute substrings inside CBOR documents.
Element type T is a BitW, an EltW wire, or a list of BitW (bitvec),
handled uniformly.
"""

from __future__ import annotations

from typing import List, Sequence

from ..proto.lfc1 import lg
from .logic import BitW, Logic


def _ceildiv(a: int, b: int) -> int:
    return -(-a // b)


class Routing:
    def __init__(self, l: Logic):
        self.l = l

    # -- public API ---------------------------------------------------------

    def shift(self, amount: Sequence[BitW], k: int, A: List, defaultA,
              unroll: int = 1) -> List:
        """Return B[0:k] with B[i] = A[i + amount]."""
        L = self.l
        logn = len(amount)
        n = len(A)
        tmp = list(A)
        l = logn
        target_nrounds = _ceildiv(logn, unroll)
        while target_nrounds > 0:
            consumed = _ceildiv(l, target_nrounds)
            target_nrounds -= 1
            l -= consumed
            shift = 1 << l
            self._shift_step(consumed, amount[l : l + consumed], n, k, tmp,
                             shift, defaultA)
        assert l == 0
        return [tmp[i] if i < n else defaultA for i in range(k)]

    def unshift(self, amount: Sequence[BitW], n: int, k: int, B: List,
                defaultB, unroll: int = 1) -> List:
        """Return A[0:n] with A[i + amount] = B[i] (and defaultB elsewhere)."""
        logn = len(amount)
        A = [B[i] if i < k else defaultB for i in range(n)]
        l = 0
        target_nrounds = _ceildiv(logn, unroll)
        while target_nrounds > 0:
            consumed = _ceildiv(logn - l, target_nrounds)
            target_nrounds -= 1
            shift = 1 << l
            self._unshift_step(consumed, amount[l : l + consumed], n, k, A,
                               shift, defaultB)
            l += consumed
        assert l == logn
        return A

    # -- internals ----------------------------------------------------------

    def _amount_is(self, logc: int, amount: Sequence[BitW]) -> List[BitW]:
        L = self.l
        out = []
        for i in range(1 << logc):
            ibits = L.bits(logc, i)
            out.append(L.eq_reduce(ibits, list(amount)))
        return out

    def _combine(self, sel: BitW, val):
        """amount_is[j] AND/select element (type-dispatched)."""
        L = self.l
        if isinstance(val, BitW):
            return L.land(sel, val)
        if isinstance(val, list):
            return [L.land(sel, v) for v in val]
        return L.lmul(sel, val)  # EltW wire

    def _accumulate(self, acc, term):
        L = self.l
        if acc is None:
            return term
        if isinstance(term, BitW):
            return L.lor_exclusive(acc, term)
        if isinstance(term, list):
            return [L.lor_exclusive(a, t) for a, t in zip(acc, term)]
        return L.add(acc, term)

    def _shift_step(self, logc, amount, n, k, tmp, shift, defaultA):
        amount_is = self._amount_is(logc, amount)
        c = 1 << logc
        limit = min(n, k + shift)
        new = list(tmp)
        for i in range(limit):
            acc = None
            for j in range(c):
                src = tmp[i + j * shift] if i + j * shift < n else defaultA
                acc = self._accumulate(acc, self._combine(amount_is[j], src))
            new[i] = acc
        tmp[:limit] = new[:limit]

    def _unshift_step(self, logc, amount, n, k, A, shift, defaultB):
        amount_is = self._amount_is(logc, amount)
        c = 1 << logc
        start = min(n, k + c * shift)
        for i in range(start - 1, -1, -1):
            acc = None
            for j in range(c):
                src = A[i - j * shift] if i >= j * shift else defaultB
                acc = self._accumulate(acc, self._combine(amount_is[j], src))
            A[i] = acc
