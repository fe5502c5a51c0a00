"""Bidirectional (truncated) FFT interpolation.

Semantic twin of reference lib/algebra/fft_interpolation.h:29-304 (van
der Hoeven's truncated Fourier transform): given k "evaluations" A[0:k]
(bit-reversed order) and n-k "coefficients" B[j % n] for b0 <= j <
b0+(n-k), fill in the remaining entries of both arrays so that
B == fftf(A) and A == fftb(B).

Host-side utility over Python ints (the reference uses it only in
tests; it is control-plane sized, so the host is the right place —
the device NTT in transforms/ntt.py covers the bulk transforms).
"""

from __future__ import annotations

from typing import List


class FFTInterpolation:
    """All methods take/return lists of natural-form host ints."""

    def __init__(self, F, omega_m: int, m: int, n: int):
        self.F = F
        assert m % n == 0
        w = _pow(F, omega_m, m // n)
        self.n = n
        self.w = [1] * max(1, n // 2)
        for j in range(1, n // 2):
            self.w[j] = F.mul_i(self.w[j - 1], w)
        winv = F.inv_i(w)
        self.winv = [1] * max(1, n // 2)
        for j in range(1, n // 2):
            self.winv[j] = F.mul_i(self.winv[j - 1], winv)
        self.half = F.inv_i(F.of_scalar(2))

    # -- 2-point solvers (fft_interpolation.h:33-95) -------------------------

    def _a0a1(self, B, i, s, winv=None):
        F = self.F
        x0 = B[i]
        x1 = B[i + s] if winv is None else F.mul_i(B[i + s], winv)
        B[i] = F.add_i(x0, x1)
        B[i + s] = F.sub_i(x0, x1)

    def _b0b1_unscaled(self, A, i, s, w=None):
        F = self.F
        x0 = F.add_i(A[i], A[i + s])
        x1 = F.sub_i(A[i], A[i + s])
        A[i] = x0
        A[i + s] = x1 if w is None else F.mul_i(x1, w)

    def _a0b0(self, A, B, ia, ib, s, w):
        F = self.F
        x0 = A[ia]
        x1 = F.sub_i(B[ib], x0)
        A[ia + s] = F.mul_i(x1, w)
        B[ib + s] = F.sub_i(x0, x1)

    def _a0b1(self, A, B, ia, ib, s, w):
        F = self.F
        x0 = A[ia]
        x1 = F.sub_i(x0, B[ib + s])
        A[ia + s] = F.mul_i(x1, w)
        B[ib] = F.add_i(x0, x1)

    # -- full transforms (fft_interpolation.h:97-166) -------------------------

    def fftf(self, A: List[int]) -> List[int]:
        """Evaluations (bit-reversed) -> coefficients."""
        F = self.F
        n = len(A)
        B = list(A)
        if n >= 2:
            for k in range(0, n, 2):
                self._a0a1(B, k, 1)
        m = 2
        while m < n:
            ws = n // (2 * m)
            for k in range(0, n, 2 * m):
                self._a0a1(B, k, m)
                for j in range(1, m):
                    self._a0a1(B, k + j, m, self.winv[j * ws])
            m *= 2
        return B

    def fftb(self, B: List[int]) -> List[int]:
        """Coefficients -> evaluations (bit-reversed), with the 1/n
        normalization on this side."""
        F = self.F
        n = len(B)
        A = list(B)
        scale = 1
        m = n
        while m > 2:
            m //= 2
            ws = n // (2 * m)
            for k in range(0, n, 2 * m):
                self._b0b1_unscaled(A, k, m)
                for j in range(1, m):
                    self._b0b1_unscaled(A, k + j, m, self.w[j * ws])
            scale = F.mul_i(scale, self.half)
        if n >= 2:
            for k in range(0, n, 2):
                self._b0b1_unscaled(A, k, 1)
            scale = F.mul_i(scale, self.half)
        return [F.mul_i(a, scale) for a in A]

    # -- bidirectional fill (fft_interpolation.h:168-279) ----------------------

    @staticmethod
    def _in_range(j, b0, n, k):
        b1 = b0 + (n - k)
        return (b0 <= j < b1) or (b0 <= j + n < b1)

    def _bidir(self, n, A, a0, B, bb, k, b0):
        """A[a0:a0+n], B[bb:bb+n] views; twiddle stride n_full//n."""
        F = self.F
        if k == 0:
            sub = self._sub_twiddle(n)
            A[a0 : a0 + n] = sub.fftb(B[bb : bb + n])
            return
        if k == n:
            sub = self._sub_twiddle(n)
            B[bb : bb + n] = sub.fftf(A[a0 : a0 + n])
            return
        if n <= 1:
            return
        ws = self.n // n  # twiddle stride: tables are for the full n
        n2 = n // 2
        T = [0] * n
        if k >= n2:
            sub = self._sub_twiddle(n2)
            T[:n2] = sub.fftf(A[a0 : a0 + n2])
            for j in range(n2):
                w = self.w[j * ws]
                if self._in_range(j, b0, n, k):
                    self._a0b0(T, B, j, bb + j, n2, w)
                elif self._in_range(j + n2, b0, n, k):
                    self._a0b1(T, B, j, bb + j, n2, w)
            bb0 = b0 - n2 if b0 >= n2 else b0
            self._bidir(n2, A, a0 + n2, T, n2, k - n2, bb0)
            for j in range(n2):
                if not self._in_range(j, b0, n, k) and \
                        not self._in_range(j + n2, b0, n, k):
                    x0 = T[j]
                    x1 = F.mul_i(T[j + n2], self.winv[j * ws])
                    B[bb + j] = F.add_i(x0, x1)
                    B[bb + j + n2] = F.sub_i(x0, x1)
        else:
            for j in range(n2):
                if self._in_range(j, b0, n, k) and \
                        self._in_range(j + n2, b0, n, k):
                    x0 = F.mul_i(self.half, F.add_i(B[bb + j], B[bb + j + n2]))
                    x1 = F.mul_i(self.half, F.sub_i(B[bb + j], B[bb + j + n2]))
                    T[j] = x0
                    T[j + n2] = F.mul_i(x1, self.w[j * ws])
            bb0 = b0 - n2 if b0 >= n2 else b0
            self._bidir(n2, A, a0, T, 0, k, bb0)
            for j in range(n2):
                w = self.w[j * ws]
                if self._in_range(j, b0, n, k):
                    if not self._in_range(j + n2, b0, n, k):
                        self._a0b0(T, B, j, bb + j, n2, w)
                else:
                    assert self._in_range(j + n2, b0, n, k)
                    self._a0b1(T, B, j, bb + j, n2, w)
            sub = self._sub_twiddle(n2)
            A[a0 + n2 : a0 + n] = sub.fftb(T[n2:])

    def _sub_twiddle(self, n: int) -> "FFTInterpolation":
        """A view with the same root rescaled to order n."""
        if n == self.n:
            return self
        sub = object.__new__(FFTInterpolation)
        sub.F = self.F
        sub.n = n
        stride = self.n // n
        sub.w = [self.w[j * stride] for j in range(max(1, n // 2))]
        sub.winv = [self.winv[j * stride] for j in range(max(1, n // 2))]
        sub.half = self.half
        return sub

    def interpolate(self, A: List[int], B: List[int], k: int, b0: int):
        """Fill A/B in place (fft_interpolation.h:282-303)."""
        n = self.n
        assert len(A) == n and len(B) == n and k <= n and b0 < n
        if n == 1:
            if k == 0:
                A[0] = B[0]
            else:
                B[0] = A[0]
            return
        self._bidir(n, A, 0, B, 0, k, b0)


def _pow(F, base: int, e: int) -> int:
    r = F.of_scalar(1)
    b = base
    while e:
        if e & 1:
            r = F.mul_i(r, b)
        b = F.mul_i(b, b)
        e >>= 1
    return r
