"""Dense bivariate polynomials over Fr (exact, host-side).

Ground truth for the distributed protocol tests, with the same role and
surface as the reference's BivariateFsPolynomial (src/bipoly.rs:36-124):
f(x, y) = sum_i y^i * (sum_j a_{ij} x^j), stored as a list of coefficient
rows (row i = coefficients in x of the y^i term).
"""

from __future__ import annotations

from ..constants import R
from ..refimpl.poly import poly_eval


class BivariatePolynomial:
    def __init__(self, rows: list[list[int]]):
        self.rows = [[c % R for c in row] for row in rows]

    @staticmethod
    def from_coeffs(rows) -> "BivariatePolynomial":
        return BivariatePolynomial(rows)

    def eval(self, x: int, y: int) -> int:
        """f(x, y), exact."""
        return poly_eval([poly_eval(row, x) for row in self.rows], y)

    def eval_x(self, x: int) -> list[int]:
        """Partial evaluation: coefficients in y of f(x, Y)."""
        return [poly_eval(row, x) for row in self.rows]

    def eval_y(self, y: int) -> list[int]:
        """Partial evaluation: coefficients in x of f(X, y)."""
        width = max(len(r) for r in self.rows)
        out = [0] * width
        ypow = 1
        for row in self.rows:
            for j, c in enumerate(row):
                out[j] = (out[j] + ypow * c) % R
            ypow = ypow * y % R
        return out
