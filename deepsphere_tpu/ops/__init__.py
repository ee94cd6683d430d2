from . import attention, spmv
from .spmv import (
    bernstein_basis,
    chebyshev_basis,
    ellpack_spmv,
    graph_conv,
    monomial_basis,
)

__all__ = [
    "attention",
    "spmv",
    "ellpack_spmv",
    "chebyshev_basis",
    "monomial_basis",
    "bernstein_basis",
    "graph_conv",
]
