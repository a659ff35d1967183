"""Host sparse direct solve — the 'mumps' role.

There is no sparse LU on TPU (SURVEY.md §2.3 N5); the reference's MUMPS path
(common.py:525-551) is covered by SuperLU (scipy.sparse.linalg.splu) on the
host CPU, including the null-pivot handling the reference enables via
``mat_mumps_icntl_24=1`` / ``cntl_3=1e-12``: structurally empty rows (background
basis functions without foreground support, common.py:261-332) are converted to
identity rows before factorization.
"""
from __future__ import annotations

import numpy as np


def solve_direct(A_csr, b: np.ndarray, null_pivot_tol: float = 1e-12):
    """Solve A x = b with sparse LU; returns numpy array."""
    import scipy.sparse as sp
    import scipy.sparse.linalg as spla

    A = A_csr.tocsr().copy()
    b = np.asarray(b, dtype=np.float64).copy()

    # null-pivot protection: rows whose max |entry| is below tolerance become
    # identity rows with zero rhs (MUMPS icntl_24 analog).
    row_max = np.zeros(A.shape[0])
    if A.nnz:
        row_of = np.repeat(
            np.arange(A.shape[0]), np.diff(A.indptr)
        )
        np.maximum.at(row_max, row_of, np.abs(A.data))
    dead = row_max <= null_pivot_tol
    if dead.any():
        ids = np.where(dead)[0]
        lil = A.tolil()
        for r in ids:
            lil.rows[r] = [int(r)]
            lil.data[r] = [1.0]
        A = lil.tocsr()
        b[ids] = 0.0

    lu = spla.splu(A.tocsc())
    return lu.solve(b)
