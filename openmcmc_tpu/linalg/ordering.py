"""Host-side fill-reducing orderings: arbitrary sparse precisions -> banded kernels.

TPU-native replacement for the reference's general sparse support (SuperLU ``splu``
factorization of any scipy.sparse pattern, reference gmrf.py:489-520, with sparse
dispatch in solve/cho_solve at gmrf.py:414-462).  A general sparse factorization is a
poor fit for the TPU (data-dependent scatter/gather, irregular supernodes); instead a
reverse Cuthill-McKee permutation -- computed ONCE on the host at model-construction
time -- reorders the pattern to small bandwidth, and the runtime uses the existing
O(p * bw^2) banded ``lax.scan`` kernels in permuted coordinates
(:class:`openmcmc_tpu.linalg.structured.Permuted`).

This covers the canonical GMRF patterns beyond a 1-D chain: a 2-D lattice with the
5-point stencil permutes to bw ~ grid width; CAR models on irregular spatial graphs
to bw ~ graph bandwidth.  Everything here runs in plain numpy before tracing; nothing
enters the compiled program except the constant permutation indices.
"""

from __future__ import annotations

import numpy as np


def rcm_permutation(pattern) -> np.ndarray:
    """Reverse Cuthill-McKee ordering of a symmetric sparsity pattern.

    ``pattern`` is a scipy.sparse matrix (values ignored).  Returns the permutation
    ``perm`` such that ``A[perm][:, perm]`` has (near-)minimal bandwidth.  Uses
    scipy's csgraph implementation when available, else a pure-numpy BFS fallback.
    """
    try:
        from scipy.sparse.csgraph import reverse_cuthill_mckee

        import scipy.sparse as sp

        return np.asarray(reverse_cuthill_mckee(sp.csr_matrix(pattern), symmetric_mode=True), np.int32)
    except ImportError:  # pragma: no cover - scipy is a baked-in dependency
        return _rcm_numpy(pattern)


def _rcm_numpy(pattern) -> np.ndarray:
    """Plain BFS Cuthill-McKee (reversed): start from a minimum-degree node, visit
    neighbors in increasing-degree order."""
    A = pattern.tocsr()
    p = A.shape[0]
    indptr, indices = A.indptr, A.indices
    degree = np.diff(indptr)
    visited = np.zeros(p, bool)
    order = []
    while len(order) < p:
        unvisited = np.flatnonzero(~visited)
        start = unvisited[np.argmin(degree[unvisited])]
        queue = [start]
        visited[start] = True
        while queue:
            node = queue.pop(0)
            order.append(node)
            nbrs = indices[indptr[node] : indptr[node + 1]]
            nbrs = nbrs[~visited[nbrs]]
            for nb in nbrs[np.argsort(degree[nbrs], kind="stable")]:
                if not visited[nb]:
                    visited[nb] = True
                    queue.append(nb)
    return np.asarray(order[::-1], np.int32)


def half_bandwidth(rows: np.ndarray, cols: np.ndarray) -> int:
    """max |i - j| over the nonzero pattern (0 for a diagonal matrix)."""
    if rows.size == 0:
        return 0
    return int(np.max(np.abs(rows.astype(np.int64) - cols.astype(np.int64))))


def bands_from_sparse(A, bw: int) -> np.ndarray:
    """Lower band storage (bw + 1, p) with bands[j, i] = A[i + j, i] from scipy.sparse."""
    coo = A.tocoo()
    p = A.shape[0]
    bands = np.zeros((bw + 1, p), np.float64)
    mask = coo.row >= coo.col
    r, c, v = coo.row[mask], coo.col[mask], coo.data[mask]
    bands[r - c, c] = v
    return bands


# Past this many sub-diagonals the O(p * bw^2) blocked band kernels are genuinely
# expensive per sweep even on the MXU; see the warning below.
BAD_BANDWIDTH = 256


def structured_from_sparse(A, bw_limit_fraction: float = 0.5):
    """Pick the best structured representation for a scipy.sparse SPD matrix.

    Decision (cheapest capable structure wins):
      diagonal pattern -> Diagonal; banded in natural order -> Banded; smaller
      bandwidth under RCM -> Permuted(Banded); otherwise (bandwidth above
      ``bw_limit_fraction * p`` both ways, where band kernels stop paying) -> Dense.

    Patterns whose RCM bandwidth stays large — expander-ish adjacencies such as
    small-world CAR graphs, where the reference's fill-in-aware SuperLU
    factorization (reference gmrf.py:489-520) still works — get no silent
    O(p * bw^2) cliff here: a :class:`BadBandwidthWarning` names the cost and
    points at ``MCMC.run(engine="auto")``, whose spectral smoother engine
    handles ANY structure up to p = 8192 with O(p) per-iteration work after a
    one-time host eigendecomposition.
    """
    import warnings

    import jax.numpy as jnp
    import scipy.sparse as sp

    from openmcmc_tpu.linalg import structured as st

    A = sp.csr_matrix(A)
    if A.shape[0] != A.shape[1]:
        raise ValueError(f"sparse state entries must be square, got {A.shape}")
    p = A.shape[0]
    dtype = jnp.result_type(float)
    coo = A.tocoo()
    bw0 = half_bandwidth(coo.row, coo.col)
    if bw0 == 0:
        return st.Diagonal(jnp.asarray(A.diagonal(), dtype))
    bw_limit = max(2, int(bw_limit_fraction * p))

    perm = rcm_permutation(A)
    Ap = A[perm][:, perm].tocoo()
    bw_p = half_bandwidth(Ap.row, Ap.col)

    if min(bw0, bw_p, bw_limit) > BAD_BANDWIDTH:
        warnings.warn(
            f"sparse precision ({p} x {p}) keeps bandwidth {min(bw0, bw_p)} even "
            f"after RCM reordering (> {BAD_BANDWIDTH}): the generic banded kernels "
            "cost O(p * bw^2) per factorization and will be slow. For the "
            "conjugate smoother family, MCMC.run(engine='auto') dispatches the "
            "spectral engine (any structure, p <= 8192, O(p) per iteration); "
            "otherwise consider a sparser model graph.",
            BadBandwidthWarning,
            stacklevel=3,
        )
    if bw0 <= min(bw_p, bw_limit):
        return st.Banded(jnp.asarray(bands_from_sparse(A, bw0), dtype))
    if bw_p <= bw_limit:
        return st.permuted(st.Banded(jnp.asarray(bands_from_sparse(Ap.tocsr(), bw_p), dtype)), perm)
    return st.Dense(jnp.asarray(A.toarray(), dtype))


class BadBandwidthWarning(UserWarning):
    """An irreducibly wide sparse pattern routed onto O(p * bw^2) band kernels."""
