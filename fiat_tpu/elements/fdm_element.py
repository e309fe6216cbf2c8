"""FDM elements (parity with /root/reference/FIAT/fdm_element.py): 1D bases
whose interior shape functions diagonalize the Laplacian/biharmonic with the
given boundary conditions (fast-diagonalization preconditioning)."""

import abc

import numpy as np

from ..core import cells as cl
from ..core import finite_element, functionals, quadrature
from ..core.barycentric import LagrangePolynomialSet
from ..core.dualset import DualSet
from ..core.polyset import ONPolynomialSet
from .p0 import P0


def sym_eig(A, B):
    """Generalized symmetric eigensolve (numpy-only scipy.linalg.eigh)."""
    Linv = np.linalg.inv(np.linalg.cholesky(B))
    C = Linv @ A @ Linv.T
    Z, V = np.linalg.eigh(C, "U")
    return Z, Linv.T @ V


def tridiag_eig(A, B):
    """sym_eig with A diagonal and B tridiagonal."""
    a = np.sqrt(np.reciprocal(A.diagonal()))
    C = a * B * a[:, None]
    Z, V = np.linalg.eigh(C, "U")
    Z = np.reciprocal(Z)
    V = np.sqrt(Z) * V * a[:, None]
    return Z[::-1], V[:, ::-1]


class FDMDual(DualSet):
    """Jet DoFs at the vertices + moments against the FDM eigenbasis."""

    def __init__(self, ref_el, degree, bc_order=1, formdegree=0,
                 orthogonalize=False):
        P = ONPolynomialSet(ref_el, degree + formdegree, variant="bubble")
        Pdim = len(P)
        P = P.take([*range(2), *range(2, Pdim, 2), *range(3, Pdim, 2)])
        self.poly_set = P

        if bc_order == 1 and formdegree == 0:
            rule = quadrature.GaussLobattoLegendreQuadratureLineRule(ref_el, Pdim + 1)
        else:
            rule = quadrature.GaussLegendreQuadratureLineRule(ref_el, Pdim)
        self.rule = rule

        solve_eig = tridiag_eig if bc_order == 1 else sym_eig

        if bc_order == 0:
            C = np.empty((0, Pdim))
        else:
            constraints = P.tabulate(ref_el.get_vertices(), bc_order - 1)
            C = np.transpose(np.column_stack(list(constraints.values())))
        bdof = slice(None, C.shape[0])
        idof = slice(C.shape[0], None)

        E = np.eye(Pdim)
        E[bdof, idof] = -C[:, idof]
        E[bdof, :] = np.linalg.solve(C[:, bdof], E[bdof, :])

        k = max(1, bc_order)
        phi = P.tabulate(rule.get_points(), k)
        wts = rule.get_weights()
        E0 = E.T @ phi[(0,)]
        Ek = E.T @ phi[(k,)]
        B = (E0 * wts) @ E0.T
        A = (Ek * wts) @ Ek.T

        S = np.eye(A.shape[0])
        lam = np.ones(A.shape[0])
        if S.shape[0] > C.shape[0]:
            lam[idof], Sii = solve_eig(A[idof, idof], B[idof, idof])
            S[idof, idof] = Sii
            S[idof, bdof] = Sii @ (Sii.T @ -B[idof, bdof])

        if orthogonalize:
            Abb = S[:, bdof].T @ A @ S[:, bdof]
            Bbb = S[:, bdof].T @ B @ S[:, bdof]
            _, Qbb = sym_eig(Abb, Bbb)
            S[:, bdof] = S[:, bdof] @ Qbb

        if formdegree == 0:
            basis = S.T @ E0
        else:
            if bc_order == 0:
                idof = lam > 1e-12
                lam[~idof] = 1.0
            lam = np.sqrt(np.reciprocal(lam))
            S = S * lam
            basis = S.T @ Ek

        sd = ref_el.get_spatial_dimension()
        top = ref_el.get_topology()
        entity_ids = {dim: {e: [] for e in top[dim]} for dim in top}
        nodes = []
        if formdegree == 0:
            if orthogonalize:
                idof = slice(None)
            elif bc_order > 0:
                for v in sorted(top[0]):
                    cur = len(nodes)
                    x, = ref_el.make_points(0, v, 0)
                    nodes.append(functionals.PointEvaluation(ref_el, x))
                    nodes.extend(functionals.PointDerivative(ref_el, x, (alpha,))
                                 for alpha in range(1, bc_order))
                    entity_ids[0][v].extend(range(cur, len(nodes)))
        elif bc_order > 0:
            basis[bdof] = np.sqrt(1.0 / ref_el.volume())
            idof = slice(formdegree, None)

        cur = len(nodes)
        nodes.extend(functionals.IntegralMoment(ref_el, rule, f)
                     for f in basis[idof])
        entity_ids[sd][0].extend(range(cur, len(nodes)))
        super().__init__(nodes, ref_el, entity_ids)


class FDMFiniteElement(finite_element.CiarletElement):
    """1D element diagonalizing a bilinear form with boundary conditions."""

    _orthogonalize = False

    @property
    @abc.abstractmethod
    def _bc_order(self):
        pass

    @property
    @abc.abstractmethod
    def _formdegree(self):
        pass

    def __new__(cls, ref_el, degree):
        if cls._formdegree == 1 and degree == 0:
            return P0(ref_el)
        return super().__new__(cls)

    def __init__(self, ref_el, degree):
        if ref_el.shape != cl.LINE:
            raise ValueError(f"{type(self)} is only defined in one dimension.")
        dual = FDMDual(ref_el, degree, bc_order=self._bc_order,
                       formdegree=self._formdegree,
                       orthogonalize=self._orthogonalize)
        if self._formdegree == 0:
            poly_set = dual.poly_set
        else:
            lr = quadrature.GaussLegendreQuadratureLineRule(ref_el, degree + 1)
            poly_set = LagrangePolynomialSet(ref_el, lr.get_points())
        super().__init__(poly_set, dual, degree, self._formdegree)


class FDMLagrange(FDMFiniteElement):
    """CG with interior functions diagonalizing the Laplacian."""
    _bc_order = 1
    _formdegree = 0


class FDMDiscontinuousLagrange(FDMFiniteElement):
    """DG from derivatives of the interior CG FDM functions."""
    _bc_order = 1
    _formdegree = 1


class FDMQuadrature(FDMFiniteElement):
    """CG FDM interior functions with orthogonalized vertex modes."""
    _bc_order = 1
    _formdegree = 0
    _orthogonalize = True


class FDMBrokenH1(FDMFiniteElement):
    """DG functions diagonalizing the Laplacian."""
    _bc_order = 0
    _formdegree = 0


class FDMBrokenL2(FDMFiniteElement):
    """Derivatives of the DG FDM functions."""
    _bc_order = 0
    _formdegree = 1


class FDMHermite(FDMFiniteElement):
    """CG with interior functions diagonalizing the biharmonic operator."""
    _bc_order = 2
    _formdegree = 0
