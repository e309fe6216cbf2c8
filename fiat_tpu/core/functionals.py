"""Linear functionals (dual-basis nodes).

Parity with /root/reference/FIAT/functional.py.  Every functional is
discrete: a weighted sum of (derivatives of components of) its argument at
points, encoded as

* ``pt_dict``:    {point: [(weight, component), ...]}
* ``deriv_dict``: {point: [(weight, alpha, component), ...]}

The dual-set layer batches these into dense weight tensors for the
generalized-Vandermonde build; on device they become segment-sum gathers.
"""

from collections import defaultdict
from itertools import chain

import numpy as np

from . import polyset
from . import quadrature
from . import quadrature_schemes


class Functional:
    """A discrete linear functional."""

    def __init__(self, ref_el, target_shape, pt_dict, deriv_dict, functional_type):
        self.ref_el = ref_el
        self.target_shape = target_shape
        self.pt_dict = pt_dict
        self.deriv_dict = deriv_dict
        self.functional_type = functional_type
        if len(deriv_dict) > 0:
            self.max_deriv_order = max(sum(wac[1]) for wac in chain(*deriv_dict.values()))
        else:
            self.max_deriv_order = 0

    def __call__(self, fn):
        raise NotImplementedError(f"Evaluation not implemented for {type(self)}")

    def evaluate(self, f):
        raise AttributeError("To evaluate the functional just call it on a function.")

    def get_point_dict(self):
        return self.pt_dict

    def get_reference_element(self):
        return self.ref_el

    def get_type_tag(self):
        return self.functional_type

    def to_riesz(self, poly_set):
        """Riesz representer of this functional against the expansion set
        underlying poly_set: array of shape (*target_shape, num_exp)."""
        es = poly_set.get_expansion_set()
        ed = poly_set.get_embedded_degree()
        result = np.zeros(poly_set.coeffs.shape[1:])
        if self.pt_dict:
            pts = list(self.pt_dict.keys())
            bfs = es.tabulate(ed, pts)
            for j, pt in enumerate(pts):
                for (w, c) in self.pt_dict[pt]:
                    result[c] += w * bfs[:, j]
        if self.deriv_dict:
            dpts = list(self.deriv_dict.keys())
            es_set = polyset.ONPolynomialSet(self.ref_el, ed)
            dbfs = es_set.tabulate(dpts, self.max_deriv_order)
            for j, pt in enumerate(dpts):
                for (w, alpha, c) in self.deriv_dict[pt]:
                    result[c] += w * dbfs[tuple(alpha)][:, j]
        return result

    def tostr(self):
        return self.functional_type


class PointEvaluation(Functional):
    """f -> f(x)."""

    def __init__(self, ref_el, x):
        pt_dict = {tuple(x): [(1.0, tuple())]}
        super().__init__(ref_el, tuple(), pt_dict, {}, "PointEval")

    def __call__(self, fn):
        return fn(tuple(self.pt_dict.keys())[0])

    def tostr(self):
        x, = self.pt_dict.keys()
        return "u(%s)" % (",".join(map(str, x)),)


class ComponentPointEvaluation(Functional):
    """f -> f_c(x) for a component c of a vector/tensor field."""

    def __init__(self, ref_el, comp, shp, x):
        if not isinstance(comp, tuple):
            comp = (comp,)
        if len(shp) != len(comp):
            raise ValueError("Component and shape are incompatible")
        if any(i < 0 or i >= n for i, n in zip(comp, shp)):
            raise ValueError("Illegal component")
        self.comp = comp
        pt_dict = {tuple(x): [(1.0, comp)]}
        super().__init__(ref_el, shp, pt_dict, {}, "ComponentPointEval")


class PointDerivative(Functional):
    """f -> D^alpha f(x)."""

    def __init__(self, ref_el, x, alpha):
        dpt_dict = {tuple(x): [(1.0, tuple(alpha), tuple())]}
        self.alpha = tuple(alpha)
        self.order = sum(self.alpha)
        super().__init__(ref_el, tuple(), {}, dpt_dict, "PointDeriv")

    def __call__(self, fn):
        import sympy
        x, = self.deriv_dict
        X = tuple(sympy.Symbol(f"X[{i}]") for i in range(len(x)))
        dvars = tuple(v for v, a in zip(X, self.alpha) for _ in range(a))
        return sympy.lambdify(X, sympy.diff(fn(X), *dvars))(*x)


class PointDirectionalDerivative(Functional):
    """f -> (s . grad f)(x)."""

    def __init__(self, ref_el, s, pt, comp=(), shp=(), nm=None):
        sd = ref_el.get_spatial_dimension()
        alphas = tuple(map(tuple, np.eye(sd, dtype=int)))
        dpt_dict = {tuple(pt): [(s[i], alphas[i], comp) for i in range(sd)]}
        super().__init__(ref_el, shp, {}, dpt_dict, nm or "PointDirectionalDeriv")


class PointNormalDerivative(PointDirectionalDerivative):
    def __init__(self, ref_el, facet_no, pt, comp=(), shp=()):
        n = ref_el.compute_normal(facet_no)
        super().__init__(ref_el, n, pt, comp=comp, shp=shp, nm="PointNormalDeriv")


class PointTangentialDerivative(PointDirectionalDerivative):
    def __init__(self, ref_el, edge_no, pt, comp=(), shp=()):
        t = ref_el.compute_edge_tangent(edge_no)
        super().__init__(ref_el, t, pt, comp=comp, shp=shp, nm="PointTangentialDeriv")


def _bilinear_alpha_weights(S, sd):
    """Collapse a direction-pair tensor S into multi-index weights tau."""
    tau = defaultdict(float)
    for index in np.ndindex(S.shape):
        alpha = [0] * sd
        for i in index:
            alpha[i] += 1
        tau[tuple(alpha)] += S[index]
    return tau


class PointSecondDerivative(Functional):
    """f -> s1^T (D^2 f)(x) s2."""

    def __init__(self, ref_el, s1, s2, pt, comp=(), shp=(), nm=None):
        sd = ref_el.get_spatial_dimension()
        tau = _bilinear_alpha_weights(np.outer(s1, s2), sd)
        dpt_dict = {tuple(pt): [(tau[alpha], alpha, comp) for alpha in tau]}
        super().__init__(ref_el, shp, {}, dpt_dict, nm or "PointSecondDeriv")


class PointNormalSecondDerivative(PointSecondDerivative):
    def __init__(self, ref_el, facet_no, pt, comp=(), shp=()):
        n = ref_el.compute_normal(facet_no)
        super().__init__(ref_el, n, n, pt, comp=comp, shp=shp,
                         nm="PointNormalSecondDeriv")


class PointTangentialSecondDerivative(PointSecondDerivative):
    def __init__(self, ref_el, edge_no, pt, comp=(), shp=()):
        t = ref_el.compute_edge_tangent(edge_no)
        super().__init__(ref_el, t, t, pt, comp=comp, shp=shp,
                         nm="PointTangentialSecondDeriv")


class PointDivergence(Functional):
    """v -> (div v)(x)."""

    def __init__(self, ref_el, x):
        sd = ref_el.get_spatial_dimension()
        alphas = tuple(map(tuple, np.eye(sd, dtype=int)))
        dpt_dict = {tuple(x): [(1.0, a, (a.index(1),)) for a in alphas]}
        super().__init__(ref_el, (len(x),), {}, dpt_dict, "PointDiv")


class IntegralMoment(Functional):
    """f -> int f_c q  against a tabulated density q (rule Q)."""

    def __init__(self, ref_el, Q, f_at_qpts, comp=tuple(), shp=tuple()):
        self.Q = Q
        self.f_at_qpts = f_at_qpts
        self.comp = comp
        weights = np.multiply(f_at_qpts, Q.get_weights())
        pt_dict = {tuple(pt): [(wt, comp)]
                   for pt, wt in zip(Q.get_points(), weights)}
        super().__init__(ref_el, shp, pt_dict, {}, "IntegralMoment")

    def __call__(self, fn):
        pts = list(self.pt_dict.keys())
        wts = np.asarray([wc[0][0] for wc in self.pt_dict.values()])
        result = np.dot([fn(p) for p in pts], wts)
        return result[self.comp] if self.comp else result


class IntegralMomentOfDerivative(Functional):
    """f -> int (D_s1 ... D_sk f)_c q for directions s1..sk."""

    def __init__(self, ref_el, Q, f_at_qpts, *directions, comp=(), shp=(), nm=""):
        self.Q = Q
        self.f_at_qpts = f_at_qpts
        self.comp = comp
        S = directions[0]
        for d in directions[1:]:
            S = np.outer(S, d)
        sd = ref_el.get_spatial_dimension()
        tau = _bilinear_alpha_weights(np.asarray(S), sd)
        weights = np.multiply(f_at_qpts, Q.get_weights())
        self.weights = {alpha: weights * tau[alpha] for alpha in tau}
        dpt_dict = {tuple(pt): [(wt * tau[alpha], alpha, comp) for alpha in tau]
                    for pt, wt in zip(Q.get_points(), weights)}
        super().__init__(ref_el, shp, {}, dpt_dict, nm or "IntegralMomentOfDerivative")


class IntegralMomentOfNormalDerivative(IntegralMomentOfDerivative):
    """f -> int_F (dn f) q over a facet F."""

    def __init__(self, ref_el, facet_no, Q_face, f_at_qpts):
        n = ref_el.compute_normal(facet_no)
        sd = ref_el.get_spatial_dimension()
        Q = quadrature.FacetQuadratureRule(ref_el, sd - 1, facet_no, Q_face, avg=True)
        super().__init__(ref_el, Q, f_at_qpts, n, nm="IntegralMomentOfNormalDerivative")


class FrobeniusIntegralMoment(IntegralMoment):
    """u -> int u : F for a tensor density F tabulated at Q's points."""

    def __init__(self, ref_el, Q, f_at_qpts, nm=None):
        shp = tuple(f_at_qpts.shape[:-1])
        if len(Q.pts) != f_at_qpts.shape[-1]:
            raise ValueError("Mismatch in number of quadrature points and values")
        self.Q = Q
        self.comp = slice(None, None)
        self.f_at_qpts = f_at_qpts
        weights = np.transpose(np.multiply(f_at_qpts, Q.get_weights()),
                               (-1,) + tuple(range(len(shp))))
        alphas = list(np.ndindex(shp))
        pt_dict = {tuple(pt): [(wt[alpha], alpha) for alpha in alphas]
                   for pt, wt in zip(Q.get_points(), weights)}
        Functional.__init__(self, ref_el, shp, pt_dict, {},
                            nm or "FrobeniusIntegralMoment")


class IntegralLegendreDirectionalMoment(FrobeniusIntegralMoment):
    """v -> int_e (v . s) P_k along an edge, P_k Legendre of degree k."""

    def __init__(self, cell, s, entity, mom_deg, quad_deg, nm=""):
        assert cell.get_spatial_dimension() == 2
        entity = (1, entity)
        Q = quadrature_schemes.create_quadrature(cell, quad_deg, entity=entity)
        x = cell.compute_barycentric_coordinates(Q.get_points(), entity=entity)
        f_at_qpts = _legendre(mom_deg, x[:, 1] - x[:, 0])
        f_at_qpts /= Q.jacobian_determinant()
        f_at_qpts = np.multiply(s[..., None], f_at_qpts)
        super().__init__(cell, Q, f_at_qpts, nm=nm)


def _legendre(n, x):
    """P_n at points x by the three-term recurrence."""
    x = np.asarray(x)
    p0 = np.ones_like(x)
    if n == 0:
        return p0
    p1 = x.copy()
    for k in range(1, n):
        p0, p1 = p1, ((2 * k + 1) * x * p1 - k * p0) / (k + 1)
    return p1


class IntegralLegendreNormalMoment(IntegralLegendreDirectionalMoment):
    def __init__(self, cell, entity, mom_deg, comp_deg):
        n = cell.compute_scaled_normal(entity)
        super().__init__(cell, n, entity, mom_deg, comp_deg,
                         "IntegralLegendreNormalMoment")


class IntegralLegendreTangentialMoment(IntegralLegendreDirectionalMoment):
    def __init__(self, cell, entity, mom_deg, comp_deg):
        t = cell.compute_edge_tangent(entity)
        super().__init__(cell, t, entity, mom_deg, comp_deg,
                         "IntegralLegendreTangentialMoment")


class IntegralLegendreBidirectionalMoment(IntegralLegendreDirectionalMoment):
    """tau -> int_e (s1 . tau . s2) P_k."""

    def __init__(self, cell, s1, s2, entity, mom_deg, comp_deg, nm=""):
        super().__init__(cell, np.outer(s1, s2), entity, mom_deg, comp_deg, nm=nm)


class IntegralLegendreNormalNormalMoment(IntegralLegendreBidirectionalMoment):
    def __init__(self, cell, entity, mom_deg, comp_deg):
        n = cell.compute_scaled_normal(entity)
        super().__init__(cell, n, n, entity, mom_deg, comp_deg,
                         "IntegralNormalNormalLegendreMoment")


class IntegralLegendreNormalTangentialMoment(IntegralLegendreBidirectionalMoment):
    def __init__(self, cell, entity, mom_deg, comp_deg):
        n = cell.compute_scaled_normal(entity)
        t = cell.compute_edge_tangent(entity)
        super().__init__(cell, n, t, entity, mom_deg, comp_deg,
                         "IntegralNormalTangentialLegendreMoment")


class IntegralLegendreTangentialTangentialMoment(IntegralLegendreBidirectionalMoment):
    def __init__(self, cell, entity, mom_deg, comp_deg):
        t = cell.compute_edge_tangent(entity)
        super().__init__(cell, t, t, entity, mom_deg, comp_deg,
                         "IntegralTangentialTangentialLegendreMoment")


class IntegralMomentOfDivergence(Functional):
    """v -> int (div v) q."""

    def __init__(self, ref_el, Q, f_at_qpts):
        self.f_at_qpts = f_at_qpts
        self.Q = Q
        sd = ref_el.get_spatial_dimension()
        shp = f_at_qpts.shape[1:-1] + (sd,)
        points = Q.get_points()
        self.dpts = points
        weights = np.multiply(f_at_qpts, Q.get_weights())
        alphas = tuple(map(tuple, np.eye(sd, dtype=int)))
        dpt_dict = {tuple(pt): [(wt, alphas[i], (i,)) for i in range(sd)]
                    for pt, wt in zip(points, weights)}
        super().__init__(ref_el, shp, {}, dpt_dict, "IntegralMomentOfDivergence")


class IntegralMomentOfTensorDivergence(Functional):
    """tau -> int (div tau) . q for symmetric tensors."""

    def __init__(self, ref_el, Q, f_at_qpts):
        self.f_at_qpts = f_at_qpts
        self.Q = Q
        points = Q.get_points()
        self.dpts = points
        sd = ref_el.get_spatial_dimension()
        assert f_at_qpts.shape == (sd, len(points))
        weights = np.multiply(f_at_qpts, Q.get_weights()).T
        alphas = tuple(map(tuple, np.eye(sd, dtype=int)))
        dpt_dict = {tuple(pt): [(wt[i], alphas[j], (i, j))
                                for i, j in np.ndindex((sd, sd))]
                    for pt, wt in zip(points, weights)}
        super().__init__(ref_el, tuple(), {}, dpt_dict, "IntegralMomentOfDivergence")


class PointNormalEvaluation(Functional):
    """v -> (v . n)(x) on a facet."""

    def __init__(self, ref_el, facet_no, pt):
        n = ref_el.compute_normal(facet_no)
        self.n = n
        pt_dict = {tuple(pt): [(n[i], (i,)) for i in range(n.shape[0])]}
        super().__init__(ref_el, n.shape, pt_dict, {}, "PointNormalEval")


class PointEdgeTangentEvaluation(Functional):
    """v -> (v . t)(x) on an edge."""

    def __init__(self, ref_el, edge_no, pt):
        t = ref_el.compute_edge_tangent(edge_no)
        self.t = t
        pt_dict = {tuple(pt): [(t[i], (i,)) for i in range(t.shape[0])]}
        super().__init__(ref_el, t.shape, pt_dict, {}, "PointEdgeTangent")

    def tostr(self):
        x, = self.pt_dict.keys()
        return "(u.t)(%s)" % (",".join(map(str, x)),)


class IntegralMomentOfEdgeTangentEvaluation(Functional):
    r"""v -> \int_e (v . t) p ds for p tabulated at the edge rule Q."""

    def __init__(self, ref_el, Q, P_at_qpts, edge):
        t = ref_el.compute_edge_tangent(edge)
        sd = ref_el.get_spatial_dimension()
        transform = ref_el.get_entity_transform(1, edge)
        points = transform(Q.get_points())
        weights = np.multiply(P_at_qpts, Q.get_weights())
        pt_dict = {tuple(pt): [(wt * t[i], (i,)) for i in range(sd)]
                   for pt, wt in zip(points, weights)}
        super().__init__(ref_el, (sd,), pt_dict, {},
                         "IntegralMomentOfEdgeTangentEvaluation")


class PointFaceTangentEvaluation(Functional):
    """v -> (v . t_k)(x) for face tangent t_k."""

    def __init__(self, ref_el, face_no, tno, pt):
        t = ref_el.compute_face_tangents(face_no)[tno]
        self.t = t
        self.tno = tno
        sd = ref_el.get_spatial_dimension()
        pt_dict = {tuple(pt): [(t[i], (i,)) for i in range(sd)]}
        super().__init__(ref_el, (sd,), pt_dict, {}, "PointFaceTangent")

    def tostr(self):
        x, = self.pt_dict.keys()
        return "(u.t%d)(%s)" % (self.tno, ",".join(map(str, x)))


class IntegralMomentOfFaceTangentEvaluation(Functional):
    r"""v -> \int_F (v x n) . p dA."""

    def __init__(self, ref_el, Q, P_at_qpts, facet):
        P_at_qpts = [[P_at_qpts[0][i], P_at_qpts[1][i], P_at_qpts[2][i]]
                     for i in range(P_at_qpts.shape[1])]
        n = ref_el.compute_scaled_normal(facet)
        sd = ref_el.get_spatial_dimension()
        transform = ref_el.get_entity_transform(sd - 1, facet)
        pts = tuple(map(tuple, transform(Q.get_points())))
        weights = Q.get_weights()
        pt_dict = {}
        for pt, wgt, phi in zip(pts, weights, P_at_qpts):
            phixn = [phi[1] * n[2] - phi[2] * n[1],
                     phi[2] * n[0] - phi[0] * n[2],
                     phi[0] * n[1] - phi[1] * n[0]]
            pt_dict[pt] = [(wgt * (-n[2] * phixn[1] + n[1] * phixn[2]), (0,)),
                           (wgt * (n[2] * phixn[0] - n[0] * phixn[2]), (1,)),
                           (wgt * (-n[1] * phixn[0] + n[0] * phixn[1]), (2,))]
        super().__init__(ref_el, (sd,), pt_dict, {},
                         "IntegralMomentOfFaceTangentEvaluation")


class PointScaledNormalEvaluation(Functional):
    """v -> (v . n~)(x), n~ the facet-volume-scaled normal."""

    def __init__(self, ref_el, facet_no, pt):
        n = ref_el.compute_scaled_normal(facet_no)
        sd = ref_el.get_spatial_dimension()
        pt_dict = {tuple(pt): [(n[i], (i,)) for i in range(sd)]}
        super().__init__(ref_el, (sd,), pt_dict, {}, "PointScaledNormalEval")

    def tostr(self):
        x, = self.pt_dict.keys()
        return "(u.n)(%s)" % (",".join(map(str, x)),)


class IntegralMomentOfScaledNormalEvaluation(Functional):
    r"""v -> \int_F (v . n~) p ds."""

    def __init__(self, ref_el, Q, P_at_qpts, facet):
        n = ref_el.compute_scaled_normal(facet)
        sd = ref_el.get_spatial_dimension()
        transform = ref_el.get_entity_transform(sd - 1, facet)
        pts = transform(Q.get_points())
        weights = Q.get_weights() * P_at_qpts
        pt_dict = {tuple(pt): [(wt * n[i], (i,)) for i in range(sd)]
                   for pt, wt in zip(pts, weights)}
        super().__init__(ref_el, (sd,), pt_dict, {},
                         "IntegralMomentOfScaledNormalEvaluation")


class PointwiseInnerProductEvaluation(Functional):
    """u (sym tensor) -> v^T u(p) w, via Frobenius weights w v^T."""

    def __init__(self, ref_el, v, w, pt):
        wvT = np.outer(w, v)
        pt_dict = {tuple(pt): [(wvT[idx], idx) for idx in np.ndindex(wvT.shape)]}
        super().__init__(ref_el, wvT.shape, pt_dict, {}, "PointwiseInnerProductEval")


class TensorBidirectionalIntegralMoment(FrobeniusIntegralMoment):
    r"""u (sym tensor) -> \int v^T u(x) w f(x)."""

    def __init__(self, ref_el, v, w, Q, f_at_qpts):
        vwT = np.outer(v, w)
        F_at_qpts = np.multiply(vwT[..., None], f_at_qpts)
        super().__init__(ref_el, Q, F_at_qpts,
                         "TensorBidirectionalMomentInnerProductEvaluation")


class IntegralMomentOfNormalEvaluation(Functional):
    r"""v -> \int_F (v . n~) p ds (volume-scaled normal)."""

    def __init__(self, ref_el, Q, P_at_qpts, facet):
        n = ref_el.compute_scaled_normal(facet)
        sd = ref_el.get_spatial_dimension()
        transform = ref_el.get_entity_transform(sd - 1, facet)
        pts = transform(Q.get_points())
        weights = np.multiply(P_at_qpts, Q.get_weights())
        pt_dict = {tuple(pt): [(wt * n[i], (i,)) for i in range(sd)]
                   for pt, wt in zip(pts, weights)}
        super().__init__(ref_el, (sd,), pt_dict, {}, "IntegralMomentOfNormalEvaluation")


class IntegralMomentOfTangentialEvaluation(Functional):
    r"""v -> \int_e (v . t) p ds (2D)."""

    def __init__(self, ref_el, Q, P_at_qpts, facet):
        sd = ref_el.get_spatial_dimension()
        assert sd == 2
        t = ref_el.compute_edge_tangent(facet)
        transform = ref_el.get_entity_transform(sd - 1, facet)
        points = transform(Q.get_points())
        weights = np.multiply(P_at_qpts, Q.get_weights())
        pt_dict = {tuple(pt): [(wt * t[i], (i,)) for i in range(sd)]
                   for pt, wt in zip(points, weights)}
        super().__init__(ref_el, (sd,), pt_dict, {},
                         "IntegralMomentOfScaledTangentialEvaluation")
