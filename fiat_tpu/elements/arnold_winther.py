"""Arnold-Winther elasticity elements (parity with
/root/reference/FIAT/arnold_winther.py): symmetric-tensor spaces with
normal-normal / normal-tangential Legendre edge moments (conforming degree 3
and nonconforming degree 2, with trailing constraint functionals)."""

import numpy as np

from ..core import cells as cl
from ..core import finite_element, polyset
from ..core.dualset import DualSet
from ..core.functionals import (ComponentPointEvaluation,
                                IntegralLegendreNormalNormalMoment,
                                IntegralLegendreNormalTangentialMoment,
                                IntegralMomentOfTensorDivergence,
                                TensorBidirectionalIntegralMoment)
from ..core.quadrature_schemes import create_quadrature


class ArnoldWintherNCDual(DualSet):
    def __init__(self, ref_el, degree=2):
        if degree != 2:
            raise ValueError("Nonconforming Arnold-Winther is degree 2 only.")
        top = ref_el.get_topology()
        sd = ref_el.get_spatial_dimension()
        entity_ids = {dim: {e: [] for e in sorted(top[dim])} for dim in sorted(top)}
        nodes = []

        qdegree = degree + 2
        for entity in sorted(top[1]):
            cur = len(nodes)
            for order in range(2):
                nodes.append(IntegralLegendreNormalNormalMoment(
                    ref_el, entity, order, qdegree))
                nodes.append(IntegralLegendreNormalTangentialMoment(
                    ref_el, entity, order, qdegree))
            entity_ids[1][entity].extend(range(cur, len(nodes)))

        cur = len(nodes)
        n = [ref_el.compute_scaled_normal(f) for f in sorted(top[sd - 1])]
        Q = create_quadrature(ref_el, degree)
        phi = np.full(Q.get_weights().shape, 1 / ref_el.volume())
        nodes.extend(TensorBidirectionalIntegralMoment(ref_el, n[i + 1], n[j + 1],
                                                       Q, phi)
                     for i in range(sd) for j in range(i, sd))
        entity_ids[2][0].extend(range(cur, len(nodes)))

        # trailing constraint functionals
        for entity in sorted(top[1]):
            cur = len(nodes)
            nodes.append(IntegralLegendreNormalNormalMoment(
                ref_el, entity, 2, qdegree))
            entity_ids[1][entity].append(cur)

        super().__init__(nodes, ref_el, entity_ids)


class ArnoldWintherNC(finite_element.CiarletElement):
    """The nonconforming Arnold-Winther element."""

    def __init__(self, ref_el, degree=2):
        if ref_el.shape != cl.TRIANGLE:
            raise ValueError("ArnoldWintherNC only defined on triangles")
        Ps = polyset.ONSymTensorPolynomialSet(ref_el, degree)
        Ls = ArnoldWintherNCDual(ref_el, degree)
        super().__init__(Ps, Ls, degree, ref_el.get_spatial_dimension() - 1,
                         mapping="double contravariant piola")


class ArnoldWintherDual(DualSet):
    def __init__(self, ref_el, degree=3):
        if degree != 3:
            raise ValueError("Arnold-Winther is degree 3 only.")
        top = ref_el.get_topology()
        sd = ref_el.get_spatial_dimension()
        shp = (sd, sd)
        entity_ids = {dim: {e: [] for e in sorted(top[dim])} for dim in sorted(top)}
        nodes = []

        for v in sorted(top[0]):
            cur = len(nodes)
            pt, = ref_el.make_points(0, v, degree)
            nodes.extend(ComponentPointEvaluation(ref_el, (i, j), shp, pt)
                         for i in range(sd) for j in range(i, sd))
            entity_ids[0][v].extend(range(cur, len(nodes)))

        max_order = degree - 2
        qdegree = degree + max_order
        for entity in sorted(top[1]):
            cur = len(nodes)
            for order in range(max_order + 1):
                nodes.append(IntegralLegendreNormalNormalMoment(
                    ref_el, entity, order, qdegree))
                nodes.append(IntegralLegendreNormalTangentialMoment(
                    ref_el, entity, order, qdegree))
            entity_ids[1][entity].extend(range(cur, len(nodes)))

        # NOTE: the reference does not reset ``cur`` here, so the cell's
        # entity ids start at the last edge's ids (replicated for parity
        # with /root/reference/FIAT/arnold_winther.py:100-119).
        n = [ref_el.compute_scaled_normal(f) for f in sorted(top[sd - 1])]
        Q = create_quadrature(ref_el, 2 * (degree - 1))
        P = polyset.ONPolynomialSet(ref_el, degree - 3, scale="L2 piola")
        phis = P.tabulate(Q.get_points())[(0,) * sd]
        nodes.extend(TensorBidirectionalIntegralMoment(ref_el, n[i + 1], n[j + 1],
                                                       Q, phi)
                     for phi in phis for i in range(sd) for j in range(i, sd))

        # constraint dofs: divergence moments against P_{k-1} \ P_{k-2}
        P = polyset.ONPolynomialSet(ref_el, degree - 1, shape=(sd,))
        dimPkm1 = P.expansion_set.get_num_members(degree - 1)
        dimPkm2 = P.expansion_set.get_num_members(degree - 2)
        PH = P.take([i + j * dimPkm1 for j in range(sd)
                     for i in range(dimPkm2, dimPkm1)])
        phis = PH.tabulate(Q.get_points())[(0,) * sd]
        nodes.extend(IntegralMomentOfTensorDivergence(ref_el, Q, phi)
                     for phi in phis)
        entity_ids[2][0].extend(range(cur, len(nodes)))
        super().__init__(nodes, ref_el, entity_ids)


class ArnoldWinther(finite_element.CiarletElement):
    """The conforming Arnold-Winther element."""

    def __init__(self, ref_el, degree=3):
        if ref_el.shape != cl.TRIANGLE:
            raise ValueError("ArnoldWinther only defined on triangles")
        Ps = polyset.ONSymTensorPolynomialSet(ref_el, degree)
        Ls = ArnoldWintherDual(ref_el, degree)
        super().__init__(Ps, Ls, degree, ref_el.get_spatial_dimension() - 1,
                         mapping="double contravariant piola")
