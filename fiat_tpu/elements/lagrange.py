"""Lagrange elements (parity with /root/reference/FIAT/lagrange.py):
point evaluation at recursively-defined lattice points; 1D uses the exact
barycentric nodal basis, higher dimensions the C0 bubble expansion."""

from ..core import cells as cl
from ..core import finite_element, functionals, polyset
from ..core.barycentric import LagrangePolynomialSet, get_lagrange_points
from ..core.dualset import DualSet
from ..core.orientation import make_entity_permutations_simplex
from ..core.variants import parse_lagrange_variant


class LagrangeDualSet(DualSet):
    """Point evaluations at recursive lattice points of every entity, on
    simplicial complexes of any dimension."""

    def __init__(self, ref_el, degree, point_variant="equispaced",
                 sort_entities=False):
        nodes = []
        entity_ids = {}
        entity_permutations = {}
        top = ref_el.get_topology()
        for dim in sorted(top):
            entity_ids[dim] = {}
            perms = ({0: [0]} if dim == 0
                     else make_entity_permutations_simplex(dim, degree - dim))
            entity_permutations[dim] = {entity: perms for entity in sorted(top[dim])}

        entities = [(dim, entity) for dim in sorted(top) for entity in sorted(top[dim])]
        if sort_entities:
            support = [top[dim][entity] for dim, entity in entities]
            entities = [entity for _, entity in sorted(zip(support, entities))]

        for dim, entity in entities:
            cur = len(nodes)
            pts = ref_el.make_points(dim, entity, degree, variant=point_variant)
            nodes.extend(functionals.PointEvaluation(ref_el, x) for x in pts)
            entity_ids[dim][entity] = list(range(cur, len(nodes)))
        super().__init__(nodes, ref_el, entity_ids, entity_permutations)


class Lagrange(finite_element.CiarletElement):
    """The Lagrange element.  ``variant`` may combine a point distribution
    ('equispaced', 'gll', 'spectral', ...) and a macro splitting
    ('Alfeld', 'Iso(2)', ...)."""

    def __init__(self, ref_el, degree, variant="equispaced", sort_entities=False):
        splitting, point_variant = parse_lagrange_variant(variant)
        if splitting is not None:
            ref_el = splitting(ref_el)
        dual = LagrangeDualSet(ref_el, degree, point_variant=point_variant,
                               sort_entities=sort_entities)
        if ref_el.shape == cl.LINE:
            # 1D: the nodal basis IS the expansion basis (no transformation
            # round-off).
            points = get_lagrange_points(dual)
            poly_set = LagrangePolynomialSet(ref_el, points)
        else:
            poly_set = polyset.ONPolynomialSet(ref_el, degree, variant="bubble",
                                               scale=1)
        super().__init__(poly_set, dual, degree, formdegree=0)
