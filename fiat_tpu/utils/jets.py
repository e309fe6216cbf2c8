"""Truncated Taylor-jet arithmetic.

A ``Jet`` carries the partial derivatives of a quantity with respect to
``nvars`` seed variables up to a fixed ``order``, as a dict mapping
derivative multi-indices to arrays.  Sums/products propagate derivatives by
linearity and the general Leibniz rule.

This is the engine behind derivative tabulation of the expansion
recurrences: the reference hand-derives first/second-derivative recurrences
and falls back to spectral differentiation matrices beyond order 2
(/root/reference/FIAT/expansions.py:109-167,357-365); here the SAME value
recurrence is simply evaluated on jets, giving exact derivatives of any
order.  Components may be numpy arrays (vectorised host evaluation), python
scalars, or traced jnp arrays (inside jit) -- only ``+ - *`` and scalar
multiplication are used.
"""

import math
from itertools import product


class Jet:
    """Truncated derivative jet in ``nvars`` variables up to ``order``.

    Components are TAYLOR coefficients, comps[alpha] = D^alpha f / alpha!,
    so that multiplication is a plain truncated convolution (no binomial
    bookkeeping); ``derivative`` folds the factorials back in."""

    __slots__ = ("nvars", "order", "comps")

    # Make numpy defer to Jet's operators (ndarray * Jet -> Jet.__rmul__),
    # instead of broadcasting the Jet into an object array.
    __array_ufunc__ = None

    def __init__(self, nvars, order, comps):
        self.nvars = nvars
        self.order = order
        self.comps = comps  # dict: multi-index tuple -> array/scalar

    # -- constructors ---------------------------------------------------------

    @staticmethod
    def variable(value, gradient, nvars, order):
        """Seed jet for a quantity with the given value and (constant)
        gradient against the seed variables."""
        comps = {(0,) * nvars: value}
        if order >= 1:
            for k in range(nvars):
                g = gradient[k]
                if _is_nonzero(g):
                    e = tuple(1 if i == k else 0 for i in range(nvars))
                    comps[e] = g
        return Jet(nvars, order, comps)

    @staticmethod
    def constant(value, nvars, order):
        return Jet(nvars, order, {(0,) * nvars: value})

    # -- arithmetic -----------------------------------------------------------

    def _like(self, comps):
        return Jet(self.nvars, self.order, comps)

    def __add__(self, other):
        if isinstance(other, Jet):
            comps = dict(self.comps)
            for a, v in other.comps.items():
                comps[a] = comps[a] + v if a in comps else v
            return self._like(comps)
        comps = dict(self.comps)
        z = (0,) * self.nvars
        comps[z] = comps.get(z, 0.0) + other
        return self._like(comps)

    __radd__ = __add__

    def __neg__(self):
        return self._like({a: -v for a, v in self.comps.items()})

    def __sub__(self, other):
        return self + (-other)

    def __rsub__(self, other):
        return (-self) + other

    def __mul__(self, other):
        if not isinstance(other, Jet):
            if _is_nonzero(other):
                return self._like({a: v * other for a, v in self.comps.items()})
            return self._like({})
        comps = {}
        for a, u in self.comps.items():
            for b, v in other.comps.items():
                g = _sum_mi(a, b)
                if sum(g) > self.order:
                    continue
                term = u * v
                if comps.get(g) is None:
                    comps[g] = term
                else:
                    comps[g] = comps[g] + term
        return self._like(comps)

    __rmul__ = __mul__

    # -- access ----------------------------------------------------------------

    def derivative(self, alpha):
        """D^alpha of the quantity (None if identically zero)."""
        alpha = tuple(alpha)
        c = self.comps.get(alpha)
        if c is None:
            return None
        fact = math.prod(math.factorial(a) for a in alpha)
        return c * fact if fact != 1 else c


def _sum_mi(a, b):
    return tuple(x + y for x, y in zip(a, b))


def _is_nonzero(g):
    return not (isinstance(g, (int, float)) and g == 0)


# -- structural helpers generic over plain arrays and Jets ------------------

def is_jet(x):
    return isinstance(x, Jet)


def take_rows(x, idx):
    """Row-gather along axis 0 (arrays or Jets with array components)."""
    if is_jet(x):
        return x._like({k: v[idx] for k, v in x.comps.items()})
    return x[idx]


def concat_rows(xs, xp):
    """Concatenate along axis 0; for Jets, missing components are zeros."""
    if not any(is_jet(x) for x in xs):
        return xp.concatenate(xs, axis=0)
    jets = []
    for x in xs:
        jets.append(x if is_jet(x) else None)
    zkey = None
    keys = set()
    for x in xs:
        keys |= set(x.comps.keys())
        zkey = zkey or next(iter(x.comps))
    nvars = xs[0].nvars
    order = xs[0].order
    comps = {}
    for k in keys:
        rows = []
        for x in xs:
            v = x.comps.get(k)
            if v is None:
                ref = next(iter(x.comps.values()))
                v = xp.zeros(ref.shape)
            rows.append(v)
        comps[k] = xp.concatenate(rows, axis=0)
    return Jet(nvars, order, comps)


def matapply(D, x):
    """Left-multiply rows by a static matrix (arrays or Jets)."""
    if is_jet(x):
        return x._like({k: D @ v for k, v in x.comps.items()})
    return D @ x


def taylor_seeds(values, jacobian, nvars, order):
    """Seed jets for coordinates: values[i] with d(values[i])/d(var k) =
    jacobian[i][k] (constants)."""
    return [Jet.variable(values[i], [jacobian[i][k] for k in range(nvars)],
                         nvars, order)
            for i in range(len(values))]


def multiindices(nvars, order):
    """All multi-indices with |alpha| <= order (graded order)."""
    out = []
    for total in range(order + 1):
        for alpha in product(range(total + 1), repeat=nvars):
            if sum(alpha) == total:
                out.append(alpha)
    return out
