"""The tensor-IR layer: what plays gem's role in fiat_tpu.

The reference stack builds an explicit tensor IR (gem, SURVEY.md section
2.3) between the symbolic element layer and generated C code: hash-consed
expression DAGs, an optimiser (delta elimination, sum factorisation,
COFFEE refactorisation), a numpy interpreter, an imperative mini-language
(Impero) with a scheduler, and a static flop counter.

fiat_tpu is TPU-native: the traced jaxpr IS the tensor IR and XLA IS the
optimiser + code generator, so gem is not ported -- it is *substituted*,
component by component:

====================  ====================================================
gem component          fiat_tpu / JAX equivalent
====================  ====================================================
Node framework         jaxpr equations; hash-consing/CSE is XLA's CSE pass
(gem/node.py)          (`as_jaxpr` exposes the DAG for inspection)
IR node zoo            jax primitives (add/mul/dot_general/reduce/...);
(gem/gem.py)           free indices become array axes; IndexSum becomes
                       einsum/dot_general; ListTensor becomes stack
Optimiser              XLA fusion + algebraic simplifier; contraction
(gem/optimise.py)      ordering: `contract` (opt_einsum 'optimal' path,
                       the sum_factorise equivalent); delta elimination:
                       spectral identity-table shortcuts
                       (fiat_tpu/symbolic/spectral.py) and the dual-basis
                       Kronecker fast path (fiat_tpu/symbolic/base.py)
Refactoriser+COFFEE    XLA algebraic simplifier + fusion autotuning
Interpreter            `evaluate` below -- jax.jit on CPU backend; arrays
(gem/interpreter.py)   are already values, no separate interpreter needed
Impero + scheduler     XLA HLO scheduling/buffer assignment (not
                       hand-rolled; `lower_text` exposes the HLO)
Flop counter           `cost_analysis` below -- XLA's own per-executable
(gem/flop_count.py)    flop/byte estimates, plus analytic counts on
                       BatchedTabulator (fiat_tpu/ops/tabulate.py)
Pretty printer         `pprint` below (jaxpr pretty-printer)
sympy2gem              fiat_tpu/symbolic/sympy2array.py
====================  ====================================================
"""

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ("as_jaxpr", "contract", "cost_analysis", "evaluate",
           "lower_text", "pprint")


def as_jaxpr(fn, *example_args):
    """Trace ``fn`` and return its jaxpr -- the expression DAG that plays
    gem's Node graph role."""
    return jax.make_jaxpr(fn)(*example_args)


def pprint(fn, *example_args):
    """Pretty-print the traced IR of ``fn`` (gem/pprint.py equivalent)."""
    return str(as_jaxpr(fn, *example_args))


def lower_text(fn, *example_args):
    """The StableHLO text of ``fn`` -- the scheduled imperative form that
    plays Impero's role."""
    return jax.jit(fn).lower(*example_args).as_text()


def cost_analysis(fn, *example_args):
    """XLA's static cost model for compiled ``fn``: a dict with 'flops',
    'bytes accessed', etc. (gem/flop_count.py equivalent, but measured on
    the *optimised* program rather than the input expression)."""
    compiled = jax.jit(fn).lower(*example_args).compile()
    analyses = compiled.cost_analysis()
    if isinstance(analyses, (list, tuple)):
        analyses = analyses[0]
    return dict(analyses) if analyses is not None else {}


def evaluate(fn, *args):
    """Evaluate a traceable function eagerly (gem/interpreter.py
    equivalent).  Exists mostly for API parity; calling ``fn`` directly
    is equally valid since arrays are values."""
    return fn(*[jnp.asarray(a) for a in args])


def contract(subscripts, *operands, **kwargs):
    """Einsum with optimal contraction-path search -- the equivalent of
    gem's sum_factorise/associate flop-optimal contraction ordering
    (gem/optimise.py:385).  XLA further fuses the resulting pairwise
    contractions."""
    kwargs.setdefault("optimize", "optimal")
    return jnp.einsum(subscripts, *operands, **kwargs)


def unconcatenate(pairs):
    """Split concatenation-valued assignments into per-chunk assignments
    (gem/unconcatenate.py:225's mixed-space splitting, in array form).

    ``pairs`` is a list of ((dest, slices), fused_array) where ``slices``
    is a list of (start, stop[, shape]) chunk descriptors along the fused
    array's leading axis.  Returns [((dest, k), chunk_array)] with chunks
    reshaped to their block shape when one is given."""
    out = []
    for (dest, slices), fused in pairs:
        for k, chunk in enumerate(slices):
            start, stop, *rest = chunk
            block = fused[start:stop]
            if rest and rest[0]:
                block = block.reshape(tuple(rest[0]) + block.shape[1:])
            out.append(((dest, k), block))
    return out
