"""Device tabulation engines (the TPU-native hot path).

``device_tabulator`` is the front door: it fuses a whole element zoo
into one compiled program and picks the fastest engine the platform
supports.
"""


def device_tabulator(elements, order=0, f64=True, **kw):
    """The recommended device engine for a zoo of elements sharing a
    reference cell.

    Returns an object with ``tab(points) -> {alpha: tables}`` and
    ``tab.unpack(tables) -> [per-element {alpha: array}]``.

    * ``f64=True`` (default): the fused multiword pipeline
      (ops/pallas_multiword.py) -- f64-accurate tabulation on the bf16
      MXU, or on the 2x-rate s8 MXU path for wide contractions
      (``wdtype`` keyword: 'auto' (default) / 'bf16' / 'int8').  The
      TPU Pallas kernels run natively on ``tpu`` backends and in
      interpret mode on ``cpu``; any other backend (e.g. ``gpu``)
      falls back to the XLA Ozaki engine (BatchedTabulator).
    * ``f64=False``: the f32 throughput engine where available
      (ops/pallas_tabulate.py), else the XLA engine in f32.
    """
    import jax
    from .tabulate import BatchedTabulator
    bt = BatchedTabulator(elements, order=order,
                          **{k: v for k, v in kw.items()
                             if k in ("tile", "derivs", "matmul")})
    backend = jax.default_backend()
    interpret = kw.get("interpret", backend == "cpu")
    # 'axon' is the tunnelled-TPU plugin backend: real Mosaic kernels
    if backend not in ("tpu", "cpu", "axon") and not interpret:
        # TPU Pallas kernels would fail at runtime on other backends
        return bt
    if not f64:
        try:
            from .pallas_tabulate import PallasZooTabulator
            return PallasZooTabulator(bt, interpret=interpret)
        except NotImplementedError:
            return bt
    from .pallas_multiword import FusedZooTabulator
    return FusedZooTabulator(bt, interpret=interpret,
                             wdtype=kw.get("wdtype", "auto"))
