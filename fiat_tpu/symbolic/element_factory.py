"""Factory pass-through (parity with finat/element_factory.py): the
conversion machinery lives in fiat_tpu.factory; re-exported here so
symbolic-layer clients find it in the same place as in the reference.
Not imported by fiat_tpu.symbolic.__init__ (the factory imports the
symbolic package, so eager re-export would be circular)."""

from ..factory import (as_fiat_cell, convert,  # noqa: F401
                       create_base_element, create_element,
                       supported_elements)
