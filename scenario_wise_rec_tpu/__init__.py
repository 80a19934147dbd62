"""scenario_wise_rec_tpu — a TPU-native multi-scenario CTR framework.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of the
Scenario-Wise-Rec benchmark (multi-domain CTR prediction: 12 models x 6
datasets x unified per-domain trainer protocol), built TPU-first:
functional param/state pytrees, jitted train steps, domain loops turned into
batched einsums, packed row-shardable embedding tables, and a device-mesh
data-parallel path.
"""

__version__ = "0.1.0"

from .core.config import enable_persistent_compilation_cache

# Remote-TPU compiles cost minutes per program; cache them across processes.
# Opt out with SWR_NO_COMPILE_CACHE=1 (see core/config.py).
enable_persistent_compilation_cache()
