"""sanafe_tpu: TPU-native rebuild of SANA-FE.

A performance/energy simulator for many-core neuromorphic chips (Loihi,
TrueNorth, ...) with the reference's YAML front-ends and Python API, and a
JAX/XLA device kernel running the entire per-timestep simulation loop under
``lax.scan``.

Public API parity with ``import sanafe`` (reference ``sanafe/__init__.py``,
``src/pymodule.cpp``).
"""

import os as _os

_cache_configured = False


def _enable_compilation_cache() -> None:
    """Persist XLA compilations across processes (DVS-scale chunk programs
    take minutes to compile on TPU; cached reloads take seconds). Honors
    an explicit JAX_COMPILATION_CACHE_DIR / jax.config setting; disable
    with SANAFE_TPU_COMPILATION_CACHE=0.

    Called lazily from ``SpikingChip`` construction, NOT at import time:
    a library consumer embedding sanafe_tpu must not get process-global
    JAX config mutated by a mere ``import``."""
    global _cache_configured
    if _cache_configured:
        return
    _cache_configured = True
    if _os.environ.get("SANAFE_TPU_COMPILATION_CACHE", "1") == "0":
        return
    if _os.environ.get("JAX_COMPILATION_CACHE_DIR"):
        return
    try:
        import jax

        if jax.config.jax_compilation_cache_dir:
            return
        cache_dir = _os.path.join(
            _os.environ.get(
                "XDG_CACHE_HOME",
                _os.path.join(_os.path.expanduser("~"), ".cache"),
            ),
            "sanafe_tpu",
            "jax_cache",
        )
        _os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # Only persist expensive compilations: small CPU programs reload
        # as AOT blobs whose feature stamps trip noisy XLA warnings, and
        # they recompile in well under a second anyway.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass  # cache is an optimization; never block import


from .arch import (
    Architecture,
    BufferPosition,
    CoreConfiguration,
    TileConfiguration,
    load_arch,
)
from .attributes import Attribute
from .chip import RunData, SpikingChip
from .compile import HardwareMappingError
from .models import get_builtin_models, register_model, ModelSpec
from .network import (
    Connection,
    Conv2DParameters,
    Neuron,
    NeuronConfiguration,
    NeuronGroup,
    SpikingNetwork,
    load_net,
)
from .network import SpikingNetwork as Network
from .trace import NeuronAddress
from .yaml_arch import DescriptionParsingError
from ._examples import (
    examples_dir,
    load_example,
    load_loihi,
    load_truenorth,
)
from .batch import ParameterSweep, expand_group_values
from . import data, layers

__version__ = "0.1.0"

__all__ = [
    "Architecture",
    "Attribute",
    "ParameterSweep",
    "expand_group_values",
    "BufferPosition",
    "Connection",
    "Conv2DParameters",
    "CoreConfiguration",
    "DescriptionParsingError",
    "HardwareMappingError",
    "ModelSpec",
    "Network",
    "Neuron",
    "NeuronAddress",
    "NeuronConfiguration",
    "NeuronGroup",
    "RunData",
    "SpikingChip",
    "SpikingNetwork",
    "TileConfiguration",
    "examples_dir",
    "get_builtin_models",
    "load_arch",
    "load_example",
    "load_loihi",
    "load_net",
    "register_model",
]
