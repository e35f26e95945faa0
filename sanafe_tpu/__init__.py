"""sanafe_tpu: TPU-native rebuild of SANA-FE.

A performance/energy simulator for many-core neuromorphic chips (Loihi,
TrueNorth, ...) with the reference's YAML front-ends and Python API, and a
JAX/XLA device kernel running the entire per-timestep simulation loop under
``lax.scan``.

Public API parity with ``import sanafe`` (reference ``sanafe/__init__.py``,
``src/pymodule.cpp``).
"""

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
