"""ptgnn_tpu: a TPU-native sparse message-passing GNN framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of microsoft/ptgnn
(reference: /root/reference). The reference couples raw-data -> tensor
conversion with module construction via an ``AbstractNeuralModel`` /
``nn.Module`` pair; we keep that split but make the neural side purely
functional (init/apply over pytrees) and make minibatches statically shaped
(padded, type-blocked edge layout) so the whole hot path compiles to a single
XLA program per configuration.
"""

__version__ = "0.1.0"

from ptgnn_tpu.core.model import AbstractNeuralModel
from ptgnn_tpu.core.trainer import ModelTrainer
from ptgnn_tpu.nn.module import Module

__all__ = ["AbstractNeuralModel", "ModelTrainer", "Module", "__version__"]
