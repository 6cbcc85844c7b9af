"""linnaeus_tpu — a TPU-native (JAX/Flax/Pallas/pjit) framework for
hierarchical taxonomic image classification.

A from-scratch rebuild of the capabilities of polli-labs/linnaeus, designed
TPU-first: Flax models with Pallas fused attention, on-device batch mixing,
pjit data-parallel training over a jax.sharding.Mesh, optax optimizers, and
Orbax checkpointing.
"""

__version__ = "0.1.0"

from linnaeus_tpu.configuration import get_config, get_default_config  # noqa: F401
