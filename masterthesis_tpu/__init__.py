"""masterthesis_tpu — a TPU-native (JAX/Flax/Pallas/pjit) multi-modal, multi-domain
image-to-image translation framework.

Re-implements the capability surface of kartikkadur/MasterThesis (see SURVEY.md)
with a TPU-first design: pure Flax modules (NHWC layout), one jitted train step
over optax parameter groups, batch sharding over a `jax.sharding.Mesh`, Pallas
fused kernels for the hot ops, and Orbax checkpointing.
"""

__version__ = "0.1.0"
