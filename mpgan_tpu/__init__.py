"""mpgan_tpu — a TPU-native (JAX/XLA/Pallas) particle-cloud GAN framework.

A ground-up rebuild of the capability surface of rkansal47/MPGAN (message-passing
GANs and set-transformer GANs for particle clouds), designed TPU-first:

- pure-functional models (params/state pytrees, explicit PRNG threading),
- the dense N x N edge-MLP message passing implemented both as XLA-fusable jnp
  and as a fused Pallas TPU kernel,
- a single jitted GAN train step (D + G) data-parallel via ``shard_map`` over a
  ``jax.sharding.Mesh``,
- a native data layer (JetNet jets, sparsified MNIST) and evaluation stack
  (W1 distances, jet features, EFPs, Frechet distances) with no external
  physics-library dependency,
- PyTorch weight import for the reference's shipped ``trained_models`` to
  validate physics fidelity.

See SURVEY.md at the repo root for the structural map of the reference this
framework re-implements.
"""

__version__ = "0.1.0"

from . import ops  # noqa: F401
