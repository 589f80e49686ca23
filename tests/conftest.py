"""Test env: force an 8-device virtual CPU mesh.

This is the TPU-world equivalent of the fake distributed backends the
reference lacks (SURVEY.md §4 item 6): all multi-chip sharding tests run on
N virtual CPU devices via --xla_force_host_platform_device_count.

Note: the ambient environment pre-imports jax with JAX_PLATFORMS=axon (TPU)
via sitecustomize, so env vars alone are ignored here — we must use
jax.config.update. XLA_FLAGS is still read lazily at CPU-backend init.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

# Every pallas_call in the suite validates its BlockSpecs against the Mosaic
# TPU block rule — interpret mode skips Mosaic, so violating specs would
# otherwise pass CPU tests and fail only on the chip.
from edgevisiontransformer_tpu.ops.pallas.common import (  # noqa: E402
    install_block_spec_validator,
)

install_block_spec_validator()
