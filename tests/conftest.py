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


# --- quick smoke subset (`pytest -m quick`, CLAUDE.md Testing) --------------
# Marker assignment lives here (single source of truth) so heavyweight
# individual tests inside otherwise-fast modules can be excluded: the smoke
# target is < 3 min on this 1-CPU host.

QUICK_FILES = {
    "test_flops.py", "test_pruning.py", "test_profile_analyse.py",
    "test_bench_gate.py", "test_benchmarks_md.py",
    "test_headline_to_sweep.py", "test_pallas_kernels.py",
}
QUICK_EXCLUDE = {
    # >= ~15 s each (pytest --durations): together they push the smoke
    # run past 3 min; the full suite still runs them
    "test_fused_encoder_head_packed",
    "test_pipelined_encoder_matches_plain",
    "test_fused_encoder_uniform_pruned",
    "test_head_importance_matches_direct_grad",
}


def pytest_collection_modifyitems(config, items):
    import pytest

    for item in items:
        base = item.name.split("[")[0]
        if item.path.name in QUICK_FILES and base not in QUICK_EXCLUDE:
            item.add_marker(pytest.mark.quick)
