"""Root conftest: force a virtual 8-device CPU platform for the test suite.

Must run before jax is imported anywhere.  The real TPU chip is reserved for
`bench.py`; tests exercise the multi-chip sharding paths on a virtual CPU mesh
(SURVEY.md §4 test strategy, layer (d)).
"""
import os

# Hard override: the session environment pins JAX_PLATFORMS to the TPU tunnel
# ("axon"); tests must not touch the real chip.  Escape hatch: the opt-in
# real-TPU tests (tests/test_convergence.py::test_overfit_tpu_production)
# set ASY_VRNET_TPU_TESTS=1 to keep the session's TPU platform — run those
# alone, never as part of the full suite.
if not os.environ.get("ASY_VRNET_TPU_TESTS"):
    os.environ["JAX_PLATFORMS"] = "cpu"
    xla_flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in xla_flags:
        os.environ["XLA_FLAGS"] = (
            xla_flags + " --xla_force_host_platform_device_count=8"
        ).strip()

    # The container's sitecustomize imports jax before this conftest runs, so
    # the env var alone is too late — jax has already captured
    # jax_platforms="axon".  Update the live config as well.
    import jax

    jax.config.update("jax_platforms", "cpu")
