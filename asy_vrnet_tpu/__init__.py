"""asy_vrnet_tpu: TPU-native vision+radar panoptic perception framework."""

import os as _os

__version__ = "0.1.0"

# Some containers pre-import jax from sitecustomize and pin a platform before
# user code runs; re-sync jax's platform config with the JAX_PLATFORMS env var
# so `JAX_PLATFORMS=cpu python -m asy_vrnet_tpu.cli.train ...` behaves as
# documented.
_plat = _os.environ.get("JAX_PLATFORMS")
if _plat:
    try:
        import jax as _jax

        if _jax.config.jax_platforms != _plat:
            _jax.config.update("jax_platforms", _plat)
        if _plat != "cpu":
            # The pinned platform name can go stale (e.g. the TPU tunnel
            # registered as "axon" in one image and plain "tpu" in the next).
            # Fall back to automatic selection ONLY when the name is unknown
            # — an init failure of a real backend (device busy: the tunnel is
            # single-client) must stay a loud error, not a silent CPU run.
            try:
                _jax.local_devices()
            except RuntimeError as _e:
                if "not in the list of known backends" in str(_e):
                    _jax.config.update("jax_platforms", "")
                    _os.environ["JAX_PLATFORMS"] = ""
                else:
                    raise
    except Exception:
        pass
del _plat

# Persistent XLA compilation cache: full-model TPU compiles take minutes
# (27 fused-kernel instances + the conv graph); cache them across runs.
# NOT for CPU runs: with the remote-compile relay active, cached CPU AOT
# executables can carry another machine's ISA features (observed
# "+prefer-no-gather not supported on the host" SIGILL warnings).
try:
    import jax as _jax

    if (
        _jax.config.jax_compilation_cache_dir is None
        and _os.environ.get("JAX_PLATFORMS", "") != "cpu"
    ):
        _cache = _os.environ.get(
            "JAX_COMPILATION_CACHE_DIR",
            _os.path.join(_os.path.dirname(_os.path.dirname(__file__)),
                          ".jax_cache"),
        )
        _jax.config.update("jax_compilation_cache_dir", _cache)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        del _cache
except Exception:
    pass
del _os
