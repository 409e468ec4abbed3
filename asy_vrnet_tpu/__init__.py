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
            # Probe it; fall back to automatic selection if it can't init.
            try:
                _jax.local_devices()
            except RuntimeError:
                _jax.config.update("jax_platforms", "")
                _os.environ["JAX_PLATFORMS"] = ""
    except Exception:
        pass
del _os, _plat
