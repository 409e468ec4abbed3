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
    except Exception:
        pass
del _os, _plat
