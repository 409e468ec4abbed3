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
            # registered as "axon" in one image and plain "tpu" in the
            # next).  Check the NAME against the registered backend
            # factories only — initializing devices at import time would
            # contend with any running job on the single-client TPU tunnel,
            # and a real init failure must surface at first use, loudly.
            try:
                from jax._src import xla_bridge as _xb

                _known = set(_xb._backend_factories)
            except Exception:
                _known = None  # private-API drift: keep the pin as-is
            if _known is not None and not (set(_plat.split(",")) & _known):
                # Loud, because auto-selection can silently land on CPU.
                # Most common cause in this image: PYTHONPATH was OVERRIDDEN
                # (it must keep /root/.axon_site, whose sitecustomize
                # registers the TPU relay backend).
                import sys as _sys

                print(
                    f"[asy_vrnet_tpu] JAX_PLATFORMS={_plat!r} names no "
                    f"registered backend (have {sorted(_known)}); clearing "
                    "the pin — jax may auto-select CPU. If you expected the "
                    "TPU relay, check that PYTHONPATH still includes the "
                    "sitecustomize dir that registers it.",
                    file=_sys.stderr,
                )
                _jax.config.update("jax_platforms", "")
                _os.environ["JAX_PLATFORMS"] = ""
    except Exception:
        pass
del _plat

# Persistent XLA compilation cache: full-model TPU compiles take minutes
# (27 fused-kernel instances + the conv graph); cache them across runs.
# Only for an EXPLICITLY pinned non-cpu platform: auto-selected platforms
# (empty JAX_PLATFORMS, incl. the stale-name fallback above) may resolve to
# CPU, and with the remote-compile relay active, cached CPU AOT executables
# can carry another machine's ISA features (observed "+prefer-no-gather not
# supported on the host" SIGILL warnings).
try:
    import jax as _jax

    if (
        _jax.config.jax_compilation_cache_dir is None
        and _os.environ.get("JAX_PLATFORMS", "") not in ("", "cpu")
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
