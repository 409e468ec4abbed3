"""Model-family coverage: all phi scales and backbone variants initialise and
produce correctly-shaped outputs (tiny inputs; structure is size-invariant)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from asy_vrnet_tpu.config import COC_VARIANTS, ModelConfig, WIDTH_TABLE
from asy_vrnet_tpu.models.efficient_vrnet import create_model, init_model


@pytest.mark.parametrize("phi", ["tiny", "s"])
def test_phi_scales(phi):
    cfg = ModelConfig(
        phi=phi, compute_dtype="float32", use_pallas_cluster=False,
        input_size=(64, 64),
    )
    model = create_model(cfg)
    params, bstats = init_model(model, jax.random.PRNGKey(0), input_size=(64, 64))
    det, seg = jax.jit(
        lambda p, b, i, r: model.apply({"params": p, "batch_stats": b}, i, r)
    )(params, bstats, jnp.ones((1, 64, 64, 3)), jnp.ones((1, 64, 64, 4)))
    assert det[0].shape == (1, 8, 8, 9)
    assert seg.shape == (1, 64, 64, 9)
    # head width scales with phi
    w = WIDTH_TABLE[phi]
    assert params["head"]["stem0"]["conv"]["kernel"].shape[-1] == int(256 * w)


def test_coc_variant_registry_complete():
    # the reference's four published variants, plus the reduced-depth
    # coc_dryrun used by the multichip dryrun's full-Pallas leg
    assert set(COC_VARIANTS) == {
        "coc_small", "coc_medium", "coc_tiny", "coc_tiny2", "coc_dryrun",
    }
    v = COC_VARIANTS["coc_medium"]
    assert v.layers == (4, 4, 12, 4)
    assert v.heads == (6, 6, 12, 12)
    t2 = COC_VARIANTS["coc_tiny2"]
    assert t2.fold_w == (8, 8, 1, 1)
    assert t2.proposal_w == (4, 2, 7, 4)


def test_coc_tiny_variants_documented_incompatibility():
    """coc_tiny/coc_tiny2 exist in the registry for parity
    (vr_coc.py:707-756) but cannot execute through VRCoC's asymmetric fusion
    in the reference either: their 196-channel stage-3 is not divisible by
    ShuffleAttention's 2*G=8 groups (shuffle_attention.py:15-19 would
    broadcast-fail identically in torch).  Only coc_small/coc_medium are
    runnable; the live path uses coc_small (neck/coc_fpn_dual.py:140)."""
    dims = COC_VARIANTS["coc_tiny"].embed_dims
    assert dims[2] % 8 != 0  # the incompatibility this test documents

    from asy_vrnet_tpu.models.vr_coc import VRCoC

    m = VRCoC(variant=COC_VARIANTS["coc_tiny"], width=1.0, dtype=jnp.float32)
    with pytest.raises(TypeError):
        jax.eval_shape(
            lambda i, r: m.init(jax.random.PRNGKey(0), i, r),
            jnp.ones((1, 64, 64, 3)), jnp.ones((1, 64, 64, 4)),
        )


def test_coc_medium_backbone_forward():
    from asy_vrnet_tpu.models.vr_coc import VRCoC

    variant = COC_VARIANTS["coc_medium"]
    m = VRCoC(variant=variant, width=0.25, dtype=jnp.float32)
    img = jnp.ones((1, 64, 64, 3))
    rad = jnp.ones((1, 64, 64, 4))
    variables = jax.jit(m.init)(jax.random.PRNGKey(0), img, rad)
    outs, outs_radar = jax.jit(m.apply)(variables, img, rad)
    dims = variant.scaled_dims(0.25)
    assert [o.shape for o in outs] == [
        (1, 16, 16, dims[0]), (1, 8, 8, dims[1]),
        (1, 4, 4, dims[2]), (1, 2, 2, dims[3]),
    ]
    assert all(np.isfinite(np.asarray(o)).all() for o in outs + outs_radar)
