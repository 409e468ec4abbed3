"""torch->flax weight converter: name mapping + full-coverage round trip."""
import numpy as np
import pytest

import jax

from asy_vrnet_tpu.utils.weights import convert_torch_state_dict, torch_key_for


@pytest.mark.parametrize("path,expected", [
    (("neck", "backbone", "stage0", "block0", "token_mixer", "fc1", "kernel"),
     "backbone.backbone.network.0.0.token_mixer.fc1.weight"),
    (("neck", "backbone", "stage3_radar", "block1", "mlp", "fc2", "bias"),
     "backbone.backbone.network_radar.9.1.mlp.fc2.bias"),
    (("neck", "backbone", "stage1", "block0", "norm1", "gn", "scale"),
     "backbone.backbone.network.3.0.norm1.weight"),
    (("neck", "backbone", "fusion2_image", "radar_projection", "bn", "scale"),
     "backbone.backbone.network.7.radar_projection.bn.weight"),
    (("neck", "backbone", "fusion2_image", "norm", "bn", "mean"),
     "backbone.backbone.network.7.norm.running_mean"),
    (("neck", "backbone", "fusion3_radar", "channel_attn", "conv_w"),
     "backbone.backbone.network_radar.10.channel_attn.conv.weight"),
    (("neck", "backbone", "fusion3_radar", "image_attn", "gn_scale"),
     "backbone.backbone.network_radar.10.image_attn.gn.weight"),
    (("neck", "backbone", "reducer1", "proj", "kernel"),
     "backbone.backbone.network.5.proj.weight"),
    (("neck", "backbone", "patch_embed_radar", "proj", "bias"),
     "backbone.backbone.patch_embed_radar.proj.bias"),
    (("neck", "backbone", "stage2", "block3", "layer_scale_1"),
     "backbone.backbone.network.6.3.layer_scale_1"),
    (("neck", "aspp", "branch2_conv", "kernel"), "backbone.aspp.branch2.0.weight"),
    (("neck", "aspp", "branch2_bn", "bn", "var"), "backbone.aspp.branch2.1.running_var"),
    (("neck", "aspp", "branch5_bn", "bn", "scale"), "backbone.aspp.branch5_bn.weight"),
    (("neck", "aspp", "conv_cat_bn", "bn", "bias"), "backbone.aspp.conv_cat.1.bias"),
    (("neck", "upsample5_4", "conv", "bn", "scale"),
     "backbone.upsample5_4.upsample.0.bn.weight"),
    (("neck", "sc_attn_seg4", "cweight"), "backbone.sc_attn_seg4.cweight"),
    (("neck", "p5_out_det", "coc", "token_mixer", "sim_alpha"),
     "backbone.p5_out_det.coc.token_mixer.sim_alpha"),
    (("neck", "p5_out_det", "conv_att", "conv", "kernel"),
     "backbone.p5_out_det.conv_att.conv.weight"),
    (("head", "stem1", "bn", "bias"), "head.stems.1.bn.bias"),
    (("head", "cls_conv0_1", "dconv", "kernel"),
     "head.cls_convs.0.1.conv.dconv.weight"),
    (("head", "cls_conv0_1", "pconv", "kernel"),
     "head.cls_convs.0.1.conv.pconv.weight"),
    (("head", "obj_pred2", "kernel"), "head.obj_preds.2.weight"),
])
def test_torch_key_mapping(path, expected):
    assert torch_key_for(path) == expected


def test_full_round_trip_coverage():
    """Build a fake torch state_dict from our own key map; conversion must
    fill every leaf and reproduce values through the layout transforms."""
    from asy_vrnet_tpu.config import ModelConfig
    from asy_vrnet_tpu.models.efficient_vrnet import create_model, init_model

    cfg = ModelConfig(phi="nano", compute_dtype="float32",
                      use_pallas_cluster=False, input_size=(64, 64))
    model = create_model(cfg)
    params, bstats = init_model(model, jax.random.PRNGKey(0), input_size=(64, 64))

    rng = np.random.default_rng(0)
    fake_sd = {}
    expected = {}
    for tree in (params, bstats):
        for keypath, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
            path = tuple(k.key if hasattr(k, "key") else str(k) for k in keypath)
            tkey = torch_key_for(path)
            assert tkey not in fake_sd, f"duplicate torch key {tkey} for {path}"
            val = rng.standard_normal(np.shape(leaf)).astype(np.float32)
            expected["/".join(path)] = val
            leafname = path[-1]
            if leafname == "kernel" and val.ndim == 4:
                fake_sd[tkey] = np.transpose(val, (3, 2, 0, 1))
            elif leafname in ("cweight", "cbias", "sweight", "sbias") and val.ndim == 1:
                fake_sd[tkey] = val.reshape(1, -1, 1, 1)
            elif val.ndim == 0:
                fake_sd[tkey] = val.reshape(1)
            else:
                fake_sd[tkey] = val

    new_params, new_bstats, report = convert_torch_state_dict(
        fake_sd, params, bstats, verbose=False
    )
    assert report["missing"] == []
    assert report["unused"] == []
    for tree in (new_params, new_bstats):
        for keypath, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
            path = "/".join(k.key if hasattr(k, "key") else str(k) for k in keypath)
            np.testing.assert_array_equal(
                np.asarray(leaf), expected[path], err_msg=path
            )
