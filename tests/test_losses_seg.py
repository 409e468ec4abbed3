"""Segmentation losses vs torch oracles (generic torch.nn.functional usage)."""
import numpy as np
import pytest

import jax.numpy as jnp

from asy_vrnet_tpu.ops.losses_seg import ce_loss, dice_loss, f_score, focal_loss

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


def _data(num_classes=5, hw=(8, 8), b=2, with_ignore=True, seed=0):
    rng = np.random.default_rng(seed)
    logits = rng.standard_normal((b, *hw, num_classes)).astype(np.float32)
    target = rng.integers(0, num_classes + (1 if with_ignore else 0), size=(b, *hw))
    onehot = np.eye(num_classes + 1)[target].astype(np.float32)
    return logits, target.astype(np.int32), onehot


def test_ce_loss_matches_torch():
    num_classes = 5
    logits, target, _ = _data(num_classes)
    weights = np.array([1.0, 2.0, 0.5, 1.0, 3.0], np.float32)
    ours = float(ce_loss(jnp.asarray(logits), jnp.asarray(target),
                         jnp.asarray(weights), num_classes))
    t_logits = torch.from_numpy(np.transpose(logits, (0, 3, 1, 2)).copy())
    ref = torch.nn.CrossEntropyLoss(
        weight=torch.from_numpy(weights), ignore_index=num_classes
    )(t_logits, torch.from_numpy(target.astype(np.int64)))
    np.testing.assert_allclose(ours, float(ref), rtol=1e-5)


def test_focal_loss_matches_reference_formula():
    num_classes = 5
    logits, target, _ = _data(num_classes, seed=1)
    weights = np.ones(num_classes, np.float32)
    alpha, gamma = 0.5, 2.0
    ours = float(focal_loss(jnp.asarray(logits), jnp.asarray(target),
                            jnp.asarray(weights), num_classes, alpha, gamma))
    # torch oracle: the reference formula (deeplabv3_training.py:22-38)
    t_logits = torch.from_numpy(logits.reshape(-1, num_classes).copy())
    t_target = torch.from_numpy(target.reshape(-1).astype(np.int64))
    logpt = -F.cross_entropy(
        t_logits, t_target, weight=torch.from_numpy(weights),
        ignore_index=num_classes, reduction="none",
    )
    pt = torch.exp(logpt)
    loss = (-((1 - pt) ** gamma) * (logpt * alpha)).mean()
    np.testing.assert_allclose(ours, float(loss), rtol=1e-5)


def test_dice_loss_matches_reference_formula():
    num_classes = 5
    logits, _, onehot = _data(num_classes, seed=2)
    ours = float(dice_loss(jnp.asarray(logits), jnp.asarray(onehot)))
    b = logits.shape[0]
    t_inputs = torch.softmax(torch.from_numpy(logits.reshape(b, -1, num_classes).copy()), -1)
    t_target = torch.from_numpy(onehot.reshape(b, -1, num_classes + 1).copy())
    tp = torch.sum(t_target[..., :-1] * t_inputs, dim=[0, 1])
    fp = torch.sum(t_inputs, dim=[0, 1]) - tp
    fn = torch.sum(t_target[..., :-1], dim=[0, 1]) - tp
    smooth = 1e-5
    score = (2 * tp + smooth) / (2 * tp + fn + fp + smooth)
    ref = 1 - torch.mean(score)
    np.testing.assert_allclose(ours, float(ref), rtol=1e-5)


def test_focal_resizes_logits_when_needed():
    num_classes = 3
    rng = np.random.default_rng(3)
    logits = rng.standard_normal((1, 4, 4, num_classes)).astype(np.float32)
    target = rng.integers(0, num_classes, size=(1, 8, 8)).astype(np.int32)
    val = float(focal_loss(jnp.asarray(logits), jnp.asarray(target),
                           None, num_classes))
    assert np.isfinite(val)


def test_f_score_range():
    num_classes = 4
    logits, _, onehot = _data(num_classes, seed=4, with_ignore=False)
    v = float(f_score(jnp.asarray(logits), jnp.asarray(onehot)))
    assert 0.0 <= v <= 1.0
