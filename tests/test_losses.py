import numpy as np
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from single_shot_detection_tpu.ops import losses
from single_shot_detection_tpu.ops.box_coder import BoxCoder
from single_shot_detection_tpu.ops.sampling import hard_negative_mining


def test_cross_entropy_vs_torch(rng):
    logits = rng.randn(40, 6).astype(np.float32)
    labels = rng.randint(-1, 6, size=(40,)).astype(np.int32)
    loss = losses.CrossEntropyLoss(reduction='sum', ignore_index=-1)
    got = float(loss(jnp.asarray(logits), jnp.asarray(labels)))
    expected = float(F.cross_entropy(torch.from_numpy(logits),
                                     torch.from_numpy(labels).long(),
                                     reduction='sum', ignore_index=-1))
    np.testing.assert_allclose(got, expected, rtol=1e-5)


def test_cross_entropy_mask_equals_gather(rng):
    logits = rng.randn(40, 6).astype(np.float32)
    labels = rng.randint(0, 6, size=(40,)).astype(np.int32)
    mask = rng.rand(40) > 0.5
    loss = losses.CrossEntropyLoss(reduction='sum', ignore_index=-1)
    got = float(loss(jnp.asarray(logits), jnp.asarray(labels), jnp.asarray(mask)))
    expected = float(F.cross_entropy(torch.from_numpy(logits[mask]),
                                     torch.from_numpy(labels[mask]).long(),
                                     reduction='sum'))
    np.testing.assert_allclose(got, expected, rtol=1e-5)


def test_smooth_l1_vs_torch(rng):
    pred = rng.randn(30, 4).astype(np.float32)
    target = rng.randn(30, 4).astype(np.float32)
    loss = losses.SmoothL1Loss(reduction='sum')
    got = float(loss(jnp.asarray(pred), jnp.asarray(target)))
    expected = float(F.smooth_l1_loss(torch.from_numpy(pred),
                                      torch.from_numpy(target), reduction='sum'))
    np.testing.assert_allclose(got, expected, rtol=1e-5)


def test_sigmoid_focal_loss_vs_reference_formula(rng):
    logits = rng.randn(20, 5).astype(np.float32)
    target = (rng.rand(20, 5) > 0.8).astype(np.float32)
    got = float(losses.SigmoidFocalLoss(gamma=2.0, alpha=0.25, reduction='sum')(
        jnp.asarray(logits), jnp.asarray(target)))
    # reference formula (losses.py:34-54) in torch
    t_logits, t_target = torch.from_numpy(logits), torch.from_numpy(target)
    alpha_w = t_target * 0.25 + (1 - t_target) * 0.75
    pb = torch.sigmoid(t_logits)
    pb = pb * t_target + (1 - pb) * (1 - t_target)
    ce = F.binary_cross_entropy_with_logits(t_logits, t_target, reduction='none')
    expected = float((alpha_w * (1 - pb) ** 2 * ce).sum())
    np.testing.assert_allclose(got, expected, rtol=1e-4)


def test_softmax_focal_gamma_zero_equals_ce(rng):
    logits = rng.randn(25, 7).astype(np.float32)
    labels = rng.randint(0, 7, size=(25,)).astype(np.int32)
    focal = losses.SoftmaxFocalLoss(gamma=0.0, reduction='sum', ignore_index=-1)
    ce = losses.CrossEntropyLoss(reduction='sum', ignore_index=-1)
    got = float(focal(jnp.asarray(logits), jnp.asarray(labels)))
    expected = float(ce(jnp.asarray(logits), jnp.asarray(labels)))
    np.testing.assert_allclose(got, expected, rtol=1e-5)


def test_giou_loss_zero_for_identical(rng):
    boxes = rng.rand(10, 4).astype(np.float32)
    boxes[:, 2:] += boxes[:, :2] + 1
    loss = losses.GeneralizedIoULoss(reduction='sum')
    got = float(loss(jnp.asarray(boxes), jnp.asarray(boxes)))
    np.testing.assert_allclose(got, 0.0, atol=1e-5)


def _toy_problem(rng, batch=2, anchors=20, classes=5):
    scores = rng.randn(batch, anchors, classes).astype(np.float32)
    locs = rng.randn(batch, anchors, 4).astype(np.float32)
    priors = np.abs(rng.rand(anchors, 4).astype(np.float32)) * 50 + 10
    target = np.zeros((batch, anchors, 6), dtype=np.float32)
    target[..., 5] = 1.0
    # a few positives with sane boxes
    for b in range(batch):
        for a in rng.choice(anchors, 4, replace=False):
            cx, cy = rng.rand(2) * 50 + 20
            w, h = rng.rand(2) * 20 + 5
            target[b, a, :4] = [cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2]
            target[b, a, 4] = rng.randint(1, classes)
    return scores, locs, priors, target


def reference_multibox(scores, locs, priors, target, ratio=3, min_neg=5):
    """Torch replay of multibox_loss.py:35-94 with hard-negative mining."""
    t_scores = torch.from_numpy(scores)
    t_locs = torch.from_numpy(locs)
    t_priors = torch.from_numpy(priors)
    t_target = torch.from_numpy(target.copy())

    tc = t_target[..., 4].long()
    positive = (tc != 0) & (tc != -1)

    # hard negative mining (sampler.py)
    import math
    loss = -F.log_softmax(t_scores, dim=-1)[:, :, 0]
    negative = tc == 0
    num_neg = negative.sum(dim=1, keepdim=True)
    num_pos = positive.sum(dim=1, keepdim=True)
    keep = torch.min(torch.clamp(num_pos * ratio, min=min_neg), num_neg)
    loss[~negative] = -math.inf
    rank = loss.argsort(dim=1, descending=True).argsort(dim=1)
    sampled = positive | (rank < keep)

    class_loss = F.cross_entropy(t_scores[sampled], tc[sampled],
                                 reduction='sum', ignore_index=-1)

    # encode target boxes (to_centroids + encode, eps added after division)
    tl = t_target[..., :4]
    mins, maxs = tl[..., :2], tl[..., 2:]
    cent = torch.cat([(mins + maxs) / 2, maxs - mins], dim=-1)
    pr = t_priors.unsqueeze(0)
    enc_xy = (cent[..., :2] - pr[..., :2]) / pr[..., 2:] * 10.0
    enc_wh = torch.log(cent[..., 2:] / pr[..., 2:] + 1e-8) * 5.0
    enc = torch.cat([enc_xy, enc_wh], dim=-1)

    loc_loss = F.smooth_l1_loss(t_locs[positive], enc[positive], reduction='sum')
    divider = positive.sum().clamp(min=1).float()
    return float(class_loss / divider), float(loc_loss / divider)


def test_multibox_loss_vs_torch_reference(rng):
    scores, locs, priors, target = _toy_problem(rng)
    coder = BoxCoder(10.0, 5.0)
    import functools
    sampler = functools.partial(hard_negative_mining,
                                negative_per_positive_ratio=3,
                                min_negative_per_image=5)
    mb = losses.MultiboxLoss(sampler, coder,
                             {'name': 'CrossEntropyLoss'},
                             {'name': 'SmoothL1Loss'})
    total, cls, loc = mb(jnp.asarray(scores), jnp.asarray(locs),
                         jnp.asarray(priors), jnp.asarray(target))
    exp_cls, exp_loc = reference_multibox(scores, locs, priors, target)
    np.testing.assert_allclose(float(cls), exp_cls, rtol=1e-4)
    np.testing.assert_allclose(float(loc), exp_loc, rtol=1e-4)
    np.testing.assert_allclose(float(total), exp_cls + exp_loc, rtol=1e-4)


def test_multibox_loss_image_mask_drops_padded_rows():
    """Zero-padded eval rows must contribute no loss (they would otherwise
    each add min_negative_per_image hard negatives)."""
    import functools
    import jax
    import jax.numpy as jnp
    from single_shot_detection_tpu.ops import sampling
    from single_shot_detection_tpu.ops.box_coder import BoxCoder
    from single_shot_detection_tpu.ops.losses import MultiboxLoss
    from single_shot_detection_tpu.ops.matching import TargetAssigner

    rng = np.random.RandomState(7)
    A, C = 64, 5
    anchors = jnp.asarray(
        np.stack([rng.uniform(10, 90, A), rng.uniform(10, 90, A),
                  rng.uniform(5, 20, A), rng.uniform(5, 20, A)], -1),
        jnp.float32)
    sampler = functools.partial(sampling.hard_negative_mining,
                                negative_per_positive_ratio=3,
                                min_negative_per_image=5)
    criterion = MultiboxLoss(sampler, BoxCoder(10.0, 5.0),
                             {'name': 'CrossEntropyLoss'},
                             {'name': 'SmoothL1Loss'})
    assigner = TargetAssigner(0.5, 0.5)

    gt = np.zeros((3, 2, 6), np.float32)
    gt[0, 0] = [20, 20, 50, 50, 1, 1]
    gt[1, 0] = [30, 10, 70, 60, 2, 1]
    mask = np.array([[True, False], [True, False], [False, False]])
    scores = jnp.asarray(rng.randn(3, A, C), jnp.float32)
    locs = jnp.asarray(rng.randn(3, A, 4), jnp.float32)

    target3 = assigner(jnp.asarray(gt), jnp.asarray(mask), anchors)
    masked = criterion(scores, locs, anchors, target3,
                       image_mask=jnp.array([True, True, False]))
    target2 = assigner(jnp.asarray(gt[:2]), jnp.asarray(mask[:2]), anchors)
    ref = criterion(scores[:2], locs[:2], anchors, target2)
    for a, b in zip(masked, ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_l1_loss_is_not_huber():
    from single_shot_detection_tpu.ops.losses import build_loss
    import jax.numpy as jnp
    l1 = build_loss('L1Loss', reduction='sum')
    pred = jnp.array([[0.5, -0.25]])
    tgt = jnp.zeros((1, 2))
    np.testing.assert_allclose(float(l1(pred, tgt)), 0.75, rtol=1e-6)


def test_mse_loss_matches_torch():
    import torch
    import torch.nn.functional as F
    from single_shot_detection_tpu.ops.losses import MSELoss
    rng = np.random.RandomState(0)
    pred = rng.randn(6, 4).astype(np.float32)
    target = rng.randn(6, 4).astype(np.float32)
    ours = MSELoss(reduction='sum')(jnp.asarray(pred), jnp.asarray(target))
    ref = F.mse_loss(torch.tensor(pred), torch.tensor(target),
                     reduction='sum')
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5)


def test_torchhub_backbone_rejected():
    import pytest
    from single_shot_detection_tpu.models.builder import create_base
    with pytest.raises(ValueError, match='torch-hub'):
        create_base('torchhub://some/repo:model')


def test_huber_loss_matches_torch(rng):
    pred = rng.randn(6, 4).astype(np.float32) * 2
    target = rng.randn(6, 4).astype(np.float32)
    for delta in (1.0, 0.5, 2.0):
        ours = losses.HuberLoss(reduction='sum', delta=delta)(
            jnp.asarray(pred), jnp.asarray(target))
        ref = F.huber_loss(torch.tensor(pred), torch.tensor(target),
                           reduction='sum', delta=delta)
        np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5)
    # delta=1 coincides with SmoothL1(beta=1), other deltas do not
    s1 = losses.SmoothL1Loss(reduction='sum', beta=1.0)(
        jnp.asarray(pred), jnp.asarray(target))
    h1 = losses.HuberLoss(reduction='sum', delta=1.0)(
        jnp.asarray(pred), jnp.asarray(target))
    np.testing.assert_allclose(float(s1), float(h1), rtol=1e-6)


def test_nll_loss_matches_torch(rng):
    logits = rng.randn(30, 7).astype(np.float32)
    logp = F.log_softmax(torch.tensor(logits), dim=-1).numpy()
    target = rng.randint(0, 7, size=30)
    target[::5] = -100  # ignore_index rows
    ours = losses.NLLLoss(reduction='mean')(
        jnp.asarray(logp), jnp.asarray(target))
    ref = F.nll_loss(torch.tensor(logp), torch.tensor(target),
                     reduction='mean', ignore_index=-100)
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5)


def test_bce_with_logits_matches_torch(rng):
    logits = rng.randn(12, 5).astype(np.float32) * 3
    target = (rng.rand(12, 5) > 0.7).astype(np.float32) * \
        rng.rand(12, 5).astype(np.float32)  # soft {0, score} plane
    ours = losses.BCEWithLogitsLoss(reduction='sum')(
        jnp.asarray(logits), jnp.asarray(target))
    ref = F.binary_cross_entropy_with_logits(
        torch.tensor(logits), torch.tensor(target), reduction='sum')
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5)
    # pos_weight path
    ours_w = losses.BCEWithLogitsLoss(reduction='sum', pos_weight=3.0)(
        jnp.asarray(logits), jnp.asarray(target))
    ref_w = F.binary_cross_entropy_with_logits(
        torch.tensor(logits), torch.tensor(target), reduction='sum',
        pos_weight=torch.tensor(3.0))
    np.testing.assert_allclose(float(ours_w), float(ref_w), rtol=1e-5)


def test_build_loss_unknown_name_lists_supported():
    import pytest
    from single_shot_detection_tpu.ops.losses import build_loss
    with pytest.raises(KeyError, match='Supported names'):
        build_loss('MarginRankingLoss')  # two-input contract: out of scope
    # the newly added torch names construct through the config factory
    for name in ('HuberLoss', 'NLLLoss', 'BCEWithLogitsLoss', 'KLDivLoss'):
        assert build_loss(name, reduction='sum') is not None


def test_bce_loss_matches_torch(rng):
    probs = rng.rand(6, 4).astype(np.float32)
    probs[0, 0], probs[1, 1] = 0.0, 1.0  # clamp path (torch clamps at -100)
    target = (rng.rand(6, 4) > 0.5).astype(np.float32)
    ours = losses.BCELoss(reduction='sum')(jnp.asarray(probs),
                                           jnp.asarray(target))
    ref = F.binary_cross_entropy(torch.tensor(probs), torch.tensor(target),
                                 reduction='sum')
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-4)


def test_kldiv_loss_matches_torch(rng):
    logits = rng.randn(6, 5).astype(np.float32)
    log_pred = np.asarray(jnp.asarray(logits)
                          - jnp.log(jnp.sum(jnp.exp(logits), -1,
                                            keepdims=True)))
    target = rng.rand(6, 5).astype(np.float32)
    target /= target.sum(-1, keepdims=True)
    target[2, 3] = 0.0  # the 0*log0 = 0 convention
    ours = losses.KLDivLoss(reduction='sum')(jnp.asarray(log_pred),
                                             jnp.asarray(target))
    ref = F.kl_div(torch.tensor(log_pred), torch.tensor(target),
                   reduction='sum')
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-4)


def test_poisson_nll_loss_matches_torch(rng):
    log_pred = rng.randn(6, 4).astype(np.float32)
    target = rng.poisson(3.0, size=(6, 4)).astype(np.float32)
    ours = losses.PoissonNLLLoss(reduction='sum')(jnp.asarray(log_pred),
                                                  jnp.asarray(target))
    ref = F.poisson_nll_loss(torch.tensor(log_pred), torch.tensor(target),
                             log_input=True, full=False, reduction='sum')
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-4)

    import pytest
    with pytest.raises(NotImplementedError):
        losses.PoissonNLLLoss(log_input=False)


def test_soft_margin_loss_matches_torch(rng):
    pred = rng.randn(6, 4).astype(np.float32) * 3
    target = np.sign(rng.randn(6, 4)).astype(np.float32)
    ours = losses.SoftMarginLoss(reduction='sum')(jnp.asarray(pred),
                                                  jnp.asarray(target))
    ref = F.soft_margin_loss(torch.tensor(pred), torch.tensor(target),
                             reduction='sum')
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-4)


def test_new_losses_in_registry():
    for name in ('BCELoss', 'KLDivLoss', 'PoissonNLLLoss', 'SoftMarginLoss'):
        assert losses.build_loss(name, reduction='sum') is not None
